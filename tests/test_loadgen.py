"""S9 load generator (tools/loadgen.py): deterministic OTLP/JSON
export requests with the reference generator's metric shapes
(test/otlp_generator.go:97-210), driven end-to-end through the
file-drop ingest stream."""

from __future__ import annotations

import json
import subprocess
import sys
import time

import pytest  # noqa: F401


def _run_loadgen(drop, ticks=10, seed=1, extra=()):
    subprocess.run(
        [
            sys.executable, "tools/loadgen.py",
            "--drop-dir", str(drop),
            "--ticks", str(ticks),
            "--seed", str(seed),
            "--reset-every", "5",
            "--start-ns",
            str((int(time.time()) - 120) * 1_000_000_000),
            *extra,
        ],
        check=True,
        capture_output=True,
    )


class TestLoadgen:
    def test_deterministic_across_runs(self, tmp_path):
        a, b = tmp_path / "a", tmp_path / "b"
        start = str((int(time.time()) - 120) * 1_000_000_000)
        for d in (a, b):
            subprocess.run(
                [sys.executable, "tools/loadgen.py", "--drop-dir", str(d),
                 "--ticks", "5", "--seed", "7", "--start-ns", start],
                check=True, capture_output=True,
            )
        fa = sorted(p.name for p in a.iterdir())
        fb = sorted(p.name for p in b.iterdir())
        assert fa == fb and len(fa) == 5
        for n in fa:
            assert (a / n).read_text() == (b / n).read_text()

    def test_payload_shape_and_counter_reset(self, tmp_path):
        drop = tmp_path / "drop"
        subprocess.run(
            [sys.executable, "tools/loadgen.py", "--drop-dir", str(drop),
             "--ticks", "24", "--seed", "1", "--reset-every", "20",
             "--start-ns",
             str((int(time.time()) - 120) * 1_000_000_000)],
            check=True, capture_output=True,
        )
        reqs = [
            json.loads((drop / f"export-{i:05d}.json").read_text())
            for i in range(24)
        ]
        # counter 0 values across ticks: cumulative until the reset at
        # tick 20, where the total restarts near zero
        c0 = []
        for r in reqs:
            ms = r["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
            for m in ms:
                if m["name"] == "test_counter_0":
                    c0.append(m["sum"]["dataPoints"][0]["asInt"])
        assert len(c0) == 24
        # indices 0..18 are ticks 1..19, all pre-reset
        assert all(b >= a for a, b in zip(c0[:18], c0[1:19]))
        # 19 ticks of 70%-chance 1..10 increments dwarf a single
        # post-reset increment (<=10)
        assert c0[19] <= 10 < c0[18]
        # gauges ride the sine; histograms carry the latency mixture
        names = {m["name"]
                 for r in reqs
                 for m in r["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]}
        assert {"test_gauge_0", "response_time_exponential"} <= names
        assert any(n.startswith("http_request_duration_") for n in names)

    def test_http_mode_posts_to_the_receiver(self, tmp_path):
        # loadgen --endpoint drives the real OTLP/HTTP receiver; every
        # tick must land as one atomic drop file (no Spark involved)
        import threading

        from clickhouse_metrics_pipeline_spark.sources.otlp_http import (
            make_otlp_http_server,
        )

        drop = tmp_path / "http_drop"
        srv = make_otlp_http_server(str(drop))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            port = srv.server_address[1]
            subprocess.run(
                [sys.executable, "tools/loadgen.py",
                 "--endpoint", f"http://127.0.0.1:{port}/v1/metrics",
                 "--ticks", "6", "--seed", "3",
                 "--start-ns",
                 str((int(time.time()) - 120) * 1_000_000_000)],
                check=True, capture_output=True,
            )
        finally:
            srv.shutdown()
        files = list(drop.glob("export-*.json"))
        assert len(files) == 6
        payload = json.loads(files[0].read_text())
        assert payload["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]

    @pytest.mark.slow
    def test_drop_dir_ingests_end_to_end(self, spark, tmp_path):
        from clickhouse_metrics_pipeline_spark.sources.otlp import (
            otlp_json_stream,
        )
        from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
            ingest_stream,
        )

        drop = tmp_path / "drop"
        _run_loadgen(drop, ticks=8)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = ingest_stream(
            otlp_json_stream(spark, str(drop), workspace_id="loadgen"),
            out, ckpt, workspace_id="loadgen", available_now=True,
        )
        q.awaitTermination(180)
        rows = spark.read.parquet(out).collect()
        assert rows
        by_metric = {}
        for r in rows:
            by_metric.setdefault(r.metric, []).append(r)
        # cumulative counters came out delta-converted (temporality=2)
        c0 = sorted(by_metric["test_counter_0"], key=lambda r: r.timestamp)
        assert {r.temporality for r in c0} == {2}
        # a reset inside the stream emits the post-reset value, never a
        # negative delta (the T1 kernel's reset rule)
        assert all(r.value >= 0 for r in c0)
        # gauges and histograms landed with their types intact
        assert by_metric["test_gauge_0"]
        hist = by_metric["response_time_exponential"][0]
        assert hist.buckets_le and hist["count"] >= 1
