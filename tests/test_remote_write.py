"""Prometheus Remote Write receiver: codec, converter, and the shared
ingest path (plans/remote_write_http.py).

The byte fixture in TestWireFormat is assembled BY HAND from the
proto3 wire spec + prompb schema (WriteRequest.timeseries=1;
TimeSeries.labels=1, samples=2; Label.name=1, value=2; Sample.value=1
double, timestamp=2 int64) — an independent derivation, so decode is
checked against the spec rather than against our own encoder.
"""

from __future__ import annotations

import json
import struct
import time
import threading
import urllib.request

import pytest

from clickhouse_metrics_pipeline_spark.plans.remote_read_wire import (
    decode_write_request,
    encode_write_request,
    snappy_compress,
)
from clickhouse_metrics_pipeline_spark.plans.remote_write_http import (
    make_remote_write_server,
    write_request_to_export,
)


def _ld(field, payload):
    return bytes([(field << 3) | 2, len(payload)]) + payload


class TestWireFormat:
    def test_decode_hand_assembled_write_request(self):
        # one series: {__name__="up", job="api"} [(1.0, 1700000000001)]
        lbl1 = _ld(1, _ld(1, b"__name__") + _ld(2, b"up"))
        lbl2 = _ld(1, _ld(1, b"job") + _ld(2, b"api"))
        sample = (
            bytes([(1 << 3) | 1])  # field 1, wire 1 (fixed64 double)
            + struct.pack("<d", 1.0)
            + bytes([(2 << 3) | 0])  # field 2, wire 0 (varint)
            # 1700000000001 as uvarint (hand-derived: 7-bit groups
            # little-endian with continuation bits)
            + b"\x81\xd0\x95\xff\xbc\x31"
        )
        ts = lbl1 + lbl2 + _ld(2, sample)
        req = _ld(1, ts)
        got = decode_write_request(req)
        assert got == [
            {
                "labels": {"__name__": "up", "job": "api"},
                "samples": [(1.0, 1700000000001)],
            }
        ]

    def test_roundtrip(self):
        series = [
            {
                "labels": {"__name__": "http_requests_total", "code": "200"},
                "samples": [(100.0, 1), (150.5, 2_000_000)],
            },
            {"labels": {"__name__": "temp"}, "samples": [(-3.25, 99)]},
        ]
        assert decode_write_request(encode_write_request(series)) == series

    def test_unknown_fields_skipped(self):
        # append a metadata field (3) — must be ignored, not an error
        body = encode_write_request(
            [{"labels": {"__name__": "up"}, "samples": [(1.0, 5)]}]
        ) + _ld(3, b"\x0a\x02hi")
        assert len(decode_write_request(body)) == 1


class TestConverter:
    def test_counter_suffix_becomes_cumulative_monotonic_sum(self):
        out = write_request_to_export(
            [
                {
                    "labels": {
                        "__name__": "requests_total",
                        "job": "api",
                        "code": "200",
                    },
                    "samples": [(100.0, 1_000)],
                }
            ]
        )
        rm = out["resourceMetrics"]
        assert len(rm) == 1
        res_attrs = {a["key"]: a["value"]["stringValue"]
                     for a in rm[0]["resource"]["attributes"]}
        assert res_attrs == {"service.name": "api"}
        m = rm[0]["scopeMetrics"][0]["metrics"][0]
        assert m["name"] == "requests_total"
        assert m["sum"]["aggregationTemporality"] == 2
        assert m["sum"]["isMonotonic"] is True
        dp = m["sum"]["dataPoints"][0]
        assert dp["timeUnixNano"] == 1_000 * 1_000_000
        assert dp["asDouble"] == 100.0
        assert {a["key"] for a in dp["attributes"]} == {"code"}

    def test_plain_name_becomes_gauge_and_jobs_split_resources(self):
        out = write_request_to_export(
            [
                {"labels": {"__name__": "temp", "job": "a"},
                 "samples": [(1.0, 1)]},
                {"labels": {"__name__": "temp", "job": "b"},
                 "samples": [(2.0, 1)]},
            ]
        )
        rm = out["resourceMetrics"]
        assert len(rm) == 2  # one resource per job
        assert all("gauge" in m
                   for r in rm for m in r["scopeMetrics"][0]["metrics"])


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
class TestEndToEnd:
    def test_remote_write_to_parquet_through_shared_ingest(
        self, spark, tmp_path
    ):
        from clickhouse_metrics_pipeline_spark.sources.otlp import (
            otlp_json_stream,
        )
        from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
            ingest_stream,
        )

        drop = tmp_path / "drop"
        srv = make_remote_write_server(str(drop))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            now_ms = (int(time.time()) - 120) * 1000
            series = [
                {
                    "labels": {
                        "__name__": "requests_total",
                        "job": "api",
                        "code": "200",
                    },
                    "samples": [(100.0, now_ms), (150.0, now_ms + 1000)],
                },
                {
                    "labels": {"__name__": "cpu_usage", "job": "api",
                               "host": "h1"},
                    "samples": [(75.5, now_ms)],
                },
            ]
            body = snappy_compress(encode_write_request(series))
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.server_address[1]}/api/v1/write",
                data=body,
                headers={"Content-Type": "application/x-protobuf"},
            )
            assert urllib.request.urlopen(req, timeout=30).status == 204

            out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
            q = ingest_stream(
                otlp_json_stream(spark, str(drop), workspace_id="w1"),
                out,
                ckpt,
                workspace_id="w1",
                available_now=True,
            )
            q.awaitTermination(120)
            rows = spark.read.parquet(out).collect()
            ctr = sorted(
                r.value for r in rows if r.metric == "requests_total"
            )
            # cumulative counter -> reset-aware deltas via the SAME
            # pipeline OTLP ingest uses
            assert ctr == [50.0, 100.0]
            g = [r for r in rows if r.metric == "cpu_usage"]
            assert len(g) == 1 and g[0].value == 75.5
            assert g[0].serviceName == "api"
            assert g[0].attributes["host"] == "h1"
            t = [r for r in rows if r.metric == "requests_total"][0]
            assert t.temporality == 2 and t.is_monotonic

        finally:
            srv.shutdown()

    def test_bad_bodies_rejected(self, tmp_path):
        srv = make_remote_write_server(str(tmp_path / "d"))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/api/v1/write"
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(
                    urllib.request.Request(url, data=b"not snappy"),
                    timeout=30,
                )
            assert e.value.code == 400
        finally:
            srv.shutdown()
