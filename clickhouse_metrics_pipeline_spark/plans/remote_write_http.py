"""Prometheus Remote Write receiver (the push half of the Prometheus
pair; the reference only serves the pull half, Remote Read —
``internal/promread/handler.go``; a metrics backend that speaks Read
almost always needs to accept Write too, so this closes the loop:
``prometheus -> remote_write -> ingest`` and
``prometheus <- remote_read <- rollups`` against one engine).

POST ``/api/v1/write`` carries a snappy-compressed ``prompb.
WriteRequest``; the dependency-free codec lives next to the Read codec
(``plans/remote_read_wire.py``). Accepted bodies convert to OTLP-JSON
ExportMetricsServiceRequest files in the SAME drop directory the
OTLP/HTTP receiver feeds (``sources/otlp_http.py``), so both network
edges share one ingest pipeline — validation, attribute merge,
cumulative->delta temporality, partitioned parquet — with zero
protocol-specific processing past the edge.

Type mapping (Remote Write v1 carries no metric-type metadata — the
protocol's documented gap): series whose ``__name__`` ends in
``_total``/``_count``/``_sum`` or ``_bucket`` become CUMULATIVE
MONOTONIC SUMS (the ingest's reset-aware cumulative->delta conversion
then applies, exactly as it does for Prometheus counters); everything
else is a gauge. The ``job`` label maps to ``service.name`` (the
standard Prometheus->OTLP resource mapping); remaining labels except
``__name__`` become datapoint attributes, preserving series identity
under the canonical K1/K2 hash.
"""

from __future__ import annotations

import json
import os
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from clickhouse_metrics_pipeline_spark.plans.remote_read_wire import (
    decode_write_request,
    snappy_decompress,
)

WRITE_PATH = "/api/v1/write"

_COUNTERISH = ("_total", "_count", "_sum", "_bucket")


def _kv(key: str, value: str) -> dict:
    return {
        "key": key,
        "value": {
            "stringValue": value,
            "intValue": None,
            "doubleValue": None,
            "boolValue": None,
        },
    }


def write_request_to_export(series: list[dict]) -> dict:
    """[{labels, samples}] -> OTLP-JSON ExportMetricsServiceRequest.

    One resourceMetrics entry per distinct ``job`` label (the resource
    boundary); within it one metric entry per series. Samples carry
    ``timeUnixNano = ts_ms * 1e6`` and ``asDouble`` values — Remote
    Write is float-only on the wire."""
    by_job: dict[str, list[dict]] = {}
    for ts in series:
        labels = dict(ts["labels"])
        name = labels.pop("__name__", "")
        job = labels.pop("job", "")
        attrs = [_kv(k, v) for k, v in sorted(labels.items())]
        dps = [
            {
                "timeUnixNano": int(ts_ms) * 1_000_000,
                "asDouble": float(v),
                "asInt": None,
                "attributes": attrs,
                "exemplars": [],
            }
            for v, ts_ms in ts["samples"]
        ]
        if name.endswith(_COUNTERISH):
            metric = {
                "name": name,
                "sum": {
                    "aggregationTemporality": 2,  # cumulative
                    "isMonotonic": True,
                    "dataPoints": dps,
                },
            }
        else:
            metric = {"name": name, "gauge": {"dataPoints": dps}}
        by_job.setdefault(job, []).append(metric)
    return {
        "resourceMetrics": [
            {
                "resource": {
                    "attributes": (
                        [_kv("service.name", job)] if job else []
                    )
                },
                "scopeMetrics": [{"metrics": metrics}],
            }
            for job, metrics in sorted(by_job.items())
        ]
    }


def make_remote_write_server(
    drop_dir: str,
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Build (not start) the receiver; ``port=0`` picks a free port.

    Protocol edges mirror the Read endpoint's: snappy-decompress
    failures and undecodable protobuf -> 400; negative/invalid
    Content-Length -> 400 (never a hung read); success -> 204 No
    Content (the Remote Write ack). Each accepted body lands
    atomically (tmp + rename) as one OTLP-JSON file for the shared
    streaming ingest."""
    os.makedirs(drop_dir, exist_ok=True)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API name)
            if self.path != WRITE_PATH:
                self.send_error(404, "unknown path")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length < 0:
                    raise ValueError("negative Content-Length")
            except ValueError:
                self.send_error(400, "bad Content-Length")
                return
            body = self.rfile.read(length)
            try:
                series = decode_write_request(snappy_decompress(body))
            except Exception:
                self.send_error(400, "undecodable WriteRequest")
                return
            export = write_request_to_export(series)
            name = f"rw-{uuid.uuid4().hex}.json"
            tmp = os.path.join(drop_dir, f".{name}.tmp")
            with open(tmp, "w") as fh:
                json.dump(export, fh)
                fh.write("\n")
            os.rename(tmp, os.path.join(drop_dir, name))
            self.send_response(204)
            self.end_headers()

        def log_message(self, *args):  # quiet test runs
            pass

    return ThreadingHTTPServer((host, port), Handler)
