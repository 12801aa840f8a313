"""OTLP/HTTP JSON receiver (S1's network edge, dependency-free).

The reference listens with gRPC (``internal/receiver/otlp.go:42-89``);
this container has no grpc/protobuf packages, but OTLP also specifies
an official HTTP binding — POST ``/v1/metrics`` with the JSON encoding
of ExportMetricsServiceRequest (opentelemetry-proto, OTLP/HTTP spec) —
which stdlib ``http.server`` can terminate. The receiver does exactly
what the reference's gRPC Export handler does at this layer: accept the
request, hand the payload to the pipeline, ack with an empty
ExportMetricsServiceResponse (``{}``).

Hand-off is the drop-dir contract: each accepted body is written
atomically (tmp + rename) as one JSON file in ``drop_dir``, where
``sources.otlp.otlp_json_stream`` -> ``streaming.pipeline.
ingest_stream`` picks it up on the next trigger. Receiver and Spark
job stay separate processes exactly like the reference's receiver and
writer goroutines — the file system is the buffer between them (at
scale the same contract rides Kafka; only the drop transport changes).

Usage::

    srv = make_otlp_http_server("/tmp/otlp-drop", port=4318)  # OTLP/HTTP port
    threading.Thread(target=srv.serve_forever, daemon=True).start()
"""

from __future__ import annotations

import json
import os
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

METRICS_PATH = "/v1/metrics"


def make_otlp_http_server(
    drop_dir: str,
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Build (not start) the receiver; ``port=0`` picks a free port.

    Bodies must be JSON (``Content-Type: application/json``; the
    protobuf encoding of OTLP/HTTP is rejected with 415 since the
    container has no protobuf decoder for the metrics service schema).
    Invalid JSON -> 400 with a partial-success-style error body, per
    the OTLP/HTTP failure semantics."""
    os.makedirs(drop_dir, exist_ok=True)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API name)
            if self.path != METRICS_PATH:
                self.send_error(404, "unknown path")
                return
            ctype = self.headers.get("Content-Type", "")
            if "json" not in ctype:
                self.send_error(415, "only application/json is supported")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length < 0:
                    raise ValueError("negative Content-Length")
            except ValueError:
                self._reply(400, {"error": "bad Content-Length"})
                return
            body = self.rfile.read(length)
            try:
                payload = json.loads(body)
            except ValueError as exc:
                self._reply(400, {"error": f"invalid JSON: {exc}"})
                return
            # atomic single-writer drop: readStream never sees a partial
            # file because rename is atomic on the same filesystem
            name = f"export-{uuid.uuid4().hex}.json"
            tmp = os.path.join(drop_dir, f".{name}.tmp")
            with open(tmp, "w") as f:
                json.dump(payload, f)
            os.rename(tmp, os.path.join(drop_dir, name))
            self._reply(200, {})  # empty ExportMetricsServiceResponse

        def _reply(self, code: int, obj: dict) -> None:
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):  # quiet: tests drive this
            pass

    return ThreadingHTTPServer((host, port), Handler)
