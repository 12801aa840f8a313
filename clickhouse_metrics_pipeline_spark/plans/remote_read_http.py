"""Prometheus Remote Read HTTP endpoint (S7, the last wire edge).

The reference's handler is an ``http.Handler`` at ``/api/v1/read``
taking a snappy-compressed prompb ReadRequest body and answering a
snappy-compressed ReadResponse (``pkg/promread/handler.go:65-107``,
mounted in ``cmd/main.go``). Everything below the HTTP object already
exists here — ``plans.remote_read_wire.handle_remote_read`` is the full
body-in/body-out dataflow — so this module is just the stdlib
``ThreadingHTTPServer`` shell around it: no third-party web framework,
matching the container's no-new-dependencies constraint.

A real Prometheus can point ``remote_read.url`` at this server; the
driver thread owns the SparkSession and the handler threads only build
and collect DataFrames, which is supported Spark usage (sessions are
thread-safe; jobs from different threads just schedule concurrently).

Usage::

    catalog = MetricsCatalog({"metrics_raw": df, "metrics_1m": rolled})
    srv = make_remote_read_server(catalog, port=9201)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
"""

from __future__ import annotations

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from clickhouse_metrics_pipeline_spark.plans.remote_read_wire import (
    handle_remote_read,
)

READ_PATH = "/api/v1/read"


def make_remote_read_server(
    catalog,
    host: str = "127.0.0.1",
    port: int = 0,
    workspace_id: str | None = None,
    now_ms: int | None = None,
    limit: int = 100_000,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``port=0`` picks a free port
    (read it back from ``server.server_address[1]``). The caller owns
    the serve loop and shutdown — tests run it in a daemon thread."""

    class Handler(BaseHTTPRequestHandler):
        # Remote Read is POST-only, same as the reference handler
        def do_POST(self):  # noqa: N802 (http.server API name)
            if self.path != READ_PATH:
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
                # stale-listing retry (r11): a rollup/compaction
                # rewrite racing this read invalidates the plan's
                # file listing; rebuilding re-lists storage
                from clickhouse_metrics_pipeline_spark.plans.promql_http import (  # noqa: E501
                    _retry_stale_listing,
                )

                resp = _retry_stale_listing(
                    lambda: handle_remote_read(
                        catalog,
                        body,
                        workspace_id=workspace_id,
                        now_ms=now_ms,
                        limit=limit,
                    )
                )
            except Exception as exc:  # malformed body -> 400, like the ref
                self.send_error(400, f"bad read request: {exc}")
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-protobuf")
            self.send_header("Content-Encoding", "snappy")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, fmt, *args):  # quiet: tests drive this
            pass

    return ThreadingHTTPServer((host, port), Handler)
