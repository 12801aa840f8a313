"""HTTP network edges: the Prometheus Remote Read endpoint
(plans.remote_read_http) and the OTLP/HTTP JSON receiver
(sources.otlp_http) — the two wire surfaces the reference terminates in
``pkg/promread/handler.go`` and ``internal/receiver/otlp.go``, driven
here through real sockets with stdlib urllib clients.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.operators.temporality import convert_to_delta
from clickhouse_metrics_pipeline_spark.operators.validate import validate
from clickhouse_metrics_pipeline_spark.plans.matchers import LabelMatcher, MatchType
from clickhouse_metrics_pipeline_spark.plans.remote_read import MetricsCatalog
from clickhouse_metrics_pipeline_spark.plans.remote_read_http import (
    make_remote_read_server,
)
from clickhouse_metrics_pipeline_spark.plans.remote_read_wire import (
    decode_read_response,
    encode_read_request,
    snappy_compress,
    snappy_decompress,
)
from clickhouse_metrics_pipeline_spark.sources.fixtures import integration_metrics
from clickhouse_metrics_pipeline_spark.sources.otlp_http import (
    make_otlp_http_server,
)

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def catalog(spark):
    raw = integration_metrics(spark, now=NOW)
    stored = convert_to_delta(
        validate(
            raw,
            workspace_id="integration_test",
            now=F.to_timestamp(F.lit("2024-06-01 12:00:00")),
        )
    )
    return MetricsCatalog({"metrics_raw": stored})


@pytest.fixture()
def read_server(catalog):
    srv = make_remote_read_server(catalog, workspace_id="integration_test")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestRemoteReadHttp:
    def test_prometheus_style_roundtrip(self, read_server):
        body = snappy_compress(
            encode_read_request(
                [
                    {
                        "start_ms": 0,
                        "end_ms": 0,
                        "matchers": [
                            LabelMatcher(MatchType.EQ, "__name__", "requests_total")
                        ],
                    }
                ]
            )
        )
        req = urllib.request.Request(
            f"{read_server}/api/v1/read",
            data=body,
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "snappy",
            },
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Encoding"] == "snappy"
            results = decode_read_response(snappy_decompress(resp.read()))
        assert len(results) == 1 and len(results[0]) == 1
        series = results[0][0]
        assert series["labels"]["__name__"] == "requests_total"
        assert [v for v, _ in series["samples"]] == [100.0, 150.0]

    def test_unknown_path_404(self, read_server):
        req = urllib.request.Request(f"{read_server}/nope", data=b"x")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 404

    def test_garbage_body_400(self, read_server):
        req = urllib.request.Request(
            f"{read_server}/api/v1/read", data=b"not snappy at all"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400


class TestOtlpHttpReceiver:
    def _post(self, url, payload, ctype="application/json"):
        data = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
        req = urllib.request.Request(
            url + "/v1/metrics", data=data, headers={"Content-Type": ctype}
        )
        return urllib.request.urlopen(req, timeout=30)

    def test_accepts_drops_and_flattens(self, spark, tmp_path):
        from clickhouse_metrics_pipeline_spark.sources.otlp import (
            OTLP_EXPORT_SCHEMA,
            flatten_otlp,
        )

        drop = str(tmp_path / "drop")
        srv = make_otlp_http_server(drop)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        payload = {
            "resourceMetrics": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name",
                             "value": {"stringValue": "svc"}}
                        ]
                    },
                    "scopeMetrics": [
                        {
                            "metrics": [
                                {
                                    "name": "cpu_usage",
                                    "gauge": {
                                        "dataPoints": [
                                            {
                                                "timeUnixNano": 1_700_000_000_000_000_000,
                                                "asDouble": 75.5,
                                                "attributes": [],
                                                "exemplars": [],
                                            }
                                        ]
                                    },
                                }
                            ]
                        }
                    ],
                }
            ]
        }
        try:
            with self._post(url, payload) as resp:
                assert resp.status == 200
                assert json.loads(resp.read()) == {}
            # the dropped file flattens through the SAME plan the
            # streaming listener uses (otlp_json_stream shares flatten_otlp)
            raw = spark.read.schema(OTLP_EXPORT_SCHEMA).json(drop)
            rows = flatten_otlp(raw, workspace_id="w1").collect()
            assert len(rows) == 1
            assert rows[0]["metric"] == "cpu_usage"
            assert rows[0]["value"] == 75.5
            assert rows[0]["serviceName"] == "svc"
        finally:
            srv.shutdown()

    def test_rejects_non_json_and_bad_json(self, tmp_path):
        drop = str(tmp_path / "drop2")
        srv = make_otlp_http_server(drop)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                self._post(url, b"\x00\x01", ctype="application/x-protobuf")
            assert e.value.code == 415
            with pytest.raises(urllib.error.HTTPError) as e:
                self._post(url, b"{not json")
            assert e.value.code == 400
        finally:
            srv.shutdown()


class TestMalformedHeaders:
    def test_bad_content_length_is_400_not_500(self, read_server, tmp_path):
        import http.client

        # urllib normalizes Content-Length; drive the socket directly
        host = read_server.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=30)
        conn.putrequest("POST", "/api/v1/read", skip_accept_encoding=True)
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        conn.close()

        srv = make_otlp_http_server(str(tmp_path / "d"))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            conn = http.client.HTTPConnection(
                f"127.0.0.1:{srv.server_address[1]}", timeout=30
            )
            conn.putrequest("POST", "/v1/metrics", skip_accept_encoding=True)
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", "abc")
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400
            conn.close()
        finally:
            srv.shutdown()


    def test_negative_content_length_is_400_not_hang(
        self, read_server, tmp_path
    ):
        """A negative Content-Length must 400 immediately — the naive
        int() parse would pass -1 to rfile.read() (read-to-EOF) and
        hang a keep-alive connection (round-4 ADVICE low)."""
        import http.client

        host = read_server.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=30)
        conn.putrequest("POST", "/api/v1/read", skip_accept_encoding=True)
        conn.putheader("Content-Length", "-7")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        conn.close()

        srv = make_otlp_http_server(str(tmp_path / "neg"))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            conn = http.client.HTTPConnection(
                f"127.0.0.1:{srv.server_address[1]}", timeout=30
            )
            conn.putrequest("POST", "/v1/metrics", skip_accept_encoding=True)
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", "-7")
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400
            conn.close()
        finally:
            srv.shutdown()
