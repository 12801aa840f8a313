"""Remote Read wire codec: snappy block format, prompb proto3 framing,
and the full body-in/body-out handler against the integration fixture
(``pkg/promread/handler.go:65-107`` + ``remote.DecodeReadRequest``).
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.operators.temporality import convert_to_delta
from clickhouse_metrics_pipeline_spark.operators.validate import validate
from clickhouse_metrics_pipeline_spark.plans.matchers import LabelMatcher, MatchType
from clickhouse_metrics_pipeline_spark.plans.remote_read import MetricsCatalog
from clickhouse_metrics_pipeline_spark.plans.remote_read_wire import (
    decode_read_request,
    decode_read_response,
    encode_read_request,
    encode_read_response,
    handle_remote_read,
    snappy_compress,
    snappy_decompress,
)
from clickhouse_metrics_pipeline_spark.sources.fixtures import integration_metrics

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


class TestSnappy:
    @pytest.mark.parametrize(
        "payload",
        [
            b"",
            b"x",
            b"hello snappy",
            bytes(range(256)) * 300,  # > one 64 KiB literal chunk
            random.Random(7).randbytes(200_000),
        ],
    )
    def test_roundtrip(self, payload):
        assert snappy_decompress(snappy_compress(payload)) == payload

    def test_decodes_copies_including_overlap(self):
        # hand-assembled per format_description.txt: literal "ab", then a
        # 2-byte-offset copy of length 18 at offset 2 -> "ab" * 10; the
        # copy overlaps its own output and must be replayed byte-wise
        buf = bytes([20, (2 - 1) << 2]) + b"ab" + bytes([((18 - 1) << 2) | 2, 2, 0])
        assert snappy_decompress(buf) == b"ab" * 10

    def test_decodes_one_byte_offset_copy(self):
        # literal "abcd", copy len 4 offset 4 (tag 01) -> "abcdabcd"
        buf = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([(0 << 2) | 1, 4])
        assert snappy_decompress(buf) == b"abcdabcd"

    def test_length_mismatch_rejected(self):
        with pytest.raises(ValueError):
            snappy_decompress(bytes([5, (2 - 1) << 2]) + b"ab")

    def test_real_snappy_interop_if_available(self):
        try:
            import snappy  # noqa: F401
        except ImportError:
            pytest.skip("python-snappy not installed in this container")
        data = b"interop" * 1000
        assert snappy.decompress(snappy_compress(data)) == data
        assert snappy_decompress(snappy.compress(data)) == data


class TestPrompb:
    def test_read_request_roundtrip(self):
        queries = [
            {
                "start_ms": 1_700_000_000_000,
                "end_ms": 1_700_003_600_000,
                "matchers": [
                    LabelMatcher(MatchType.EQ, "__name__", "requests_total"),
                    LabelMatcher(MatchType.RE, "endpoint", "/api/.*"),
                    LabelMatcher(MatchType.NEQ, "method", "DELETE"),
                ],
            },
            {"start_ms": 0, "end_ms": 0, "matchers": []},
        ]
        assert decode_read_request(encode_read_request(queries)) == queries

    def test_read_response_roundtrip(self):
        results = [
            [
                {
                    "labels": {"__name__": "m", "env": "prod"},
                    "samples": [(1.5, 1_700_000_000_000), (2.0, 1_700_000_001_000)],
                },
                {"labels": {"__name__": "n"}, "samples": []},
            ],
            [],
        ]
        assert decode_read_response(encode_read_response(results)) == results


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


def test_handler_end_to_end(catalog):
    body = snappy_compress(
        encode_read_request(
            [{"start_ms": 0, "end_ms": 0, "matchers": [
                LabelMatcher(MatchType.EQ, "__name__", "requests_total")]}]
        )
    )
    resp = decode_read_response(snappy_decompress(handle_remote_read(
        catalog, body, workspace_id="integration_test"
    )))
    assert len(resp) == 1 and len(resp[0]) == 1
    series = resp[0][0]
    assert series["labels"]["__name__"] == "requests_total"
    assert series["labels"]["endpoint"] == "/api/users"
    # delta sums re-cumulated per series (handler.go:184-197, fixed
    # per-series): [100, 150], 1 s apart, millisecond timestamps
    t0 = int(NOW.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    values = [(v, t) for v, t in series["samples"]]
    assert [v for v, _ in values] == [100.0, 150.0]
    assert values[1][1] - values[0][1] == 1000
    assert values[0][1] <= t0  # fixture points sit at/shortly before NOW


def test_handler_routes_to_rollup_resolution(catalog, spark):
    """A query older than the raw-table retention must serve from the 1m
    rollup through the wire path (router Q1, handler.go:304-321)."""
    from clickhouse_metrics_pipeline_spark.operators.rollup import (
        build_rollup_hierarchy,
    )

    stored = catalog.get("metrics_raw")
    catalog.tables["metrics_1m"] = build_rollup_hierarchy(stored)["metrics_1m"]
    t0 = int(NOW.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    body = snappy_compress(encode_read_request([
        {"start_ms": t0 - 3_600_000, "end_ms": t0 + 3_600_000, "matchers": [
            LabelMatcher(MatchType.EQ, "__name__", "cpu_usage")]},
    ]))
    resp = decode_read_response(snappy_decompress(handle_remote_read(
        catalog, body,
        workspace_id="integration_test",
        now_ms=t0 + 4 * 3_600_000,  # age 5h > 3h raw retention -> metrics_1m
    )))
    assert len(resp) == 1 and len(resp[0]) == 1
    series = resp[0][0]
    assert series["labels"]["__name__"] == "cpu_usage"
    # rollup rows serve value_last; one 1m bucket for the single gauge point
    assert [v for v, _ in series["samples"]] == [75.5]


def test_handler_multi_query_and_empty(catalog):
    body = snappy_compress(encode_read_request([
        {"start_ms": 0, "end_ms": 0, "matchers": [
            LabelMatcher(MatchType.RE, "__name__", "request.*")]},
        {"start_ms": 0, "end_ms": 0, "matchers": [
            LabelMatcher(MatchType.EQ, "__name__", "no_such_metric")]},
    ]))
    resp = decode_read_response(snappy_decompress(handle_remote_read(
        catalog, body, workspace_id="integration_test"
    )))
    assert len(resp) == 2
    names = [s["labels"]["__name__"] for s in resp[0]]
    assert names == sorted(names) and set(names) == {
        "request_duration", "requests_total"
    }
    assert resp[1] == []


# --------------------------------------------------------------------------
# Recorded wire fixtures (round 4): canonical prompb.ReadRequest bytes
# derived independently from the public wire specs by
# tools/gen_prompb_fixture.py and checked in — guards the hand-rolled
# codec against drift (reference analog: promread/handler.go:65-107).
# --------------------------------------------------------------------------

_FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
_T0 = 1717243200000  # 2024-06-01 12:00:00 UTC == NOW, in ms
_START, _END = _T0 - 3_600_000, _T0 + 3_600_000


def _fixture(name: str) -> bytes:
    with open(os.path.join(_FIXDIR, name), "rb") as f:
        return f.read()


class TestRecordedRequestFixture:
    def test_decodes_real_request_shape(self):
        """The recorded request carries ReadHints and
        accepted_response_types (fields a real Prometheus server sends,
        a minimal client omits) — the decoder must take the supported
        fields and skip the rest."""
        qs = decode_read_request(_fixture("prompb_read_request.bin"))
        assert len(qs) == 1
        q = qs[0]
        assert (q["start_ms"], q["end_ms"]) == (_START, _END)
        assert q["matchers"] == [
            LabelMatcher(MatchType.EQ, "__name__", "requests_total")
        ]

    def test_encoder_is_byte_exact_canonical_marshal(self):
        """encode_read_request of the same query must equal the
        canonical proto3 marshal a minimal client produces —
        byte-for-byte (fields in order, defaults omitted)."""
        got = encode_read_request([
            {"start_ms": _START, "end_ms": _END, "matchers": [
                LabelMatcher(MatchType.EQ, "__name__", "requests_total")]}
        ])
        assert got == _fixture("prompb_read_request_minimal.bin")

    def test_snappy_fixture_uses_copy_element(self):
        """The framed fixture encodes the repeated start-timestamp
        varint as a snappy COPY element (what a real compressor emits
        for a >=4-byte match) — the decompressor must reproduce the
        exact proto bytes from it."""
        framed = _fixture("prompb_read_request.snappy.bin")
        raw = _fixture("prompb_read_request.bin")
        assert snappy_decompress(framed) == raw
        # and it genuinely differs from our literal-only compressor's
        # framing (otherwise this adds no coverage)
        assert framed != snappy_compress(raw)

    def test_handler_end_to_end_byte_exact(self, catalog, spark):
        """Full wire e2e from the recorded bytes: the 2 h span routes
        to the 1m rollup (router Q1), and the response body must be the
        exact canonical framing of the expected result — sorted series,
        proto3 field order, snappy block format."""
        from clickhouse_metrics_pipeline_spark.operators.rollup import (
            build_rollup_hierarchy,
        )

        stored = catalog.get("metrics_raw")
        catalog.tables["metrics_1m"] = build_rollup_hierarchy(stored)[
            "metrics_1m"
        ]
        resp = handle_remote_read(
            catalog,
            _fixture("prompb_read_request.snappy.bin"),
            workspace_id="integration_test",
            now_ms=_T0 + 3_600_000,
        )
        raw_resp = snappy_decompress(resp)
        # the deltas [100, 50] share one 1m bucket; rollup rows serve
        # value_last (router test pins this projection)
        expected = [[{
            "labels": {
                "__name__": "requests_total",
                "endpoint": "/api/users",
                "method": "GET",
            },
            "samples": [(50.0, _T0)],
        }]]
        assert decode_read_response(raw_resp) == expected
        assert raw_resp == encode_read_response(expected)
