"""Property tests for the Remote Read wire codec (no Spark needed) and a
randomized exactness pin for the prefix/positional-filtered n-gram
Jaccard join (Spark, seeded corpus vs a pure-Python brute force).
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from clickhouse_metrics_pipeline_spark.plans.matchers import LabelMatcher, MatchType
from clickhouse_metrics_pipeline_spark.plans.remote_read_wire import (
    decode_read_request,
    decode_read_response,
    encode_read_request,
    encode_read_response,
    snappy_compress,
    snappy_decompress,
)

_CODEC_SETTINGS = dict(max_examples=200, deadline=None)


class TestSnappyProperties:
    @given(payload=st.binary(max_size=300_000))
    @settings(**_CODEC_SETTINGS)
    def test_roundtrip_arbitrary_bytes(self, payload):
        assert snappy_decompress(snappy_compress(payload)) == payload


_label = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=20
)
_matcher = st.builds(
    LabelMatcher,
    type=st.sampled_from(list(MatchType)),
    name=_label,
    value=_label,
)
_query = st.fixed_dictionaries(
    {
        "start_ms": st.integers(min_value=0, max_value=2**53),
        "end_ms": st.integers(min_value=0, max_value=2**53),
        "matchers": st.lists(_matcher, max_size=4),
    }
)
_series = st.fixed_dictionaries(
    {
        # distinct label names per series (proto map semantics)
        "labels": st.dictionaries(_label, _label, max_size=4),
        "samples": st.lists(
            st.tuples(
                st.floats(allow_nan=False, width=64),
                st.integers(min_value=-(2**53), max_value=2**53),
            ),
            max_size=5,
        ),
    }
)


class TestPrompbProperties:
    @given(queries=st.lists(_query, max_size=3))
    @settings(**_CODEC_SETTINGS)
    def test_request_roundtrip(self, queries):
        assert decode_read_request(encode_read_request(queries)) == queries

    @given(results=st.lists(st.lists(_series, max_size=3), max_size=3))
    @settings(**_CODEC_SETTINGS)
    def test_response_roundtrip(self, results):
        assert decode_read_response(encode_read_response(results)) == results

    @given(queries=st.lists(_query, max_size=2), payload=st.binary(max_size=1000))
    @settings(max_examples=50, deadline=None)
    def test_request_survives_snappy(self, queries, payload):
        body = snappy_compress(encode_read_request(queries) )
        assert decode_read_request(snappy_decompress(body)) == queries


def _brute_force_pairs(docs: list[tuple[int, str]], threshold: float, n: int = 3):
    """Pure-Python exact n-gram Jaccard — the oracle the Spark join must
    equal pair-for-pair (shingle semantics mirror normalize/tokenize)."""
    sets = {}
    for doc_id, text in docs:
        toks = " ".join(text.split()).strip().lower().split(" ")
        if len(toks) < n:
            continue
        sets[doc_id] = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= threshold:
                out[(a, b)] = round(j, 6)
    return out


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
def test_prefix_filtered_join_is_exact_on_random_corpus(spark):
    """The prefix + length + positional filters must lose NOTHING: on a
    seeded random corpus (shared vocab -> plenty of partial overlap) the
    Spark join equals Python brute force at every threshold tried."""
    from clickhouse_metrics_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for doc_id in range(30):
        length = rng.randint(3, 30)
        docs.append(
            (doc_id, " ".join(rng.choice(vocab) for _ in range(length)))
        )
    # a few near-dup mutations so high thresholds are non-trivially hit
    for doc_id, src in [(100, 0), (101, 1), (102, 2)]:
        toks = docs[src][1].split()
        if len(toks) > 4:
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        docs.append((doc_id, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")

    for threshold in (0.0, 0.25, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
        }
        assert got == _brute_force_pairs(docs, threshold), f"t={threshold}"
