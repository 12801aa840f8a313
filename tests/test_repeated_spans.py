"""repeated_spans (operators/dedup.py): property + golden tests.

Pins the operator against a brute-force Python oracle (positional
k-grams, occurrence counting, interval-union merge) on corpora built to
hit every edge: cross-doc repeats, within-doc repeats, overlap merging,
non-merging adjacency, and short documents. Also pins partition-count
invariance — the float-free kernel must be bit-identical under any
shuffle parallelism.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from clickhouse_metrics_pipeline_spark.operators.dedup import repeated_spans


def _norm_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip()).lower().split(" ")


def _brute_spans(texts: dict[int, str], k: int, min_count: int):
    """Reference implementation: count k-grams corpus-wide, mark hit
    start positions, merge intervals sharing >= 1 token."""
    grams: dict[int, list[str]] = {}
    counts: Counter = Counter()
    for did, text in texts.items():
        w = _norm_tokens(text)
        gs = [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
        grams[did] = gs
        counts.update(gs)
    out = []
    for did, gs in sorted(grams.items()):
        hits = [i for i, g in enumerate(gs) if counts[g] >= min_count]
        spans = []
        for pos in hits:
            if spans and pos < spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], pos + k)
                spans[-1][2] += 1
            else:
                spans.append([pos, pos + k, 1])
        out.extend(
            (did, s, e - s, n) for s, e, n in spans
        )
    return sorted(out)


def _run(spark, texts: dict[int, str], k: int = 8, min_count: int = 2):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    rows = repeated_spans(df, k=k, min_count=min_count).collect()
    return sorted(
        (r.doc_id, r.span_start, r.span_tokens, r.n_dup_grams) for r in rows
    )


W = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def _sent(idx: list[int]) -> str:
    return " ".join(W[i % len(W)] + str(i) for i in idx)


def test_cross_doc_repeat_localized(spark):
    shared = _sent(range(100, 110))  # 10 tokens -> 3 start positions at k=8
    texts = {
        1: _sent(range(0, 20)) + " " + shared,
        2: shared + " " + _sent(range(40, 60)),
    }
    got = _run(spark, texts)
    assert got == _brute_spans(texts, 8, 2)
    # doc 1: span starts at token 20, 10 tokens long, 3 dup grams
    assert (1, 20, 10, 3) in got
    assert (2, 0, 10, 3) in got


def test_within_doc_repeat_counts(spark):
    block = _sent(range(200, 208))  # exactly k tokens
    texts = {7: block + " " + _sent(range(300, 320)) + " " + block}
    got = _run(spark, texts)
    assert got == _brute_spans(texts, 8, 2)
    assert len(got) == 2  # the two copies, separated by unique middle


def test_overlap_merges_adjacency_does_not(spark):
    a = _sent(range(400, 409))  # 9 tokens: 2 overlapping gram starts
    texts = {1: a, 2: a, 3: _sent(range(500, 520))}
    got = _run(spark, texts)
    assert got == _brute_spans(texts, 8, 2)
    # one merged span per copy, not two
    assert got == [(1, 0, 9, 2), (2, 0, 9, 2)]


def test_short_docs_and_no_repeats_empty(spark):
    texts = {1: "too short", 2: _sent(range(600, 630)), 3: _sent(range(700, 730))}
    assert _run(spark, texts) == []


def test_min_count_threshold(spark):
    tri = _sent(range(800, 808))
    texts = {1: tri, 2: tri, 3: tri}
    assert _run(spark, texts, min_count=4) == []
    got = _run(spark, texts, min_count=3)
    assert got == _brute_spans(texts, 8, 3)
    assert len(got) == 3


@pytest.mark.parametrize("k", [2, 5])
def test_alternate_k(spark, k):
    texts = {
        1: "x y " + _sent(range(900, 905)) + " x y",
        2: _sent(range(905, 912)) + " x y",
    }
    assert _run(spark, texts, k=k) == _brute_spans(texts, k, 2)


def test_partition_count_invariance(spark):
    texts = {
        i: (_sent(range(i, i + 15)) if i % 3 else _sent(range(0, 15)))
        for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    base = sorted(map(tuple, repeated_spans(df, k=8).collect()))
    re7 = sorted(map(tuple, repeated_spans(df.repartition(7), k=8).collect()))
    assert base == re7 == _brute_spans(texts, 8, 2)


def test_df_cap_excludes_boilerplate_grams(spark):
    """max_count (the df-cap) drops grams above the frequency ceiling:
    a boilerplate 8-gram repeated in many documents stops producing
    spans, genuine low-frequency repeats are untouched, and a capped
    run's hit set is a subset of the uncapped run's."""
    boiler = _sent(range(200, 208))  # 8 tokens, one gram start
    rare = _sent(range(300, 308))
    texts = {i: boiler for i in range(10)}  # gram count 10
    texts[100] = rare
    texts[101] = rare  # gram count 2
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )
    uncapped = sorted(map(tuple, repeated_spans(df, k=8).collect()))
    capped = sorted(
        map(tuple, repeated_spans(df, k=8, max_count=5).collect())
    )
    # uncapped: 10 boilerplate spans + 2 rare spans; capped: rare only
    assert len(uncapped) == 12
    assert capped == [
        (100, 0, 8, 1),
        (101, 0, 8, 1),
    ]
    assert set(capped) <= set(uncapped)
    # cap at/above the hot gram's count keeps everything
    at_cap = sorted(
        map(tuple, repeated_spans(df, k=8, max_count=10).collect())
    )
    assert at_cap == uncapped
