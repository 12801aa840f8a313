"""Sharded mixture-sampling operator (operators/mixture.py): exact
quota split across shards, unsharded equivalence with the pinned
catalog query, and determinism under re-execution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.functions.text import token_count
from clickhouse_metrics_pipeline_spark.operators.mixture import mixture_sample
from clickhouse_metrics_pipeline_spark.tables import _t
from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
    _MIX_DIV,
    MIXTURE_BP,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return _t(spark, SF, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tok")
    )


def test_one_shard_equals_catalog_query(spark):
    """num_shards=1 reproduces docs_mixture_sample row for row (the
    catalog hash must be unchanged by the operator promotion)."""
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        docs_mixture_sample,
    )

    got = sorted(
        map(
            tuple,
            mixture_sample(
                _docs(spark),
                weights_bp=MIXTURE_BP,
                budget_divisor=_MIX_DIV,
                num_shards=1,
            )
            .select("doc_id", "source", "n_tok", "cum_tok", "quota_tok")
            .collect(),
        )
    )
    want = sorted(map(tuple, docs_mixture_sample(spark, SF).collect()))
    assert got and got == want


@pytest.mark.parametrize("shards", [1, 4])
def test_quota_respected_and_deterministic(spark, shards):
    """For any shard count: shard quotas sum to the exact source quota,
    per-source selected tokens stay within quota, and a re-run is
    bit-identical."""
    d = _docs(spark)
    total = d.agg(F.sum("n_tok")).collect()[0][0]
    sel = mixture_sample(
        d, weights_bp=MIXTURE_BP, budget_divisor=_MIX_DIV, num_shards=shards
    )
    rows = sel.collect()
    assert rows

    per_src: dict = {}
    shard_quota: dict = {}
    for r in rows:
        per_src[r.source] = per_src.get(r.source, 0) + r.n_tok
        shard_quota[(r.source, r.shard)] = r.quota_tok
        assert r.cum_tok <= r.quota_tok
    for src, tok in per_src.items():
        q = (total * MIXTURE_BP[src]) // _MIX_DIV
        assert tok <= q
        # every selected shard's quota slice is part of the exact split
        got_q = sum(
            qt for (s, _), qt in shard_quota.items() if s == src
        )
        assert got_q <= q  # selected shards only; full split sums to q

    again = sorted(map(tuple, sel.collect()))
    assert again == sorted(map(tuple, rows))


def test_shard_split_sums_exactly(spark):
    """The n shard quota slices of every source sum to the source
    quota exactly (q div n plus one for the first q mod n shards)."""
    d = _docs(spark)
    total = d.agg(F.sum("n_tok")).collect()[0][0]
    n = 5
    # recompute the split the operator applies, over ALL shards (the
    # selection only surfaces shards that kept rows)
    for src, bp in MIXTURE_BP.items():
        q = (total * bp) // _MIX_DIV
        slices = [q // n + (1 if j < q % n else 0) for j in range(n)]
        assert sum(slices) == q
