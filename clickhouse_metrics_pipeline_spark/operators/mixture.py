"""Deterministic token-budget mixture sampling: select documents per
source to fill a target mixture (basis-point weights over sources) —
the curation step that turns a raw crawl into a training mixture.

Within each source, documents are ordered by a portable md5-derived
hash (reproducible "random" order — identical in any engine and on any
retry, never ``rand()``) and kept while the source's running token
total stays within its quota (greedy prefix).

Scale shape: the only global aggregate is a 1-row token total that
broadcasts into every task; quota assignment is a map-side expression;
the keep decision is one running-sum window per (source, shard)
partition. The shard count bounds per-task work — each shard's window
serializes ``source/num_shards`` rows through one task, so at 100 TB
the count must grow with the cluster; it defaults to
``spark.sparkContext.defaultParallelism``. The source quota is split
across shards EXACTLY (``q div n`` + 1 for the first ``q mod n``
shards, summing to ``q``), so the per-source selected token total is
within quota for any shard count, and ``num_shards=1`` reproduces the
unsharded catalog query (``docs_mixture_sample``) bit for bit — both
pinned in tests/test_mixture.py.

Reference analog: none (the reference engine stops at fixed-grain
rollups); the mixture semantics are the published LLaMA/Pile-style
few-heavy-many-light source weighting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mixture_sample(
    docs: DataFrame,
    *,
    weights_bp: dict[str, int],
    budget_divisor: int = 25000,
    num_shards: int | None = None,
    id_col: str = "doc_id",
    source_col: str = "source",
    tokens_col: Column | str = "n_tok",
) -> DataFrame:
    """Greedy-prefix mixture selection toward ``weights_bp``.

    ``docs`` needs an id column, a source column, and a token-count
    column (pass a Column expression to compute one on the fly). The
    global budget is ``total_tokens * w_bp / budget_divisor`` per
    source (e.g. divisor 25000 = 40% of the corpus distributed by
    basis-point weight). ``num_shards`` defaults to the session's
    ``defaultParallelism`` — pass an explicit value for reproducible
    output across cluster sizes.

    Returns the kept rows: id, source, ``n_tok``, ``shard``,
    ``cum_tok`` (running total within the shard), ``quota_tok`` (the
    shard's exact quota slice)."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )

    if num_shards is None:
        num_shards = docs.sparkSession.sparkContext.defaultParallelism
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")

    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    flat: list = []
    for src, bp in sorted(weights_bp.items()):
        flat += [F.lit(src), F.lit(bp)]

    base = docs.select(
        F.col(id_col).alias("_mix_id"),
        F.col(source_col).alias("source"),
        tokens.cast("bigint").alias("n_tok"),
    )
    tot = base.agg(F.sum("n_tok").alias("total_tok"))
    d = (
        base.crossJoin(F.broadcast(tot))
        .withColumn("w_bp", F.element_at(F.create_map(*flat), F.col("source")))
        .withColumn(
            "_src_quota",
            F.expr(f"(total_tok * w_bp) div {budget_divisor}"),
        )
        .withColumn(
            "shard",
            (portable_hash60(F.col("_mix_id").cast("string")) % num_shards)
            .cast("int"),
        )
        .withColumn(
            # exact integer split: shard j gets q div n, +1 for j < q mod n;
            # the n shard quotas sum to the source quota exactly
            "quota_tok",
            F.expr(f"_src_quota div {num_shards}")
            + F.when(
                F.col("shard") < F.col("_src_quota") % num_shards, F.lit(1)
            ).otherwise(F.lit(0)),
        )
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy(portable_hash60(F.col("_mix_id").cast("string")), "_mix_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tok", F.sum("n_tok").over(w))
        .where(F.col("cum_tok") <= F.col("quota_tok"))
        .select(
            F.col("_mix_id").alias(id_col),
            "source",
            "n_tok",
            "shard",
            "cum_tok",
            "quota_tok",
        )
    )
