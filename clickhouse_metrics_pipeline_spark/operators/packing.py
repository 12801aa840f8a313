"""Sequence packing: assign documents to fixed-token-budget training
bins — the batch-assembly step between chunking and the data loader in
a pretraining pipeline.

Documents are sharded by a portable 60-bit hash (md5-derived, so any
engine can recompute the assignment) and packed SEQUENTIALLY within the
shard in doc_id order: a document's bin is
``floor(tokens_before_it / budget)`` — concat-then-split semantics,
the same contract as chunked corpus assembly (a doc may straddle its
bin boundary and is counted where it starts).

Scale shape: one shuffle on the shard key, then a per-shard running-sum
window. The shard count bounds per-task work — each shard's window
serializes corpus/``num_shards`` rows through one task, so at 100 TB
the count must grow with the cluster. It therefore defaults to
``spark.sparkContext.defaultParallelism`` rather than any fixed
number; the pinned catalog query passes 32 explicitly to keep its
oracle hash stable. Per-bin totals are exact integer token counts, so
results are bit-identical under any re-sharding of the same
``num_shards`` (pinned in tests/test_packing.py).

Reference analog: batch assembly between the rollup MVs and the query
layer (glitchdawg/clickhouse-metrics-pipeline schema.sql:146-192 stores
precomputed aggregates for exactly this reason); the packing semantics
themselves are the standard pretraining concat-then-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int = 2048,
    num_shards: int | None = None,
    id_col: str = "doc_id",
    tokens_col: Column | str = "n_tokens",
) -> DataFrame:
    """Pack documents into fixed-token-budget bins, per hash shard.

    ``docs`` needs an id column and a token-count column (pass a
    Column expression to compute one on the fly). ``num_shards``
    defaults to the session's ``defaultParallelism`` — pass an explicit
    value for reproducible output across cluster sizes.

    Returns one row per (shard, bin): ``n_docs``, ``sum_tokens``,
    ``fill_ratio`` (sum_tokens / budget, 4 decimals)."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )

    if num_shards is None:
        num_shards = docs.sparkSession.sparkContext.defaultParallelism
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")

    tokens = (
        F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    )
    shard = portable_hash60(F.col(id_col).cast("string")) % num_shards
    base = docs.select(
        F.col(id_col).alias("_pack_id"),
        shard.alias("shard"),
        tokens.cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_pack_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = base.select(
        "shard",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)
        ).alias("bin"),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 4).alias(
            "fill_ratio"
        ),
    )
