"""operators.packing.pack_sequences — shard-count parameterization.

Pins the round-4 contract: the shard count is an operator parameter
(defaulting to the cluster's defaultParallelism), results are
bit-identical under any re-partitioning of the input for a fixed
num_shards, and totals are conserved at every shard count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.operators.packing import pack_sequences


def _corpus(spark, n=500, parts=4):
    # deterministic synthetic corpus: ids d0000..d0499, token counts
    # spread 1..399 so bins straddle the 64-token test budget
    return (
        spark.range(0, n, 1, parts)
        .select(
            F.format_string("d%04d", F.col("id")).alias("doc_id"),
            ((F.col("id") * 37 + 11) % 399 + 1).alias("n_tokens"),
        )
    )


def _key(rows):
    return sorted(
        (r.shard, r.bin, r.n_docs, r.sum_tokens, r.fill_ratio) for r in rows
    )


class TestPackSequences:
    @pytest.mark.parametrize("num_shards", [4, 32])
    def test_resharding_invariance(self, spark, num_shards):
        """For a fixed num_shards, per-bin totals are identical no
        matter how the input is partitioned — the hash shard key, not
        Spark's physical partitioning, determines packing order."""
        a = pack_sequences(
            _corpus(spark, parts=2), budget=64, num_shards=num_shards
        ).collect()
        b = pack_sequences(
            _corpus(spark, parts=16).repartition(7), budget=64,
            num_shards=num_shards,
        ).collect()
        assert _key(a) == _key(b)

    @pytest.mark.parametrize("num_shards", [1, 4, 32])
    def test_conservation(self, spark, num_shards):
        """Every doc lands in exactly one bin at any shard count."""
        docs = _corpus(spark)
        want_docs = docs.count()
        want_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
        out = pack_sequences(docs, budget=64, num_shards=num_shards)
        got = out.agg(
            F.sum("n_docs").alias("d"), F.sum("sum_tokens").alias("t")
        ).collect()[0]
        assert (got.d, got.t) == (want_docs, want_tokens)
        assert out.select("shard").distinct().count() <= num_shards

    def test_default_shards_is_parallelism(self, spark):
        """Omitting num_shards uses defaultParallelism — the
        cluster-proportional default the 100 TB shape needs."""
        docs = _corpus(spark)
        dp = spark.sparkContext.defaultParallelism
        auto = pack_sequences(docs, budget=64).collect()
        explicit = pack_sequences(docs, budget=64, num_shards=dp).collect()
        assert _key(auto) == _key(explicit)

    def test_concat_then_split_semantics(self, spark):
        """Golden: one shard, budget 10, tokens [4,4,4,4] → bins by
        floor(tokens_before/10) = [0,0,0,1]; a doc straddling the
        boundary counts where it starts."""
        docs = spark.createDataFrame(
            [(f"d{i}", 4) for i in range(4)], "doc_id STRING, n_tokens INT"
        )
        rows = pack_sequences(docs, budget=10, num_shards=1).collect()
        by_bin = {r.bin: (r.n_docs, r.sum_tokens) for r in rows}
        assert by_bin == {0: (3, 12), 1: (1, 4)}

    def test_catalog_query_unchanged(self, spark):
        """The pinned catalog query (num_shards=32) must produce the
        same result through the promoted operator as the inlined r3
        plan did — guarded by comparing against an inline recomputation
        at 32 shards."""
        from clickhouse_metrics_pipeline_spark.functions.hashing import (
            portable_hash60,
        )
        from pyspark.sql import Window

        docs = _corpus(spark)
        got = _key(
            pack_sequences(docs, budget=64, num_shards=32).collect()
        )
        # r3's inlined formulation, reproduced verbatim
        shard = portable_hash60(F.col("doc_id").cast("string")) % 32
        base = docs.select(
            "doc_id", shard.alias("shard"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
        w = (
            Window.partitionBy("shard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        binned = base.select(
            "shard", "n_tokens",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(64)
            ).alias("bin"),
        )
        want = _key(
            binned.groupBy("shard", "bin").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("sum_tokens"),
                F.round(F.sum("n_tokens") / F.lit(64.0), 4).alias(
                    "fill_ratio"
                ),
            ).collect()
        )
        assert got == want

    @pytest.mark.parametrize("bad", [{"num_shards": 0}, {"budget": 0}])
    def test_rejects_degenerate_params(self, spark, bad):
        with pytest.raises(ValueError):
            pack_sequences(_corpus(spark), **{"budget": 64, **bad})
