"""Incremental maintenance of stored dedup state under delta ingest.

A 100 TB deployment never rebuilds its dedup artifacts from scratch on
ingest: the pair table is extended with pairs touching the delta only
(probe-restricted prefix join), and per-source KMV sketches are merged
with the delta's sketches (lossless k-min union). Both paths must equal
the full rebuild exactly — that equality is what these tests pin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.functions.hashing import portable_hash60
from clickhouse_metrics_pipeline_spark.functions.sketch import (
    kmv_merge,
    kmv_sketch,
)
from clickhouse_metrics_pipeline_spark.operators.dedup import (
    gram_hashes_from_text,
    incremental_pair_update,
    ngram_jaccard_pairs,
    word_shingles,
)

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _pairs_set(df):
    return {
        (r.id_a, r.id_b, round(r.jaccard, 6)) for r in df.collect()
    }


class TestIncrementalPairs:
    def test_probe_union_equals_full_rebuild(self, spark):
        d = _docs(spark)
        median = d.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
        old = d.where(F.col("doc_id") <= median)
        new_ids = d.where(F.col("doc_id") > median).select("doc_id")

        full_idx = d.select(
            "doc_id", gram_hashes_from_text("text", 3).alias("sh")
        ).persist()
        try:
            stored = ngram_jaccard_pairs(old, threshold=0.8)
            incr = incremental_pair_update(
                full_idx, stored, new_ids, threshold=0.8
            )
            want = ngram_jaccard_pairs(d, threshold=0.8, shingled=full_idx)
            assert _pairs_set(incr) == _pairs_set(want)
            # the corpus actually has duplicate pairs on BOTH sides of
            # the split, or the test proves nothing
            got = _pairs_set(incr)
            assert any(b <= median for _, b, _ in got)
            assert any(b > median for _, b, _ in got)
        finally:
            full_idx.unpersist()

    def test_probe_restricts_to_delta_touching_pairs(self, spark):
        d = _docs(spark)
        median = d.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
        new_ids = d.where(F.col("doc_id") > median).select("doc_id")
        delta = ngram_jaccard_pairs(d, threshold=0.8, probe=new_ids)
        rows = delta.collect()
        assert rows, "expected delta pairs in the sf0.01 corpus"
        for r in rows:
            assert r.id_a > median or r.id_b > median
            assert r.id_a < r.id_b


class TestIncrementalKmvSketch:
    def test_merged_source_sketches_equal_full(self, spark):
        k = 64
        d = _docs(spark)
        median = d.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]

        def sketch(part):
            return (
                part.select(
                    "source", F.explode(word_shingles("text", 8)).alias("g")
                )
                .groupBy("source")
                .agg(kmv_sketch(portable_hash60(F.col("g")), k).alias("sk"))
            )

        old_sk = sketch(d.where(F.col("doc_id") <= median))
        new_sk = sketch(d.where(F.col("doc_id") > median))
        merged = {
            r.source: list(r.sk)
            for r in old_sk.unionByName(new_sk)
            .groupBy("source")
            .agg(kmv_merge("sk", k).alias("sk"))
            .collect()
        }
        full = {r.source: list(r.sk) for r in sketch(d).collect()}
        assert merged == full


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
