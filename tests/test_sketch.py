"""KMV distinct-sketch kernel tests (functions/sketch.py).

Pins the three contracts the catalog queries rely on:
1. merge losslessness — k-min of union of partial k-mins equals the
   global k-min (pure-python property via hypothesis, and the Spark
   minute→hour→day cascade vs the direct sketch);
2. the bounded map-side combine (kmv_partial) feeds kmv_sketch to the
   exact same sketch as the unbounded collect_set path;
3. estimate semantics — exact |sk| below k, unbiased floor form at k,
   and its cross-engine twin fragment agrees with DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.functions.hashing import portable_hash60
from clickhouse_metrics_pipeline_spark.functions.sketch import (
    kmv_estimate,
    kmv_merge,
    kmv_numerator,
    kmv_partial,
    kmv_sketch,
    kmv_sketch_md5,
)
from clickhouse_metrics_pipeline_spark.oracle_fragments import (
    kmv_estimate_sql,
)

SF = "/root/testdata/sf0.001"


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1 << 60), max_size=30),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_kmv_merge_lossless_property(parts, k):
    """k smallest of union-of-partial-k-mins == k smallest of union."""
    partials = [sorted(set(p))[:k] for p in parts]
    merged = sorted(set().union(*map(set, partials)))[:k]
    direct = sorted(set().union(*map(set, parts)))[:k]
    assert merged == direct


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        "ts",
        portable_hash60(F.col("user_id").cast("string")).alias("h"),
    )


def test_spark_cascade_equals_direct(spark):
    """minute→hour merge of per-minute sketches reproduces the direct
    per-type sketch bit-for-bit (arrays equal, not just estimates)."""
    k = 16
    ev = _events(spark)
    direct = {
        r["event_type"]: r["sk"]
        for r in ev.groupBy("event_type")
        .agg(kmv_sketch("h", k).alias("sk"))
        .collect()
    }
    per_min = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(kmv_sketch("h", k).alias("sk"))
    merged = {
        r["event_type"]: r["sk"]
        for r in per_min.groupBy("event_type")
        .agg(kmv_merge("sk", k).alias("sk"))
        .collect()
    }
    assert merged == direct


def test_kmv_partial_bounded_path_equals_unbounded(spark):
    """The Arrow map-side combine feeds the reducer to the identical
    sketch (and its md5) as the unbounded collect_set path."""
    k = 16
    ev = _events(spark)
    plain = (
        ev.groupBy("event_type")
        .agg(kmv_sketch("h", k).alias("sk"))
        .select("event_type", kmv_sketch_md5("sk").alias("md5"))
    )
    bounded_in = kmv_partial(ev, ["event_type"], "h", k)
    bounded = (
        bounded_in.groupBy("event_type")
        .agg(kmv_sketch("h", k).alias("sk"))
        .select("event_type", kmv_sketch_md5("sk").alias("md5"))
    )
    a = {r["event_type"]: r["md5"] for r in plain.collect()}
    b = {r["event_type"]: r["md5"] for r in bounded.collect()}
    assert a == b
    # and the combine really bounds: <= k rows per (group, batch); with
    # one group and few batches the output must be far below the input
    n_in = ev.count()
    n_out = bounded_in.count()
    assert n_out < n_in


def test_kmv_estimate_branches(spark):
    """|distinct| < k → exact; at k the floor((k-1)·2^60/h_k) form, and
    the estimate lands within the KMV error envelope."""
    k = 8
    ev = _events(spark)
    n_exact, sk = (
        ev.agg(
            F.countDistinct("h").alias("n"), kmv_sketch("h", k).alias("sk")
        )
        .select("n", "sk")
        .first()
    )
    est = (
        ev.agg(kmv_sketch("h", 1024).alias("big"), kmv_sketch("h", k).alias("sk"))
        .select(
            kmv_estimate("big", 1024).alias("exact_path"),
            kmv_estimate("sk", k).alias("est_path"),
        )
        .first()
    )
    # n_exact distinct users in sf0.001 is << 1024 → exact branch
    assert est["exact_path"] == n_exact
    # estimator branch: explicit floor form
    import math

    expected = math.floor(kmv_numerator(k) / float(sk[k - 1]))
    assert est["est_path"] == expected
    # error envelope: KMV std err ~ 1/sqrt(k-2); allow 4 sigma
    rel = abs(est["est_path"] - n_exact) / n_exact
    assert rel < 4 / (k - 2) ** 0.5


def test_estimate_sql_twin_matches_spark(spark):
    """The DuckDB fragment evaluates the same estimate on the same
    sketch values (IEEE double division + floor agree)."""
    k = 8
    sk = (
        _events(spark)
        .agg(kmv_sketch("h", k).alias("sk"))
        .first()["sk"]
    )
    spark_est = (
        spark.range(1)
        .select(F.lit(sk).alias("sk"))
        .select(kmv_estimate("sk", k).alias("e"))
        .first()["e"]
    )
    lit = "[" + ",".join(str(v) for v in sk) + "]"
    duck_est = duckdb.sql(
        f"SELECT {kmv_estimate_sql(lit, k)} AS e"
    ).fetchone()[0]
    assert spark_est == duck_est


def test_kmv_source_overlap_tracks_exact(spark):
    """The sketch pair-overlap estimates stay inside the KMV error
    envelope of the exact matrix (run at sf0.01 where sources share
    real gram mass)."""
    from clickhouse_metrics_pipeline_spark.workloads_ext2 import (
        docs_kmv_source_overlap,
        docs_source_overlap,
    )

    sf = "/root/testdata/sf0.01"
    est = {
        (r.source_a, r.source_b): (r.jaccard_bp_est, r.n_union_est)
        for r in docs_kmv_source_overlap(spark, sf).collect()
    }
    exact = {
        (r.source_a, r.source_b): (
            r.overlap_bp,
            r.n_a + r.n_b - r.n_shared,
        )
        for r in docs_source_overlap(spark, sf).collect()
    }
    # exact only emits pairs with shared grams; est emits all pairs
    assert set(exact) <= set(est)
    k = 128
    for pair, (bp_exact, union_exact) in exact.items():
        bp_est, union_est = est[pair]
        # jaccard: +-3 sigma ~ 3/sqrt(k) absolute
        assert abs(bp_est - bp_exact) <= 3 * 10000 / k**0.5 + 100
        # union estimate within 40% (k=128 -> sigma ~ 9%)
        assert abs(union_est - union_exact) <= 0.4 * union_exact


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# --------------------------------------------------------------------------
# bottom-k hash sample (mergeable quantile state)
# --------------------------------------------------------------------------


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1 << 60),
                st.integers(min_value=-10_000, max_value=10_000),
            ),
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_hash_sample_merge_lossless_property(parts, k):
    """bottom-k of union-of-partial-bottom-ks == bottom-k of union,
    under the lexicographic (h, c) order the Spark kernel sorts by."""
    partials = [sorted(set(p))[:k] for p in parts]
    merged = sorted(set().union(*map(set, partials)))[:k]
    direct = sorted(set().union(*map(set, parts)))[:k]
    assert merged == direct


def test_hash_sample_quantile_golden(spark):
    """Type-1 quantile positions on a known sample, including the n=1
    clamp and the p99-rounds-up edge."""
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        hash_sample,
        hash_sample_quantile,
    )

    # cents 100..1000 under hashes 1..10 (hash order == value order so
    # positions are readable): p50 -> ceil(0.5*10)=5th -> 500 cents
    rows = [(i, (i + 1) * 100) for i in range(10)]
    df = spark.createDataFrame(rows, "h long, c long")
    sk = df.agg(hash_sample("h", "c", 16).alias("sk"))
    got = sk.select(
        hash_sample_quantile("sk", 5000).alias("p50"),
        hash_sample_quantile("sk", 9000).alias("p90"),
        hash_sample_quantile("sk", 9900).alias("p99"),
        hash_sample_quantile("sk", 1).alias("pmin"),
    ).collect()[0]
    assert (got.p50, got.p90, got.p99, got.pmin) == (5.0, 9.0, 10.0, 1.0)

    one = spark.createDataFrame([(7, 250)], "h long, c long").agg(
        hash_sample("h", "c", 4).alias("sk")
    )
    got1 = one.select(
        hash_sample_quantile("sk", 5000).alias("p50"),
        hash_sample_quantile("sk", 9900).alias("p99"),
    ).collect()[0]
    assert (got1.p50, got1.p99) == (2.5, 2.5)


def test_hash_sample_spark_cascade_equals_direct(spark):
    """minute→hour merge of per-minute samples reproduces the direct
    per-type sample bit-for-bit (struct arrays equal, cut branch
    exercised: k=16 < per-type rows)."""
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        hash_sample,
        hash_sample_merge,
    )

    k = 16
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        "ts",
        portable_hash60(F.col("event_id").cast("string")).alias("h"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    direct = {
        r["event_type"]: r["sk"]
        for r in ev.groupBy("event_type")
        .agg(hash_sample("h", "c", k).alias("sk"))
        .collect()
    }
    merged = {
        r["event_type"]: r["sk"]
        for r in ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("m"))
        .agg(hash_sample("h", "c", k).alias("sk"))
        .groupBy("event_type")
        .agg(hash_sample_merge("sk", k).alias("sk"))
        .collect()
    }
    assert direct and merged == direct
    assert all(len(sk) == k for sk in direct.values())


def test_hash_sample_partial_bounded_path_equals_unbounded(spark):
    """The Arrow map-side bottom-k cut feeds the reducer to the
    identical sample (and md5) as the unbounded collect_set path."""
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        hash_sample,
        hash_sample_md5,
        hash_sample_partial,
    )

    k = 16
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        portable_hash60(F.col("event_id").cast("string")).alias("h"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    plain = {
        r["event_type"]: (r["sk"], r["m"])
        for r in ev.groupBy("event_type")
        .agg(hash_sample("h", "c", k).alias("sk"))
        .select("event_type", "sk", hash_sample_md5("sk").alias("m"))
        .collect()
    }
    cut = hash_sample_partial(ev.repartition(8), ["event_type"], "h", "c", k)
    bounded = {
        r["event_type"]: (r["sk"], r["m"])
        for r in cut.groupBy("event_type")
        .agg(hash_sample("h", "c", k).alias("sk"))
        .select("event_type", "sk", hash_sample_md5("sk").alias("m"))
        .collect()
    }
    assert plain and bounded == plain
