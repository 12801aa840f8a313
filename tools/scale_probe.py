"""Empirical scale probe: does operator throughput hold as data grows?

The bench (`bench.py`) measures absolute latency at sf0.1. This tool
answers the scale question directly: it synthesizes m x sf0.1 inputs
(m in 1, 4, 16 by default) by unioning shifted copies — new key ranges
per copy, so series/document CARDINALITY grows with volume the way real
data grows — and times the steady-state run of one representative of
each core operator family:

- shuffle aggregation   (1h windowed rollup over events)
- sequential window     (per-series cumulative->delta, lag over sort)
- hash dedup            (normalize -> xxhash64 -> groupBy over documents)
- Arrow kernel          (fused MinHash band-bucket signature over documents)
- as-of join            (union-and-carry temporal join over events)
- session windows       (30m-gap sessions over events)
- fused ANN probe       (probe-matrix cosine top-k over embeddings)
- int8 quantization     (map-only JVM HOF compression over embeddings)
- model scoring         (hash-bucketed linear classifier over documents)
- banded SRP pairs      (integer-SRP bucket self-join over embeddings)

A distributed-friendly operator keeps rows/sec roughly flat as m grows
(until cores saturate); an operator hiding a driver-side loop or an
all-pairs join collapses. The summary prints per-op scaling efficiency
eff = (rows/sec at max m) / (rows/sec at m=1); >=0.7 passes on
local[32] given 100k-row baselines leave cores idle at m=1.

Usage: python tools/scale_probe.py [--multiples 1,4,16] [--sf-dir DIR]
Prints one JSON line per (op, multiple), then a summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from clickhouse_metrics_pipeline_spark.operators import dedup
from clickhouse_metrics_pipeline_spark.session import get_spark
from clickhouse_metrics_pipeline_spark.tables import _events


def scaled_events(spark, sf_dir: str, m: int) -> DataFrame:
    """m shifted copies of events: distinct user_id range per copy, so
    the series key space (user_id, event_type) grows m-fold."""
    base = _events(spark, sf_dir)
    parts = [
        base.select(
            (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
            "event_type",
            "value",
        )
        for i in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def scaled_docs(spark, sf_dir: str, m: int) -> DataFrame:
    """m copies of documents with fresh ids and per-copy text salt (so
    exact-dedup groups don't collapse degenerately across copies)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copy{i}")).alias("text"),
        )
        for i in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def scaled_embeddings(spark, sf_dir: str, m: int) -> DataFrame:
    """m copies of embeddings with fresh vec_ids. Each copy's vectors
    are dimension-ROTATED by the copy index: norms and within-copy
    geometry are preserved (comparable per-row work), but copies are
    not near-duplicates of each other — plain value reuse made every
    vector gain m-1 exact twins, so pair-emitting probes (srp_pairs)
    saw a legitimately quadratic OUTPUT and measured the data, not the
    plan."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(base.select("embedding").first()[0])

    def rot(i: int):
        if i == 0:
            return F.col("embedding")
        return F.concat(
            F.slice("embedding", i + 1, dim - i), F.slice("embedding", 1, i)
        )

    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            rot(i % dim).alias("embedding"),
        )
        for i in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def op_rollup_agg(ev: DataFrame) -> int:
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour"))
        .agg(
            F.min("value"),
            F.max("value"),
            F.sum("value"),
            F.count(F.lit(1)),
        )
        .count()
    )


def op_window_delta(ev: DataFrame) -> int:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    delta = F.when(prev.isNull(), F.col("value")).otherwise(F.col("value") - prev)
    return ev.select("event_id", delta.alias("d")).where(F.col("d").isNotNull()).count()


def op_exact_dedup(docs: DataFrame) -> int:
    key = F.xxhash64(dedup.normalize_text("text"))
    return (
        docs.groupBy(key.alias("k"))
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
        .count()
    )


def op_minhash_kernel(docs: DataFrame) -> int:
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.repartition(par)
        .select(dedup.minhash_band_buckets_from_text("text").alias("bb"))
        .selectExpr("sum(size(bb)) as s")
        .collect()[0][0]
    )


def op_asof_join(ev: DataFrame) -> int:
    from clickhouse_metrics_pipeline_spark.operators.asof import asof_join

    left = ev.where(F.col("event_type") == "purchase")
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    return asof_join(
        left, right, keys=["user_id"], payload=["event_id"]
    ).count()


def op_session_window(ev: DataFrame) -> int:
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)), F.sum("value"))
        .count()
    )


def op_fused_topk(emb: DataFrame) -> int:
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        cosine_topk_fused,
    )

    probes = emb.where(F.col("vec_id") < 10)
    return cosine_topk_fused(emb, probes, k=5).count()


def op_int8_quantize(emb: DataFrame) -> int:
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int8_quantize,
    )

    q = emb.select(int8_quantize(F.col("embedding")).alias("q"))
    return q.select(F.sum(F.size("q.q")).alias("s")).collect()[0][0]


def op_kmv_sketch(ev: DataFrame) -> int:
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    h = portable_hash60(F.col("user_id").cast("string"))
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour"))
        .agg(kmv_sketch(h, 64).alias("sk"))
        .select(kmv_estimate("sk", 64).alias("e"))
        .count()
    )


def op_hash_sample(ev: DataFrame) -> int:
    """Bottom-k sample THROUGH the map-side bounded combine
    (hash_sample_partial) — the 100 TB path: each Arrow batch cuts to
    <= k rows per group before the shuffle, so agg state never grows
    with input rows. The raw collect_set form measured efficiency 1.5
    at 16x (its per-group state is the full distinct (h, c) set);
    the partial composition is pinned lossless in tests/test_sketch.py."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        hash_sample,
        hash_sample_partial,
        hash_sample_quantile,
    )
    from clickhouse_metrics_pipeline_spark.tables import value_cents

    h = portable_hash60(F.col("event_id").cast("string"))
    pre = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("ws"),
        h.alias("h"),
        value_cents("value").alias("c"),
    )
    part = hash_sample_partial(pre, ["event_type", "ws"], "h", "c", 64)
    return (
        part.groupBy("event_type", "ws")
        .agg(hash_sample(F.col("h"), F.col("c"), 64).alias("sk"))
        .select(hash_sample_quantile("sk", 9500).alias("p95"))
        .count()
    )


def op_anomaly_zscore(ev: DataFrame) -> int:
    from pyspark.sql import Window

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(-24, -1)
    b = b.select(
        "n",
        F.count(F.lit(1)).over(w).alias("k"),
        F.sum(dec(F.col("n"))).over(w).alias("s"),
        F.sum(dec(F.col("n")) * dec(F.col("n"))).over(w).alias("ss"),
    )
    k, n = dec(F.col("k")), dec(F.col("n"))
    dev = k * n - F.col("s")
    flag = dev * dev * (k - F.lit(1)) > F.lit(4) * k * (
        k * F.col("ss") - F.col("s") * F.col("s")
    )
    return b.where((F.col("k") >= 12) & flag).count()


def op_quality_classifier(docs: DataFrame) -> int:
    """Hash-bucketed linear model scoring (workloads_ext4): zero-shuffle
    row-local token->bucket->weight sum; the map-only model-scoring
    shape must scale perfectly."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )

    toks = dedup.tokens(F.col("text"))
    weight = (
        lambda t: (portable_hash60(t) % 4096) * 2654435761 % 1001 - 500
    )
    score = F.aggregate(
        F.transform(toks, weight),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + w,
    )
    return (
        docs.select((score * 100 >= F.size(toks) * 5).alias("keep"))
        .where(F.col("keep"))
        .count()
    )


def op_srp_pairs(emb: DataFrame) -> int:
    """Banded integer-SRP near-dup pairs (operators/similarity.py) at
    the SCALE operating point: 12-bit bands keep expected bucket
    occupancy O(1) as the corpus grows, and the occupancy cap bounds
    any hot bucket — candidate volume stays ~linear in rows. (As of
    round 5 this is also the graded catalog configuration; the 6-bit
    n^2/64 demo point survives only as a pytest case.)"""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        srp_int8_pairs,
    )

    import math

    # the documented sizing rule applied dynamically: keep expected
    # bucket occupancy O(1) as the corpus grows (n / 2^bits ~ const).
    # A FIXED band width at growing n measures the quadratic candidate
    # blowup of a misconfigured run, not the plan (12 bits at 16x
    # measured efficiency 2.9; sized bands, ~linear).
    n = emb.count()
    bits = max(12, math.ceil(math.log2(max(n, 2))))
    return srp_int8_pairs(
        emb, n_bands=8, rows_per_band=bits, max_bucket=64
    ).count()


def op_ivf_int(emb: DataFrame) -> int:
    """Integer IVF end to end — fit (2 treeAggregate iterations) +
    probe. Fit cost is ~linear map passes; probe touches ~nprobe/k of
    the corpus. Probes the round-5 flagship at its catalog config."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        ivf_int_topk,
    )

    return ivf_int_topk(emb).count()


def op_repeated_spans(docs: DataFrame) -> int:
    """Repeated-span localization at the catalog df-cap: positional
    gram kernel (row-local), posting-list-bounded repeat counting,
    per-document sweep. Output rows scale with true duplication."""
    from clickhouse_metrics_pipeline_spark.operators.dedup import (
        repeated_spans,
    )

    return repeated_spans(docs, k=8, min_count=2, max_count=1000).count()


def op_recording_rules(ev: DataFrame) -> int:
    from clickhouse_metrics_pipeline_spark.plans.rules import (
        Rule,
        evaluate_rules,
    )

    return evaluate_rules(
        ev,
        [
            Rule("p:count", "count"),
            Rule("p:sum", "sum_cents"),
            Rule("p:avg", "avg_scaled"),
            Rule("p:share", "share_ppm"),
            Rule("p:err", "error_ratio_ppm"),
        ],
    ).count()


def op_rate_kernel(ev: DataFrame) -> int:
    from clickhouse_metrics_pipeline_spark.functions.rate import (
        rate_over_window,
    )

    return (
        rate_over_window(ev, ["user_id", "event_type"], 300)
        .where(F.col("rate").isNotNull())
        .count()
    )


def op_adjacent_pairs(ev: DataFrame) -> int:
    """resets()/changes() kernel: one shuffle to (series, window),
    row-local sorted-array adjacent-pair count (r7). Work per group is
    bounded by samples-per-window; cardinality growth adds groups, not
    group size, so throughput should hold."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        "sum by (event_type) (changes(events[30m]))", events_as_series(ev)
    ).count()


def op_regression_moments(ev: DataFrame) -> int:
    """deriv()/predict_linear() kernel: exact DECIMAL least-squares
    moments with map-side partial aggregation (r7); the moment state
    is 5 decimals per (series, window) regardless of sample count."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        "sum by (event_type) (deriv(events[1h]))", events_as_series(ev)
    ).count()


def op_hw_fold(ev: DataFrame) -> int:
    """holt_winters() kernel (r8): one shuffle to (series, window),
    then a row-local collect_list + array-aggregate fixed-point fold.
    Per-group work is bounded by samples-per-window (the in-window
    sample array), so cardinality growth adds groups, not group size
    — the same bound as every per-series window op."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        "sum by (event_type) (holt_winters(events[1h], 0.3, 0.1))",
        events_as_series(ev),
    ).count()


def op_setop_match(ev: DataFrame) -> int:
    """and/unless/or vector set ops (r8): two by-grain aggregated
    vectors semi/anti-joined on (by-labels, window). Both sides
    reduce before the join, so the join input is rollup-sized; AQE
    broadcasts the smaller side. Throughput should track the
    aggregation, not the join."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        "sum by (event_type) (sum_over_time(events[1h])) and "
        "sum by (event_type) (count_over_time(events[1h])) > 2",
        events_as_series(ev),
    ).count()


def op_group_left(ev: DataFrame) -> int:
    """on(...) group_left vector matching — since r12 the
    share-of-total ratio compiles to ONE aggregate plus a window
    function over it (the coarse side is the window-sum of the fine
    side partitioned by the on-key; no join, no second scan).
    Throughput should track the single fine aggregation plus a
    by-grain window exchange."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        "sum by (event_type, user) (count_over_time(events[1h])) "
        "/ on(event_type) group_left "
        "sum by (event_type) (count_over_time(events[1h]))",
        events_as_series(ev),
    ).count()


def op_rate_bucket_walk(ev: DataFrame) -> int:
    """rate() inside stored-bucket histogram_quantile (r10): explode
    the ladder to (series x le) — fan-out bounded by the 6-entry
    ladder — one rate-kernel shuffle on (series, le, window),
    map-side-combinable micro-unit sums per (by, window, le), then an
    O(ladder) collect per group for the walk. Throughput should track
    the rate kernel at ~1/6 the rows/sec (the ladder fan-out), flat
    in cardinality."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )
    from clickhouse_metrics_pipeline_spark.workloads_ext10 import _LES10

    host = (F.col("user_id") % 4).cast("string")
    counts = F.array(
        *[
            F.expr(
                f"CAST((unix_timestamp(ts) * (1 + {j} + user_id % 4)) "
                "DIV 7 AS BIGINT)"
            )
            for j in range(len(_LES10))
        ]
    )
    frame = ev.select(
        F.lit("hist_requests").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type"), F.lit("host")),
            F.array(F.col("event_type"), host),
        ).alias("attributes"),
        "ts",
        "value",
        F.col("event_id").alias("sample_id"),
        F.array(*[F.lit(le) for le in _LES10]).alias("buckets_le"),
        counts.alias("buckets_count"),
    )
    return compile_promql(
        "histogram_quantile(0.95, "
        "sum by (event_type) (rate(hist_requests[1d])))",
        frame,
    ).count()


def op_exp_quantile(ev: DataFrame) -> int:
    """exp-histogram quantile from text (r10): the A6 merge shape —
    explode per-sample exp buckets to (group, sign, index), map-side
    partial sums, re-collect O(indexes) per group, midpoint walk.
    State per group is bounded by the index range, not row count."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    i0 = (F.col("event_id") % 4).cast("int")
    c0 = ((F.col("event_id") + F.col("user_id")) % 3 + 1).cast("bigint")
    c1 = (F.col("user_id") % 5 + 1).cast("bigint")
    frame = ev.select(
        F.lit("exp_requests").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type")), F.array(F.col("event_type"))
        ).alias("attributes"),
        "ts",
        "value",
        (F.col("user_id") % 2).cast("int").alias("exp_scale"),
        (F.col("event_id") % 2).cast("bigint").alias("exp_zero_count"),
        F.lit(0.0).alias("exp_zero_threshold"),
        F.array(
            F.struct(i0.alias("index"), c0.alias("count")),
            F.struct((i0 + 2).alias("index"), c1.alias("count")),
        ).alias("exp_positive_buckets"),
        F.lit(None)
        .cast("array<struct<index:int,count:bigint>>")
        .alias("exp_negative_buckets"),
    )
    return compile_promql(
        "histogram_quantile(0.99, "
        "sum by (event_type) (count_over_time(exp_requests[1d])))",
        frame,
    ).count()


def op_exp_fraction(ev: DataFrame) -> int:
    """histogram_fraction over exp histograms from text (r11): the
    identical A6/H7 merge shape as exp_quantile — per-(group, sign,
    index) partial sums at the min scale — with the walk replaced by
    the two-bound cumulative-mass row-local HOF. Scaling is the
    merge's: state per group bounded by the index range, growth adds
    groups. (increase() inside histogram_quantile needs no family of
    its own — it is rate_bucket_walk's plan with the /range division
    dropped, byte-identical shuffle structure.)"""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    i0 = (F.col("event_id") % 3).cast("int")
    c0 = ((F.col("event_id") + F.col("user_id")) % 3 + 1).cast("bigint")
    c1 = (F.col("user_id") % 5 + 1).cast("bigint")
    frame = ev.select(
        F.lit("exp_latency").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type")), F.array(F.col("event_type"))
        ).alias("attributes"),
        "ts",
        "value",
        (-(F.col("user_id") % 2)).cast("int").alias("exp_scale"),
        (F.col("event_id") % 2).cast("bigint").alias("exp_zero_count"),
        F.lit(0.0).alias("exp_zero_threshold"),
        F.array(
            F.struct(i0.alias("index"), c0.alias("count")),
            F.struct((i0 + 2).alias("index"), c1.alias("count")),
        ).alias("exp_positive_buckets"),
        F.lit(None)
        .cast("array<struct<index:int,count:bigint>>")
        .alias("exp_negative_buckets"),
    )
    return compile_promql(
        "histogram_fraction(4, 16, "
        "sum by (event_type) (count_over_time(exp_latency[1d])))",
        frame,
    ).count()


def op_byagg_fused(ev: DataFrame) -> int:
    """Composable by-aggregation (r11 fusion): sum by of
    count_over_time collapses to ONE map-side-combinable
    HashAggregate on the by-grain — one exchange carrying by-grain
    partials. The canonical fused one-aggregate shape; throughput
    should track a plain windowed groupBy."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        "sum by (event_type) (count_over_time(events[1h]))",
        events_as_series(ev),
    ).count()


def op_absent_gap(ev: DataFrame) -> int:
    """absent() as a range report (r12 gap enumeration): one
    map-side-combinable window-grain aggregate, then a
    single-partition sort over lifetime/grain rows emitting each
    unmatched window plus the grid gaps to its predecessor. Group
    count is bounded by lifetime/grain (NOT cardinality), so the
    aggregate dominates and throughput should hold; the r11 form's
    O(N^2) single-task membership test is what this probe would have
    caught at fine grains."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        'absent(events{event_type="purchase"}[30m])',
        events_as_series(ev),
    ).count()


def op_lsh_ann(emb: DataFrame) -> int:
    """Float-ANN banded LSH pairs (r11 item 12 reshape: the
    explode/self-join/distinct decide pairs over (id, table, key)
    rows only; vectors re-attach by id after). Same sizing rule as
    op_srp_pairs: planes grow with log2(n) so expected bucket
    occupancy stays O(1) — a FIXED 6-plane table at 16x measures the
    quadratic candidate blowup of a misconfigured run (measured:
    eff 2.5), not the plan."""
    import math

    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        lsh_ann_pairs,
    )

    n = emb.count()
    planes = max(6, math.ceil(math.log2(max(n, 2))) - 5)
    return lsh_ann_pairs(
        emb, threshold=0.45, num_tables=8, planes_per_table=planes
    ).count()


def op_resize_chain(docs: DataFrame) -> int:
    """Multimodal resize -> extract chain (r11 item 16 reshape: meta
    rides the Arrow batch — one resize pass, one extract pass, no
    join). Pure map-only Python stages; throughput should scale with
    cores until the Arrow boundary saturates."""
    from clickhouse_metrics_pipeline_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
        resize_media,
    )

    media = documents_as_media(
        docs.withColumn("n_chars", F.length("text"))
    )
    resized = resize_media(media, width=32, height=24, fake_decode=True)
    return extract_features(
        resized, fake_decode=True, with_meta=True
    ).count()


OPS = {
    "rollup_agg": ("events", op_rollup_agg),
    "byagg_fused": ("events", op_byagg_fused),
    "absent_gap": ("events", op_absent_gap),
    "lsh_ann": ("embeddings", op_lsh_ann),
    "resize_chain": ("documents", op_resize_chain),
    "adjacent_pairs": ("events", op_adjacent_pairs),
    "hw_fold": ("events", op_hw_fold),
    "setop_match": ("events", op_setop_match),
    "group_left": ("events", op_group_left),
    "rate_bucket_walk": ("events", op_rate_bucket_walk),
    "exp_quantile": ("events", op_exp_quantile),
    "exp_fraction": ("events", op_exp_fraction),
    "regression_moments": ("events", op_regression_moments),
    "recording_rules": ("events", op_recording_rules),
    "rate_kernel": ("events", op_rate_kernel),
    "window_delta": ("events", op_window_delta),
    "exact_dedup": ("documents", op_exact_dedup),
    "minhash_kernel": ("documents", op_minhash_kernel),
    "asof_join": ("events", op_asof_join),
    "session_window": ("events", op_session_window),
    "fused_topk": ("embeddings", op_fused_topk),
    "int8_quantize": ("embeddings", op_int8_quantize),
    "kmv_sketch": ("events", op_kmv_sketch),
    "hash_sample": ("events", op_hash_sample),
    "anomaly_zscore": ("events", op_anomaly_zscore),
    "quality_classifier": ("documents", op_quality_classifier),
    "srp_pairs": ("embeddings", op_srp_pairs),
    "ivf_int": ("embeddings", op_ivf_int),
    "repeated_spans": ("documents", op_repeated_spans),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiples", default="1,4,16")
    ap.add_argument("--ops", default=None, help="comma list; default all")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    multiples = [int(x) for x in args.multiples.split(",")]
    if args.ops:
        wanted = args.ops.split(",")
        unknown = set(wanted) - set(OPS)
        assert not unknown, f"unknown ops: {unknown}"
        for name in list(OPS):
            if name not in wanted:
                del OPS[name]

    spark = get_spark(app_name="cmp-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rates: dict[str, dict[int, float]] = {name: {} for name in OPS}
    for m in multiples:
        inputs = {
            "events": scaled_events(spark, args.sf_dir, m).persist(),
            "documents": scaled_docs(spark, args.sf_dir, m).persist(),
            "embeddings": scaled_embeddings(spark, args.sf_dir, m).persist(),
        }
        counts = {k: df.count() for k, df in inputs.items()}  # materialize
        for name, (src, fn) in OPS.items():
            fn(inputs[src])  # cold run: codegen + worker warm
            # best of two warm runs — same rationale as bench.py: a
            # single warm sample in a long probe session carries GC
            # pauses from the preceding ops' heap churn (measured: the
            # srp probe's in-context 16x time ran 2x its isolated
            # time on one sample and matched it on the next)
            warm = []
            for _ in range(2):
                t0 = time.time()
                fn(inputs[src])
                warm.append(time.time() - t0)
            dt = min(warm)
            rate = counts[src] / dt
            rates[name][m] = rate
            print(
                json.dumps(
                    {
                        "op": name,
                        "multiple": m,
                        "input_rows": counts[src],
                        "sec": round(dt, 3),
                        "rows_per_sec": round(rate),
                    }
                )
            )
        for df in inputs.values():
            df.unpersist()

    lo, hi = min(multiples), max(multiples)
    summary = {
        "metric": "scale_efficiency",
        "multiples": multiples,
        "efficiency": {
            name: round(r[hi] / r[lo], 3) for name, r in rates.items()
        },
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
