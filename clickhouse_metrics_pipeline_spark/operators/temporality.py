"""Temporality conversion (T1-T6) as batch window operators.

The reference converts cumulative->delta per series with an in-memory
state map guarded by a mutex (``internal/converter/temporality.go``). The
Spark-native form of per-series sequential state is a window partitioned by
``series_hash`` ordered by ``timestamp``: ``lag()`` gives the previous
point, a running ``sum()`` re-cumulates. This distributes by shuffling on
series_hash (analogous to the reference's hash-map keying, but across
executors) and has no unbounded driver state - at 100 TB the state lives in
the shuffle, one partition per hash range, AQE-splittable on skew.

Pinned semantics (test/temporality_test.go, FIXTURES.md SS5):

- First cumulative point of a series is emitted AS ITS FULL VALUE, not
  dropped (temporality.go:51-61; [100,150,200] -> [100,50,50]).
- Counter reset (monotonic sum: value < prev; histogram: count < prev
  count): emit the raw value (temporality.go:66-79; [100,150,20,50] ->
  [100,50,20,30]).
- Histogram delta guards: count/sum are only subtracted when the previous
  count/sum > 0, else the raw cumulative value passes through
  (temporality.go:87-94).
- Bucket deltas match by upper bound; bounds absent from the previous
  point pass through unchanged (temporality.go:115-140).
- Gauges and already-delta rows pass through untouched
  (temporality.go:44-46, 107-108).
- Reset detection for histograms does NOT require is_monotonic
  (temporality.go:166-173); for sums it does (temporality.go:157-164).

The streaming variant with the same semantics lives in
``clickhouse_metrics_pipeline_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_metrics_pipeline_spark.schema import (
    METRIC_TYPE_HISTOGRAM,
    METRIC_TYPE_SUM,
    TEMPORALITY_CUMULATIVE,
    TEMPORALITY_DELTA,
)

def _series_window():
    # built lazily: WindowSpec construction needs an active SparkContext
    return Window.partitionBy("series_hash").orderBy("timestamp")


def _reset_flag(prev_value: Column, prev_count: Column) -> Column:
    """Counter-reset predicate (T4, temporality.go:142-179)."""
    is_sum = F.col("metric_type") == METRIC_TYPE_SUM
    is_hist = F.col("metric_type") == METRIC_TYPE_HISTOGRAM
    sum_reset = (
        is_sum
        & F.col("is_monotonic")
        & F.col("value").isNotNull()
        & prev_value.isNotNull()
        & (F.col("value") < prev_value)
    )
    # Reference compares count against the same LastValue slot it stores
    # counts into; per-series a histogram only ever stores counts there.
    hist_reset = (
        is_hist
        & F.col("count").isNotNull()
        & prev_count.isNotNull()
        & (F.col("count") < prev_count)
    )
    return sum_reset | hist_reset


def detect_resets(df: DataFrame, out_col: str = "reset_detected") -> DataFrame:
    """Standalone reset detector over a metrics DataFrame (T4)."""
    w = _series_window()
    prev_value = F.lag("value").over(w)
    prev_count = F.lag("count").over(w)
    return df.withColumn(out_col, F.coalesce(_reset_flag(prev_value, prev_count), F.lit(False)))


def _delta_buckets(current: Column, previous: Column) -> Column:
    """Per-le bucket subtraction with pass-through (T3, temporality.go:115-140)."""
    prev_map = F.map_from_entries(
        F.transform(previous, lambda b: F.struct(b["le"].alias("key"), b["count"].alias("value")))
    )
    subtracted = F.transform(
        current,
        lambda b: F.struct(
            b["le"].alias("le"),
            F.when(
                F.element_at(prev_map, b["le"]).isNotNull(),
                b["count"] - F.element_at(prev_map, b["le"]),
            )
            .otherwise(b["count"])
            .alias("count"),
        ),
    )
    return F.when(
        previous.isNull() | (F.size(previous) == 0), current
    ).otherwise(subtracted)


def _cumulative_buckets(delta: Column, previous_cumulative: Column) -> Column:
    """Per-le bucket addition with pass-through (T6, temporality.go:238-263)."""
    prev_map = F.map_from_entries(
        F.transform(
            previous_cumulative,
            lambda b: F.struct(b["le"].alias("key"), b["count"].alias("value")),
        )
    )
    added = F.transform(
        delta,
        lambda b: F.struct(
            b["le"].alias("le"),
            (b["count"] + F.coalesce(F.element_at(prev_map, b["le"]), F.lit(0))).alias(
                "count"
            ),
        ),
    )
    return F.when(
        previous_cumulative.isNull() | (F.size(previous_cumulative) == 0), delta
    ).otherwise(added)


def convert_to_delta(df: DataFrame) -> DataFrame:
    """Cumulative -> delta conversion (T1-T4), batch form.

    Only cumulative sum/histogram rows are rewritten; everything else
    passes through byte-identical (incl. temporality code).
    """
    convertible = (F.col("temporality") == TEMPORALITY_CUMULATIVE) & F.col(
        "metric_type"
    ).isin(METRIC_TYPE_SUM, METRIC_TYPE_HISTOGRAM)

    w = _series_window()
    prev_value = F.lag(F.when(convertible, F.col("value"))).over(w)
    prev_count = F.lag(F.when(convertible, F.col("count"))).over(w)
    prev_sum = F.lag(F.when(convertible, F.col("sum"))).over(w)
    prev_buckets = F.lag(F.when(convertible, F.col("buckets"))).over(w)
    first_point = prev_value.isNull() & prev_count.isNull() & prev_sum.isNull() & prev_buckets.isNull()

    reset = _reset_flag(prev_value, prev_count)

    is_sum = F.col("metric_type") == METRIC_TYPE_SUM
    is_hist = F.col("metric_type") == METRIC_TYPE_HISTOGRAM

    new_value = F.when(
        convertible & is_sum & F.col("value").isNotNull() & ~first_point & ~reset,
        F.col("value") - F.coalesce(prev_value, F.lit(0.0)),
    ).otherwise(F.col("value"))

    # LastCount/LastSum > 0 guards (temporality.go:87-94)
    new_count = F.when(
        convertible
        & is_hist
        & F.col("count").isNotNull()
        & ~first_point
        & ~reset
        & (F.coalesce(prev_count, F.lit(0)) > 0),
        F.col("count") - prev_count,
    ).otherwise(F.col("count"))

    new_sum = F.when(
        convertible
        & is_hist
        & F.col("sum").isNotNull()
        & ~first_point
        & ~reset
        & (F.coalesce(prev_sum, F.lit(0.0)) > 0),
        F.col("sum") - prev_sum,
    ).otherwise(F.col("sum"))

    new_buckets = F.when(
        convertible & is_hist & ~first_point & ~reset,
        _delta_buckets(F.col("buckets"), prev_buckets),
    ).otherwise(F.col("buckets"))

    new_temporality = F.when(convertible, F.lit(TEMPORALITY_DELTA).cast("tinyint")).otherwise(
        F.col("temporality")
    )

    return (
        df.withColumn("value", new_value)
        .withColumn("count", new_count)
        .withColumn("sum", new_sum)
        .withColumn("buckets", new_buckets)
        .withColumn("temporality", new_temporality)
    )


def convert_to_cumulative(df: DataFrame) -> DataFrame:
    """Delta -> cumulative re-accumulation (T5-T6), batch form.

    Running sum per series over event time. Fixes the reference's
    query-side flaw where all delta series share one accumulator across
    requests (promread/handler.go:184-197) - here the window partitions by
    series_hash, so accumulation is correctly per-series.
    """
    convertible = (F.col("temporality") == TEMPORALITY_DELTA) & F.col(
        "metric_type"
    ).isin(METRIC_TYPE_SUM, METRIC_TYPE_HISTOGRAM)

    run = _series_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_sum = F.col("metric_type") == METRIC_TYPE_SUM
    is_hist = F.col("metric_type") == METRIC_TYPE_HISTOGRAM

    new_value = F.when(
        convertible & is_sum & F.col("value").isNotNull(),
        F.sum(F.when(convertible, F.col("value"))).over(run),
    ).otherwise(F.col("value"))
    new_count = F.when(
        convertible & is_hist & F.col("count").isNotNull(),
        F.sum(F.when(convertible, F.col("count"))).over(run),
    ).otherwise(F.col("count"))
    new_sum = F.when(
        convertible & is_hist & F.col("sum").isNotNull(),
        F.sum(F.when(convertible, F.col("sum"))).over(run),
    ).otherwise(F.col("sum"))

    # Cumulative buckets: per-(series, le) running sum. Explode + window is
    # the distributed form of the reference's per-le map accumulation.
    df = df.withColumn("_row_ts", F.col("timestamp"))
    exploded = df.where(convertible & is_hist & F.col("buckets").isNotNull()).select(
        "series_hash", "_row_ts", F.posexplode("buckets").alias("_pos", "b")
    )
    le_run = (
        Window.partitionBy("series_hash", F.col("b.le"))
        .orderBy("_row_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = exploded.withColumn("_cum", F.sum("b.count").over(le_run))
    rebuilt = cum.groupBy("series_hash", "_row_ts").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_pos"), F.struct(F.col("b.le").alias("le"), F.col("_cum").alias("count")).alias("s")))
        ).alias("_rb")
    ).select(
        "series_hash",
        "_row_ts",
        F.transform("_rb", lambda x: x["s"]).alias("_cum_buckets"),
    )

    out = (
        df.join(rebuilt, ["series_hash", "_row_ts"], "left")
        .withColumn("value", new_value)
        .withColumn("count", new_count)
        .withColumn("sum", new_sum)
        .withColumn(
            "buckets",
            F.when(convertible & is_hist & F.col("_cum_buckets").isNotNull(), F.col("_cum_buckets")).otherwise(
                F.col("buckets")
            ),
        )
        .withColumn(
            "temporality",
            F.when(convertible, F.lit(TEMPORALITY_CUMULATIVE).cast("tinyint")).otherwise(
                F.col("temporality")
            ),
        )
        .drop("_row_ts", "_cum_buckets")
    )
    return out
