"""Round-7 catalog extensions.

Two verdict-directed families:

- The PromQL front-end extended to the last implemented kernels it
  could not yet reach from text (VERDICT r6 item 4): ``irate()``
  compiled onto the events_irate_5m expression tree (instant rate at
  each window's last sample, lag crossing window boundaries — the
  kernel's documented contract), ``absent()`` compiled onto the
  events_absent_series grid-minus-present shape (one row per
  evaluation window of the metric's lifetime with NO matching
  samples), and the no-by-clause SCALAR aggregation
  (``sum(rate(...))`` — one row per window over all series). All
  three parse → compile through plans/promql.py; no new kernels.

- The stateful streaming temporality conversion (T1–T4) as a
  driver-graded row (VERDICT r6 item 3): ``events_delta_stream`` runs
  streaming/pipeline.delta_convert_stream — the per-series
  cumulative→delta state machine with reset detection via
  ``applyInPandasWithState`` (state semantics of
  ``converter/temporality.go:43-113``; first point emitted as-is per
  ``test/temporality_test.go:51``) — over a REAL file stream with an
  availableNow trigger, then grades the emitted deltas against a
  DuckDB lag-window restatement. Until now this operator (the one
  genuinely UDF-shaped streaming component) was pytest-pinned only;
  the two existing streaming-graded rows are windowed aggregations.

Exactness: the streamed values are integer CENTS carried in the
pipeline's double value column (exact integers in double up to 2^53,
deltas of exact integers are exact), cast to BIGINT in the graded
projection — no float column reaches the hash (the r7 no-DOUBLE
schema audit pins this).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.tables import _events

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"

EXTRA7_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA7_ORACLE: dict[str, str] = {}


# --------------------------------------------------------------------------
# PromQL text: sum by (event_type) (irate(events[5m]))
# --------------------------------------------------------------------------

PROMQL_IRATE_QUERY = "sum by (event_type) (irate(events[5m]))"


def promql_irate_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text irate(): the instant rate at each 5-minute window's
    last sample per series (last value / seconds since the series'
    previous sample — the driver-green events_irate_5m kernel's
    contract, lag crossing window boundaries), converted to BIGINT
    micro-units per series and integer-summed by event_type. One
    shuffle on the series key serves the lag AND the per-window
    argmax; the by-re-aggregation is rollup-sized."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_IRATE_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_IRATE_SQL = f"""
WITH g AS (
  SELECT event_type, user_id, ts, event_id, value,
         date_diff('microsecond', lag(ts) OVER w, ts) / 1e6 AS gap_s,
         time_bucket(INTERVAL 5 MINUTE, ts) AS bucket_ts,
         row_number() OVER (PARTITION BY event_type, user_id,
                                         time_bucket(INTERVAL 5 MINUTE, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM {_EV_SQL}
  WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id)
), ps AS (
  SELECT event_type, bucket_ts,
         round(value / nullif(gap_s, 0.0), 6) AS ir
  FROM g WHERE rn = 1
)
SELECT event_type, bucket_ts,
       sum(CAST(round(ir * 1000000) AS BIGINT))::BIGINT AS value
FROM ps WHERE ir IS NOT NULL
GROUP BY 1, 2
"""

EXTRA7_QUERIES["promql_irate_by_type"] = promql_irate_by_type
EXTRA7_ORACLE["promql_irate_by_type"] = PROMQL_IRATE_SQL


# --------------------------------------------------------------------------
# PromQL text: absent(events{event_type="purchase"}[30m])
# --------------------------------------------------------------------------

PROMQL_ABSENT_QUERY = 'absent(events{event_type="purchase"}[30m])'


def promql_absent_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text absent(): every 30-minute evaluation window in the
    metric's lifetime where the purchase selector produced NO samples
    — the gone-silent detector (events_absent_series' family) from
    text. Grid bounds come from the metric frame BEFORE matcher
    filtering; the matcher applies to the presence set only. Emits
    (bucket_ts, value=1); real absent() copies equality-matcher
    labels — documented subset divergence."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_ABSENT_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_ABSENT_SQL = f"""
WITH bounds AS (
  SELECT min(time_bucket(INTERVAL 30 MINUTE, ts)) AS w0,
         max(time_bucket(INTERVAL 30 MINUTE, ts)) AS w1
  FROM {_EV_SQL}
), grid AS (
  SELECT unnest(generate_series(w0, w1, INTERVAL 30 MINUTE)) AS bucket_ts
  FROM bounds
), present AS (
  SELECT DISTINCT time_bucket(INTERVAL 30 MINUTE, ts) AS bucket_ts
  FROM {_EV_SQL} WHERE event_type = 'purchase'
)
SELECT g.bucket_ts, 1::BIGINT AS value
FROM grid g ANTI JOIN present p USING (bucket_ts)
"""

EXTRA7_QUERIES["promql_absent_gap"] = promql_absent_gap
EXTRA7_ORACLE["promql_absent_gap"] = PROMQL_ABSENT_SQL


# --------------------------------------------------------------------------
# PromQL text: sum(rate(events[5m])) — the no-by scalar aggregation
# --------------------------------------------------------------------------

PROMQL_SCALAR_SUM_QUERY = "sum(rate(events[5m]))"


def promql_scalar_sum_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL scalar aggregation (no by-clause): the all-series sum of
    per-series 5-minute rates, one row per evaluation window. Rides
    the exact same shared rate kernel + micro-unit tail as the
    driver-green promql_rate_by_type; only the grouping key set is
    empty. Output (bucket_ts, value)."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_SCALAR_SUM_QUERY, events_as_series(_events(spark, sf_dir))
    )


def _promql_scalar_sum_sql() -> str:
    from clickhouse_metrics_pipeline_spark.workloads_ext2 import (
        EVENTS_RATE_SQL,
    )

    return f"""
SELECT bucket_ts,
       sum(CAST(round(rate * 1000000) AS BIGINT))::BIGINT AS value
FROM ({EVENTS_RATE_SQL}) rs
WHERE rate IS NOT NULL
GROUP BY 1
"""


EXTRA7_QUERIES["promql_scalar_sum_rate"] = promql_scalar_sum_rate
EXTRA7_ORACLE["promql_scalar_sum_rate"] = _promql_scalar_sum_sql()


# --------------------------------------------------------------------------
# Stateful streaming temporality conversion (T1-T4) as a graded row
# --------------------------------------------------------------------------


def events_delta_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-series cumulative->delta state machine run as a REAL
    stream: readStream over the events parquet, the events shaped as
    cumulative monotonic SUM points (value = integer cents carried in
    the double column), then streaming/pipeline.delta_convert_stream —
    ``applyInPandasWithState`` keyed by series_hash, carrying the last
    raw cumulative point as state, reset detection on decrease
    (``converter/temporality.go:43-113``; first point emitted AS-IS
    per ``test/temporality_test.go:51``) — drained with availableNow
    into a parquet sink and graded row-for-row against a DuckDB
    lag-window restatement.

    Determinism contract: the staged source is ONE parquet file, so
    availableNow processes ONE micro-batch and the state UDF sees each
    series' full history sorted by timestamp (unique per series in
    this corpus — verified at sf0.01/sf0.1); the 7-day watermark never
    trips inside a single batch (watermark advances only between
    batches). The UDF emits every converted row directly (no window
    eviction), so no closed-window cutoff is needed.

    Exactness: cents are exact integers in double (<= 2^53), deltas of
    exact integers are exact, and the graded projection casts value to
    BIGINT — no float column reaches the hash. series_hash is
    xxhash64(event_type, user_id) (collision-free on this corpus —
    grading identity rides (metric, user), not the hash).

    Scale: state is ONE row (last point) per live series, bounded by
    the TTL ladder + watermark horizon, not by throughput; the same
    plan ingests 100 TB/day with state = series cardinality."""
    from clickhouse_metrics_pipeline_spark.schema import (
        METRIC_TYPE_SUM,
        TEMPORALITY_CUMULATIVE,
    )
    from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
        _EXEMPLARS_DDL,
        delta_convert_stream,
    )
    from clickhouse_metrics_pipeline_spark.workloads_ext6 import (
        _drain_available_now,
        _stage_events_stream,
    )

    stream, src = _stage_events_stream(spark, sf_dir, "delta_stream_src_")
    shaped = stream.select(
        F.xxhash64("event_type", "user_id").alias("series_hash"),
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("metric"),
        F.lit("default").alias("workspaceId"),
        F.col("user_id").cast("string").alias("serviceName"),
        F.lit(METRIC_TYPE_SUM).cast("tinyint").alias("metric_type"),
        F.lit(TEMPORALITY_CUMULATIVE).cast("tinyint").alias("temporality"),
        F.lit(True).alias("is_monotonic"),
        F.round(F.col("value") * 100).alias("value"),
        F.lit(None).cast("bigint").alias("count"),
        F.lit(None).cast("double").alias("sum"),
        F.lit(None).cast("array<double>").alias("buckets_le"),
        F.lit(None).cast("array<bigint>").alias("buckets_count"),
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string")
        ).alias("attributes"),
        F.lit(None).cast(_EXEMPLARS_DDL).alias("exemplars"),
    )
    # state_ttl=False: a registered processing-time timeout makes
    # Trigger.AvailableNow schedule batches until the TTL fires — the
    # drain would never terminate (see delta_convert_stream docstring)
    out = delta_convert_stream(shaped, state_ttl=False)
    out_dir = _drain_available_now(out, src, "delta_stream_")
    return spark.read.parquet(out_dir).select(
        "metric",
        F.col("serviceName").alias("user"),
        F.col("timestamp").alias("ts"),
        F.col("value").cast("bigint").alias("delta_cents"),
    )


EVENTS_DELTA_STREAM_SQL = f"""
WITH s AS (
  SELECT event_type AS metric, user_id::VARCHAR AS user, ts,
         CAST(round(value * 100) AS BIGINT) AS c,
         lag(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY event_type, user_id ORDER BY ts, event_id
         ) AS prev
  FROM {_EV_SQL}
)
SELECT metric, user, ts,
       CASE WHEN prev IS NULL THEN c          -- first point as-is
            WHEN c < prev THEN c              -- reset: raw value
            ELSE c - prev END AS delta_cents
FROM s
"""

EXTRA7_QUERIES["events_delta_stream"] = events_delta_stream
EXTRA7_ORACLE["events_delta_stream"] = EVENTS_DELTA_STREAM_SQL


# --------------------------------------------------------------------------
# PromQL text: resets() / changes() onto the T4 comparison kernels
# --------------------------------------------------------------------------

PROMQL_RESETS_QUERY = "sum by (event_type) (resets(events[1h]))"
PROMQL_CHANGES_QUERY = "sum by (event_type) (changes(events[30m]))"


def promql_resets_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text resets(): per series, consecutive-sample DECREASES
    within each 1-hour evaluation window (compared on exact integer
    cents, (ts, sample_id) order), integer-summed by event_type — the
    T4 reset detector (events_reset_detect whole-series,
    events_resets_1h per-type-window) at PromQL's per-series grain
    from text. The comparison never crosses the window edge: PromQL's
    range vector holds only in-window samples, so a single-sample
    window emits 0. One shuffle on (series, window) builds the sorted
    in-window sample array row-locally (bounded by sampling rate x
    range); the adjacent-pair count is a JVM-side higher-order
    function — no second shuffle, no global window function."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_RESETS_QUERY, events_as_series(_events(spark, sf_dir))
    )


def promql_changes_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text changes(): per series, consecutive-sample value
    CHANGES within each 30-minute window, summed by event_type. Same
    plan shape as promql_resets_by_type; the predicate is inequality
    instead of decrease."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_CHANGES_QUERY, events_as_series(_events(spark, sf_dir))
    )


def _adjacent_count_sql(minutes: int, predicate: str) -> str:
    """Shared oracle shape: per (series, window) count of adjacent
    sample pairs satisfying ``predicate`` over (prev, c) cents, lag
    partitioned BY WINDOW so the comparison stays window-local, then
    sum by event_type."""
    return f"""
WITH s AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL {minutes} MINUTE, ts) AS bucket_ts,
         CAST(round(value * 100) AS BIGINT) AS c,
         lag(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY event_type, user_id,
                        time_bucket(INTERVAL {minutes} MINUTE, ts)
           ORDER BY ts, event_id
         ) AS prev
  FROM {_EV_SQL}
), f AS (
  SELECT event_type, bucket_ts,
         CASE WHEN prev IS NOT NULL AND {predicate} THEN 1 ELSE 0 END AS hit
  FROM s
)
SELECT event_type, bucket_ts, sum(hit)::BIGINT AS value
FROM f GROUP BY 1, 2
"""


EXTRA7_QUERIES["promql_resets_by_type"] = promql_resets_by_type
EXTRA7_ORACLE["promql_resets_by_type"] = _adjacent_count_sql(60, "c < prev")
EXTRA7_QUERIES["promql_changes_by_type"] = promql_changes_by_type
EXTRA7_ORACLE["promql_changes_by_type"] = _adjacent_count_sql(30, "c <> prev")


# --------------------------------------------------------------------------
# PromQL text: stdvar_over_time / stddev_over_time in exact integers
# --------------------------------------------------------------------------

PROMQL_STDVAR_QUERY = "sum by (event_type) (stdvar_over_time(events[1h]))"
PROMQL_STDDEV_QUERY = "max by (event_type) (stddev_over_time(events[1h]))"


def promql_stdvar_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text stdvar_over_time(): per (series, 1h window) the
    exact integer moment form the driver-green events_stddev_over_time
    kernel stores — (n*sum(c^2) - sum(c)^2) floored by n^2 via the
    DECIMAL(38,0) divider = population variance in cents^2 (raw
    value^2 x10000, no float anywhere) — integer-summed by event_type.
    One shuffle to the series-window grain with map-side partial
    moments; the by-re-aggregation is rollup-sized."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_STDVAR_QUERY, events_as_series(_events(spark, sf_dir))
    )


def promql_stddev_max_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text stddev_over_time() under max by (event_type): the
    most-volatile-series panel. stddev is the floor integer square
    root of the cents^2 variance (IEEE-correctly-rounded sqrt with a
    one-step +-1 correction — exact below 2^52, and DuckDB applies the
    identical correction), so the result is stddev in integer cents
    and the whole query value-hashes across engines."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_STDDEV_QUERY, events_as_series(_events(spark, sf_dir))
    )


_VAR_C2_SQL = f"""
  SELECT event_type,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         CAST(
           (count(*) * sum(c * c) - sum(c) * sum(c))
           // (count(*) * count(*)) AS BIGINT
         ) AS var_c2
  FROM (
    SELECT event_type, user_id, ts,
           CAST(round(value * 100) AS BIGINT) AS c
    FROM {_EV_SQL}
  )
  GROUP BY event_type, user_id, 2
"""

PROMQL_STDVAR_SQL = f"""
SELECT event_type, bucket_ts, sum(var_c2)::BIGINT AS value
FROM ({_VAR_C2_SQL}) v
GROUP BY 1, 2
"""

PROMQL_STDDEV_SQL = f"""
WITH v AS ({_VAR_C2_SQL}),
r AS (
  SELECT event_type, bucket_ts, var_c2,
         CAST(floor(sqrt(var_c2::DOUBLE)) AS BIGINT) AS s0
  FROM v
)
SELECT event_type, bucket_ts,
       max(CASE WHEN (s0 + 1) * (s0 + 1) <= var_c2 THEN s0 + 1
                WHEN s0 * s0 > var_c2 THEN s0 - 1
                ELSE s0 END)::BIGINT AS value
FROM r GROUP BY 1, 2
"""

EXTRA7_QUERIES["promql_stdvar_by_type"] = promql_stdvar_by_type
EXTRA7_ORACLE["promql_stdvar_by_type"] = PROMQL_STDVAR_SQL
EXTRA7_QUERIES["promql_stddev_max_by_type"] = promql_stddev_max_by_type
EXTRA7_ORACLE["promql_stddev_max_by_type"] = PROMQL_STDDEV_SQL


# --------------------------------------------------------------------------
# PromQL text: deriv() — windowed least-squares slope
# --------------------------------------------------------------------------

PROMQL_DERIV_QUERY = "sum by (event_type) (deriv(events[1h]))"


def promql_deriv_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text deriv(): per (series, 1h window) the least-squares
    slope of the in-window samples in raw-value units per second —
    the events_predict_linear kernel's exact DECIMAL(38,0) moment
    arithmetic (n, Σx, Σy, Σxy, Σx² with x = window-local micro
    offset, y = integer cents) at the window grain, only the final
    division in float and written token-identically in both engines:
    round(num/den · 1e4, 6). Per-series slopes convert to BIGINT
    micro-units before the integer sum by event_type (the shared
    double-family tail). One shuffle with map-side partial moments."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_DERIV_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_DERIV_SQL = f"""
WITH m AS (
  SELECT event_type,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         count(*)::HUGEINT AS n,
         sum(x)::HUGEINT AS sx,
         sum(c)::HUGEINT AS sy,
         sum(x::HUGEINT * c) AS sxy,
         sum(x::HUGEINT * x) AS sxx
  FROM (
    SELECT event_type, user_id, ts,
           epoch_us(ts) % 3600000000 AS x,
           CAST(round(value * 100) AS BIGINT) AS c
    FROM {_EV_SQL}
  )
  GROUP BY event_type, user_id, 2
), s AS (
  SELECT event_type, bucket_ts,
         round((n * sxy - sx * sy)::DOUBLE
               / (n * sxx - sx * sx)::DOUBLE * 10000, 6) AS slope
  FROM m WHERE n * sxx - sx * sx <> 0
)
SELECT event_type, bucket_ts,
       sum(CAST(round(slope * 1000000) AS BIGINT))::BIGINT AS value
FROM s GROUP BY 1, 2
"""

EXTRA7_QUERIES["promql_deriv_by_type"] = promql_deriv_by_type
EXTRA7_ORACLE["promql_deriv_by_type"] = PROMQL_DERIV_SQL


PROMQL_PREDICT_QUERY = (
    "max by (event_type) (predict_linear(events[1h], 3600))"
)


def promql_predict_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text predict_linear(sel[1h], 3600): the deriv regression
    evaluated one hour past each window's end — the
    disk-full-in-an-hour capacity forecast, per series, max by
    event_type (the worst-series panel). Same exact DECIMAL moment
    state as deriv; the forecast numerator sy*den + num*(n*x*-sx)
    stays decimal until the single final division (DuckDB twin:
    HUGEINT), then cents -> raw /100, round 6, micro-units for the
    integer max."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_PREDICT_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_PREDICT_SQL = f"""
WITH m AS (
  SELECT event_type,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         count(*)::HUGEINT AS n,
         sum(x)::HUGEINT AS sx,
         sum(c)::HUGEINT AS sy,
         sum(x::HUGEINT * c) AS sxy,
         sum(x::HUGEINT * x) AS sxx
  FROM (
    SELECT event_type, user_id, ts,
           epoch_us(ts) % 3600000000 AS x,
           CAST(round(value * 100) AS BIGINT) AS c
    FROM {_EV_SQL}
  )
  GROUP BY event_type, user_id, 2
), s AS (
  SELECT event_type, bucket_ts,
         round((sy * (n * sxx - sx * sx)
                + (n * sxy - sx * sy) * (n * 7200000000 - sx))::DOUBLE
               / (n * (n * sxx - sx * sx))::DOUBLE / 100.0, 6) AS pred
  FROM m WHERE n * sxx - sx * sx <> 0
)
SELECT event_type, bucket_ts,
       max(CAST(round(pred * 1000000) AS BIGINT))::BIGINT AS value
FROM s GROUP BY 1, 2
"""

EXTRA7_QUERIES["promql_predict_by_type"] = promql_predict_by_type
EXTRA7_ORACLE["promql_predict_by_type"] = PROMQL_PREDICT_SQL


# --------------------------------------------------------------------------
# A12 incremental rollup (MV freshness) as a graded row
# --------------------------------------------------------------------------


def events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A12 incremental partition job graded end-to-end: events are
    staged as a date-partitioned metrics_raw table in TWO writes (the
    older half of the dates, then the rest), ``incremental_rollup_job``
    runs after each write — the second run must process ONLY the new +
    lookback partitions (the reference's MV freshness guard,
    ``schema.sql:183,274,365``, as partition arithmetic with dynamic
    partition overwrite) — and the final 1m table is graded
    row-for-row against a full-history DuckDB rollup. A missed or
    double-processed partition shows up as a count/min/max mismatch.
    The pytest tier (tests/test_incremental_rollup.py) additionally
    pins idempotent reruns and the late-data lookback; this row makes
    the end-state equivalence driver-checkable.

    Graded projection mirrors the streaming rollup row: identity rides
    (metric, user), min/max as exact integer cents, samples_count —
    no float column reaches the hash. Temp staging is removed after
    the (eager) jobs; only the output dir outlives the call."""
    import shutil
    import tempfile

    from clickhouse_metrics_pipeline_spark.operators.rollup import (
        incremental_rollup_job,
    )
    from clickhouse_metrics_pipeline_spark.schema import METRIC_TYPE_GAUGE

    ev = _events(spark, sf_dir)
    shaped = ev.select(
        F.lit("default").alias("workspaceId"),
        F.xxhash64("event_type", "user_id").alias("series_hash"),
        F.col("event_type").alias("metric"),
        F.col("user_id").cast("string").alias("serviceName"),
        F.lit(METRIC_TYPE_GAUGE).cast("tinyint").alias("metric_type"),
        F.lit(0).cast("tinyint").alias("temporality"),
        F.lit(False).alias("is_monotonic"),
        F.col("ts").alias("timestamp"),
        F.col("value"),
        F.lit(None).cast("bigint").alias("count"),
        F.lit(None).cast("double").alias("sum"),
        F.lit(None)
        .cast("array<struct<le:double,count:bigint>>")
        .alias("buckets"),
        F.lit(None).cast("int").alias("exp_scale"),
        F.lit(None).cast("bigint").alias("exp_zero_count"),
        F.lit(None).cast("double").alias("exp_zero_threshold"),
        F.lit(None)
        .cast("array<struct<index:int,count:bigint>>")
        .alias("exp_positive_buckets"),
        F.lit(None)
        .cast("array<struct<index:int,count:bigint>>")
        .alias("exp_negative_buckets"),
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string")
        ).alias("attributes"),
        F.to_date("ts").alias("date"),
    )
    dates = sorted(
        r["date"].isoformat()
        for r in shaped.select("date").distinct().collect()
    )
    split = dates[len(dates) // 2]
    base = tempfile.mkdtemp(prefix="inc_rollup_")
    raw_path, out_path = f"{base}/raw", f"{base}/1m"
    shaped.where(F.col("date") <= F.lit(split)).write.partitionBy(
        "date"
    ).parquet(raw_path)
    first = incremental_rollup_job(spark, raw_path, out_path)
    shaped.where(F.col("date") > F.lit(split)).write.mode(
        "append"
    ).partitionBy("date").parquet(raw_path)
    second = incremental_rollup_job(spark, raw_path, out_path)
    # the freshness guard worked: run 2 touched only new + lookback
    # partitions, never the full history
    if not first or not second or len(second) >= len(dates):
        raise RuntimeError(
            f"incremental runs degenerated: {len(first)} then "
            f"{len(second)} of {len(dates)} partitions"
        )
    shutil.rmtree(raw_path, ignore_errors=True)
    return spark.read.parquet(out_path).select(
        "metric",
        F.col("serviceName").alias("user"),
        F.col("timestamp").alias("bucket_ts"),
        F.round(F.col("value_min") * 100).cast("bigint").alias("min_cents"),
        F.round(F.col("value_max") * 100).cast("bigint").alias("max_cents"),
        "samples_count",
    )


EVENTS_ROLLUP_INC_SQL = f"""
SELECT event_type AS metric, user_id::VARCHAR AS user,
       time_bucket(INTERVAL 1 MINUTE, ts) AS bucket_ts,
       CAST(round(min(value) * 100) AS BIGINT) AS min_cents,
       CAST(round(max(value) * 100) AS BIGINT) AS max_cents,
       count(*) AS samples_count
FROM {_EV_SQL}
GROUP BY 1, 2, 3
"""

EXTRA7_QUERIES["events_rollup_incremental"] = events_rollup_incremental
EXTRA7_ORACLE["events_rollup_incremental"] = EVENTS_ROLLUP_INC_SQL
