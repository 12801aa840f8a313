"""Round-8 catalog extensions.

Three families:

- The streaming HISTOGRAM delta branch (T2/T3) as a driver-graded row
  (VERDICT r7 item 3): ``events_hist_delta_stream`` mirrors the
  ``events_delta_stream`` recipe with histogram-shaped rows — the
  count/sum/bucket state machine of ``converter/temporality.go:81-105``
  (reset on count decrease, the LastCount>0 / LastSum>0 guards, raw
  cumulative buckets carried as state) run as a REAL availableNow
  stream and graded against a DuckDB lag-window restatement on exact
  integer counts. Until now the histogram branch of the stream state
  UDF was pytest-pinned only; the sum branch got its row in r7.

- The PromQL front-end extended to the last driver-green kernels it
  had not yet reached from text (VERDICT r7 item 5): a graded
  ``delta()`` text row onto the last-minus-first kernel
  (events_delta_1h's contract), ``holt_winters()`` compiled onto the
  events_holt_winters exact fixed-point recursion at the (series,
  window) grain, and ``histogram_fraction()`` onto the
  events_histogram_fraction exact-ppm bucket arithmetic.

- Beyond-the-ask PromQL surface growth, one graded row each: the
  raw-unit scalar threshold (``promql_hot_windows``, the r8 unit-
  contract change), vector set operations and/unless/or (the
  alerting filter idiom), clamp_min/abs value functions, and
  subqueries ``fn(inner[R:S])`` over both double (rate) and integer
  (sum_over_time) inners.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.tables import _events

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"

EXTRA8_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA8_ORACLE: dict[str, str] = {}


# --------------------------------------------------------------------------
# Streaming histogram cumulative->delta (T2/T3) as a graded row
# --------------------------------------------------------------------------


def events_hist_delta_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-series HISTOGRAM cumulative->delta state machine run as
    a real stream: events shaped as cumulative histogram points —
    count = integer cents (non-monotonic, so real resets occur),
    sum = 3*cents, a fixed two-bucket ladder (le 10/50) with counts
    (cents//3, cents) — then streaming/pipeline.delta_convert_stream
    (``applyInPandasWithState`` keyed by series_hash, the count/sum/
    bucket branch of ``converter/temporality.go:81-105``: reset on
    count DECREASE emits the row raw, otherwise count/sum/bucket
    deltas against the carried raw cumulative point; first point
    as-is per ``test/temporality_test.go:51``), drained with
    availableNow and graded row-for-row against a DuckDB lag-window
    restatement.

    The corpus makes the guards degenerate-free: cents >= 1, so
    LastCount>0 and LastSum>0 always hold after the first point and
    the oracle needs no zero-state special case; the reference's
    guard semantics themselves are pinned by the zero-count golden
    tests in tests/test_temporality.py.

    Determinism: one staged parquet file -> one micro-batch; the
    state UDF concatenates all Arrow chunks of a series and sorts
    once (the r8 cross-chunk fix), so per-series order is the full
    (unique-timestamp) history regardless of chunking. Exactness:
    every graded column is a BIGINT delta of exact integers; bucket
    deltas surface as element_at columns so no array reaches the
    hash.

    Scale: state is ONE raw cumulative point (two scalars + the
    bucket array) per live series — the same bound as the sum branch;
    identical plan at 100 TB/day."""
    from clickhouse_metrics_pipeline_spark.schema import (
        METRIC_TYPE_HISTOGRAM,
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

    stream, src = _stage_events_stream(spark, sf_dir, "hist_delta_src_")
    c = F.round(F.col("value") * 100).cast("bigint")
    shaped = stream.select(
        F.xxhash64("event_type", "user_id").alias("series_hash"),
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("metric"),
        F.lit("default").alias("workspaceId"),
        F.col("user_id").cast("string").alias("serviceName"),
        F.lit(METRIC_TYPE_HISTOGRAM).cast("tinyint").alias("metric_type"),
        F.lit(TEMPORALITY_CUMULATIVE).cast("tinyint").alias("temporality"),
        F.lit(False).alias("is_monotonic"),
        F.lit(None).cast("double").alias("value"),
        c.alias("count"),
        # exact integers carried in the pipeline's double sum column
        (c * 3).cast("double").alias("sum"),
        F.array(F.lit(10.0), F.lit(50.0)).alias("buckets_le"),
        # nondecreasing in le for any single point (cents >= 1)
        F.array(F.floor(c / F.lit(3)).cast("bigint"), c).alias(
            "buckets_count"
        ),
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string")
        ).alias("attributes"),
        F.lit(None).cast(_EXEMPLARS_DDL).alias("exemplars"),
    )
    # state_ttl=False: same availableNow-drain contract as
    # events_delta_stream (a processing-time timeout would make the
    # drain schedule micro-batches forever)
    out = delta_convert_stream(shaped, state_ttl=False)
    out_dir = _drain_available_now(out, src, "hist_delta_stream_")
    return spark.read.parquet(out_dir).select(
        "metric",
        F.col("serviceName").alias("user"),
        F.col("timestamp").alias("ts"),
        F.col("count").alias("count_delta"),
        F.col("sum").cast("bigint").alias("sum_delta"),
        F.element_at("buckets_count", 1).alias("b10_delta"),
        F.element_at("buckets_count", 2).alias("b50_delta"),
    )


EVENTS_HIST_DELTA_STREAM_SQL = f"""
WITH s AS (
  SELECT event_type AS metric, user_id::VARCHAR AS user, ts,
         CAST(round(value * 100) AS BIGINT) AS c,
         lag(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY event_type, user_id ORDER BY ts, event_id
         ) AS prev
  FROM {_EV_SQL}
)
SELECT metric, user, ts,
       CASE WHEN prev IS NULL OR c < prev THEN c
            ELSE c - prev END AS count_delta,
       CASE WHEN prev IS NULL OR c < prev THEN c * 3
            ELSE (c - prev) * 3 END AS sum_delta,
       CASE WHEN prev IS NULL OR c < prev THEN c // 3
            ELSE c // 3 - prev // 3 END AS b10_delta,
       CASE WHEN prev IS NULL OR c < prev THEN c
            ELSE c - prev END AS b50_delta
FROM s
"""

EXTRA8_QUERIES["events_hist_delta_stream"] = events_hist_delta_stream
EXTRA8_ORACLE["events_hist_delta_stream"] = EVENTS_HIST_DELTA_STREAM_SQL


# --------------------------------------------------------------------------
# PromQL text: delta() onto the last-minus-first kernel
# --------------------------------------------------------------------------

PROMQL_DELTA_QUERY = "max by (event_type) (delta(events[1h]))"


def promql_delta_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text delta(): per (series, 1h window) last sample minus
    first sample in integer cents — the driver-green events_delta_1h
    kernel's contract ((ts, sample_id) order via min_by/max_by
    streaming aggregates, no per-group sort) — then max by event_type
    (the biggest-gauge-move panel). delta() has been in the grammar
    since r6; this row closes its text-path driver evidence (r7
    verdict item 5). One shuffle to the series-window grain; the
    by-re-aggregation is rollup-sized."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_DELTA_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_DELTA_SQL = f"""
WITH ranked AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER w_asc AS rn_a,
         row_number() OVER w_desc AS rn_d
  FROM {_EV_SQL}
  WINDOW w_asc AS (PARTITION BY event_type, user_id,
                                time_bucket(INTERVAL 60 MINUTE, ts)
                   ORDER BY ts, event_id),
         w_desc AS (PARTITION BY event_type, user_id,
                                 time_bucket(INTERVAL 60 MINUTE, ts)
                    ORDER BY ts DESC, event_id DESC)
), d AS (
  SELECT event_type, bucket_ts,
         max(CASE WHEN rn_d = 1 THEN c END)
           - max(CASE WHEN rn_a = 1 THEN c END) AS delta_c
  FROM ranked
  GROUP BY event_type, user_id, bucket_ts
)
SELECT event_type, bucket_ts, max(delta_c)::BIGINT AS value
FROM d GROUP BY 1, 2
"""

EXTRA8_QUERIES["promql_delta_by_type"] = promql_delta_by_type
EXTRA8_ORACLE["promql_delta_by_type"] = PROMQL_DELTA_SQL


# --------------------------------------------------------------------------
# PromQL text: holt_winters() in exact fixed-point
# --------------------------------------------------------------------------

PROMQL_HW_QUERY = "sum by (event_type) (holt_winters(events[6h], 0.3, 0.1))"


def promql_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text holt_winters(sel[6h], 0.3, 0.1): the
    events_holt_winters kernel's EXACT fixed-point double exponential
    smoothing at the (series, 6h window) grain — factors in
    thousandths, Prometheus init s0=y0 / b0=y1-y0, every /1000
    rescale floored by the shared _hw_fd arithmetic (token-identical
    in the DuckDB twin's recursive CTE) — emitting each window's
    final smoothed level in integer cents, summed by event_type.
    Scale: one shuffle to the series-window grain; the fold is a
    row-local array aggregate (state two bigints regardless of window
    length), the same in-row recurrence shape as the kernel."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_HW_QUERY, events_as_series(_events(spark, sf_dir))
    )


def _promql_hw_sql() -> str:
    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        _HW_SCALE,
        _HW_SF,
        _HW_TF,
        _hw_fd_sql,
    )

    keys = "o.event_type = hw.event_type AND o.user_id = hw.user_id AND o.bucket_ts = hw.bucket_ts"
    return f"""
WITH RECURSIVE o AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 360 MINUTE, ts) AS bucket_ts,
         CAST(round(value * 100) AS BIGINT) AS y,
         row_number() OVER w AS i,
         count(*) OVER (PARTITION BY event_type, user_id,
                        time_bucket(INTERVAL 360 MINUTE, ts)) AS n
  FROM {_EV_SQL}
  WINDOW w AS (PARTITION BY event_type, user_id,
                            time_bucket(INTERVAL 360 MINUTE, ts)
               ORDER BY ts, event_id)
), hw(event_type, user_id, bucket_ts, i, n, s, b) AS (
  SELECT o1.event_type, o1.user_id, o1.bucket_ts, 1::BIGINT, o1.n, o1.y,
         coalesce(o2.y - o1.y, 0::BIGINT)
  FROM o o1 LEFT JOIN o o2
    ON o2.event_type = o1.event_type AND o2.user_id = o1.user_id
   AND o2.bucket_ts = o1.bucket_ts AND o2.i = 2
  WHERE o1.i = 1
  UNION ALL
  SELECT event_type, user_id, bucket_ts, i, n, s2,
         CAST({_hw_fd_sql(f"{_HW_TF}*(s2 - s) + {_HW_SCALE - _HW_TF}*b")} AS BIGINT)
  FROM (
    SELECT o.event_type, o.user_id, o.bucket_ts, o.i, o.n, hw.s, hw.b,
           CAST({_hw_fd_sql(f"{_HW_SF}*o.y + {_HW_SCALE - _HW_SF}*(hw.s + hw.b)")} AS BIGINT) AS s2
    FROM hw JOIN o ON {keys} AND o.i = hw.i + 1
  )
)
SELECT event_type, bucket_ts, sum(s)::BIGINT AS value
FROM hw WHERE i = n GROUP BY 1, 2
"""


EXTRA8_QUERIES["promql_holt_winters"] = promql_holt_winters
EXTRA8_ORACLE["promql_holt_winters"] = _promql_hw_sql()


# --------------------------------------------------------------------------
# PromQL text: histogram_fraction() in exact ppm
# --------------------------------------------------------------------------

PROMQL_FRAC_QUERY = (
    "histogram_fraction(25, 100, sum by (event_type) "
    "(count_over_time(events[1h])))"
)


def promql_hist_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text histogram_fraction(25, 100, ...): the fraction of
    each (event_type, 1h) merged histogram's samples with
    25 < value <= 100, as truncated parts-per-million — the
    events_histogram_fraction kernel's exact-ppm arithmetic at the
    windowed merged-histogram grain. Both bounds sit on the fixed le
    ladder, where bucket cumulative counts ARE exact sample counts,
    so the engine counts raw samples directly (equal to the
    stored-bucket walk by construction; no interpolation). Map-side
    partial counts; one shuffle to the by-grain."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_FRAC_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_FRAC_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
       ((sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END)::BIGINT
         - sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)::BIGINT)
        * 1000000) // count(*) AS value
FROM {_EV_SQL}
GROUP BY 1, 2
"""

EXTRA8_QUERIES["promql_hist_fraction"] = promql_hist_fraction
EXTRA8_ORACLE["promql_hist_fraction"] = PROMQL_FRAC_SQL


# --------------------------------------------------------------------------
# PromQL text: raw-unit scalar threshold (the r8 behavior change)
# --------------------------------------------------------------------------

PROMQL_HOT_QUERY = "sum by (event_type) (sum_over_time(events[1h])) > 200"


def promql_hot_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL scalar comparison with RAW-unit semantics (r8 behavior
    change, r7 verdict item 4): '> 200' means 200 raw value units and
    compiles to a 20000-cent threshold on the cents-encoded side via
    encoding_scale(output_encoding(q)) — real PromQL's unit contract,
    where r7 read the scalar in encoding units (the driver-flagged
    trap). The comparison FILTERS the vector and keeps values
    unchanged (PromQL instant-vector comparison semantics)."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_HOT_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_HOT_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value
FROM {_EV_SQL}
GROUP BY 1, 2
HAVING sum(CAST(round(value * 100) AS BIGINT)) > 20000
"""

EXTRA8_QUERIES["promql_hot_windows"] = promql_hot_windows
EXTRA8_ORACLE["promql_hot_windows"] = PROMQL_HOT_SQL


# --------------------------------------------------------------------------
# PromQL vector set operations: and / unless / or
# --------------------------------------------------------------------------

PROMQL_AND_QUERY = (
    "sum by (event_type) (sum_over_time(events[1h])) and "
    "sum by (event_type) (count_over_time(events[1h])) > 4"
)


def promql_and_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL 'and' (vector intersection) with a comparison-filtered
    rhs — the alerting idiom "value where condition holds": hourly
    value sums (integer cents) kept only for (event_type, window)
    keys whose sample count exceeds 4. Comparison binds tighter than
    the set op (real PromQL precedence); the rhs scalar is raw-unit
    (count encoding, scale 1). Compiles to a semi join of two
    by-grain aggregated vectors — both sides tiny, AQE broadcasts."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_AND_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_AND_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value
FROM {_EV_SQL}
GROUP BY 1, 2
HAVING count(*) > 4
"""

EXTRA8_QUERIES["promql_and_threshold"] = promql_and_threshold
EXTRA8_ORACLE["promql_and_threshold"] = PROMQL_AND_SQL


PROMQL_UNLESS_QUERY = (
    "sum by (event_type) (count_over_time(events[1h])) unless "
    "sum by (event_type) (count_over_time(events[1h] offset 1d))"
)


def promql_unless_new_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL 'unless' (vector difference): hourly activity counts for
    (event_type, window) keys where the SAME window one day earlier
    had no samples — "new activity vs yesterday". The rhs offset
    shifts sample timestamps forward before bucketing (the engine's
    offset contract), so its key set is yesterday's windows projected
    onto today; the anti join removes them. Mixed encodings are fine
    for unless (rhs is only a key filter); here both are counts."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_UNLESS_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_UNLESS_SQL = f"""
WITH lhs AS (
  SELECT event_type,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         count(*)::BIGINT AS value
  FROM {_EV_SQL} GROUP BY 1, 2
), rhs AS (
  SELECT DISTINCT event_type,
         time_bucket(INTERVAL 60 MINUTE, ts) + INTERVAL 1 DAY AS bucket_ts
  FROM {_EV_SQL}
)
SELECT l.event_type, l.bucket_ts, l.value
FROM lhs l ANTI JOIN rhs r
  ON r.event_type = l.event_type AND r.bucket_ts = l.bucket_ts
"""

EXTRA8_QUERIES["promql_unless_new_activity"] = promql_unless_new_activity
EXTRA8_ORACLE["promql_unless_new_activity"] = PROMQL_UNLESS_SQL


PROMQL_OR_QUERY = (
    'sum by (event_type) (sum_over_time(events{user=~"1.*"}[1h])) or '
    "sum by (event_type) (sum_over_time(events[1h]))"
)


def promql_or_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL 'or' (vector union, lhs wins): hourly value sums over
    the user-1xx cohort where that cohort has samples, falling back
    to the all-users sum elsewhere — the dashboard fallback idiom.
    'or' merges values, so the parser requires equal output encodings
    (both sides cents here); matched keys keep the lhs value, the
    anti-joined rhs remainder fills in."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_OR_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_OR_SQL = f"""
WITH lhs AS (
  SELECT event_type,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value
  FROM {_EV_SQL}
  WHERE regexp_matches(user_id::VARCHAR, '^(?:1.*)$')
  GROUP BY 1, 2
), rhs AS (
  SELECT event_type,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value
  FROM {_EV_SQL} GROUP BY 1, 2
)
SELECT event_type, bucket_ts, value FROM lhs
UNION ALL
SELECT r.event_type, r.bucket_ts, r.value
FROM rhs r ANTI JOIN lhs l
  ON l.event_type = r.event_type AND l.bucket_ts = r.bucket_ts
"""

EXTRA8_QUERIES["promql_or_fallback"] = promql_or_fallback
EXTRA8_ORACLE["promql_or_fallback"] = PROMQL_OR_SQL


# --------------------------------------------------------------------------
# PromQL value functions: clamp_min / abs
# --------------------------------------------------------------------------

PROMQL_CLAMP_QUERY = (
    "clamp_min(sum by (event_type) (sum_over_time(events[1h])), 50)"
)


def promql_clamp_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL clamp_min(): hourly value sums floored at 50 RAW units —
    the bound is integer raw units scaled into the side's encoding at
    compile time (5000 cents here), the same raw-unit rule as the
    trailing scalar (r8 unit contract). Row-local integer GREATEST
    over the aggregated vector; encoding unchanged."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_CLAMP_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_CLAMP_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
       greatest(sum(CAST(round(value * 100) AS BIGINT)), 5000)::BIGINT
         AS value
FROM {_EV_SQL}
GROUP BY 1, 2
"""

EXTRA8_QUERIES["promql_clamp_floor"] = promql_clamp_floor
EXTRA8_ORACLE["promql_clamp_floor"] = PROMQL_CLAMP_SQL


PROMQL_ABS_QUERY = "abs(min by (event_type) (delta(events[1h])))"


def promql_abs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL abs() over the most-negative per-type windowed delta:
    per (series, 1h window) last-minus-first cents, min by event_type
    (the biggest drop), absolute value — the gauge-swing-magnitude
    panel. Row-local integer abs; cents encoding unchanged."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_ABS_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_ABS_SQL = f"""
WITH ranked AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 60 MINUTE, ts) AS bucket_ts,
         CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER w_asc AS rn_a,
         row_number() OVER w_desc AS rn_d
  FROM {_EV_SQL}
  WINDOW w_asc AS (PARTITION BY event_type, user_id,
                                time_bucket(INTERVAL 60 MINUTE, ts)
                   ORDER BY ts, event_id),
         w_desc AS (PARTITION BY event_type, user_id,
                                 time_bucket(INTERVAL 60 MINUTE, ts)
                    ORDER BY ts DESC, event_id DESC)
), d AS (
  SELECT event_type, bucket_ts,
         max(CASE WHEN rn_d = 1 THEN c END)
           - max(CASE WHEN rn_a = 1 THEN c END) AS delta_c
  FROM ranked
  GROUP BY event_type, user_id, bucket_ts
)
SELECT event_type, bucket_ts, abs(min(delta_c))::BIGINT AS value
FROM d GROUP BY 1, 2
"""

EXTRA8_QUERIES["promql_abs_delta"] = promql_abs_delta
EXTRA8_ORACLE["promql_abs_delta"] = PROMQL_ABS_SQL


# --------------------------------------------------------------------------
# PromQL subqueries: fn(inner[R:S])
# --------------------------------------------------------------------------

PROMQL_SUBQ_RATE_QUERY = (
    "max by (event_type) (max_over_time(rate(events[5m])[1h:5m]))"
)


def promql_subquery_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL subquery max_over_time(rate(x[5m])[1h:5m]): the WORST
    5-minute rate inside each hour, per series, max by event_type —
    the burst-detection idiom subqueries exist for. The inner rate
    rides the full boundary-extrapolation kernel (functions/rate.py,
    the events_rate_5m contract), integerizes to micro-units (the
    by-agg rule), and the outer stage windows the already-reduced
    per-(series, 5m) results at 1h — rollup-sized regardless of raw
    volume. Subset bounds: step == inner range, R a multiple of S
    (see the subq grammar rule)."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_SUBQ_RATE_QUERY, events_as_series(_events(spark, sf_dir))
    )


def _promql_subq_rate_sql() -> str:
    from clickhouse_metrics_pipeline_spark.workloads_ext2 import (
        EVENTS_RATE_SQL,
    )

    return f"""
SELECT event_type,
       time_bucket(INTERVAL 60 MINUTE, bucket_ts) AS bucket_ts,
       max(CAST(round(rate * 1000000) AS BIGINT))::BIGINT AS value
FROM ({EVENTS_RATE_SQL}) rs
WHERE rate IS NOT NULL
GROUP BY 1, 2
"""


EXTRA8_QUERIES["promql_subquery_max_rate"] = promql_subquery_max_rate
EXTRA8_ORACLE["promql_subquery_max_rate"] = _promql_subq_rate_sql()


PROMQL_SUBQ_PEAK_QUERY = (
    "sum by (event_type) "
    "(max_over_time(sum_over_time(events[30m])[3h:30m]))"
)


def promql_subquery_peak_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PromQL subquery over an integer inner:
    max_over_time(sum_over_time(x[30m])[3h:30m]) — each series' PEAK
    30-minute value volume (integer cents) within every 3-hour
    window, summed by event_type: the capacity-headroom panel. Pure
    integer end to end; the outer max runs over series x 6 inner
    windows per range."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_SUBQ_PEAK_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_SUBQ_PEAK_SQL = f"""
WITH inner_w AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 30 MINUTE, ts) AS sub_ts,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
  FROM {_EV_SQL}
  GROUP BY 1, 2, 3
), outer_w AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 180 MINUTE, sub_ts) AS bucket_ts,
         max(cents) AS peak
  FROM inner_w
  GROUP BY 1, 2, 3
)
SELECT event_type, bucket_ts, sum(peak)::BIGINT AS value
FROM outer_w GROUP BY 1, 2
"""

EXTRA8_QUERIES["promql_subquery_peak_volume"] = promql_subquery_peak_volume
EXTRA8_ORACLE["promql_subquery_peak_volume"] = PROMQL_SUBQ_PEAK_SQL
