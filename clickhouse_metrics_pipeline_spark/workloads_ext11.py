"""Round-11 catalog extensions — the r10 verdict's two named
native-histogram text completions, plus two of its "smaller
text-path residuals" promoted into the subset (scalar division,
``promql_per_second_avg``; group_right, ``promql_group_right_ratio``
— both below):

- **increase() inside histogram_quantile** (verdict item 5 —
  Grafana's other canonical latency-panel spelling,
  ``histogram_quantile(0.95, sum(increase(x_bucket[5m])) by (le))``):
  ``promql_increase_bucket_p95`` compiles the increase form over the
  same stored CUMULATIVE bucket-counter frame as the r10 rate row —
  the extrapolatedRate kernel in increase mode (rate × range on the
  same micro-units, ``functions/rate.py mode='increase'``), then the
  identical cross-series micro-unit sum and exact-integer prometheus
  walk. The walk is scale-free in the counts, so the quantile agrees
  with the rate form up to micro-unit rounding.

- **histogram_fraction over exp-histograms** (verdict item 6 — the
  last native-histogram read not reachable from text):
  ``promql_exp_hist_fraction`` routes a two-bound fraction over a
  frame carrying exp-histogram columns onto the H7 min-scale merge +
  a two-bound cumulative-mass difference
  (``functions/histogram.exp_histogram_fraction``), truncated-ppm
  BIGINT output like the classic fraction rows. The fixture mixes
  scales 0 and −1 (the merge's floor-div downscale runs for real) and
  puts both bounds ON bucket edges — powers of two, exact at either
  scale — so every mass term is an exactly-representable double and
  the ppm floor is engine-invariant (the in-bucket interpolation
  branch is pinned separately by pytest at scale 0, where edges and
  offsets are binary-exact).

Scale notes: the increase row shares the rate row's shape — shuffle 1
on (series ⊗ le, window) with ladder-bounded fan-out, shuffle 2 the
map-side-combinable (by, window, le) sum. The fraction row is the A6
rollup-merge shape plus a row-local HOF over O(indexes) entries.
``py=0`` throughout.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.tables import _events, frame_memo
from clickhouse_metrics_pipeline_spark.workloads_ext10 import (
    _cum_bucket_series_frame,
    _rate_bucket_sql,
)

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"

EXTRA11_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA11_ORACLE: dict[str, str] = {}


# --------------------------------------------------------------------------
# increase() inside histogram_quantile (r10 verdict item 5)
# --------------------------------------------------------------------------

PROMQL_INCREASE_BUCKET_QUERY = (
    "histogram_quantile(0.95, "
    "sum by (event_type) (increase(hist_requests[1d])))"
)


def promql_increase_bucket_p95(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_quantile(0.95, sum by (t) (increase(x[1d]))) from
    text over stored cumulative bucket arrays — the r10 verdict's
    "most likely real-dashboard string still rejected". Same plan as
    the driver-green rate form with the kernel in increase mode
    (extrapolated increase = rate × range before the micro-unit
    re-expression); the DuckDB twin restates the same kernel with the
    /range division dropped. Output BIGINT p95 × 10000."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        PROMQL_INCREASE_BUCKET_QUERY,
        _cum_bucket_series_frame(spark, sf_dir),
    )


EXTRA11_QUERIES["promql_increase_bucket_p95"] = promql_increase_bucket_p95
EXTRA11_ORACLE["promql_increase_bucket_p95"] = _rate_bucket_sql(
    mode="increase", phi=95
)


# --------------------------------------------------------------------------
# histogram_fraction over exp-histograms (r10 verdict item 6)
# --------------------------------------------------------------------------

PROMQL_EXP_FRACTION_QUERY = (
    "histogram_fraction(4, 16, "
    "sum by (event_type) (count_over_time(exp_latency[1d])))"
)


@frame_memo  # r12: plan-construction memo (see tables.frame_memo)
def _exp_frac_series_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events reshaped as an exp-histogram series frame for the
    fraction read: scale alternates 0 / −1 by user (scale −1 buckets
    are powers of FOUR, so the H7 min-scale downscale shifts the
    scale-0 indexes by floor-div 2 for real), two positive buckets per
    sample at indexes (event_id%3, event_id%3+2) with small
    deterministic counts, and a 0/1 zero-count. Both query bounds
    (4, 16) are bucket EDGES at either scale — powers of two, exact
    doubles — so the fraction's mass terms restate exactly in
    DuckDB."""
    ev = _events(spark, sf_dir)
    i0 = (F.col("event_id") % 3).cast("int")
    c0 = ((F.col("event_id") + F.col("user_id")) % 3 + 1).cast("bigint")
    c1 = (F.col("user_id") % 5 + 1).cast("bigint")
    return ev.select(
        F.lit("exp_latency").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type")), F.array(F.col("event_type"))
        ).alias("attributes"),
        F.col("ts"),
        F.col("value"),
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


def promql_exp_hist_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_fraction(4, 16, ...) from text over EXP-histogram
    columns: the native-histogram fraction (Prometheus supports
    histogram_fraction on native histograms; the reference delegates
    PromQL to downstream Prometheus — this is the engine-side
    completion). H7 min-scale merge per (event_type, day), then the
    two-bound cumulative-mass difference; bounds sit on bucket edges,
    so no in-bucket interpolation fires and every term is integer
    mass in exact doubles. Output truncated ppm BIGINT."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        PROMQL_EXP_FRACTION_QUERY, _exp_frac_series_frame(spark, sf_dir)
    )


_EXP_FRACTION_SQL = f"""
WITH base AS (
  SELECT event_type, time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         (-(user_id % 2))::INT AS scale,
         (event_id % 2)::BIGINT AS zc,
         (event_id % 3)::INT AS i0,
         ((event_id + user_id) % 3 + 1)::BIGINT AS c0,
         ((user_id % 5) + 1)::BIGINT AS c1
  FROM {_EV_SQL}
), ms AS (
  SELECT event_type, bucket_ts, min(scale) AS min_scale
  FROM base GROUP BY 1, 2
), expl AS (
  SELECT b.event_type, b.bucket_ts, ms.min_scale,
         floor(b.i0 / pow(2, b.scale - ms.min_scale))::INT AS idx,
         b.c0 AS cnt
  FROM base b JOIN ms USING (event_type, bucket_ts)
  UNION ALL
  SELECT b.event_type, b.bucket_ts, ms.min_scale,
         floor((b.i0 + 2) / pow(2, b.scale - ms.min_scale))::INT,
         b.c1
  FROM base b JOIN ms USING (event_type, bucket_ts)
), pos AS (
  SELECT event_type, bucket_ts, min_scale, idx, sum(cnt)::BIGINT AS cnt
  FROM expl GROUP BY 1, 2, 3, 4
), zeros AS (
  SELECT event_type, bucket_ts, sum(zc)::BIGINT AS zcnt
  FROM base GROUP BY 1, 2
), masses AS (
  SELECT p.event_type, p.bucket_ts,
         sum(p.cnt) AS pos_total,
         sum(p.cnt) FILTER (
           WHERE pow(pow(2, pow(2, -p.min_scale)), p.idx + 1) <= 16.0
         ) AS m_hi_pos,
         sum(p.cnt) FILTER (
           WHERE pow(pow(2, pow(2, -p.min_scale)), p.idx + 1) <= 4.0
         ) AS m_lo_pos
  FROM pos p GROUP BY 1, 2
)
SELECT m.event_type, m.bucket_ts,
       CAST(floor(
         ((coalesce(m.m_hi_pos, 0) - coalesce(m.m_lo_pos, 0))::DOUBLE
          * 1000000.0)
         / (z.zcnt + m.pos_total)::DOUBLE
       ) AS BIGINT) AS value
FROM masses m JOIN zeros z USING (event_type, bucket_ts)
"""

EXTRA11_QUERIES["promql_exp_hist_fraction"] = promql_exp_hist_fraction
EXTRA11_ORACLE["promql_exp_hist_fraction"] = _EXP_FRACTION_SQL


# --------------------------------------------------------------------------
# Scalar division (r11 — closing a named subset residual)
# --------------------------------------------------------------------------

PROMQL_PER_SECOND_QUERY = (
    "sum by (event_type) (sum_over_time(events[1d])) / 86400"
)


def promql_per_second_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar division from text — `sum_over_time(...[1d]) / 86400`,
    the per-second-average idiom (the r10 verdict's "scalar division"
    residual, now in the subset): the daily cents sum becomes
    sign-truncated (value x 1e6) DIV 86400 through the exact decimal
    divider, carried under the composite 'value_x100/ppm' encoding
    (raw read-back = daily_sum / 86400). The divisor N lives in the
    stored value, not the scale, so the twin restates the identical
    HUGEINT expression."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_PER_SECOND_QUERY, events_as_series(_events(spark, sf_dir))
    )


_PER_SECOND_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
       CAST(
         (sum(CAST(round(value * 100) AS BIGINT))::HUGEINT * 1000000)
         // 86400
       AS BIGINT) AS value
FROM {_EV_SQL}
GROUP BY 1, 2
"""

EXTRA11_QUERIES["promql_per_second_avg"] = promql_per_second_avg
EXTRA11_ORACLE["promql_per_second_avg"] = _PER_SECOND_SQL


# --------------------------------------------------------------------------
# group_right vector matching (r11 — closing a named subset residual)
# --------------------------------------------------------------------------

PROMQL_GROUP_RIGHT_QUERY = (
    "sum by (event_type) (count_over_time(events[1d])) "
    "/ on(event_type) group_right "
    "sum by (event_type, user) (count_over_time(events[1d]))"
)


def promql_group_right_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``group_right`` from text (the r10 verdict's "group_right is
    rejected with a swap-the-sides hint" residual, now accepted): the
    exact mirror of the driver-green promql_share_of_type — the many
    side is the RIGHT one, so the user's spelled order total/per-user
    emits the INVERSE share per (event_type, user, day) without any
    manual side-swapping. Desugared at parse time into the swapped
    group_left BinQuery with ``swapped=True``; '/' reads its
    numerator from the user's LEFT (the one side), pinned by this
    row's hand-ordered twin. Same plan as group_left: two branches
    of one scan reduced to their by-grains, broadcast-sized join."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_GROUP_RIGHT_QUERY, events_as_series(_events(spark, sf_dir))
    )


_GROUP_RIGHT_SQL = f"""
WITH per_user AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS "user",
         time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         count(*)::BIGINT AS c
  FROM {_EV_SQL} GROUP BY 1, 2, 3
), per_type AS (
  SELECT event_type, bucket_ts, sum(c)::BIGINT AS tc
  FROM per_user GROUP BY 1, 2
)
SELECT p.event_type, p."user", p.bucket_ts,
       ((t.tc * 1000000) // p.c)::BIGINT AS value
FROM per_user p JOIN per_type t USING (event_type, bucket_ts)
"""

EXTRA11_QUERIES["promql_group_right_ratio"] = promql_group_right_ratio
EXTRA11_ORACLE["promql_group_right_ratio"] = _GROUP_RIGHT_SQL


# --------------------------------------------------------------------------
# rate() inside histogram_fraction (r11 — the canonical native-
# histogram fraction spelling, classic + exp)
# --------------------------------------------------------------------------

PROMQL_RATE_FRACTION_QUERY = (
    "histogram_fraction(25, 200, "
    "sum by (event_type) (rate(hist_requests[1d])))"
)


def promql_rate_hist_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_fraction(lo, hi, sum by (t) (rate(x[1d]))) over
    stored CUMULATIVE bucket counters — Prometheus's canonical
    histogram_fraction spelling composes rate() inside (r11; the
    count_over_time form was the r8/r10 subset). Same shared rated
    merge as the driver-green rate quantile
    (plans/promql._stored_bucket_rate_merged), then
    ``bucket_fraction_ppm`` — the exact rational two-bound difference
    over micro-rate counts; bounds 25/200 sit ON the stored ladder,
    the D=1 exact-count case the HUGEINT twin restates directly.
    Output truncated-ppm BIGINT."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )
    from clickhouse_metrics_pipeline_spark.workloads_ext10 import (
        _cum_bucket_series_frame,
    )

    return compile_promql(
        PROMQL_RATE_FRACTION_QUERY,
        _cum_bucket_series_frame(spark, sf_dir),
    )


EXTRA11_QUERIES["promql_rate_hist_fraction"] = promql_rate_hist_fraction
EXTRA11_ORACLE["promql_rate_hist_fraction"] = _rate_bucket_sql(
    frac=(25.0, 200.0)
)


PROMQL_EXP_RATE_FRACTION_QUERY = (
    "histogram_fraction(4, 16, "
    "sum by (event_type) (rate(exp_requests_cum[1d])))"
)


def promql_exp_rate_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_fraction(4, 16, sum by (t) (rate(exp[1d]))) over
    TIME-cumulative EXP-histogram counters — the native-histogram
    fraction with rate() inside, completing the read matrix
    {quantile, fraction} x {count_over_time, rate} x {classic, exp}.
    The identical rated min-scale merge as the driver-gate-green
    promql_exp_rate_p95 (per-(series, sign, index) extrapolatedRate
    -> micro-units -> H7 floor-div merge), with the two-bound
    cumulative-mass difference replacing the H6 walk; bounds 4/16
    are bucket edges at both fixture scales, so every mass term is
    an exact integer micro-rate sum. Twin = the exp-rate twin's
    prefix with the walk CTEs swapped for the same mass difference.
    Output truncated-ppm BIGINT."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )
    from clickhouse_metrics_pipeline_spark.workloads_ext10 import (
        _cum_exp_series_frame,
    )

    return compile_promql(
        PROMQL_EXP_RATE_FRACTION_QUERY,
        _cum_exp_series_frame(spark, sf_dir),
    )


def _exp_rate_fraction_sql() -> str:
    """The exp-rate twin with its walk tail (uni/w/arg_min CTEs)
    replaced by the two-bound mass difference — the prefix through
    ``zeros`` (slots -> extrapolatedRate -> micro -> min-scale shift
    -> pos/zeros) is shared verbatim with _EXP_RATE_SQL."""
    from clickhouse_metrics_pipeline_spark.workloads_ext10 import (
        _EXP_RATE_SQL,
    )

    marker = "), uni AS ("
    prefix = _EXP_RATE_SQL.split(marker)[0]
    return prefix + """), totals AS (
  SELECT p.event_type, p.bucket_ts, z.cnt AS zcnt,
         sum(p.cnt) AS pos_total,
         sum(p.cnt) FILTER (
           WHERE pow(pow(2, pow(2, -p.min_scale)), p.idx + 1) <= 16.0
         ) AS hi_pos,
         sum(p.cnt) FILTER (
           WHERE pow(pow(2, pow(2, -p.min_scale)), p.idx + 1) <= 4.0
         ) AS lo_pos
  FROM pos p JOIN zeros z USING (event_type, bucket_ts)
  GROUP BY 1, 2, 3
)
SELECT event_type, bucket_ts,
       CAST(floor(
         (coalesce(hi_pos, 0) - coalesce(lo_pos, 0))::DOUBLE
         * 1000000.0 / (zcnt + pos_total)::DOUBLE
       ) AS BIGINT) AS value
FROM totals
"""


EXTRA11_QUERIES["promql_exp_rate_fraction"] = promql_exp_rate_fraction
EXTRA11_ORACLE["promql_exp_rate_fraction"] = _exp_rate_fraction_sql()
