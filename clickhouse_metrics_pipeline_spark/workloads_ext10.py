"""Round-10 catalog extensions.

Four rows: three closing the r9 verdict's last text-path gaps, plus
the ``@`` modifier (a named subset residual) beyond the ask:

- **rate() inside stored-bucket histogram_quantile** (verdict item 3
  — the canonical Grafana latency-panel idiom):
  ``promql_rate_bucket_p95`` compiles
  ``histogram_quantile(0.95, sum by (t) (rate(x[1d])))`` against a
  series frame carrying TIME-cumulative bucket-counter arrays — per
  (series, le) extrapolatedRate (the driver-green ``functions/rate.py``
  kernel), micro-unit integer re-expression, cross-series sum, then
  the exact-integer prometheus-mode H1 walk. Real Prometheus rates
  le-CUMULATIVE ``_bucket`` series; this engine's arrays are le-delta,
  so each per-bucket counter is rated directly (documented divergence,
  ``plans/promql._stored_bucket_rate_quantile_plan``).

- **Exp-histograms from PromQL text** (verdict item 4 — the
  native-histogram read path): ``promql_exp_hist_p99`` routes
  ``histogram_quantile(0.99, sum by (t) (count_over_time(x[1d])))``
  over a frame carrying exp-histogram columns onto the H7 min-scale
  merge (floor-div downscale) + H6 midpoint walk
  (``functions/histogram.py:393``, both driver-green as kernels).

- **Raw-ladder fallback pin** (r9 ADVICE item as a graded row):
  ``promql_quantile_raw_fallback`` runs a quantile over a frame whose
  bucket columns EXIST but are NULL for the matched metric — the
  compile-time probe must fall back to the raw-value ladder path
  instead of answering empty.

- **`@` modifier** (``promql_at_modifier``): ``sel[r] @ T`` pins
  evaluation to the grid window containing T — compiled as a
  bucket_ts filter on the output grid (a groupBy key, so Catalyst
  pushes it below the aggregation).

Scale notes: the rate-bucket row's shuffle 1 lands on (series x le,
window) — the rate kernel's single shuffle with ladder-bounded
fan-out; shuffle 2 is the map-side-combinable (by, window, le) sum.
The exp row is the A6 rollup-merge shape (explode, per-index partial
sums). ``py=0`` throughout.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.oracle_fragments import (
    LE_SQL,
    hist_walk_prom_scaled_sql,
)
from clickhouse_metrics_pipeline_spark.tables import _events, frame_memo

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"

EXTRA10_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA10_ORACLE: dict[str, str] = {}


# --------------------------------------------------------------------------
# histogram_quantile over rate() of stored CUMULATIVE buckets (r9 item 3)
# --------------------------------------------------------------------------

PROMQL_RATE_BUCKET_QUERY = (
    "histogram_quantile(0.95, "
    "sum by (event_type) (rate(hist_requests[1d])))"
)

_LES10 = [10.0, 25.0, 50.0, 100.0, 200.0, 500.0]


@frame_memo  # r12: plan-construction memo (see tables.frame_memo)
def _cum_bucket_series_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events reshaped as a stored CUMULATIVE-histogram frame: one
    series per (event_type, host=user_id%4), each sample carrying the
    fixed le ladder with per-bucket TIME-CUMULATIVE counters
    ``(unix(ts) * (1 + j + host)) div 7`` — monotone in ts per series
    (rate's counter contract), consistent across rows sharing a
    timestamp, and restatable in DuckDB with integer arithmetic.
    event_id rides along as sample_id (the rate kernel's tiebreak)."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        static_series_key,
    )

    ev = _events(spark, sf_dir)
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
    return ev.select(
        F.lit("hist_requests").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type"), F.lit("host")),
            F.array(F.col("event_type"), host),
        ).alias("attributes"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("sample_id"),
        F.array(*[F.lit(le) for le in _LES10]).alias("buckets_le"),
        counts.alias("buckets_count"),
        static_series_key(
            "hist_requests",
            {"event_type": F.col("event_type"), "host": host},
        ).alias("_series_key"),
    )


def promql_rate_bucket_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile(0.95, sum by (t) (rate(x[1d]))) from text
    over stored cumulative bucket arrays — per-(series, le) Prometheus
    extrapolatedRate, BIGINT micro-unit sum across series, then the
    exact-integer prometheus walk. Closes the canonical-dashboard form
    the r9 verdict named as the most common real string not yet
    parseable (the reference's read loop re-cumulates stored buckets
    for exactly this, promread/handler.go:177-205). Output BIGINT
    p95 x10000."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        PROMQL_RATE_BUCKET_QUERY, _cum_bucket_series_frame(spark, sf_dir)
    )


def _rate_bucket_sql(
    mode: str = "rate",
    phi: int = 95,
    frac: tuple[float, float] | None = None,
) -> str:
    """extrapolatedRate twin over per-le cumulative bucket counters;
    ``mode='increase'`` (r11) drops the /range division — the kernel's
    increase form — before the same micro-unit sum and walk.
    ``frac=(lo, hi)`` (r11) swaps the walk for the on-ladder
    two-bound fraction: floor((cum_hi - cum_lo) * 1e6 / total) in
    HUGEINT — bucket_fraction_ppm's D=1 exact-count case."""
    les = ", ".join(
        f"({j}, {le})" for j, le in enumerate(_LES10)
    )
    div = "/ 86400.0" if mode == "rate" else ""
    tail = _rate_bucket_tail(phi, frac)
    return f"""
WITH le(j, le) AS (
  VALUES {les}
), base AS (
  SELECT event_type, (user_id % 4) AS h, le.le AS le, le.j AS j,
         ts, event_id,
         (((epoch_us(ts) // 1000000) * (1 + le.j + (user_id % 4)))
          // 7)::DOUBLE AS v,
         time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         lag((((epoch_us(ts) // 1000000) * (1 + le.j + (user_id % 4)))
              // 7)::DOUBLE) OVER wb AS prev_v,
         row_number() OVER wb AS rn_a,
         row_number() OVER (PARTITION BY event_type, user_id % 4, le.j,
                                         time_bucket(INTERVAL 1 DAY, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM {_EV_SQL} CROSS JOIN le
  WINDOW wb AS (PARTITION BY event_type, user_id % 4, le.j,
                             time_bucket(INTERVAL 1 DAY, ts)
                ORDER BY ts, event_id)
), agg AS (
  SELECT event_type, h, le, bucket_ts,
         count(*) AS n_samples,
         max(CASE WHEN rn_a = 1 THEN v END) AS first_v,
         max(CASE WHEN rn_d = 1 THEN v END) AS last_v,
         epoch_us(min(ts)) / 1e6 AS first_s,
         epoch_us(max(ts)) / 1e6 AS last_s,
         sum(CASE WHEN prev_v IS NOT NULL AND v < prev_v
                  THEN prev_v ELSE 0.0 END) AS corr
  FROM base GROUP BY 1, 2, 3, 4
), ext AS (
  SELECT *,
         epoch(bucket_ts)::DOUBLE AS range_start,
         last_v - first_v + corr AS result_v,
         last_s - first_s AS sampled,
         (last_s - first_s) / (n_samples - 1) AS avg_iv
  FROM agg
), ext2 AS (
  SELECT *,
         (CASE WHEN result_v > 0 AND first_v >= 0
                    AND sampled * (first_v / result_v)
                        < first_s - range_start
               THEN sampled * (first_v / result_v)
               ELSE first_s - range_start END) AS dur_start,
         range_start + 86400.0 - last_s AS dur_end
  FROM ext
), rates AS (
  SELECT event_type, bucket_ts, le,
         CASE WHEN n_samples >= 2 AND sampled > 0 THEN
           round(result_v
                 * ((sampled
                     + (CASE WHEN dur_start < avg_iv * 1.1
                             THEN dur_start ELSE avg_iv / 2 END)
                     + (CASE WHEN dur_end < avg_iv * 1.1
                             THEN dur_end ELSE avg_iv / 2 END))
                    / sampled)
                 {div}, 6)
         END AS rate
  FROM ext2
), counts AS (
  SELECT event_type, bucket_ts, le,
         sum(CAST(round(rate * 1000000) AS BIGINT))::BIGINT AS cnt
  FROM rates WHERE rate IS NOT NULL
  GROUP BY 1, 2, 3
), w AS (
  SELECT event_type, bucket_ts, le, cnt,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts
                        ORDER BY le) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts) AS total,
         lag(le, 1, 0.0) OVER (PARTITION BY event_type, bucket_ts
                               ORDER BY le) AS prev
  FROM counts
)
{tail}
"""


def _rate_bucket_tail(
    phi: int, frac: tuple[float, float] | None
) -> str:
    if frac is None:
        return f"""SELECT event_type, bucket_ts,
       {hist_walk_prom_scaled_sql(phi)} AS value
FROM w GROUP BY event_type, bucket_ts"""
    lo, hi = frac
    return f"""SELECT event_type, bucket_ts,
       CAST(((coalesce(max(CASE WHEN le <= {hi} THEN cum END), 0)
              - coalesce(max(CASE WHEN le <= {lo} THEN cum END), 0))::HUGEINT
             * 1000000) // max(total) AS BIGINT) AS value
FROM w GROUP BY event_type, bucket_ts"""


EXTRA10_QUERIES["promql_rate_bucket_p95"] = promql_rate_bucket_p95
EXTRA10_ORACLE["promql_rate_bucket_p95"] = _rate_bucket_sql()


# --------------------------------------------------------------------------
# Exp-histograms from PromQL text (r9 verdict item 4)
# --------------------------------------------------------------------------

PROMQL_EXP_HIST_QUERY = (
    "histogram_quantile(0.99, "
    "sum by (event_type) (count_over_time(exp_requests[1d])))"
)


@frame_memo  # r12: plan-construction memo (see tables.frame_memo)
def _exp_series_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events reshaped as an exp-histogram series frame: scale
    alternates 0/1 by user (so the merge exercises the H7 min-scale
    floor-div downscale), two positive buckets per sample at indexes
    (event_id%4, event_id%4+2) with small deterministic counts, and a
    0/1 zero-count — all integer-restatable in DuckDB."""
    ev = _events(spark, sf_dir)
    i0 = (F.col("event_id") % 4).cast("int")
    c0 = ((F.col("event_id") + F.col("user_id")) % 3 + 1).cast("bigint")
    c1 = (F.col("user_id") % 5 + 1).cast("bigint")
    return ev.select(
        F.lit("exp_requests").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type")), F.array(F.col("event_type"))
        ).alias("attributes"),
        F.col("ts"),
        F.col("value"),
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


def promql_exp_hist_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile from text over EXP-histogram columns: the
    native-histogram read path (real Prometheus exposes native
    histograms through the same histogram_quantile call). Routes onto
    the driver-green H7 merge (min-scale floor-div downscale,
    functions/histogram.py:393) and H6 midpoint walk per (event_type,
    day). Output BIGINT round(midpoint x10000) — scale-0 midpoints are
    1.5*2^idx, exactly representable."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        PROMQL_EXP_HIST_QUERY, _exp_series_frame(spark, sf_dir)
    )


_EXP_HIST_P99_SQL = f"""
WITH base AS (
  SELECT event_type, time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         (user_id % 2)::INT AS scale,
         (event_id % 2)::BIGINT AS zc,
         (event_id % 4)::INT AS i0,
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
  SELECT event_type, bucket_ts, sum(zc)::BIGINT AS cnt
  FROM base GROUP BY 1, 2
), uni AS (
  SELECT event_type, bucket_ts, 0.0 AS v, cnt, -1e9 AS ord
  FROM zeros
  UNION ALL
  SELECT event_type, bucket_ts,
         (pow(pow(2, pow(2, -min_scale)), idx)
          + pow(pow(2, pow(2, -min_scale)), idx + 1)) / 2 AS v,
         cnt, idx::DOUBLE AS ord
  FROM pos
), w AS (
  SELECT event_type, bucket_ts, v, cnt, ord,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts
                        ORDER BY ord) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts) AS total
  FROM uni
)
SELECT event_type, bucket_ts,
       CAST(round(arg_min(v, ord)
                  FILTER (WHERE cum >= total * 99 / 100.0) * 10000)
            AS BIGINT) AS value
FROM w GROUP BY event_type, bucket_ts
"""

EXTRA10_QUERIES["promql_exp_hist_p99"] = promql_exp_hist_p99
EXTRA10_ORACLE["promql_exp_hist_p99"] = _EXP_HIST_P99_SQL


# --------------------------------------------------------------------------
# Raw-ladder fallback as a graded row (r9 ADVICE item)
# --------------------------------------------------------------------------

PROMQL_RAW_FALLBACK_QUERY = (
    "histogram_quantile(0.90, "
    "sum by (event_type) (count_over_time(gauge_like[1d])))"
)


@frame_memo  # r12: plan-construction memo (see tables.frame_memo)
def _null_bucket_series_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A metrics_raw-shaped frame (bucket columns PRESENT) whose
    matched metric carries no bucket arrays at all — the gauge case
    the r9 ADVICE item named."""
    ev = _events(spark, sf_dir)
    return ev.select(
        F.lit("gauge_like").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type")), F.array(F.col("event_type"))
        ).alias("attributes"),
        F.col("ts"),
        F.col("value"),
        F.lit(None).cast("array<double>").alias("buckets_le"),
        F.lit(None).cast("array<bigint>").alias("buckets_count"),
    )


def promql_quantile_raw_fallback(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r9 ADVICE item pinned as a graded row: a quantile over a
    bucket-column-bearing frame whose metric has only NULL bucket
    arrays must compile to the raw-value ladder plan (the compile-time
    limit(1) probe), answering the same merged-histogram walk the
    bucket-free frame gets — never an empty result."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        PROMQL_RAW_FALLBACK_QUERY, _null_bucket_series_frame(spark, sf_dir)
    )


_RAW_FALLBACK_SQL = f"""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         {LE_SQL} AS le, count(*)::BIGINT AS cnt
  FROM {_EV_SQL} GROUP BY 1, 2, 3
), w AS (
  SELECT event_type, bucket_ts, le, cnt,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts
                        ORDER BY le) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts) AS total,
         lag(le, 1, 0.0) OVER (PARTITION BY event_type, bucket_ts
                               ORDER BY le) AS prev
  FROM b
)
SELECT event_type, bucket_ts,
       {hist_walk_prom_scaled_sql(90)} AS value
FROM w GROUP BY event_type, bucket_ts
"""

EXTRA10_QUERIES["promql_quantile_raw_fallback"] = promql_quantile_raw_fallback
EXTRA10_ORACLE["promql_quantile_raw_fallback"] = _RAW_FALLBACK_SQL


# --------------------------------------------------------------------------
# '@' modifier (r10 beyond-the-ask: closes a named subset residual)
# --------------------------------------------------------------------------


def promql_at_modifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``@`` from text: ``sel[1d] @ T`` pins evaluation to the
    tumbling-grid window containing unix-second T (the grid form of
    PromQL's fixed evaluation timestamp — r9 verdict's residual list).
    T is the corpus max(ts) (one bounded agg collect, the same pattern
    the streaming rows' watermark cutoff uses), so the row grades the
    final day's counts against a twin that restates the same pin."""
    import datetime as dt

    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    ev = _events(spark, sf_dir)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    t = int((max_ts - dt.datetime(1970, 1, 1)).total_seconds())
    return compile_promql(
        f"sum by (event_type) (count_over_time(events[1d] @ {t}))",
        events_as_series(ev),
    )


_AT_MODIFIER_SQL = f"""
WITH mx AS (
  SELECT time_bucket(INTERVAL 1 DAY, max(ts)) AS w FROM {_EV_SQL}
)
SELECT event_type, time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
       count(*)::BIGINT AS value
FROM {_EV_SQL}
WHERE time_bucket(INTERVAL 1 DAY, ts) = (SELECT w FROM mx)
GROUP BY 1, 2
"""

EXTRA10_QUERIES["promql_at_modifier"] = promql_at_modifier
EXTRA10_ORACLE["promql_at_modifier"] = _AT_MODIFIER_SQL


# --------------------------------------------------------------------------
# Off-ladder histogram_fraction bounds (r10: closes a named residual)
# --------------------------------------------------------------------------

PROMQL_FRAC_INTERP_QUERY = (
    "histogram_fraction(30, 150, "
    "sum by (event_type) (count_over_time(events[1d])))"
)


def promql_hist_fraction_interp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_fraction with OFF-LADDER integer bounds (30 sits 5/25
    into the (25,50] bucket, 150 sits 50/100 into (100,200]):
    in-bucket linear interpolation the way real histogram_fraction
    reads classic buckets, kept exact — interp(B) = (cum_before·D +
    cnt·(B−prev)) / D with integer terms, the two-bound difference one
    rational floored to ppm through the DECIMAL(38,0) divider
    (plans/promql._hist_fraction_plan; on-ladder bounds are the D=1
    special case, so the r8 row's results are untouched)."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_FRAC_INTERP_QUERY, events_as_series(_events(spark, sf_dir))
    )


# hi=150: bucket (100,200], D=100, offset 50; lo=30: (25,50], D=25,
# offset 5. ppm = (X_hi*25 - X_lo*100) * 1e6 // (n * 2500)
_FRAC_INTERP_SQL = f"""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         count(*)::HUGEINT AS n,
         sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END)::HUGEINT AS cb_hi,
         sum(CASE WHEN value > 100 AND value <= 200
                  THEN 1 ELSE 0 END)::HUGEINT AS ct_hi,
         sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)::HUGEINT AS cb_lo,
         sum(CASE WHEN value > 25 AND value <= 50
                  THEN 1 ELSE 0 END)::HUGEINT AS ct_lo
  FROM {_EV_SQL} GROUP BY 1, 2
)
SELECT event_type, bucket_ts,
       (((cb_hi * 100 + ct_hi * 50) * 25
         - (cb_lo * 25 + ct_lo * 5) * 100) * 1000000
        // (n * 2500))::BIGINT AS value
FROM b
"""

EXTRA10_QUERIES["promql_hist_fraction_interp"] = promql_hist_fraction_interp
EXTRA10_ORACLE["promql_hist_fraction_interp"] = _FRAC_INTERP_SQL


# --------------------------------------------------------------------------
# Native-histogram rate: histogram_quantile over rate() of exp histograms
# --------------------------------------------------------------------------

PROMQL_EXP_RATE_QUERY = (
    "histogram_quantile(0.95, "
    "sum by (event_type) (rate(exp_requests_cum[1d])))"
)


@frame_memo  # r12: plan-construction memo (see tables.frame_memo)
def _cum_exp_series_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events reshaped as TIME-cumulative exp-histogram series: one
    series per (event_type, host=user_id%4) at a per-series-constant
    scale host%2, two positive bucket counters at indexes (host,
    host+2) growing ``(unix·(1+j+host)) div 7`` and a zero counter
    growing ``(unix·(1+host)) div 11`` — all monotone per series and
    integer-restatable in DuckDB."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        static_series_key,
    )

    ev = _events(spark, sf_dir)
    host = (F.col("user_id") % 4).cast("string")

    def cum(j: int) -> F.Column:
        return F.expr(
            f"CAST((unix_timestamp(ts) * (1 + {j} + user_id % 4)) "
            "DIV 7 AS BIGINT)"
        )

    i0 = (F.col("user_id") % 4).cast("int")
    return ev.select(
        F.lit("exp_requests_cum").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type"), F.lit("host")),
            F.array(F.col("event_type"), host),
        ).alias("attributes"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("sample_id"),
        ((F.col("user_id") % 4) % 2).cast("int").alias("exp_scale"),
        F.expr(
            "CAST((unix_timestamp(ts) * (1 + user_id % 4)) "
            "DIV 11 AS BIGINT)"
        ).alias("exp_zero_count"),
        F.lit(0.0).alias("exp_zero_threshold"),
        F.array(
            F.struct(i0.alias("index"), cum(0).alias("count")),
            F.struct((i0 + 2).alias("index"), cum(1).alias("count")),
        ).alias("exp_positive_buckets"),
        F.lit(None)
        .cast("array<struct<index:int,count:bigint>>")
        .alias("exp_negative_buckets"),
        static_series_key(
            "exp_requests_cum",
            {"event_type": F.col("event_type"), "host": host},
        ).alias("_series_key"),
    )


def promql_exp_rate_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-histogram rate from text — the composition of this
    round's two paths: histogram_quantile(0.95, sum by (t)
    (rate(exp[1d]))) rates every per-(series, sign, index) cumulative
    counter (incl. the zero counter) with the extrapolatedRate kernel,
    merges the BIGINT micro-rates across series at the group's min
    scale (H7 floor-div shift), and walks with the H6 midpoint walk
    (plans/promql._exp_rate_quantile_plan). Output BIGINT
    round(midpoint x10000)."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        PROMQL_EXP_RATE_QUERY, _cum_exp_series_frame(spark, sf_dir)
    )


_EXP_RATE_SQL = f"""
WITH slots AS (
  SELECT event_type, (user_id % 4) AS h, ((user_id % 4) % 2) AS scale,
         1 AS sign, (user_id % 4) AS idx, ts, event_id,
         (((epoch_us(ts) // 1000000) * (1 + 0 + (user_id % 4)))
          // 7)::DOUBLE AS v
  FROM {_EV_SQL}
  UNION ALL
  SELECT event_type, (user_id % 4), ((user_id % 4) % 2),
         1, (user_id % 4) + 2, ts, event_id,
         (((epoch_us(ts) // 1000000) * (1 + 1 + (user_id % 4)))
          // 7)::DOUBLE
  FROM {_EV_SQL}
  UNION ALL
  SELECT event_type, (user_id % 4), ((user_id % 4) % 2),
         0, 0, ts, event_id,
         (((epoch_us(ts) // 1000000) * (1 + (user_id % 4)))
          // 11)::DOUBLE
  FROM {_EV_SQL}
), base AS (
  SELECT event_type, h, scale, sign, idx, ts, event_id, v,
         time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         lag(v) OVER wb AS prev_v,
         row_number() OVER wb AS rn_a,
         row_number() OVER (PARTITION BY event_type, h, sign, idx,
                                         time_bucket(INTERVAL 1 DAY, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM slots
  WINDOW wb AS (PARTITION BY event_type, h, sign, idx,
                             time_bucket(INTERVAL 1 DAY, ts)
                ORDER BY ts, event_id)
), agg AS (
  SELECT event_type, h, scale, sign, idx, bucket_ts,
         count(*) AS n_samples,
         max(CASE WHEN rn_a = 1 THEN v END) AS first_v,
         max(CASE WHEN rn_d = 1 THEN v END) AS last_v,
         epoch_us(min(ts)) / 1e6 AS first_s,
         epoch_us(max(ts)) / 1e6 AS last_s,
         sum(CASE WHEN prev_v IS NOT NULL AND v < prev_v
                  THEN prev_v ELSE 0.0 END) AS corr
  FROM base GROUP BY 1, 2, 3, 4, 5, 6
), ext AS (
  SELECT *,
         epoch(bucket_ts)::DOUBLE AS range_start,
         last_v - first_v + corr AS result_v,
         last_s - first_s AS sampled,
         (last_s - first_s) / (n_samples - 1) AS avg_iv
  FROM agg
), ext2 AS (
  SELECT *,
         (CASE WHEN result_v > 0 AND first_v >= 0
                    AND sampled * (first_v / result_v)
                        < first_s - range_start
               THEN sampled * (first_v / result_v)
               ELSE first_s - range_start END) AS dur_start,
         range_start + 86400.0 - last_s AS dur_end
  FROM ext
), rates AS (
  SELECT event_type, bucket_ts, scale, sign, idx,
         CASE WHEN n_samples >= 2 AND sampled > 0 THEN
           round(result_v
                 * ((sampled
                     + (CASE WHEN dur_start < avg_iv * 1.1
                             THEN dur_start ELSE avg_iv / 2 END)
                     + (CASE WHEN dur_end < avg_iv * 1.1
                             THEN dur_end ELSE avg_iv / 2 END))
                    / sampled)
                 / 86400.0, 6)
         END AS rate
  FROM ext2
), micro AS (
  SELECT event_type, bucket_ts, scale, sign, idx,
         CAST(round(rate * 1000000) AS BIGINT) AS r
  FROM rates WHERE rate IS NOT NULL
), ms AS (
  SELECT event_type, bucket_ts, min(scale) AS min_scale
  FROM micro GROUP BY 1, 2
), shifted AS (
  SELECT m.event_type, m.bucket_ts, ms.min_scale, m.sign,
         CASE WHEN m.sign = 0 THEN 0
              ELSE floor(m.idx / pow(2, m.scale - ms.min_scale))::INT
         END AS idx,
         m.r
  FROM micro m JOIN ms USING (event_type, bucket_ts)
), pos AS (
  SELECT event_type, bucket_ts, min_scale, idx, sum(r)::BIGINT AS cnt
  FROM shifted WHERE sign = 1 GROUP BY 1, 2, 3, 4
), grp AS (
  SELECT DISTINCT event_type, bucket_ts, min_scale FROM shifted
), zeros AS (
  SELECT g.event_type, g.bucket_ts,
         coalesce(z.cnt, 0)::BIGINT AS cnt
  FROM grp g LEFT JOIN (
    SELECT event_type, bucket_ts, sum(r) AS cnt
    FROM shifted WHERE sign = 0 GROUP BY 1, 2
  ) z USING (event_type, bucket_ts)
), uni AS (
  SELECT event_type, bucket_ts, 0.0 AS v, cnt, -1e9 AS ord FROM zeros
  UNION ALL
  SELECT event_type, bucket_ts,
         (pow(pow(2, pow(2, -min_scale)), idx)
          + pow(pow(2, pow(2, -min_scale)), idx + 1)) / 2 AS v,
         cnt, idx::DOUBLE AS ord
  FROM pos
), w AS (
  SELECT event_type, bucket_ts, v, cnt, ord,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts
                        ORDER BY ord) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts) AS total
  FROM uni
)
SELECT event_type, bucket_ts,
       CAST(round(arg_min(v, ord)
                  FILTER (WHERE cum >= total * 95 / 100.0) * 10000)
            AS BIGINT) AS value
FROM w GROUP BY event_type, bucket_ts
"""

EXTRA10_QUERIES["promql_exp_rate_p95"] = promql_exp_rate_p95
EXTRA10_ORACLE["promql_exp_rate_p95"] = _EXP_RATE_SQL


# --------------------------------------------------------------------------
# Native-histogram component rates: histogram_count / histogram_sum
# --------------------------------------------------------------------------


@frame_memo  # r12: plan-construction memo (see tables.frame_memo)
def _cum_count_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events reshaped as stored-histogram rows whose count/sum
    component counters are TIME-cumulative: count grows
    ``(unix·(1+host)) div 7``, sum ``(unix·(2+host)) div 9`` — both
    monotone per (event_type, host=user_id%4) series and
    integer-restatable in DuckDB."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        static_series_key,
    )

    ev = _events(spark, sf_dir)
    host = (F.col("user_id") % 4).cast("string")
    return ev.select(
        F.lit("hist_cs").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type"), F.lit("host")),
            F.array(F.col("event_type"), host),
        ).alias("attributes"),
        F.col("ts"),
        F.lit(None).cast("double").alias("value"),
        F.col("event_id").alias("sample_id"),
        F.expr(
            "CAST((unix_timestamp(ts) * (1 + user_id % 4)) "
            "DIV 7 AS BIGINT)"
        ).alias("count"),
        F.expr(
            "CAST((unix_timestamp(ts) * (2 + user_id % 4)) "
            "DIV 9 AS BIGINT)"
        ).cast("double").alias("sum"),
        static_series_key(
            "hist_cs",
            {"event_type": F.col("event_type"), "host": host},
        ).alias("_series_key"),
    )


def promql_hist_count_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_count(rate(x[1d])) from text — the native-histogram
    observations-per-second panel: the stored histogram's cumulative
    COUNT counter swaps in for value, then the plan IS the
    extrapolatedRate kernel with the micro-unit by-sum
    (plans/promql compile, hist_component). Twin restates the same
    counter in SQL."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        "sum by (event_type) (histogram_count(rate(hist_cs[1d])))",
        _cum_count_sum_frame(spark, sf_dir),
    )


def promql_hist_sum_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_sum(rate(x[1d])) from text — the native-histogram
    sum-per-second read (mean latency's numerator), same compile path
    as histogram_count over the SUM component counter."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
    )

    return compile_promql(
        "sum by (event_type) (histogram_sum(rate(hist_cs[1d])))",
        _cum_count_sum_frame(spark, sf_dir),
    )


def _component_rate_sql(mult_add: int, div: int) -> str:
    """Rate-kernel twin over the cumulative component counter
    ``(epoch·(mult_add + host)) // div`` per (event_type, host, day),
    micro-unit summed by event_type."""
    return f"""
WITH base AS (
  SELECT event_type, (user_id % 4) AS h, ts, event_id,
         (((epoch_us(ts) // 1000000) * ({mult_add} + (user_id % 4)))
          // {div})::DOUBLE AS v,
         time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         lag((((epoch_us(ts) // 1000000) * ({mult_add} + (user_id % 4)))
              // {div})::DOUBLE) OVER wb AS prev_v,
         row_number() OVER wb AS rn_a,
         row_number() OVER (PARTITION BY event_type, user_id % 4,
                                         time_bucket(INTERVAL 1 DAY, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM {_EV_SQL}
  WINDOW wb AS (PARTITION BY event_type, user_id % 4,
                             time_bucket(INTERVAL 1 DAY, ts)
                ORDER BY ts, event_id)
), agg AS (
  SELECT event_type, h, bucket_ts,
         count(*) AS n_samples,
         max(CASE WHEN rn_a = 1 THEN v END) AS first_v,
         max(CASE WHEN rn_d = 1 THEN v END) AS last_v,
         epoch_us(min(ts)) / 1e6 AS first_s,
         epoch_us(max(ts)) / 1e6 AS last_s,
         sum(CASE WHEN prev_v IS NOT NULL AND v < prev_v
                  THEN prev_v ELSE 0.0 END) AS corr
  FROM base GROUP BY 1, 2, 3
), ext AS (
  SELECT *,
         epoch(bucket_ts)::DOUBLE AS range_start,
         last_v - first_v + corr AS result_v,
         last_s - first_s AS sampled,
         (last_s - first_s) / (n_samples - 1) AS avg_iv
  FROM agg
), ext2 AS (
  SELECT *,
         (CASE WHEN result_v > 0 AND first_v >= 0
                    AND sampled * (first_v / result_v)
                        < first_s - range_start
               THEN sampled * (first_v / result_v)
               ELSE first_s - range_start END) AS dur_start,
         range_start + 86400.0 - last_s AS dur_end
  FROM ext
), rates AS (
  SELECT event_type, bucket_ts,
         CASE WHEN n_samples >= 2 AND sampled > 0 THEN
           round(result_v
                 * ((sampled
                     + (CASE WHEN dur_start < avg_iv * 1.1
                             THEN dur_start ELSE avg_iv / 2 END)
                     + (CASE WHEN dur_end < avg_iv * 1.1
                             THEN dur_end ELSE avg_iv / 2 END))
                    / sampled)
                 / 86400.0, 6)
         END AS rate
  FROM ext2
)
SELECT event_type, bucket_ts,
       sum(CAST(round(rate * 1000000) AS BIGINT))::BIGINT AS value
FROM rates WHERE rate IS NOT NULL
GROUP BY 1, 2
"""


EXTRA10_QUERIES["promql_hist_count_rate"] = promql_hist_count_rate
EXTRA10_ORACLE["promql_hist_count_rate"] = _component_rate_sql(1, 7)
EXTRA10_QUERIES["promql_hist_sum_rate"] = promql_hist_sum_rate
EXTRA10_ORACLE["promql_hist_sum_rate"] = _component_rate_sql(2, 9)
