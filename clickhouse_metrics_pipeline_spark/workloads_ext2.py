"""Second extended catalog: temporal/windowing operators beyond the
reference's tumbling-only surface (session windows, sliding windows,
as-of join, interval containment join), multidimensional aggregation
(CUBE / grouping sets, explicit-domain pivot), exact distinct counts,
remote-read series assembly with an order-sensitive checksum, exemplar
capping (F4) as an array kernel, the full 1m->5m->1h rollup cascade
proven lossless against raw, summary-type exact quantiles (A13),
resolution routing (Q1) as a first-class query, PromQL-style query
functions (irate, topk, quantile-over-time, LOCF gap fill), language
identification as a confusion-matrix query, context-window chunking /
vocabulary top-k, and the end-to-end training-data prep pipeline.

Reference anchors (SURVEY SS2): tumbling rollups `schema.sql:152,255,346`
are generalized to sliding/session windows Spark gives for free;
exemplar capping mirrors `processor/processor.go:100-104`; series
assembly mirrors `promread/handler.go:137-220`; the cascade mirrors the
MV chain `schema.sql:249-283,340-373` with the weighted-avg fix (A11);
resolution routing mirrors `promread/handler.go:304-321`.

Scale notes are inline per query; the common themes:
- windows/sessions: one shuffle on the series key, no self-joins;
- as-of join: union-and-carry, one exchange, no range explosion;
- interval join: broadcast the (tiny) interval side, non-equi join
  stays a BroadcastNestedLoopJoin over 3 rows - the scale-safe shape;
- cascade: each level re-aggregates the previous level's output
  (15x, then 12x row reduction), never re-reads raw.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.functions.expr import packed_ts_order
from pyspark.sql.window import Window

from clickhouse_metrics_pipeline_spark.functions.text import (
    LANG_MARKERS,
    detect_language,
)
from clickhouse_metrics_pipeline_spark.operators.asof import asof_join
from clickhouse_metrics_pipeline_spark.plans.router import select_resolution
from clickhouse_metrics_pipeline_spark.tables import (
    _events,
    _t,
    avg_from_cents,
    avg_value,
    sum_value,
    value_cents,
)

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"

from clickhouse_metrics_pipeline_spark.oracle_fragments import (  # noqa: E402
    avg_from_cents_sql,
    avg_value_sql,
    portable_hash60_sql,
    sql_tokens,
    sum_value_sql,
)

# canonical cents fragments (single source; Column twins in tables.py)
_SUMV = sum_value_sql()
_AVGV = avg_value_sql()


# --------------------------------------------------------------------------
# Session windows (streaming-native operator, batch-checkable)
# --------------------------------------------------------------------------


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30-minute gap (F.session_window - the
    operator Structured Streaming uses for session state; batch form is
    oracle-checkable). Merge rule pinned by test: a point exactly
    gap-after the previous point still merges (new session iff
    gap > 30 min strictly).

    Scale: one shuffle on user_id; session merge is a sort within the
    key partition - no self-join, no state blowup."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_value("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


EVENTS_SESSION_SQL = f"""
WITH flg AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM {_EV_SQL}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flg
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       {_SUMV} AS sum_value
FROM sess
GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# Sliding windows (hop < size: each point lands in size/hop windows)
# --------------------------------------------------------------------------


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 - the overlap shape tumbling
    rollups (schema.sql:152) can't express; built-in `window()` emits
    each point into exactly 2 windows.

    Scale: the duplication factor is size/hop (2x), applied before the
    partial aggregation - shuffle carries pre-aggregated partials, not
    doubled raw rows."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_value("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


EVENTS_SLIDING_SQL = f"""
SELECT time_bucket(INTERVAL 5 MINUTE, ts) - k.k * INTERVAL 5 MINUTE AS win_start,
       event_type,
       count(*) AS n_events,
       {_SUMV} AS sum_value
FROM {_EV_SQL}
CROSS JOIN (VALUES (0), (1)) k(k)
GROUP BY win_start, event_type
"""


# --------------------------------------------------------------------------
# As-of join (union-and-carry; operators/asof.py)
# --------------------------------------------------------------------------


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the latest click by the same user at or
    before it (backward as-of join): attribution, the canonical
    temporal-join workload. gap_us is an exact integer so the oracle
    hash can't wobble on float formatting."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        payload=["event_id", "ts"],
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("asof_event_id").alias("click_id"),
        F.col("asof_ts").alias("click_ts"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    )


EVENTS_ASOF_SQL = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'click' THEN event_id END AS c_id,
         CASE WHEN event_type = 'click' THEN ts END AS c_ts
  FROM {_EV_SQL}
  WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(c_id IGNORE NULLS) OVER w AS click_id,
         last_value(c_ts IGNORE NULLS) OVER w AS click_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
       click_id, click_ts,
       date_diff('microsecond', click_ts, ts) AS gap_us
FROM carried WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# Interval containment join (broadcast range join)
# --------------------------------------------------------------------------


def events_incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: pick the 3 days with the most 'error' events
    ("incidents"), then count every event type inside those day windows
    via a ts-containment join.

    Scale: the interval side is 3 rows -> F.broadcast makes the
    non-equi join a BroadcastNestedLoopJoin over a tiny build side,
    which is the *correct* plan (a shuffle range-join would be wasted
    motion); the probe side streams once."""
    ev = _events(spark, sf_dir)
    incidents = (
        ev.where(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("inc_day"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .orderBy(F.col("n_errors").desc(), F.col("inc_day"))
        .limit(3)
    )
    iv = F.broadcast(
        incidents.select(
            "inc_day",
            F.col("inc_day").cast("timestamp").alias("win_start"),
            F.date_add("inc_day", 1).cast("timestamp").alias("win_end"),
        )
    )
    return (
        ev.join(iv, (ev.ts >= iv.win_start) & (ev.ts < iv.win_end))
        .groupBy("inc_day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_value("value").alias("sum_value"),
        )
    )


EVENTS_INCIDENT_SQL = f"""
WITH inc AS (
  SELECT ts::DATE AS inc_day, count(*) AS n_errors
  FROM {_EV_SQL} WHERE event_type = 'error'
  GROUP BY 1 ORDER BY n_errors DESC, inc_day LIMIT 3
)
SELECT inc_day, event_type, count(*) AS n_events,
       {_SUMV} AS sum_value
FROM {_EV_SQL}
JOIN inc ON ts >= inc_day::TIMESTAMP AND ts < (inc_day + 1)::TIMESTAMP
GROUP BY inc_day, event_type
"""


# --------------------------------------------------------------------------
# CUBE / grouping sets
# --------------------------------------------------------------------------


def events_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(event_type, day): all four grouping sets in one pass with
    grouping_id disambiguating the ALL rows (DuckDB's grouping() uses
    the same bit order).

    Scale: CUBE expands each row into 4 grouping-set rows *after*
    partial aggregation under Spark's Expand operator - the shuffle
    carries partials per set, not 4x raw."""
    ev = _events(spark, sf_dir)
    day = F.to_date("ts").cast("string")
    return (
        ev.cube(F.col("event_type"), day.alias("day"))
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            sum_value("value").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "gid",
            "n_events",
            "sum_value",
        )
    )


EVENTS_CUBE_SQL = f"""
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(day, 'ALL') AS day,
       grouping(event_type, day)::BIGINT AS gid,
       count(*) AS n_events,
       {_SUMV} AS sum_value
FROM (SELECT event_type, ts::DATE::VARCHAR AS day, value FROM {_EV_SQL}) e
GROUP BY CUBE (event_type, day)
"""


# --------------------------------------------------------------------------
# Exact distinct (partial-agg friendly)
# --------------------------------------------------------------------------


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct users + active days. count(DISTINCT x, y)
    expands to a two-phase plan (dedup shuffle then count) - partials
    keep the shuffle narrow. The HLL approximate variant is pytest-
    checked against this within 5% (tests/test_workloads_ext2.py)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_DISTINCT_SQL = f"""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT ts::DATE) AS n_days,
       count(*) AS n_events
FROM {_EV_SQL}
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Remote-read series assembly (Q3) with order-sensitive checksum
# --------------------------------------------------------------------------


def events_series_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series assembly exactly as promread/handler.go:137-220: group by
    series, samples in (ts, tiebreak) order. The sample vector is
    summarized by an order-SENSITIVE md5 over integer-scaled values, so
    any mis-ordering flips the hash - a stronger check than count/min/
    max. Values are scaled to bigints (round(value*10000)) before
    stringification: no float-formatting divergence between engines."""
    ev = _events(spark, sf_dir)
    vint = F.round(F.col("value") * 10000, 0).cast("bigint").cast("string")
    samples = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), vint.alias("v")))
    )
    return ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.md5(
            F.array_join(F.transform(samples, lambda s: s["v"]), ",")
        ).alias("series_md5"),
    )


EVENTS_ASSEMBLY_SQL = f"""
SELECT user_id, event_type,
       count(*) AS n_samples,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       md5(string_agg(round(value * 10000, 0)::BIGINT::VARCHAR, ','
                      ORDER BY ts, event_id)) AS series_md5
FROM {_EV_SQL}
GROUP BY user_id, event_type
"""


# --------------------------------------------------------------------------
# Exemplar cap (F4) as an array kernel
# --------------------------------------------------------------------------


def events_exemplar_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (processor.go:100-104): keep at most N exemplars per series.
    Exemplar policy: top-3 by value (ties by event_id), implemented the
    way the engine stores them - collect, sort, slice(1..N) - then
    exploded back to rows so the oracle can pin every kept exemplar."""
    ev = _events(spark, sf_dir)
    ex = F.struct(
        (-F.col("value")).alias("neg_v"),
        F.col("event_id").alias("eid"),
        F.round("value", 4).alias("v"),
    )
    capped = ev.groupBy("user_id", "event_type").agg(
        F.slice(F.array_sort(F.collect_list(ex)), 1, 3).alias("exemplars")
    )
    e = F.posexplode("exemplars")
    return capped.select(
        "user_id", "event_type", e.alias("pos", "x")
    ).select(
        "user_id",
        "event_type",
        (F.col("pos") + 1).alias("exemplar_rank"),
        F.col("x.eid").alias("event_id"),
        F.col("x.v").alias("value"),
    )


EVENTS_EXEMPLAR_SQL = f"""
SELECT user_id, event_type, rn AS exemplar_rank, event_id,
       round(value, 4) AS value
FROM (SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM {_EV_SQL})
WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# Rollup cascade 1m -> 5m -> 1h, proven lossless against raw
# --------------------------------------------------------------------------


def _grain_rollup(df: DataFrame, grain: str) -> DataFrame:
    """One cascade level: re-aggregate aggregates (A11, weighted form).
    Carries (sum_value, samples) so avg is exact at every level, and
    (last_key, value_last) so anyLast is deterministic (max_by)."""
    return df.groupBy(
        "user_id", "event_type", F.date_trunc(grain, "bucket_ts").alias("bucket_ts")
    ).agg(
        F.min("value_min").alias("value_min"),
        F.max("value_max").alias("value_max"),
        F.sum("sum_value").alias("sum_value"),
        F.max_by("value_last", "last_key").alias("value_last"),
        F.max("last_key").alias("last_key"),
        F.sum("samples").alias("samples"),
    )


def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MV chain (schema.sql:249-283, 340-373) as explicit jobs:
    raw -> 1m -> 5m -> 1h, each level reading ONLY the previous level.
    avg is weighted (A11 fix), so the oracle computes 1h directly from
    raw - hash equality proves the cascade is lossless.

    Scale: this is the plan that survives 100 TB - the 1h job reads the
    5m table (180x smaller than raw), not raw; each level is one
    shuffle on the same (series, bucket) key family."""
    ev = _events(spark, sf_dir)
    m1 = ev.groupBy(
        "user_id", "event_type", F.date_trunc("minute", "ts").alias("bucket_ts")
    ).agg(
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.sum(value_cents("value")).alias("sum_value"),  # exact cents
        # packed (ts, event_id) order (functions/expr.packed_ts_order):
        # DECIMAL(38,0) buffers keep every cascade level a HashAggregate
        # (the struct forms forced SortAggregate); last_key carries the
        # same total order across levels, value_last is unchanged
        F.max_by("value", packed_ts_order("ts", "event_id")).alias("value_last"),
        F.max(packed_ts_order("ts", "event_id")).alias("last_key"),
        F.count(F.lit(1)).alias("samples"),
    )
    m5 = _grain_rollup(
        m1.withColumn(
            "bucket_ts",
            F.timestamp_seconds(F.floor(F.unix_timestamp("bucket_ts") / 300) * 300),
        ),
        "minute",
    )
    h1 = _grain_rollup(m5, "hour")
    return h1.select(
        "user_id",
        "event_type",
        "bucket_ts",
        F.round("value_min", 4).alias("value_min"),
        F.round("value_max", 4).alias("value_max"),
        avg_from_cents(F.col("sum_value"), F.col("samples")).alias("value_avg"),
        F.round("value_last", 4).alias("value_last"),
        F.col("samples").alias("samples_count"),
    )


EVENTS_CASCADE_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_type, value,
         time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
         row_number() OVER (PARTITION BY user_id, event_type,
                                         time_bucket(INTERVAL 1 HOUR, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM {_EV_SQL}
)
SELECT user_id, event_type, bucket_ts,
       round(min(value), 4) AS value_min,
       round(max(value), 4) AS value_max,
       {avg_from_cents_sql("sum(CAST(round(value * 100) AS BIGINT))", "count(*)")} AS value_avg,
       round(max(CASE WHEN rn = 1 THEN value END), 4) AS value_last,
       count(*) AS samples_count
FROM ranked
GROUP BY user_id, event_type, bucket_ts
"""


# --------------------------------------------------------------------------
# Summary-type exact quantiles (A13)
# --------------------------------------------------------------------------


def _exact_quantile_scaled(arr, n, p_pct: int):
    """Linear-interpolated quantile over a sorted BIGINT-cents array,
    emitted as BIGINT value*10000 in exact integer arithmetic.

    pos = (n-1)*p/100 splits into k = pos div 100 hundredths and
    remainder r; result*10000 = cents[k]*(100-r) + cents[k+1]*r - the
    same (1-g)*a + g*b as percentile()/quantile_cont(), but with no
    float anywhere, so the hash is engine-invariant (the same
    round-4 fragility fix as bucket_percentile_scaled)."""
    pos = (n - F.lit(1)).cast("bigint") * F.lit(p_pct)
    # (pos - pos%100)/100 is exactly divisible, so the double division
    # is exact for any realistic group size (pos < 2^53)
    k = ((pos - pos % F.lit(100)) / F.lit(100)).cast("bigint")
    r = pos % F.lit(100)
    lo = F.element_at(arr, (k + F.lit(1)).cast("int"))
    hi = F.element_at(arr, F.least(k + F.lit(2), n.cast("bigint")).cast("int"))
    return lo * (F.lit(100) - r) + hi * r


def events_summary_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary metric shape (count/sum/quantiles) per event_type using
    EXACT percentiles (linear interpolation) - the oracle comparison
    A13 prescribes exact percentile for. percentile_approx is the
    at-scale variant (pytest-checked within tolerance, not hashed).
    Quantiles ride on sorted integer cents and come out as BIGINT
    value*10000: F.percentile/quantile_cont interpolate in doubles,
    whose last-ulp disagreement across engines flipped a driver hash
    in round 4 (hist_quantile_over_time); this shape cannot."""
    ev = _events(spark, sf_dir)
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        sum_value("value").alias("sum_value"),
        F.array_sort(F.collect_list(value_cents("value"))).alias("arr"),
    )
    return g.select(
        "event_type",
        "n",
        "sum_value",
        _exact_quantile_scaled(F.col("arr"), F.col("n"), 50).alias("p50_scaled"),
        _exact_quantile_scaled(F.col("arr"), F.col("n"), 90).alias("p90_scaled"),
        _exact_quantile_scaled(F.col("arr"), F.col("n"), 99).alias("p99_scaled"),
    )


def _summary_q_sql(p_pct: int) -> str:
    pos = f"((n - 1) * {p_pct})"
    return (
        f"arr[({pos} // 100 + 1)::BIGINT] * (100 - {pos} % 100)"
        f" + arr[least({pos} // 100 + 2, n)::BIGINT] * ({pos} % 100)"
    )


EVENTS_SUMMARY_SQL = f"""
WITH g AS (
  SELECT event_type,
         count(*) AS n,
         {_SUMV} AS sum_value,
         list_sort(list(round(value * 100)::BIGINT)) AS arr
  FROM {_EV_SQL}
  GROUP BY event_type
)
SELECT event_type, n, sum_value,
       {_summary_q_sql(50)} AS p50_scaled,
       {_summary_q_sql(90)} AS p90_scaled,
       {_summary_q_sql(99)} AS p99_scaled
FROM g
"""


# --------------------------------------------------------------------------
# Resolution routing (Q1) as a first-class query
# --------------------------------------------------------------------------

_ROUTE_NOW_MS = 1_706_745_600_000  # 2024-02-01 00:00:00 UTC
_ROUTE_START_MS = 1_704_844_800_000  # 2024-01-10
_ROUTE_END_MS = 1_705_017_600_000  # 2024-01-12 (span 2d, age 22d -> 5m)


def events_resolution_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (promread/handler.go:304-321) live: the router picks the
    grain for a 2-day-span, 22-day-old query -> metrics_5m; the rollup
    then runs at that grain over the range. The routing decision is
    itself pinned by pytest (tests/test_workloads_ext2.py)."""
    table = select_resolution(_ROUTE_START_MS, _ROUTE_END_MS, _ROUTE_NOW_MS)
    assert table == "metrics_5m", table
    grain_s = {"metrics_raw": 1, "metrics_1m": 60, "metrics_5m": 300, "metrics_1h": 3600}[
        table
    ]
    ev = _events(spark, sf_dir).where(
        (F.unix_micros("ts") >= _ROUTE_START_MS * 1000)
        & (F.unix_micros("ts") < _ROUTE_END_MS * 1000)
    )
    return (
        ev.groupBy(
            "event_type",
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / grain_s) * grain_s
            ).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            avg_value("value").alias("value_avg"),
        )
        .withColumn("resolution", F.lit(table))
    )


EVENTS_ROUTE_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 5 MINUTE, ts) AS bucket_ts,
       count(*) AS n_samples,
       {_AVGV} AS value_avg,
       'metrics_5m' AS resolution
FROM {_EV_SQL}
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY event_type, bucket_ts
"""


# --------------------------------------------------------------------------
# Language identification (confusion matrix vs the labeled lang column)
# --------------------------------------------------------------------------


def _sql_list_lit(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def docs_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (marker n-gram heuristic) as a confusion matrix
    against the labeled `lang` column: rows (lang, lang_pred, n). The
    heuristic itself is pure built-in expressions (functions/text.py);
    argmax ties break en > de > es > fr, no hits -> 'und'."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("lang_pred", detect_language("text"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _docs_language_sql() -> str:
    toks = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
    hits = {
        lang: f"len(list_filter({toks}, x -> list_contains({_sql_list_lit(ws)}, x)))"
        for lang, ws in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    return f"""
SELECT lang,
       CASE WHEN {best} = 0 THEN 'und'
            WHEN {hits['en']} = {best} THEN 'en'
            WHEN {hits['de']} = {best} THEN 'de'
            WHEN {hits['es']} = {best} THEN 'es'
            WHEN {hits['fr']} = {best} THEN 'fr'
            ELSE 'und' END AS lang_pred,
       count(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# PromQL-style query-side functions (beyond the reference's remote-read
# projection: promread/handler.go:177-205 re-cumulates; rate/topk/
# quantile-over-time are the natural next functions a metrics engine
# serves)
# --------------------------------------------------------------------------


def hist_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile over time: per (event_type, 1h window), P95
    from the windowed bucket histogram - the Grafana heatmap/latency-
    panel query. Buckets aggregate map-side per (type, window, le)
    before the array kernel (H1) runs row-local on the tiny per-window
    arrays: at 100 TB the shuffle carries one row per bucket per
    window, never raw samples. p95 is emitted as BIGINT value*10000
    (bucket_percentile_scaled): round 4's driver run proved the
    round(double,4) tail can flip a hash across environments when one
    of 3385 values lands on a 4-digit rounding boundary; the scaled
    walk is exact integer arithmetic end-to-end."""
    from clickhouse_metrics_pipeline_spark.functions.histogram import (
        bucket_percentile_scaled,
    )
    from clickhouse_metrics_pipeline_spark.workloads import _le_expr

    ev = _events(spark, sf_dir)
    per_le = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bucket_ts"),
            _le_expr(F.col("value")).alias("le"),
        )
        .groupBy("event_type", "bucket_ts", "le")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    hists = per_le.groupBy("event_type", "bucket_ts").agg(
        F.array_sort(F.collect_list(F.struct("le", "count"))).alias("buckets")
    )
    return hists.select(
        "event_type",
        "bucket_ts",
        bucket_percentile_scaled("buckets", 95).alias("p95_scaled"),
        F.aggregate(
            "buckets", F.lit(0).cast("bigint"), lambda a, b: a + b["count"]
        ).alias("n_samples"),
    )


def _quantile_over_time_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        LE_SQL as _LE_SQL,
        hist_walk_scaled_sql as _hist_walk_scaled_sql,
    )

    return f"""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
         {_LE_SQL} AS le, count(*)::BIGINT AS cnt
  FROM {_EV_SQL} GROUP BY 1, 2, 3
), w AS (
  SELECT event_type, bucket_ts, le, cnt,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts ORDER BY le) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts) AS total,
         lag(le, 1, 0.0) OVER (PARTITION BY event_type, bucket_ts ORDER BY le) AS prev
  FROM b
)
SELECT event_type, bucket_ts,
       {_hist_walk_scaled_sql(95)} AS p95_scaled,
       sum(cnt)::BIGINT AS n_samples
FROM w GROUP BY event_type, bucket_ts
"""


def events_irate_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL irate() shape: per series and 5-minute bucket, the
    instantaneous rate at the bucket's last sample = last value divided
    by the seconds since the previous sample of the same series (lag
    crosses bucket boundaries, as irate does). Same-timestamp pairs
    yield NULL via nullif. One shuffle on the series key serves both
    the lag window and the per-bucket argmax."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1e6
    with_gap = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        "value",
        gap.alias("gap_s"),
        F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / 300) * 300
        ).alias("bucket_ts"),
    )
    return (
        with_gap.groupBy("user_id", "event_type", "bucket_ts")
        .agg(
            F.max_by(
                F.round(F.col("value") / F.nullif(F.col("gap_s"), F.lit(0.0)), 6),
                F.struct("ts", "event_id"),
            ).alias("irate"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


EVENTS_IRATE_SQL = f"""
WITH g AS (
  SELECT user_id, event_type, ts, event_id, value,
         date_diff('microsecond', lag(ts) OVER w, ts) / 1e6 AS gap_s,
         time_bucket(INTERVAL 5 MINUTE, ts) AS bucket_ts,
         row_number() OVER (PARTITION BY user_id, event_type,
                                         time_bucket(INTERVAL 5 MINUTE, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM {_EV_SQL}
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT user_id, event_type, bucket_ts,
       max(CASE WHEN rn = 1
                THEN round(value / nullif(gap_s, 0.0), 6) END) AS irate,
       count(*) AS n_samples
FROM g
GROUP BY user_id, event_type, bucket_ts
"""


def events_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame rolling aggregate: per series, the 3-sample moving
    average (ROWS 2 PRECEDING .. CURRENT) in (ts, event_id) order - the
    smoothing primitive dashboards apply over irate/gauge series. The
    bounded frame keeps window state O(frame) per partition regardless
    of series length (unlike unbounded running frames)."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_type",
        "event_id",
        avg_from_cents(
            F.sum(value_cents("value")).over(w),
            F.count(F.lit(1)).over(w),
        ).alias("rolling_mean_3"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


EVENTS_ROLLING_MEAN_SQL = f"""
SELECT user_id, event_type, event_id,
       floor((200 * sum(CAST(round(value * 100) AS BIGINT)) OVER w
              + count(*) OVER w) / (2 * count(*) OVER w)) / 10000.0
         AS rolling_mean_3,
       count(*) OVER w AS n_in_frame
FROM {_EV_SQL}
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def events_topk_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL topk(5, ...) shape: the 5 heaviest series per metric by
    total value. The rank window runs per metric over the aggregated
    series table (750 rows at sf0.1), never over raw samples - the
    composition that stays cheap at 100 TB."""
    ev = _events(spark, sf_dir)
    totals = ev.groupBy("event_type", "user_id").agg(
        sum_value("value").alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("event_type", "rank", "user_id", "total_value")
    )


EVENTS_TOPK_SERIES_SQL = f"""
SELECT event_type, rank, user_id, total_value
FROM (SELECT event_type, user_id,
             {_SUMV} AS total_value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {_SUMV} DESC,
                                         user_id) AS rank
      FROM {_EV_SQL}
      GROUP BY event_type, user_id)
WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# Context-window chunking (training-data op: fixed-size token windows
# with overlap, the shape LLM pretraining sharding uses)
# --------------------------------------------------------------------------

_CHUNK = 32
_STRIDE = 24  # 8-token overlap


def docs_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into 32-token windows with stride 24. All
    row-local JVM expressions (sequence -> slice -> posexplode): the
    chunk fan-out happens inside the scan stage, no shuffle until a
    consumer asks for one - at 100 TB chunking is a map, never a
    shuffle. chunk_md5 pins exact window content against the oracle."""
    from clickhouse_metrics_pipeline_spark.operators.dedup import tokens

    d = _t(spark, sf_dir, "documents")
    w = tokens("text")
    n = F.size(w)
    # last chunk index: floor((n - CHUNK + STRIDE - 1) / STRIDE) = floor((n-9)/24)
    kmax = F.greatest(
        F.lit(0), F.floor((n - F.lit(_CHUNK - _STRIDE + 1)) / F.lit(_STRIDE))
    )
    chunks = F.transform(
        F.sequence(F.lit(0), kmax),
        lambda k: F.slice(w, k * _STRIDE + 1, _CHUNK),
    )
    e = F.posexplode(chunks)
    return (
        d.select(F.col("doc_id"), F.size(w).alias("n_tokens"), e.alias("chunk_idx", "c"))
        .select(
            "doc_id",
            "n_tokens",
            "chunk_idx",
            F.size("c").alias("n_chunk_tokens"),
            F.md5(F.array_join("c", " ")).alias("chunk_md5"),
        )
    )


DOCS_CHUNKING_SQL = """
WITH t AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
), k AS (
  SELECT doc_id, toks, len(toks) AS n_tokens,
         unnest(range(0, greatest((len(toks) - 9) // 24, 0) + 1)) AS chunk_idx
  FROM t
)
SELECT doc_id, n_tokens, chunk_idx,
       len(list_slice(toks, chunk_idx * 24 + 1,
                      least(chunk_idx * 24 + 32, n_tokens))) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_idx * 24 + 1,
                      least(chunk_idx * 24 + 32, n_tokens)), ' ')) AS chunk_md5
FROM k
"""


def docs_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: global top-20 tokens by frequency, ranked with a
    deterministic tie-break. The groupBy is partial-aggregated (shuffle
    carries one row per distinct token per partition); the rank window
    then runs on the aggregated vocabulary - tiny - so the
    single-partition window is not a scale hazard."""
    from clickhouse_metrics_pipeline_spark.operators.dedup import tokens

    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("rank", "tok", "n")
    )


DOCS_TOKEN_TOPK_SQL = """
SELECT rank, tok, n
FROM (SELECT tok, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, tok) AS rank
      FROM (SELECT unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS tok
            FROM documents)
      GROUP BY tok)
WHERE rank <= 20
"""


# --------------------------------------------------------------------------
# Pivot (wide reshaping - one column per metric)
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per day, one value column per event_type (the
    dashboard-table reshaping). The value list is EXPLICIT - with it,
    pivot is a single groupBy with conditional aggregates (no extra
    pass to discover the domain, no shuffle beyond the groupBy); an
    implicit pivot would scan once just to enumerate types."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(sum_value("value"))
        .orderBy("day")
    )


EVENTS_PIVOT_SQL = f"""
SELECT ts::DATE AS day,
       {", ".join(
           f"round(sum(CAST(round(value * 100) AS BIGINT))"
           f" FILTER (WHERE event_type = '{t}') / 100.0, 4) AS {t}"
           for t in _EVENT_TYPES
       )}
FROM {_EV_SQL}
GROUP BY day
ORDER BY day
"""


# --------------------------------------------------------------------------
# Gap filling (LOCF) — aligned range-query grids with carried values
# --------------------------------------------------------------------------


def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-query alignment: per series, a dense 1-hour bucket grid
    from the series' first to last hour; empty buckets carry the last
    observed rollup value forward (LOCF - PromQL staleness semantics
    without the 5m cutoff). is_gap marks carried rows.

    Scale shape: the grid is generated per series with sequence()
    (row-local, bounded by the series' own span), the actuals join is
    on the same (series, bucket) key as the rollup shuffle, and the
    carry-forward is one window over the already-aggregated grid -
    bucket-grain rows, never raw samples."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 25)
    actual = ev.groupBy(
        "user_id",
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(sum_value("value").alias("sum_value"))
    span = actual.groupBy("user_id", "event_type").agg(
        F.min("bucket_ts").alias("t0"), F.max("bucket_ts").alias("t1")
    )
    grid = span.select(
        "user_id",
        "event_type",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(actual, ["user_id", "event_type", "bucket_ts"], "left")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "event_type",
        "bucket_ts",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("sum_value").isNull().cast("int").alias("is_gap"),
    )


EVENTS_GAP_FILL_SQL = f"""
WITH actual AS (
  SELECT user_id, event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
         {_SUMV} AS sum_value
  FROM {_EV_SQL}
  WHERE user_id < 25
  GROUP BY 1, 2, 3
), grid AS (
  SELECT user_id, event_type,
         unnest(generate_series(min(bucket_ts), max(bucket_ts),
                                INTERVAL 1 HOUR)) AS bucket_ts
  FROM actual GROUP BY user_id, event_type
)
SELECT g.user_id, g.event_type, g.bucket_ts,
       last_value(a.sum_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id, g.event_type ORDER BY g.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       (a.sum_value IS NULL)::INT AS is_gap
FROM grid g
LEFT JOIN actual a USING (user_id, event_type, bucket_ts)
"""


# --------------------------------------------------------------------------
# End-to-end training-data prep pipeline (the composite flagship:
# exact dedup -> near-dup drop -> quality gate -> chunk accounting)
# --------------------------------------------------------------------------


def docs_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full preprocessing pipeline a pretraining corpus runs, as one
    plan: (1) exact dedup keeps the min-id doc per normalized-text
    fingerprint; (2) near-dup drop removes the higher id of every exact
    n-gram Jaccard >= 0.8 pair; (3) quality gate keeps score >= 0.9;
    (4) survivors are chunk-counted (32-token windows, stride 24).

    Composition of already-verified operators - the value pinned here is
    the PIPELINE semantics (stage order, survivor sets). Scale shape:
    two broadcast-able side tables (keepers by anti-hash, drop-ids from
    the sparse pair join) against one corpus scan."""
    from clickhouse_metrics_pipeline_spark.functions.expr import row_let
    from clickhouse_metrics_pipeline_spark.functions.text import (
        quality_score_of,
    )
    from clickhouse_metrics_pipeline_spark.operators.dedup import tokens
    from clickhouse_metrics_pipeline_spark.workloads import dedup_index

    d = _t(spark, sf_dir, "documents")
    keepers = dedup_index(spark, sf_dir, "exact_keepers")

    # the verified pair table is a stored ingest-time artifact (see
    # dedup_index "pairs08") — the pipeline probes it, as production
    # dedup does, instead of re-running the pair join per execution
    drops = (
        dedup_index(spark, sf_dir, "pairs08")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    # r11 optimization (guide §1.2 step 2): the survivor projection
    # recomputed quality_score AND token_count — each mention its own
    # tokenization (operator-level runtime CSE cannot see inside the
    # row_let lambdas) — so survivors paid two tokenizations and a
    # second full quality body on top of the gate's. One row_let
    # (tokens bound once; quality mentioned once) emits both
    # output columns as a struct; the split select survives
    # CollapseProject because the alias is referenced twice and is not
    # cheap (plan-pinned in test_workloads_ext4's sibling pins). The
    # quality gate itself stays a plain filter below the projection —
    # its evaluation is count-path cost the old shape already paid.
    from clickhouse_metrics_pipeline_spark.functions.text import (
        quality_score,
    )

    t = F.col("text")
    out_struct = row_let(
        {"w": tokens(t)},
        lambda bw: F.struct(
            (
                F.greatest(
                    F.lit(0),
                    F.floor((F.size(bw["w"]) - F.lit(9)) / F.lit(24)),
                )
                + 1
            ).cast("bigint").alias("n_chunks"),
            F.round(quality_score_of(bw["w"], t), 2).alias("quality"),
        ),
    )
    return (
        d.join(keepers, "doc_id", "left_semi")
        .join(drops, "doc_id", "left_anti")
        .where(quality_score("text") >= 0.9)
        .select("doc_id", out_struct.alias("_s"))
        .select(
            "doc_id",
            F.col("_s.n_chunks").alias("n_chunks"),
            F.col("_s.quality").alias("quality"),
        )
    )


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination — the benchmark-leakage check every
    pretraining pipeline runs (the n-gram-collision method used for
    public LLM training sets): flag each eval-split document sharing at
    least one 8-gram with ANY train-split document, with the shared-gram
    count as the contamination score.

    Split is deterministic (doc_id % 50 == 0 -> eval). Grams are the
    same 64-bit hash kernel the dedup suite uses
    (:func:`operators.dedup.gram_hashes_from_text`, shingle_n=8), so
    the contains-join ships bigints, not 8-gram text; the oracle runs
    the string form (collision odds ~1e-9 corpus-wide). Scale shape:
    both sides are stored per-corpus indexes precomputed once at
    ingest — the per-doc gram table (``dedup_index("grams8")``) and
    the DISTINCT train-side gram set (``dedup_index("grams8_train")``,
    the train n-gram index every production leakage check probes) —
    so each check pays only the eval split's ~2% explode plus one
    join on the gram key; the train-side distinct never reruns per
    query. No all-pairs anything."""
    from clickhouse_metrics_pipeline_spark.workloads import dedup_index

    grams = dedup_index(spark, sf_dir, "grams8").withColumnRenamed(
        "sh", "grams"
    )
    ev = grams.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.size("grams").cast("bigint").alias("n_grams"),
        F.explode("grams").alias("s"),
    )
    tr = dedup_index(spark, sf_dir, "grams8_train")
    return (
        ev.join(tr, "s")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select("doc_id", "n_shared", "n_grams")
    )


_EIGHT_GRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
                        ||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]
                        for i in range(1, len(w) - 6)]) AS grams
  FROM toks WHERE len(w) >= 8
)"""

DOCS_DECONTAMINATE_SQL = (
    _EIGHT_GRAM_SQL
    + """, ev AS (
  SELECT doc_id, len(grams)::BIGINT AS n_grams, unnest(grams) AS s
  FROM g WHERE doc_id % 50 = 0
), tr AS (
  SELECT DISTINCT unnest(grams) AS s FROM g WHERE doc_id % 50 != 0
)
SELECT doc_id, count(*)::BIGINT AS n_shared, n_grams
FROM ev JOIN tr USING (s)
GROUP BY doc_id, n_grams
"""
)


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling — the data-mixture step
    of a pretraining pipeline: per-language keep rates (en 90%, de/es/fr
    50%, everything else 10%) applied with a HASH-based Bernoulli
    decision instead of an RNG, so the sample is reproducible across
    runs, engines and retries (a speculative re-execution must not
    sample a different corpus). The decision hash is the md5-derived
    60-bit portable form (same construction as simhash60_portable, so
    DuckDB computes bit-identical values); at 100 TB this is a map-only
    scan — no shuffle, no state, resample = rerun with new rates.
    Returns (lang, n_kept, n_total, rate_pct) per stratum so the oracle
    pins both the per-stratum totals and the exact kept counts."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )

    d = _t(spark, sf_dir, "documents")
    h = portable_hash60(F.col("doc_id").cast("string")) % 100
    rate = (
        F.when(F.col("lang") == "en", F.lit(90))
        .when(F.col("lang").isin("de", "es", "fr"), F.lit(50))
        .otherwise(F.lit(10))
    )
    return (
        d.select("lang", rate.alias("rate_pct"), (h < rate).alias("_keep"))
        .groupBy("lang", "rate_pct")
        .agg(
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select("lang", "n_kept", "n_total", "rate_pct")
    )


DOCS_STRATIFIED_SAMPLE_SQL = """
WITH d AS (
  SELECT lang,
         CASE WHEN lang = 'en' THEN 90
              WHEN lang IN ('de', 'es', 'fr') THEN 50
              ELSE 10 END AS rate_pct,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS h
  FROM documents
)
SELECT lang,
       sum(CASE WHEN h < rate_pct THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       count(*)::BIGINT AS n_total,
       rate_pct
FROM d GROUP BY lang, rate_pct
"""


def _training_pipeline_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        JACCARD_PAIRS_SQL as _JACCARD_PAIRS_SQL,
        docs_text_stats_sql as _docs_text_stats_sql,
    )

    return f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
), drops AS (
  SELECT DISTINCT id_b AS doc_id FROM ({_JACCARD_PAIRS_SQL}) p
), stats AS (
  SELECT doc_id, n_tokens, quality FROM ({_docs_text_stats_sql()}) s
)
SELECT s.doc_id,
       greatest((n_tokens - 9) // 24, 0) + 1 AS n_chunks,
       round(quality, 2) AS quality
FROM stats s
JOIN keep USING (doc_id)
LEFT JOIN drops USING (doc_id)
WHERE drops.doc_id IS NULL AND quality >= 0.9
"""


# --------------------------------------------------------------------------
# Sequence packing (training-batch assembly over token budgets)
# --------------------------------------------------------------------------


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing catalog query: documents into 2048-token
    training bins via operators.packing.pack_sequences (see that module
    for semantics and the 100 TB scale shape). The shard count is
    pinned to 32 here so the oracle hash is stable across hosts; the
    operator itself defaults to the cluster's defaultParallelism —
    per-shard packing parallelism must grow with the data."""
    from clickhouse_metrics_pipeline_spark.functions.text import token_count
    from clickhouse_metrics_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(
        d,
        budget=2048,
        num_shards=32,
        id_col="doc_id",
        tokens_col=token_count("text"),
    )


DOCS_PACK_SQL = f"""
WITH base AS (
  SELECT doc_id,
         {portable_hash60_sql("doc_id::VARCHAR")} % 32 AS shard,
         len({sql_tokens()})::BIGINT AS n_tokens
  FROM documents
), binned AS (
  SELECT shard, n_tokens,
         floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) / 2048)::BIGINT AS bin
  FROM base
)
SELECT shard, bin, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS sum_tokens,
       round(sum(n_tokens) / 2048.0, 4) AS fill_ratio
FROM binned
GROUP BY shard, bin
"""


# --------------------------------------------------------------------------
# Cross-source overlap matrix (dataset-curation diagnostics)
# --------------------------------------------------------------------------


def docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 8-gram overlap matrix — the duplication diagnostic a
    curation pipeline runs BEFORE mixing sources (two crawls of the
    same sites inflate dedup work and skew mixture weights; this
    quantifies it per source pair). Probes the stored grams8 index
    (same one decontamination uses), reduces to per-source DISTINCT
    gram hashes, inverted-index self-joins on the gram key across
    sources, and scores each pair with an integer-exact Jaccard in
    basis points (floor(10000*shared/union) — integer floor, so no
    float rounding boundary exists for either engine; the oracle runs
    the string-gram form, hash-collision odds ~1e-9 as in
    docs_decontaminate).

    Scale (round-4 shape): per-source distinct shrinks the input to
    unique (source, gram) rows; ONE aggregation by gram collects each
    gram's source set (bounded by #sources, not corpus size), and the
    source PAIRS are expanded row-locally from that set (<= C(k,2) per
    gram) — no gram-keyed self-join at all, so no posting-list join
    blowup is even possible; sizes is a tiny broadcast (one row per
    source)."""
    from clickhouse_metrics_pipeline_spark.workloads import dedup_index

    # the stored/memoized grams8_srcsets index (gram -> sorted source
    # set, computed once per corpus like every dedup index) IS the
    # query input: both the pair counts and the per-source sizes are
    # tiny aggregations over it
    gsets = dedup_index(spark, sf_dir, "grams8_srcsets")
    # all ordered pairs within the set (row-local; array_sort makes
    # source_a < source_b by construction)
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("srcs"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("srcs"),
                        i + F.lit(2),
                        F.size(F.col("srcs")),
                    ),
                    lambda y: F.struct(
                        x.alias("source_a"), y.alias("source_b")
                    ),
                ),
            )
        )
    )
    shared = (
        gsets.where(F.size("srcs") > 1)
        .select(pair.alias("p"))
        .groupBy("p.source_a", "p.source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = gsets.select(F.explode("srcs").alias("source")).groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n"))
    out = (
        shared.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"), F.col("n").alias("n_a")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"), F.col("n").alias("n_b")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.floor(
                (F.lit(10000) * F.col("n_shared"))
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).cast("bigint").alias("overlap_bp"),
        )
    )
    return out


DOCS_SOURCE_OVERLAP_SQL = (
    _EIGHT_GRAM_SQL
    + """, sg AS (
  SELECT DISTINCT d.source, s
  FROM (SELECT doc_id, unnest(grams) AS s FROM g) x
  JOIN documents d USING (doc_id)
), sizes AS (SELECT source, count(*) AS n FROM sg GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM sg a JOIN sg b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared, sa.n AS n_a, sb.n AS n_b,
       floor((10000 * n_shared) / (sa.n + sb.n - n_shared))::BIGINT AS overlap_bp
FROM shared
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""
)


# --------------------------------------------------------------------------
# Embedding compression (storage-side op for 100 TB embedding corpora)
# --------------------------------------------------------------------------


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding corpus with exact
    dequantization-error accounting (max abs error + MSE per vector) —
    the standard 4x compression applied before storing/shipping an
    embedding corpus; the error columns are the acceptance check a
    production pipeline runs before swapping the float32 copy out.

    Scale: map-only JVM expressions (transform/zip_with/aggregate), no
    shuffle, no Python — runs at scan speed. The MSE fold is an explicit
    left fold so the oracle reproduces the exact fp summation order."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int8_dequant_error,
        int8_quantize,
    )

    e = _t(spark, sf_dir, "embeddings")
    d = e.select(
        "vec_id", "embedding", int8_quantize(F.col("embedding")).alias("_q")
    )
    err = int8_dequant_error(F.col("embedding"), F.col("_q"))
    return d.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(F.col("_q.scale"), 9).alias("scale_r"),
        F.round(err["max_abs_err"], 9).alias("max_abs_err"),
        F.round(err["mse"], 12).alias("mse_r"),
    )


EMB_QUANTIZE_SQL = """
WITH q AS (
  SELECT vec_id, embedding, len(embedding) AS n_dims,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale
  FROM embeddings
), e AS (
  SELECT vec_id, n_dims, scale,
         -- scale=0 guard mirrors int8_quantize: a zero vector gets an
         -- all-zero code, so its error is |x| (= 0 for every dim)
         list_transform(embedding,
                        x -> CASE WHEN scale > 0
                             THEN abs(x::DOUBLE - round(x::DOUBLE / scale) * scale)
                             ELSE abs(x::DOUBLE) END) AS err
  FROM q
)
SELECT vec_id, n_dims, round(scale, 9) AS scale_r,
       round(list_max(err), 9) AS max_abs_err,
       round(list_reduce(list_prepend(0.0::DOUBLE,
                                      list_transform(err, x -> x * x)),
                         (a, b) -> a + b) / n_dims, 12) AS mse_r
FROM e
"""


# --------------------------------------------------------------------------
# Exemplar -> trace linkage (round 4)
# --------------------------------------------------------------------------


def events_exemplar_trace_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link metric spikes to trace IDs through stored exemplar arrays —
    the investigation query the reference's exemplar columns exist for
    (schema.sql:55-61: exemplars.traceId/value alongside every series)
    but which no reference query exercises end-to-end.

    Shape: (1) roll raw points to (event_type, 1h bucket) carrying the
    capped exemplar array (top-3 by value, F4 policy, each with a
    deterministic md5-derived trace id standing in for the OTLP trace
    id); (2) flag spike buckets — bucket avg > 1.5x the event type's
    overall avg, compared in EXACT integer-cents cross-multiplied form
    (2 * sum_c * g_n > 3 * g_sum_c * n) so neither engine faces a float
    boundary (1.5x, not 2x: the hourly/global ratio tightens as the
    bucket sample count grows, and at sf0.1 no bucket exceeds 2x — the
    threshold must flag spikes at every scale factor, not only small
    ones); (3) explode ONLY spike buckets' exemplars to
    (bucket, rank, trace_id, value) rows.

    Scale: one shuffle to the bucket grain; the per-type global avg is
    a 5-row broadcast; exemplar arrays are capped at 3 so the explode
    is bounded by 3x the spike-bucket count, never by raw cardinality."""
    ev = _events(spark, sf_dir)
    trace_id = F.substring(F.md5(F.col("event_id").cast("string")), 1, 16)
    ex = F.struct(
        (-F.col("value")).alias("neg_v"),
        F.col("event_id").alias("eid"),
        F.round("value", 4).alias("v"),
        trace_id.alias("tid"),
    )
    buckets = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        F.sum(value_cents("value")).alias("c"),
        F.count(F.lit(1)).alias("n"),
        F.slice(F.array_sort(F.collect_list(ex)), 1, 3).alias("exemplars"),
    )
    overall = ev.groupBy("event_type").agg(
        F.sum(value_cents("value")).alias("gc"),
        F.count(F.lit(1)).alias("gn"),
    )
    spikes = buckets.join(F.broadcast(overall), "event_type").where(
        2 * F.col("c") * F.col("gn") > 3 * F.col("gc") * F.col("n")
    )
    e = F.posexplode("exemplars")
    return spikes.select(
        "event_type", "bucket_ts", e.alias("pos", "x")
    ).select(
        "event_type",
        "bucket_ts",
        (F.col("pos") + 1).alias("exemplar_rank"),
        F.col("x.tid").alias("trace_id"),
        F.col("x.v").alias("value"),
    )


EVENTS_EXEMPLAR_TRACE_SQL = f"""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         sum(CAST(round(value * 100) AS BIGINT)) AS c, count(*) AS n
  FROM {_EV_SQL} GROUP BY 1, 2
), g AS (
  SELECT event_type, sum(CAST(round(value * 100) AS BIGINT)) AS gc, count(*) AS gn
  FROM {_EV_SQL} GROUP BY 1
), spikes AS (
  SELECT b.event_type, b.bucket_ts
  FROM b JOIN g USING (event_type)
  WHERE 2 * b.c * g.gn > 3 * g.gc * b.n
), ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts, event_id, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY value DESC, event_id) AS rn
  FROM {_EV_SQL}
)
SELECT r.event_type, r.bucket_ts, rn AS exemplar_rank,
       substr(md5(r.event_id::VARCHAR), 1, 16) AS trace_id,
       round(r.value, 4) AS value
FROM ranked r
JOIN spikes s ON r.event_type = s.event_type AND r.bucket_ts = s.bucket_ts
WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# Multi-workspace isolation (round 4)
# --------------------------------------------------------------------------


def events_workspace_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tenant isolation: workspaceId is part of every series
    identity in the reference schema (K1/K2 hash inputs, the first
    ORDER BY column of every table) but no query exercised filtering
    one tenant out of a multi-tenant corpus. Derive four synthetic
    workspaces (user_id % 4), stamp the series fingerprint WITH the
    workspace — the same metric+attrs in two tenants must be distinct
    series — and serve tenant ws1's per-metric aggregate next to the
    all-tenant series count, proving the fingerprint separates tenants
    (n_series < n_series_total) while values stay tenant-pure (exact
    integer-cents sum over ws1 rows only).

    Scale: the tenant filter is the FIRST predicate (prunes to ~1/4 of
    the corpus before any shuffle — on the reference's layout this is
    the primary-key prefix, here a pushed-down scan filter); the
    all-tenant series count is a separate 5-row aggregate broadcast
    back."""
    ev = _events(spark, sf_dir).withColumn(
        "ws", F.concat(F.lit("ws"), (F.col("user_id") % 4).cast("string"))
    )
    fp = F.md5(
        F.concat_ws(
            "|",
            F.col("event_type"),
            F.col("ws"),
            F.concat(F.lit("user_id="), F.col("user_id").cast("string")),
        )
    )
    base = ev.select("event_type", "ws", "value", fp.alias("series_fp"))
    ws1 = base.where(F.col("ws") == "ws1").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("series_fp").alias("n_series"),
        sum_value("value").alias("sum_val"),
    )
    allw = base.groupBy("event_type").agg(
        F.countDistinct("series_fp").alias("n_series_total")
    )
    return ws1.join(F.broadcast(allw), "event_type")


EVENTS_WS_ISOLATION_SQL = f"""
WITH base AS (
  SELECT event_type, 'ws' || (user_id % 4)::VARCHAR AS ws, value,
         md5(event_type || '|' || 'ws' || (user_id % 4)::VARCHAR ||
             '|' || 'user_id=' || user_id) AS series_fp
  FROM {_EV_SQL}
), ws1 AS (
  SELECT event_type, count(*) AS n_events,
         count(DISTINCT series_fp) AS n_series,
         {_SUMV} AS sum_val
  FROM base WHERE ws = 'ws1' GROUP BY event_type
), allw AS (
  SELECT event_type, count(DISTINCT series_fp) AS n_series_total
  FROM base GROUP BY event_type
)
SELECT event_type, n_events, n_series, sum_val, n_series_total
FROM ws1 JOIN allw USING (event_type)
"""


# --------------------------------------------------------------------------
# PromQL rate() with boundary extrapolation
# --------------------------------------------------------------------------


def events_rate_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PromQL ``rate()`` semantics per series and 5-minute range:
    counter increase over the window's samples (reset-corrected — a
    drop adds the pre-reset value, exactly the Prometheus loop), then
    the boundary extrapolation: the sampled interval is extended toward
    each range edge by the distance to it when that is under 1.1× the
    average sample interval, else by half an average interval, with the
    counter's zero-crossing clamp on the start side (never extrapolate
    a counter below zero). ``irate`` (events_irate_5m) is the two-
    sample instantaneous variant; this is the one dashboards actually
    graph. Only deterministic double arithmetic over (first, last,
    corrections, n) — the DuckDB oracle evaluates the identical
    expression tree, so the rounded rates hash-match exactly.

    One shuffle on (series, bucket) serves the in-window lag and the
    aggregation; the fixed 300 s range is the resolution-router grain
    the 5m rollup serves (plans/router.py). The expression tree lives
    in the shared kernel functions/rate.py (also the compile target of
    the PromQL text front-end's rate()/increase())."""
    from clickhouse_metrics_pipeline_spark.functions.rate import (
        rate_over_window,
    )

    return rate_over_window(
        _events(spark, sf_dir), ["user_id", "event_type"], 300
    )


EVENTS_RATE_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, ts, event_id, value,
         time_bucket(INTERVAL 5 MINUTE, ts) AS bucket_ts,
         lag(value) OVER wb AS prev_v,
         row_number() OVER wb AS rn_a,
         row_number() OVER (PARTITION BY user_id, event_type,
                                         time_bucket(INTERVAL 5 MINUTE, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM {_EV_SQL}
  WINDOW wb AS (PARTITION BY user_id, event_type,
                             time_bucket(INTERVAL 5 MINUTE, ts)
                ORDER BY ts, event_id)
), agg AS (
  SELECT user_id, event_type, bucket_ts,
         count(*) AS n_samples,
         max(CASE WHEN rn_a = 1 THEN value END) AS first_v,
         max(CASE WHEN rn_d = 1 THEN value END) AS last_v,
         epoch_us(min(ts)) / 1e6 AS first_s,
         epoch_us(max(ts)) / 1e6 AS last_s,
         sum(CASE WHEN prev_v IS NOT NULL AND value < prev_v
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
                    AND sampled * (first_v / result_v) < first_s - range_start
               THEN sampled * (first_v / result_v)
               ELSE first_s - range_start END) AS dur_start,
         range_start + 300.0 - last_s AS dur_end
  FROM ext
)
SELECT user_id, event_type, bucket_ts, n_samples,
       CASE WHEN n_samples >= 2 AND sampled > 0 THEN
         round(result_v
               * ((sampled
                   + (CASE WHEN dur_start < avg_iv * 1.1
                           THEN dur_start ELSE avg_iv / 2 END)
                   + (CASE WHEN dur_end < avg_iv * 1.1
                           THEN dur_end ELSE avg_iv / 2 END)) / sampled)
               / 300.0, 6)
       END AS rate
FROM ext2
"""


# --------------------------------------------------------------------------
# KMV cross-source overlap estimate (sketch-scale pair diagnostics)
# --------------------------------------------------------------------------


def docs_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 8-gram overlap estimated from per-source KMV
    sketches — the sketch-scale complement of docs_source_overlap's
    exact matrix. The exact path touches every unique (source, gram)
    row per pair; this one reduces each source to a k=128 sketch once,
    then scores ALL pairs row-locally from the tiny sketch table (the
    KMV set-operation estimators of Beyer et al., SIGMOD 2007: for a
    pair, merge the two sketches, count union k-minima present in
    both, jaccard ≈ common/|union k-min|, intersection ≈ jaccard ×
    union estimate). At 100 TB the pair diagnostics cost O(sources² ×
    k) after one corpus scan, instead of a gram-keyed join per pair.
    Every number is integer/IEEE-deterministic, so the DuckDB oracle
    reproduces the sketches AND the estimates exactly; accuracy vs the
    exact matrix is pinned in tests/test_sketch.py."""
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        kmv_estimate,
    )
    from clickhouse_metrics_pipeline_spark.workloads import dedup_index

    k = 128
    # the stored per-source sketch table (one row per source, k bigints
    # each — computed once per corpus at ingest like every dedup index)
    # IS the query input; all pair scoring below is row-local
    sk = dedup_index(spark, sf_dir, "kmv_src128")
    a = sk.select(F.col("source").alias("source_a"), F.col("sk").alias("ska"))
    b = sk.select(F.col("source").alias("source_b"), F.col("sk").alias("skb"))
    p = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    uk = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("ska"), F.col("skb")))),
        1,
        k,
    )
    p = p.select("source_a", "source_b", uk.alias("uk"), "ska", "skb")
    common = F.size(
        F.array_intersect(F.array_intersect(F.col("uk"), F.col("ska")), F.col("skb"))
    )
    n_union = kmv_estimate("uk", k)
    return p.select(
        "source_a",
        "source_b",
        common.alias("n_common"),
        n_union.alias("n_union_est"),
        F.floor(F.lit(10000) * common / F.size("uk")).cast("bigint").alias(
            "jaccard_bp_est"
        ),
        F.floor(common * n_union / F.size("uk")).cast("bigint").alias(
            "n_inter_est"
        ),
    )


def _kmv_source_overlap_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        kmv_estimate_sql,
        kmv_sketch_sql,
    )

    k = 128
    return (
        _EIGHT_GRAM_SQL
        + f""", sg AS (
  SELECT d.source, {portable_hash60_sql("s")} AS h
  FROM (SELECT doc_id, unnest(grams) AS s FROM g) x
  JOIN documents d USING (doc_id)
), sk AS (
  SELECT source, {kmv_sketch_sql("h", k)} AS sk FROM sg GROUP BY source
), p AS (
  SELECT a.source AS source_a, b.source AS source_b, a.sk AS ska, b.sk AS skb,
         list_slice(list_sort(list_distinct(list_concat(a.sk, b.sk))), 1, {k}) AS uk
  FROM sk a JOIN sk b ON a.source < b.source
)
SELECT source_a, source_b,
       len(list_filter(uk, x -> list_contains(ska, x) AND list_contains(skb, x)))::INT AS n_common,
       {kmv_estimate_sql("uk", k)} AS n_union_est,
       floor(10000 * len(list_filter(uk, x -> list_contains(ska, x) AND list_contains(skb, x)))
             / len(uk))::BIGINT AS jaccard_bp_est,
       floor(len(list_filter(uk, x -> list_contains(ska, x) AND list_contains(skb, x)))
             * {kmv_estimate_sql("uk", k)} / len(uk))::BIGINT AS n_inter_est
FROM p
"""
    )


# --------------------------------------------------------------------------
# KMV distinct sketch (mergeable approximate-distinct state)
# --------------------------------------------------------------------------


def events_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct-user KMV sketch (k=64) next to the exact
    count. The reference's rollup tables store only exact aggregates
    (schema.sql:146-192); ClickHouse's uniqState/uniqMerge is the
    production shape for distinct-counts a cascade can re-aggregate —
    this is the deterministic, oracle-checkable equivalent (see
    functions/sketch.py). The full sketch is pinned (order-sensitive
    md5 over all 64 hashes), not just the estimate."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        kmv_estimate,
        kmv_sketch,
        kmv_sketch_md5,
    )

    k = 64
    ev = _events(spark, sf_dir)
    h = portable_hash60(F.col("user_id").cast("string"))
    grouped = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        kmv_sketch(h, k).alias("sk"),
    )
    return grouped.select(
        "event_type",
        "n_exact",
        kmv_estimate("sk", k).alias("n_kmv"),
        F.element_at("sk", k).alias("kth_hash"),
        kmv_sketch_md5("sk").alias("sketch_md5"),
    )


def _kmv_users_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        kmv_estimate_sql,
        kmv_sketch_md5_sql,
        kmv_sketch_sql,
    )

    k = 64
    return f"""
WITH h AS (
  SELECT event_type, user_id,
         {portable_hash60_sql("user_id::VARCHAR")} AS h
  FROM {_EV_SQL}
), sk AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact,
         {kmv_sketch_sql("h", k)} AS sk
  FROM h GROUP BY event_type
)
SELECT event_type, n_exact,
       {kmv_estimate_sql("sk", k)} AS n_kmv,
       list_extract(sk, {k}) AS kth_hash,
       {kmv_sketch_md5_sql("sk")} AS sketch_md5
FROM sk
"""


def events_kmv_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count served FROM STORED ROLLUP STATE: per-minute KMV
    sketches (k=32) merged minute→hour→day, exactly the re-aggregation
    ladder of the reference's MV cascade (schema.sql:146-373) with a
    mergeable distinct state in place of sum/count. The DuckDB oracle
    computes the DIRECT per-day sketch from raw rows, so the hash match
    proves both cross-engine determinism and that the two-level merge
    is lossless (k-min of union of partial k-mins ≡ global k-min).
    k=32 < per-day distinct users, so the estimator branch (not the
    exact small-set branch) is what's being pinned."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
        kmv_sketch_md5,
    )

    k = 32
    ev = _events(spark, sf_dir)
    h = portable_hash60(F.col("user_id").cast("string"))
    per_min = ev.select(
        "event_type", F.date_trunc("minute", "ts").alias("m"), h.alias("h")
    ).groupBy("event_type", "m").agg(kmv_sketch("h", k).alias("sk"))
    per_hour = per_min.groupBy(
        "event_type", F.date_trunc("hour", "m").alias("hr")
    ).agg(kmv_merge("sk", k).alias("sk"))
    per_day = per_hour.groupBy(
        "event_type", F.to_date("hr").alias("day")
    ).agg(kmv_merge("sk", k).alias("sk"))
    return per_day.select(
        "event_type",
        "day",
        kmv_estimate("sk", k).alias("n_kmv"),
        F.element_at("sk", k).alias("kth_hash"),
        kmv_sketch_md5("sk").alias("sketch_md5"),
    )


def _kmv_cascade_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        kmv_estimate_sql,
        kmv_sketch_md5_sql,
        kmv_sketch_sql,
    )

    k = 32
    return f"""
WITH h AS (
  SELECT event_type, ts::DATE AS day,
         {portable_hash60_sql("user_id::VARCHAR")} AS h
  FROM {_EV_SQL}
), sk AS (
  SELECT event_type, day, {kmv_sketch_sql("h", k)} AS sk
  FROM h GROUP BY event_type, day
)
SELECT event_type, day,
       {kmv_estimate_sql("sk", k)} AS n_kmv,
       list_extract(sk, {k}) AS kth_hash,
       {kmv_sketch_md5_sql("sk")} AS sketch_md5
FROM sk
"""


# --------------------------------------------------------------------------
# Catalog
# --------------------------------------------------------------------------

EXTRA2_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_rate_5m": events_rate_5m,
    "events_kmv_users": events_kmv_users,
    "events_kmv_cascade": events_kmv_cascade,
    "docs_kmv_source_overlap": docs_kmv_source_overlap,
    "events_exemplar_trace_join": events_exemplar_trace_join,
    "events_workspace_isolation": events_workspace_isolation,
    "events_session_window": events_session_window,
    "events_sliding_window": events_sliding_window,
    "events_asof_join": events_asof_join,
    "events_incident_windows": events_incident_windows,
    "events_cube_rollup": events_cube_rollup,
    "events_distinct_users": events_distinct_users,
    "events_series_assembly": events_series_assembly,
    "events_exemplar_cap": events_exemplar_cap,
    "events_rollup_cascade": events_rollup_cascade,
    "events_summary_quantiles": events_summary_quantiles,
    "events_resolution_route": events_resolution_route,
    "docs_language_id": docs_language_id,
    "docs_chunking": docs_chunking,
    "docs_token_topk": docs_token_topk,
    "events_irate_5m": events_irate_5m,
    "events_rolling_mean": events_rolling_mean,
    "events_topk_series": events_topk_series,
    "hist_quantile_over_time": hist_quantile_over_time,
    "docs_training_pipeline": docs_training_pipeline,
    "docs_decontaminate": docs_decontaminate,
    "docs_stratified_sample": docs_stratified_sample,
    "events_gap_fill_locf": events_gap_fill_locf,
    "events_pivot_daily": events_pivot_daily,
    "emb_quantize_int8": emb_quantize_int8,
    "docs_pack_sequences": docs_pack_sequences,
    "docs_source_overlap": docs_source_overlap,
}

EXTRA2_ORACLE: dict[str, str] = {
    "events_rate_5m": EVENTS_RATE_SQL,
    "events_kmv_users": _kmv_users_sql(),
    "events_kmv_cascade": _kmv_cascade_sql(),
    "docs_kmv_source_overlap": _kmv_source_overlap_sql(),
    "events_exemplar_trace_join": EVENTS_EXEMPLAR_TRACE_SQL,
    "events_workspace_isolation": EVENTS_WS_ISOLATION_SQL,
    "events_session_window": EVENTS_SESSION_SQL,
    "events_sliding_window": EVENTS_SLIDING_SQL,
    "events_asof_join": EVENTS_ASOF_SQL,
    "events_incident_windows": EVENTS_INCIDENT_SQL,
    "events_cube_rollup": EVENTS_CUBE_SQL,
    "events_distinct_users": EVENTS_DISTINCT_SQL,
    "events_series_assembly": EVENTS_ASSEMBLY_SQL,
    "events_exemplar_cap": EVENTS_EXEMPLAR_SQL,
    "events_rollup_cascade": EVENTS_CASCADE_SQL,
    "events_summary_quantiles": EVENTS_SUMMARY_SQL,
    "events_resolution_route": EVENTS_ROUTE_SQL,
    "docs_language_id": _docs_language_sql(),
    "docs_chunking": DOCS_CHUNKING_SQL,
    "docs_token_topk": DOCS_TOKEN_TOPK_SQL,
    "events_irate_5m": EVENTS_IRATE_SQL,
    "events_rolling_mean": EVENTS_ROLLING_MEAN_SQL,
    "events_topk_series": EVENTS_TOPK_SERIES_SQL,
    "hist_quantile_over_time": _quantile_over_time_sql(),
    "docs_training_pipeline": _training_pipeline_sql(),
    "docs_decontaminate": DOCS_DECONTAMINATE_SQL,
    "docs_stratified_sample": DOCS_STRATIFIED_SAMPLE_SQL,
    "events_gap_fill_locf": EVENTS_GAP_FILL_SQL,
    "events_pivot_daily": EVENTS_PIVOT_SQL,
    "emb_quantize_int8": EMB_QUANTIZE_SQL,
    "docs_pack_sequences": DOCS_PACK_SQL,
    "docs_source_overlap": DOCS_SOURCE_OVERLAP_SQL,
}
