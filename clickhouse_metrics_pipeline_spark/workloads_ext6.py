"""Round-6 catalog extensions.

Two families, both verdict-directed:

- The PromQL front-end extended toward the reference's real query
  surface (``promread/handler.go:177-205`` re-cumulates counters for
  the downstream Prometheus to rate() — this engine completes the
  computation): ``rate()``/``increase()`` compiled onto the shared
  boundary-extrapolation kernel (functions/rate.py, the driver-green
  events_rate_5m expression tree), ``histogram_quantile(phi, ...)``
  compiled onto bucket_percentile_scaled in prometheus-interpolation
  mode, the ``offset`` modifier (grid-shift evaluation), ``topk``
  with a deterministic tiebreak, the ``quantile by`` aggregation and
  ``quantile_over_time`` (both carrying PromQL's linear interpolation
  in exact integer arithmetic). All graded from PromQL TEXT through
  the parser.
- The streaming surface's first driver-graded row:
  ``events_rules_stream_1h`` runs the continuous recording-rules
  operator (streaming/pipeline.recording_rules_stream) over a real
  file stream with an availableNow trigger and emits the closed
  windows — the same long-format rows the batch engine computes,
  which the DuckDB oracle restates with the same watermark-safe
  cutoff. Until now the streaming engine was pytest-pinned only.

Exactness: aggregated rate values are BIGINT micro-units
(round(rate,6) x 1e6 per series, then integer summation — float
cross-series addition would be combine-order dependent);
histogram_quantile emits BIGINT quantile x10000; the streaming rows
are the batch engine's exact integers.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.tables import _events, _t

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"
_CENTS = "CAST(round(value * 100) AS BIGINT)"

EXTRA6_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA6_ORACLE: dict[str, str] = {}


# --------------------------------------------------------------------------
# PromQL text: sum by (event_type) (rate(events[5m]))
# --------------------------------------------------------------------------

PROMQL_RATE_QUERY = "sum by (event_type) (rate(events[5m]))"


def promql_rate_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text rate(): parsed, compiled onto the shared
    functions/rate.py kernel (full Prometheus extrapolatedRate
    semantics — reset correction, boundary extrapolation, zero-clamp),
    per-series micro-unit conversion, then the by(event_type) integer
    sum. The per-series stage is plan-identical to the driver-green
    events_rate_5m; the oracle wraps that query's own SQL tree."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_RATE_QUERY, events_as_series(_events(spark, sf_dir))
    )


def _promql_rate_sql() -> str:
    from clickhouse_metrics_pipeline_spark.workloads_ext2 import (
        EVENTS_RATE_SQL,
    )

    return f"""
SELECT event_type, bucket_ts,
       sum(CAST(round(rate * 1000000) AS BIGINT))::BIGINT AS value
FROM ({EVENTS_RATE_SQL}) rs
WHERE rate IS NOT NULL
GROUP BY 1, 2
"""


EXTRA6_QUERIES["promql_rate_by_type"] = promql_rate_by_type


# --------------------------------------------------------------------------
# PromQL text: histogram_quantile(0.95, sum by (event_type) (...))
# --------------------------------------------------------------------------

PROMQL_HIST_QUERY = (
    "histogram_quantile(0.95, "
    "sum by (event_type) (count_over_time(events[1h])))"
)


def promql_hist_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL text histogram_quantile: values bucketed with the fixed
    le ladder, counts merged at the (event_type, 1h) grain (= the
    PromQL sum over series), walked by bucket_percentile_scaled in
    prometheus mode (prev + frac*(le-prev), the histogram_quantile
    formula). BIGINT quantile x10000. Same merged-histogram walk the
    driver-green hist_quantile_over_time / hist_percentile_prom_events
    pair proved; this row proves the TEXT path end to end."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_HIST_QUERY, events_as_series(_events(spark, sf_dir))
    )


def _promql_hist_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        LE_SQL,
        hist_walk_prom_scaled_sql,
    )

    return f"""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
         {LE_SQL} AS le, count(*)::BIGINT AS cnt
  FROM {_EV_SQL} GROUP BY 1, 2, 3
), w AS (
  SELECT event_type, bucket_ts, le, cnt,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts ORDER BY le) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, bucket_ts) AS total,
         lag(le, 1, 0.0) OVER (PARTITION BY event_type, bucket_ts
                               ORDER BY le) AS prev
  FROM b
)
SELECT event_type, bucket_ts,
       {hist_walk_prom_scaled_sql(95)} AS value
FROM w GROUP BY event_type, bucket_ts
"""


EXTRA6_QUERIES["promql_hist_p95"] = promql_hist_p95


# --------------------------------------------------------------------------
# Streaming graded rows (SS2.9): shared staging/run helpers
# --------------------------------------------------------------------------


def _stage_events_stream(spark: SparkSession, sf_dir: str, prefix: str):
    """readStream over the (immutable, read-only) driver events parquet.

    The file stream source needs a DIRECTORY, so the file is staged
    into a temp source dir; ts gets the same normalization the batch
    _events applies (NANOS files surface as bigint under nanosAsLong).
    Returns (stream, staged_src_dir) — remove the dir once drained."""
    raw = _t(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix=prefix)
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        shutil.copytree(path, f"{src}/events.parquet")
    else:
        shutil.copy(path, f"{src}/events.parquet")
    stream = spark.readStream.schema(raw.schema).parquet(src)
    dt = dict(stream.dtypes)["ts"]
    if dt == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    elif dt == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream, src


def _drain_available_now(out: DataFrame, src: str, prefix: str) -> str:
    """Run the streaming plan to completion (availableNow, append-mode
    parquet sink), then drop the staged source and checkpoint — only
    the output dir must outlive the call (the returned path is read
    lazily by the graded DataFrame)."""
    tmp = tempfile.mkdtemp(prefix=prefix)
    q = (
        out.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .format("parquet")
        .start(f"{tmp}/out")
    )
    if not q.awaitTermination(600):
        # timed out: stopping here would leave a silently PARTIAL sink
        # that grades wrong-but-plausible — fail loudly instead
        q.stop()
        raise RuntimeError(
            "streaming availableNow drain exceeded 600s; refusing to "
            "grade a partial sink"
        )
    q.stop()
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
    return f"{tmp}/out"


def _closed_windows(
    spark: SparkSession, sf_dir: str, out_dir: str, grain_sql: str
) -> DataFrame:
    """Watermark-safe cutoff both engines restate: keep windows ending
    at or before max(ts) - 20 min (margin over the 10-min watermark so
    the comparison is independent of the >=/> eviction edge and of
    microbatch slicing)."""
    max_ts = _events(spark, sf_dir).agg(F.max("ts")).collect()[0][0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 20 MINUTES")
    return spark.read.parquet(out_dir).where(
        F.col("bucket_ts") + F.expr(f"INTERVAL {grain_sql}") <= cutoff
    )


# --------------------------------------------------------------------------
# Streaming recording rules as a driver-graded row (SS2.9)
# --------------------------------------------------------------------------


def events_rules_stream_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous recording-rules operator run as a REAL stream:
    readStream over the events parquet, ONE streaming window
    aggregation to per-(type, 1h) integer partials behind a 10-minute
    watermark, rule fan-out through a single explode, availableNow
    trigger, append-mode parquet sink — then the emitted CLOSED
    windows, which must equal the batch rules engine row-for-row.

    Watermark-safe grading: append mode emits a window once the
    watermark (max event time - 10 min) passes its end, so the emitted
    set covers every window ending at or before max(ts) - 20 min with
    margin; both sides filter to exactly that cutoff, making the
    comparison independent of the >=/> eviction edge and of microbatch
    slicing. First driver-graded row whose path goes through
    streaming/pipeline.py (until now pytest-pinned only).

    Scale: the streaming aggregation state is (types x open windows)
    integer triples — bounded by the watermark horizon, not by rows;
    identical plan at 100 TB/day ingest."""
    from clickhouse_metrics_pipeline_spark.plans.rules import Rule
    from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
        recording_rules_stream,
    )

    rules = [
        Rule("job:events:count_1h", "count"),
        Rule("job:value:sum_cents_1h", "sum_cents"),
        Rule("job:value:avg_scaled_1h", "avg_scaled"),
    ]
    stream, src = _stage_events_stream(spark, sf_dir, "rules_stream_src_")
    out = recording_rules_stream(
        stream, rules, type_col="event_type", ts_col="ts", value_col="value"
    )
    out_dir = _drain_available_now(out, src, "rules_stream_")
    return _closed_windows(spark, sf_dir, out_dir, "1 HOUR").select(
        "record", "event_type", "bucket_ts", "value"
    )


EVENTS_RULES_STREAM_SQL = f"""
WITH base AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
         count(*) AS n, sum({_CENTS})::BIGINT AS c
  FROM {_EV_SQL}
  GROUP BY 1, 2
), mx AS (
  SELECT max(ts) - INTERVAL 20 MINUTE AS cutoff FROM {_EV_SQL}
), closed AS (
  SELECT * FROM base
  WHERE bucket_ts + INTERVAL 1 HOUR <= (SELECT cutoff FROM mx)
)
SELECT 'job:events:count_1h' AS record, event_type, bucket_ts, n AS value
FROM closed
UNION ALL
SELECT 'job:value:sum_cents_1h', event_type, bucket_ts, c FROM closed
UNION ALL
SELECT 'job:value:avg_scaled_1h', event_type, bucket_ts,
       (CASE WHEN c < 0 THEN -1 ELSE 1 END)
         * ((200 * abs(c)::HUGEINT + n) // (2 * n))::BIGINT
FROM closed
"""

EXTRA6_QUERIES["events_rules_stream_1h"] = events_rules_stream_1h
EXTRA6_ORACLE["events_rules_stream_1h"] = EVENTS_RULES_STREAM_SQL
EXTRA6_ORACLE["promql_rate_by_type"] = _promql_rate_sql()
EXTRA6_ORACLE["promql_hist_p95"] = _promql_hist_sql()


# --------------------------------------------------------------------------
# PromQL text batch 2: topk, offset modifier, quantile aggregation
# --------------------------------------------------------------------------

PROMQL_TOPK_QUERY = (
    "topk(3, sum by (event_type) (count_over_time(events[6h])))"
)


def promql_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL topk over an aggregated vector: per 6h evaluation
    window, the 3 busiest event types. Deterministic tiebreak (value
    desc, then event_type asc) — real PromQL ties are nondeterministic;
    the subset documents the divergence so the result value-hashes."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_TOPK_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_TOPK_SQL = f"""
WITH g AS (
  SELECT event_type, time_bucket(INTERVAL 6 HOUR, ts) AS bucket_ts,
         count(*) AS value
  FROM {_EV_SQL} GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket_ts
             ORDER BY value DESC, event_type ASC) AS rn
  FROM g
)
SELECT event_type, bucket_ts, value FROM r WHERE rn <= 3
"""


PROMQL_OFFSET_QUERY = (
    "sum by (event_type) (count_over_time(events[1h] offset 90m))"
)


def promql_offset_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL offset modifier: evaluate hourly counts over data
    older by 90 minutes. The deliberately non-grain-multiple offset
    proves the grid-shift semantics — a sample at t lands in the
    window [T-1h, T) iff t in [T-1h-90m, T-90m), i.e. the hourly grid
    shifts to :30 boundaries. The oracle restates it as
    time_bucket(1h, ts + 90 minutes)."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_OFFSET_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_OFFSET_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 1 HOUR, ts + INTERVAL 90 MINUTE) AS bucket_ts,
       count(*) AS value
FROM {_EV_SQL}
GROUP BY 1, 2
"""


PROMQL_QUANTILE_QUERY = (
    "quantile by (event_type) (0.5, sum_over_time(events[1h]))"
)


def promql_quantile_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL quantile aggregation: the median per-series hourly cents
    sum within each event type, PromQL's linear interpolation carried
    in EXACT integer arithmetic (plans/promql._quantile_agg): with the
    per-series values sorted, pos = p*(n-1) percent units,
    value = v_lo*10000 + (v_hi-v_lo)*(pos%100)*100 — the quantile
    x10000 with no float anywhere, so both engines hash identically."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_QUANTILE_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_QUANTILE_SQL = f"""
WITH per_series AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
         sum({_CENTS})::BIGINT AS v
  FROM {_EV_SQL} GROUP BY 1, 2, 3
), r AS (
  SELECT event_type, bucket_ts, v,
         row_number() OVER (PARTITION BY event_type, bucket_ts
                            ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type, bucket_ts) AS n
  FROM per_series
), pick AS (
  SELECT event_type, bucket_ts,
         max(CASE WHEN rn = (50 * (n - 1)) // 100 + 1 THEN v END) AS vlo,
         max(CASE WHEN rn = least((50 * (n - 1)) // 100 + 2, n)
                  THEN v END) AS vhi,
         max((50 * (n - 1)) % 100) AS rem
  FROM r GROUP BY 1, 2
)
SELECT event_type, bucket_ts,
       (vlo * 10000 + (vhi - vlo) * rem * 100)::BIGINT AS value
FROM pick
"""

EXTRA6_QUERIES["promql_topk_types"] = promql_topk_types
EXTRA6_QUERIES["promql_offset_counts"] = promql_offset_counts
EXTRA6_QUERIES["promql_quantile_by_type"] = promql_quantile_by_type
EXTRA6_ORACLE["promql_topk_types"] = PROMQL_TOPK_SQL
EXTRA6_ORACLE["promql_offset_counts"] = PROMQL_OFFSET_SQL
EXTRA6_ORACLE["promql_quantile_by_type"] = PROMQL_QUANTILE_SQL


PROMQL_QOT_QUERY = (
    "max by (event_type) (quantile_over_time(0.9, events[1h]))"
)


def promql_q90_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_over_time: per-series p90 of the window's sample cents
    (exact integer interpolation over the sorted in-window array,
    BIGINT x10000), then max by event_type — the "worst series p90"
    panel. Proves the two-arg range-function path of the parser and
    the row-local sorted-array quantile kernel."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_QOT_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_QOT_SQL = f"""
WITH s AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts, {_CENTS} AS v
  FROM {_EV_SQL}
), r AS (
  SELECT event_type, user_id, bucket_ts, v,
         row_number() OVER (PARTITION BY event_type, user_id, bucket_ts
                            ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY event_type, user_id,
                                     bucket_ts) AS n
  FROM s
), pick AS (
  SELECT event_type, user_id, bucket_ts,
         max(CASE WHEN rn = (90 * (n - 1)) // 100 + 1 THEN v END) AS vlo,
         max(CASE WHEN rn = least((90 * (n - 1)) // 100 + 2, n)
                  THEN v END) AS vhi,
         max((90 * (n - 1)) % 100) AS rem
  FROM r GROUP BY 1, 2, 3
)
SELECT event_type, bucket_ts,
       max(vlo * 10000 + (vhi - vlo) * rem * 100)::BIGINT AS value
FROM pick GROUP BY 1, 2
"""

EXTRA6_QUERIES["promql_q90_over_time"] = promql_q90_over_time
EXTRA6_ORACLE["promql_q90_over_time"] = PROMQL_QOT_SQL


# --------------------------------------------------------------------------
# Second streaming-graded row: the windowed rollup MV as a stream
# --------------------------------------------------------------------------


def events_rollup_stream_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming windowed rollup (streaming/pipeline.rollup_stream —
    the continuous form of the reference's 1m MV, schema.sql:146-192)
    run over a real file stream with availableNow, graded on its
    hash-exact columns: per (metric, series, 1-minute window) min, max
    and sample count. value_sum/value_avg are float-combine columns
    (order-dependent addition) and value_last needs a unique-ts
    tiebreak, so the graded projection deliberately excludes them —
    the batch catalog grades those semantics via the integer-cents
    rollup queries instead. min/max ARE order-independent selections
    (hash-safe even as doubles), but the graded projection still casts
    them to exact integer cents so the no-float-in-hash-graded-
    streaming-projections contract (r6 verdict item 7, enforced by
    tools/check_oracle.py::audit_stream_schema and
    tests/test_graded_stream_schema.py) holds uniformly. Same watermark-safe cutoff contract as
    events_rules_stream_1h. The series key is an md5 canonical
    fingerprint both engines can compute."""
    from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
        rollup_stream,
    )

    stream, src = _stage_events_stream(spark, sf_dir, "rollup_stream_src_")
    shaped = stream.select(
        F.col("ts").alias("timestamp"),
        F.lit("default").alias("workspaceId"),
        F.col("event_type").alias("metric"),
        F.md5(
            F.concat_ws("|", F.col("event_type"), F.col("user_id"))
        ).alias("series_hash"),
        F.col("value"),
        F.lit(None).cast("double").alias("sum"),
        F.lit(None).cast("bigint").alias("count"),
    )
    out = rollup_stream(shaped, grain="1 minute")
    out_dir = _drain_available_now(out, src, "rollup_stream_")
    return _closed_windows(spark, sf_dir, out_dir, "1 MINUTE").select(
        "metric",
        "series_hash",
        "bucket_ts",
        F.round(F.col("value_min") * 100).cast("bigint").alias("min_cents"),
        F.round(F.col("value_max") * 100).cast("bigint").alias("max_cents"),
        "samples_count",
    )


EVENTS_ROLLUP_STREAM_SQL = f"""
WITH mx AS (
  SELECT max(ts) - INTERVAL 20 MINUTE AS cutoff FROM {_EV_SQL}
)
SELECT event_type AS metric,
       md5(event_type || '|' || user_id::VARCHAR) AS series_hash,
       time_bucket(INTERVAL 1 MINUTE, ts) AS bucket_ts,
       CAST(round(min(value) * 100) AS BIGINT) AS min_cents,
       CAST(round(max(value) * 100) AS BIGINT) AS max_cents,
       count(*) AS samples_count
FROM {_EV_SQL}
GROUP BY 1, 2, 3
HAVING bucket_ts + INTERVAL 1 MINUTE <= (SELECT cutoff FROM mx)
"""

EXTRA6_QUERIES["events_rollup_stream_1m"] = events_rollup_stream_1m
EXTRA6_ORACLE["events_rollup_stream_1m"] = EVENTS_ROLLUP_STREAM_SQL


# --------------------------------------------------------------------------
# PromQL binary op: the week-over-week ratio from text
# --------------------------------------------------------------------------

PROMQL_WOW_QUERY = (
    "sum by (event_type) (count_over_time(events[1d])) / "
    "sum by (event_type) (count_over_time(events[1d] offset 7d))"
)


def promql_wow_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL vector arithmetic: daily counts divided by week-ago
    daily counts per event type, in truncated ppm — the
    events_wow_ratio kernel reachable from PromQL TEXT. The offset
    grid-shift puts week-ago data into the current evaluation window,
    the by-tuple is the vector-matching key, and the division rides
    the exact decimal floor divider."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_WOW_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_WOW_SQL = f"""
WITH cur AS (
  SELECT event_type, time_bucket(INTERVAL 1 DAY, ts) AS bucket_ts,
         count(*) AS c
  FROM {_EV_SQL} GROUP BY 1, 2
), prv AS (
  SELECT event_type,
         time_bucket(INTERVAL 1 DAY, ts + INTERVAL 7 DAY) AS bucket_ts,
         count(*) AS c
  FROM {_EV_SQL} GROUP BY 1, 2
)
SELECT cur.event_type, cur.bucket_ts,
       ((cur.c * 1000000) // prv.c)::BIGINT AS value
FROM cur JOIN prv USING (event_type, bucket_ts)
WHERE prv.c != 0
"""

EXTRA6_QUERIES["promql_wow_ratio"] = promql_wow_ratio
EXTRA6_ORACLE["promql_wow_ratio"] = PROMQL_WOW_SQL
