"""Round-5 catalog extensions.

Four families, every query with a value-hash DuckDB oracle and the
catalog's exactness contract (integer / scaled-integer arithmetic on
every computed value — no float combine anywhere):

- PromQL range-function completions over the events stream:
  stddev_over_time (exact integer variance state), delta(), resets(),
  histogram_fraction, week-over-week offset ratio, active-series
  churn, staleness, the Grafana heatmap grid, and a group_left-style
  dimension enrichment (events joined broadcast to the customer
  table — the PromQL ``on(...) group_left`` shape).
- Corpus-curation panels over documents: log2 length histogram,
  stopword-ratio profile, duplicate token-mass inflation (probing the
  stored exact-dedup keeper index), per-label int8 norm statistics.
- Deterministic-integer trained ANN — the round-5 flagships:
  ``emb_ivf_int_topk`` (IVF with an integer Lloyd k-means coarse
  quantizer) and ``emb_pq_int_adc_topk`` (product quantization with
  integer codebooks and ADC lookup-table search). Every model
  parameter derives from md5 + integer arithmetic, so both trained
  index + probe pipelines have full value-hash oracles — closing the
  round-4 gap where trained-ANN queries could only be graded
  rows-only. Models memoize per corpus and persist as stored indexes
  (store_ivf_int_index / store_pq_int_index; train once at ingest,
  probe per query).
- The recording-rules engine (plans/rules.py) as a catalog query:
  a five-rule set evaluated from one scan/shuffle, long format.

Scale notes are per-query; the common rules: aggregations reduce at
the source grain before any join, dimension joins broadcast, window
partitions are bounded by construction (per-bucket, per-series, or
df-capped), and probe outputs are O(k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_metrics_pipeline_spark.tables import _events, _t, value_cents

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"
_CENTS = "CAST(round(value * 100) AS BIGINT)"


# --------------------------------------------------------------------------
# stddev_over_time with exact integer variance state
# --------------------------------------------------------------------------


def events_stddev_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``stddev_over_time`` per (event_type, 1h window), carried
    as the EXACT integer moment state instead of a float stddev:
    (n, sum_cents, var_num = n*Σc² − (Σc)²). var_num / n² is the
    population variance in cents² — any client can take the final
    square root; the stored state is combine-order exact and mergeable
    across windows (the same reason the rollup MVs store sum+count
    rather than avg). Scale: one shuffle to the window grain with
    map-side partial sums; Σc² ≤ rows·(max cents)² fits BIGINT through
    petabyte-scale windows (1e12 rows × 1e7 cents² ≈ 1e19 would need
    DECIMAL — per-hour windows are orders of magnitude below that)."""
    ev = _events(spark, sf_dir)
    c = value_cents("value")
    g = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(c).alias("sum_cents"),
        F.sum(c * c).alias("sumsq_cents"),
    )
    return g.select(
        "event_type",
        "bucket_ts",
        "n_samples",
        "sum_cents",
        (
            F.col("n_samples") * F.col("sumsq_cents")
            - F.col("sum_cents") * F.col("sum_cents")
        ).alias("var_num"),
    )


EVENTS_STDDEV_SQL = f"""
SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
       count(*) AS n_samples,
       sum({_CENTS})::BIGINT AS sum_cents,
       (count(*) * sum({_CENTS} * {_CENTS})
         - sum({_CENTS}) * sum({_CENTS}))::BIGINT AS var_num
FROM {_EV_SQL}
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# PromQL delta() at the series × hour grain
# --------------------------------------------------------------------------


def events_delta_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``delta()`` for gauges: per (user_id, event_type, 1h),
    last sample minus first sample in integer cents. Sample order is
    (ts, event_id) — event_id is unique, so first/last are
    deterministic. Scale: single shuffle to the series-window grain;
    min_by/max_by are streaming aggregates (no per-group sort)."""
    ev = _events(spark, sf_dir)
    key = F.struct("ts", "event_id")
    c = value_cents("value")
    return (
        ev.groupBy(
            "user_id",
            "event_type",
            F.date_trunc("hour", "ts").alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.min_by(c, key).alias("_first"),
            F.max_by(c, key).alias("_last"),
        )
        .select(
            "user_id",
            "event_type",
            "bucket_ts",
            "n_samples",
            (F.col("_last") - F.col("_first")).alias("delta_cents"),
        )
    )


EVENTS_DELTA_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_type, date_trunc('hour', ts) AS bucket_ts,
         {_CENTS} AS c,
         row_number() OVER w_asc AS rn_a,
         row_number() OVER w_desc AS rn_d
  FROM {_EV_SQL}
  WINDOW w_asc AS (PARTITION BY user_id, event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id),
         w_desc AS (PARTITION BY user_id, event_type, date_trunc('hour', ts)
                    ORDER BY ts DESC, event_id DESC)
)
SELECT user_id, event_type, bucket_ts,
       count(*) AS n_samples,
       max(CASE WHEN rn_d = 1 THEN c END)
         - max(CASE WHEN rn_a = 1 THEN c END) AS delta_cents
FROM ranked
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# PromQL resets() at the rollup grain
# --------------------------------------------------------------------------


def events_resets_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``resets()``: per (event_type, hour), how many
    consecutive-sample DECREASES occurred — the windowed twin of
    events_reset_detect (whole-series grain) and the decrease-only
    counterpart of events_changes_1h. Same bounded per-bucket sort
    window, same (ts, event_id) determinism, pure comparisons."""
    ev = _events(spark, sf_dir)
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket_ts"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "bucket_ts").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    flagged = b.select(
        "event_type",
        "bucket_ts",
        F.when(prev.isNotNull() & (prev > F.col("value")), 1)
        .otherwise(0)
        .alias("_dec"),
    )
    return flagged.groupBy("event_type", "bucket_ts").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("_dec").cast("bigint").alias("n_resets"),
    )


EVENTS_RESETS_SQL = f"""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts, ts, event_id, value
  FROM {_EV_SQL}
), f AS (
  SELECT event_type, bucket_ts,
         CASE WHEN lag(value) OVER w IS NOT NULL
                   AND lag(value) OVER w > value THEN 1 ELSE 0 END AS is_dec
  FROM b
  WINDOW w AS (PARTITION BY event_type, bucket_ts ORDER BY ts, event_id)
)
SELECT event_type, bucket_ts, count(*)::BIGINT AS n_points,
       sum(is_dec)::BIGINT AS n_resets
FROM f GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# PromQL histogram_fraction from the bucket histogram
# --------------------------------------------------------------------------


def events_histogram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``histogram_fraction(-Inf, 100, ...)`` per event_type: the exact
    fraction of samples with value <= 100, computed from the same
    fixed-bound buckets the H1 percentile queries use, emitted as
    integer parts-per-million (truncating division — both engines
    truncate toward zero on non-negative operands). Map-only partial
    counts; one tiny shuffle per type."""
    ev = _events(spark, sf_dir)
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("value") <= 100.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_le_100"),
    )
    exact_ppm = (
        F.col("n_le_100") * F.lit(1_000_000)
        - (F.col("n_le_100") * F.lit(1_000_000)) % F.col("n_total")
    ) / F.col("n_total")
    return g.select(
        "event_type",
        "n_le_100",
        "n_total",
        exact_ppm.cast("bigint").alias("frac_ppm"),
    )


EVENTS_HIST_FRACTION_SQL = f"""
SELECT event_type,
       sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END)::BIGINT AS n_le_100,
       count(*) AS n_total,
       (sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END)::BIGINT * 1000000)
         // count(*) AS frac_ppm
FROM {_EV_SQL}
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Active-series accounting (the TSDB head-cardinality panel)
# --------------------------------------------------------------------------


def events_active_series_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per hour: how many distinct series were active, and how many
    appeared for the FIRST time (series churn — the head-cardinality
    growth panel every metrics TSDB watches; series = (user_id,
    event_type), K1/K2 grain). Scale: active counts reduce per
    (hour, series) map-side before the distinct count; first-seen is
    one groupBy over series (the series dictionary — tiny next to
    samples), re-bucketed and broadcast-joined onto the hourly
    actives."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.select(
            F.date_trunc("hour", "ts").alias("bucket_ts"),
            "user_id",
            "event_type",
        )
        .distinct()
        .groupBy("bucket_ts")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    births = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("_first_ts"))
        .groupBy(F.date_trunc("hour", "_first_ts").alias("bucket_ts"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    return hourly.join(F.broadcast(births), "bucket_ts", "left").select(
        "bucket_ts",
        "n_active",
        F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
    )


EVENTS_CHURN_SQL = f"""
WITH hourly AS (
  SELECT bucket_ts, count(*)::BIGINT AS n_active FROM (
    SELECT DISTINCT date_trunc('hour', ts) AS bucket_ts, user_id, event_type
    FROM {_EV_SQL}) GROUP BY 1
), births AS (
  SELECT date_trunc('hour', first_ts) AS bucket_ts, count(*)::BIGINT AS n_new
  FROM (SELECT user_id, event_type, min(ts) AS first_ts
        FROM {_EV_SQL} GROUP BY 1, 2)
  GROUP BY 1
)
SELECT hourly.bucket_ts, n_active,
       coalesce(n_new, 0)::BIGINT AS n_new
FROM hourly LEFT JOIN births ON births.bucket_ts = hourly.bucket_ts
"""


# --------------------------------------------------------------------------
# Staleness report (PromQL staleness / the "gone quiet" panel)
# --------------------------------------------------------------------------


def events_staleness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per series: last sample time and integer seconds of staleness
    relative to the corpus watermark (max ts overall) — the query
    behind stale-series eviction and the absent() alert family.
    Scale: series reduction is one groupBy; the watermark is a 1-row
    broadcast scalar crossJoin (the established scalar-join shape);
    microsecond subtraction with integer div — no float time math."""
    ev = _events(spark, sf_dir)
    per_series = ev.groupBy("user_id", "event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    wm = ev.agg(F.max("ts").alias("_wm_ts"))
    joined = per_series.crossJoin(F.broadcast(wm))
    stale_us = F.unix_micros("_wm_ts") - F.unix_micros("last_ts")
    return joined.select(
        "user_id",
        "event_type",
        "last_ts",
        "n_samples",
        ((stale_us - stale_us % F.lit(1_000_000)) / F.lit(1_000_000))
        .cast("bigint")
        .alias("staleness_s"),
    )


EVENTS_STALENESS_SQL = f"""
WITH per_series AS (
  SELECT user_id, event_type, max(ts) AS last_ts, count(*) AS n_samples
  FROM {_EV_SQL} GROUP BY 1, 2
), wm AS (SELECT max(ts) AS wm_ts FROM {_EV_SQL})
SELECT user_id, event_type, last_ts, n_samples,
       (epoch_us(wm_ts) - epoch_us(last_ts)) // 1000000 AS staleness_s
FROM per_series CROSS JOIN wm
"""


# --------------------------------------------------------------------------
# Week-over-week offset ratio (PromQL `offset 7d` comparison)
# --------------------------------------------------------------------------


def events_wow_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL ``metric / metric offset 7d`` panel: per (event_type,
    day), sample count against the same weekday one week earlier, with
    the ratio in truncated parts-per-million (NULL when no prior-week
    row). Scale: the daily rollup is tiny (types × days); the offset
    join is a broadcast self-join on the shifted day key."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    prev = daily.select(
        "event_type",
        (F.col("day_ts") + F.expr("INTERVAL 7 DAYS")).alias("day_ts"),
        F.col("n").alias("n_prev_week"),
    )
    j = daily.join(F.broadcast(prev), ["event_type", "day_ts"], "left")
    ratio = (
        F.col("n") * F.lit(1_000_000)
        - (F.col("n") * F.lit(1_000_000)) % F.col("n_prev_week")
    ) / F.col("n_prev_week")
    return j.select(
        "event_type",
        "day_ts",
        "n",
        "n_prev_week",
        F.when(F.col("n_prev_week") > 0, ratio)
        .cast("bigint")
        .alias("wow_ppm"),
    )


EVENTS_WOW_SQL = f"""
WITH daily AS (
  -- ::TIMESTAMP: DuckDB's date_trunc('day') yields DATE, Spark's a
  -- timestamp — align the compared type
  SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day_ts, count(*) AS n
  FROM {_EV_SQL} GROUP BY 1, 2
)
SELECT d.event_type, d.day_ts, d.n,
       p.n AS n_prev_week,
       CASE WHEN p.n > 0 THEN (d.n * 1000000) // p.n END AS wow_ppm
FROM daily d LEFT JOIN daily p
  ON p.event_type = d.event_type
 AND p.day_ts + INTERVAL 7 DAY = d.day_ts
"""


# --------------------------------------------------------------------------
# group_left dimension enrichment (events × customer)
# --------------------------------------------------------------------------


def events_user_enrich_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``group_left`` / ClickHouse dictionary-join shape: the
    top-20 users by event volume enriched with customer dimension
    attributes (events.user_id -> customer.c_custkey). The dimension
    side broadcasts — the many-to-one enrichment never shuffles the
    fact table by the dimension key. acctbal passes through rounded
    (stored 2-decimal, no arithmetic)."""
    ev = _events(spark, sf_dir)
    c = _t(spark, sf_dir, "customer")
    top = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(20)
    )
    return top.join(
        F.broadcast(c), top.user_id == c.c_custkey, "left"
    ).select(
        "user_id",
        "n_events",
        "n_types",
        "c_name",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )


EVENTS_ENRICH_SQL = f"""
WITH top AS (
  SELECT user_id, count(*) AS n_events,
         count(DISTINCT event_type) AS n_types
  FROM {_EV_SQL}
  GROUP BY user_id
  ORDER BY n_events DESC, user_id
  LIMIT 20
)
SELECT user_id, n_events, n_types, c_name, c_mktsegment,
       round(c_acctbal, 2) AS c_acctbal
FROM top LEFT JOIN customer ON c_custkey = user_id
"""


# --------------------------------------------------------------------------
# Heatmap grid (hour-of-day × value bucket)
# --------------------------------------------------------------------------


def events_heatmap_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Grafana heatmap: sample counts on the (hour-of-day, le
    bucket) grid per event_type — 24 × 7 cells per type, the 2-D
    marginal both the seasonal profile and the histogram panels slice.
    Map-side combinable counts only."""
    from clickhouse_metrics_pipeline_spark.workloads import _le_expr

    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.hour("ts").cast("bigint").alias("hod"),
            _le_expr(F.col("value")).alias("le"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _heatmap_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import LE_SQL

    return f"""
SELECT event_type, hour(ts)::BIGINT AS hod, {LE_SQL} AS le,
       count(*) AS n
FROM {_EV_SQL}
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Corpus curation panels over documents
# --------------------------------------------------------------------------

# log2 length buckets: CASE ladder over powers of two (integer-exact in
# any engine; no float log anywhere). Documents are bounded well below
# 2^24 chars in this corpus; the ladder top-clamps beyond it.
_LOG2_TOP = 24


def _log2_bucket_spark(col):
    out = F.lit(_LOG2_TOP)
    for b in range(_LOG2_TOP - 1, -1, -1):
        out = F.when(col < F.lit(1 << (b + 1)), F.lit(b)).otherwise(out)
    return F.when(col <= 0, F.lit(-1)).otherwise(out).cast("bigint")


def _log2_bucket_sql(expr: str) -> str:
    cases = " ".join(
        f"WHEN {expr} < {1 << (b + 1)} THEN {b}" for b in range(_LOG2_TOP)
    )
    return (
        f"(CASE WHEN {expr} <= 0 THEN -1 {cases} "
        f"ELSE {_LOG2_TOP} END)::BIGINT"
    )


def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length distribution: per (source, floor(log2(n_chars)))
    bucket, document count and total chars — the curation panel that
    catches truncation spikes and boilerplate walls. The log2 bucket is
    a power-of-two CASE ladder (integer-exact; float log would put
    documents AT a power of two on an engine-dependent side)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "source", _log2_bucket_spark(F.col("n_chars")).alias("len_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


DOCS_LENGTH_HIST_SQL = f"""
SELECT source, {_log2_bucket_sql("n_chars")} AS len_bucket,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents
GROUP BY 1, 2
"""


def docs_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio deciles per source: bucket = trunc(10 * hits /
    n_tokens) clamped to 9 — the quality-score marginal (a natural-
    language doc sits in deciles 2-5; code and boilerplate sit at 0-1).
    All integer: token counts and truncating division only."""
    from clickhouse_metrics_pipeline_spark.functions.text import (
        STOPWORDS_EN,
        tokens,
    )

    d = _t(spark, sf_dir, "documents")
    w = d.select("source", tokens("text").alias("_w"))
    sw = F.array([F.lit(s) for s in STOPWORDS_EN])
    counted = w.select(
        "source",
        F.size("_w").cast("bigint").alias("_n"),
        F.size(F.filter("_w", lambda x: F.array_contains(sw, x)))
        .cast("bigint")
        .alias("_hits"),
    )
    dec = (
        F.col("_hits") * 10 - (F.col("_hits") * 10) % F.col("_n")
    ) / F.col("_n")
    return (
        counted.withColumn(
            "decile",
            F.least(
                F.when(F.col("_n") > 0, dec).otherwise(F.lit(0)).cast("bigint"),
                F.lit(9).cast("bigint"),
            ),
        )
        .groupBy("source", "decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _stopword_profile_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        sql_list_lit,
        sql_tokens,
    )
    from clickhouse_metrics_pipeline_spark.functions.text import STOPWORDS_EN

    toks = sql_tokens()
    sw = sql_list_lit(STOPWORDS_EN)
    return f"""
WITH c AS (
  SELECT source, len({toks})::BIGINT AS n,
         len(list_filter({toks}, x -> list_contains({sw}, x)))::BIGINT AS hits
  FROM documents
)
SELECT source,
       least(CASE WHEN n > 0 THEN (hits * 10) // n ELSE 0 END, 9)::BIGINT
         AS decile,
       count(*) AS n_docs
FROM c GROUP BY 1, 2
"""


def docs_dup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate token-mass inflation per source: what fraction of a
    source's tokens live in documents that exact-dedup would drop
    (non-keepers), in truncated ppm. Probes the stored exact-dedup
    keeper index (``dedup_index('exact_keepers')`` — the ingest-time
    artifact) with a broadcast anti-join; token counting is row-local.
    The panel that tells a curation run how much raw mass dedup will
    reclaim, per source."""
    from clickhouse_metrics_pipeline_spark.functions.text import tokens
    from clickhouse_metrics_pipeline_spark.workloads import dedup_index

    d = _t(spark, sf_dir, "documents")
    keepers = dedup_index(spark, sf_dir, "exact_keepers")
    toks = d.select(
        "doc_id", "source", F.size(tokens("text")).cast("bigint").alias("_t")
    )
    flagged = toks.join(
        F.broadcast(keepers), "doc_id", "left_semi"
    ).select("source", F.col("_t").alias("_kt"))
    total = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("_t").alias("total_tokens")
    )
    kept = flagged.groupBy("source").agg(F.sum("_kt").alias("_kept_tokens"))
    j = total.join(F.broadcast(kept), "source", "left").select(
        "source",
        "n_docs",
        "total_tokens",
        (F.col("total_tokens") - F.coalesce("_kept_tokens", F.lit(0))).alias(
            "dup_tokens"
        ),
    )
    ppm = (
        F.col("dup_tokens") * F.lit(1_000_000)
        - (F.col("dup_tokens") * F.lit(1_000_000)) % F.col("total_tokens")
    ) / F.col("total_tokens")
    return j.withColumn("dup_ppm", ppm.cast("bigint"))


def _dup_inflation_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import sql_tokens

    toks = sql_tokens()
    return f"""
WITH t AS (
  SELECT doc_id, source, len({toks})::BIGINT AS nt,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents
), keepers AS (
  SELECT min(doc_id) AS doc_id FROM t GROUP BY fp
), agg AS (
  SELECT source, count(*) AS n_docs, sum(nt)::BIGINT AS total_tokens,
         sum(CASE WHEN doc_id IN (SELECT doc_id FROM keepers)
                  THEN 0 ELSE nt END)::BIGINT AS dup_tokens
  FROM t GROUP BY source
)
SELECT source, n_docs, total_tokens, dup_tokens,
       ((dup_tokens * 1000000) // total_tokens)::BIGINT AS dup_ppm
FROM agg
"""


def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization health per label: min/max/sum of int8 squared
    norms plus vector count — the panel that catches labels whose
    vectors collapse under int8 (norm underflow) or saturate. Derives
    n2 with the same deterministic quantizer the ANN family uses; all
    BIGINT."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int8_quantize,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = int8_quantize(F.col("embedding"))["q"]
    n2 = F.aggregate(
        F.transform(q, lambda x: x.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x * x,
    )
    g = e.select("label", n2.alias("_n2"))
    return g.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("_n2").alias("min_n2"),
        F.max("_n2").alias("max_n2"),
        F.sum("_n2").alias("sum_n2"),
    )


EMB_NORM_STATS_SQL = """
WITH qv AS (
  SELECT label,
         CASE WHEN s > 0
              THEN list_transform(embedding, x -> round(x::DOUBLE / s)::BIGINT)
              ELSE list_transform(embedding, x -> 0::BIGINT) END AS q
  FROM (SELECT label, embedding,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE)))/127.0 AS s
        FROM embeddings)
)
SELECT label, count(*) AS n_vecs,
       min(n2) AS min_n2, max(n2) AS max_n2, sum(n2)::BIGINT AS sum_n2
FROM (SELECT label,
             list_sum(list_transform(q, x -> x * x))::BIGINT AS n2
      FROM qv)
GROUP BY label
"""


EXTRA5_QUERIES = {
    "events_stddev_over_time": events_stddev_over_time,
    "events_delta_1h": events_delta_1h,
    "events_resets_1h": events_resets_1h,
    "events_histogram_fraction": events_histogram_fraction,
    "events_active_series_churn": events_active_series_churn,
    "events_staleness_report": events_staleness_report,
    "events_wow_ratio": events_wow_ratio,
    "events_user_enrich_topk": events_user_enrich_topk,
    "events_heatmap_grid": events_heatmap_grid,
    "docs_length_histogram": docs_length_histogram,
    "docs_stopword_profile": docs_stopword_profile,
    "docs_dup_inflation": docs_dup_inflation,
    "emb_norm_stats": emb_norm_stats,
}

EXTRA5_ORACLE = {
    "events_stddev_over_time": EVENTS_STDDEV_SQL,
    "events_delta_1h": EVENTS_DELTA_SQL,
    "events_resets_1h": EVENTS_RESETS_SQL,
    "events_histogram_fraction": EVENTS_HIST_FRACTION_SQL,
    "events_active_series_churn": EVENTS_CHURN_SQL,
    "events_staleness_report": EVENTS_STALENESS_SQL,
    "events_wow_ratio": EVENTS_WOW_SQL,
    "events_user_enrich_topk": EVENTS_ENRICH_SQL,
    "events_heatmap_grid": _heatmap_sql(),
    "docs_length_histogram": DOCS_LENGTH_HIST_SQL,
    "docs_stopword_profile": _stopword_profile_sql(),
    "docs_dup_inflation": _dup_inflation_sql(),
    "emb_norm_stats": EMB_NORM_STATS_SQL,
}


# --------------------------------------------------------------------------
# Round-5 flagship: deterministic-integer IVF ANN with a value-hash
# oracle (operators/similarity.py int_kmeans_fit_assign / ivf_int_topk)
# --------------------------------------------------------------------------

_IVF_K = 8
_IVF_ITERS = 2
_IVF_NPROBE = 2
_IVF_TOPK = 5
_IVF_PROBE_MAX = 10

# memoized trained model per corpus: (centroids df, assigned df) — the
# train-once / probe-per-query deployment shape (same contract as
# workloads_ext._IVF_INDEX for the float family)
_IVF_INT_MODEL: dict[str, tuple[DataFrame, DataFrame]] = {}


def _ivf_int_paths(root: str, sf_dir: str) -> tuple[str, str]:
    import os

    corpus = os.path.basename(sf_dir.rstrip("/"))
    base = f"{root}/{corpus}/ivfint{_IVF_K}x{_IVF_ITERS}"
    return f"{base}/centroids", f"{base}/assigned"


def _load_ivf_int(spark: SparkSession, sf_dir: str):
    """Stored-index path for the integer IVF model: when
    $SPARK_GRAFT_INDEX_DIR holds a persisted (centroids, assigned)
    pair (store_ivf_int_index / tools/build_indexes.py), probe queries
    read the parquet tables instead of retraining — the same contract
    as the float IVF's stored index. Returns None when absent."""
    from clickhouse_metrics_pipeline_spark.sources.writer import load_index
    from clickhouse_metrics_pipeline_spark.workloads import index_root

    root = index_root()
    if root is None:
        return None
    cp, ap = _ivf_int_paths(root, sf_dir)
    cent, assigned = load_index(spark, cp), load_index(spark, ap)
    if cent is None or assigned is None:
        return None
    return cent, assigned


def store_ivf_int_index(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> tuple[str, str]:
    """Materialize the trained integer-IVF model (k-row centroid table
    + cluster-assigned corpus, partitioned by cid so probes prune to
    their nprobe partitions) — the ingest-time job; deterministic
    training makes stored == retrained exactly (pinned in
    tests/test_stored_index.py)."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int_kmeans_fit_assign,
    )
    from clickhouse_metrics_pipeline_spark.sources.writer import write_index
    from clickhouse_metrics_pipeline_spark.workloads import index_root

    root = root or index_root()
    if root is None:
        raise ValueError("no index root: pass root= or set SPARK_GRAFT_INDEX_DIR")
    cent, assigned = int_kmeans_fit_assign(
        _t(spark, sf_dir, "embeddings"), k=_IVF_K, iters=_IVF_ITERS
    )
    cp, ap = _ivf_int_paths(root, sf_dir)
    write_index(cent, cp)
    write_index(assigned, ap, partition_by=["cid"])
    return cp, ap


def emb_ivf_int_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a TRAINED k-means coarse quantizer in deterministic
    integer arithmetic — the first trained-ANN catalog query with a
    full value-hash oracle (the float/rand() IVF pair could only be
    graded rows-only; this derives every model parameter from md5 +
    integer Lloyd steps, so the DuckDB twin rebuilds the identical
    model, assignment, and probe results).

    Model: 8 centroids, md5-hash-order seeds, 2 unrolled Lloyd
    iterations over the int8-quantized corpus, truncating-division
    centroid updates. Probes (vec_id < 10) search the nprobe=2 nearest
    clusters and rank candidates by integer squared L2 (ties to the
    lower vec_id) — top-5 each.

    Scale: see the operator docstring — one-job-per-iteration
    treeAggregate fit, candidate join bounded to the probed clusters
    (~nprobe/k of the corpus), O(k) output. The trained model
    (centroids + cluster-assigned corpus) is memoized per corpus,
    exactly like the float IVF family's stored index: training is
    deterministic, so train-once / probe-per-query is
    semantics-preserving and is the deployment shape — warm runs
    measure the probe, cold runs record the train."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int_kmeans_fit_assign,
        ivf_int_probe,
    )

    key = sf_dir
    if key not in _IVF_INT_MODEL:
        _IVF_INT_MODEL[key] = _load_ivf_int(spark, sf_dir) or (
            lambda e: int_kmeans_fit_assign(e, k=_IVF_K, iters=_IVF_ITERS)
        )(_t(spark, sf_dir, "embeddings"))
    cent, assigned = _IVF_INT_MODEL[key]
    return ivf_int_probe(
        cent,
        assigned,
        k_clusters=_IVF_K,
        nprobe=_IVF_NPROBE,
        topk=_IVF_TOPK,
        probe_max_id=_IVF_PROBE_MAX,
    )


def _ivf_dist2_sql(qa: str, qb: str) -> str:
    return (
        f"list_sum([({qa}[i+1]-{qb}[i+1])*({qa}[i+1]-{qb}[i+1]) "
        f"for i in range(0,64)])::BIGINT"
    )


def _ivf_assign_cte(cent: str, name: str, k: int) -> str:
    d2 = _ivf_dist2_sql("qv.q", f"{cent}.cvec")
    return f"""{name} AS (
  SELECT vec_id, min(skey) % {k} AS cid FROM (
    SELECT qv.vec_id, {d2} * {k} + {cent}.cid AS skey
    FROM qv CROSS JOIN {cent})
  GROUP BY vec_id
)"""


def _ivf_update_cte(assign: str, cent_in: str, cent_out: str) -> str:
    # truncating per-dimension integer mean; empty clusters keep the
    # previous centroid (coalesce)
    return f"""{cent_out} AS (
  SELECT {cent_in}.cid, coalesce(u.cvec, {cent_in}.cvec) AS cvec
  FROM {cent_in} LEFT JOIN (
    SELECT cid, list(m ORDER BY d) AS cvec FROM (
      SELECT cid, d, CAST((s - s % n) / n AS BIGINT) AS m FROM (
        SELECT cid, d, sum(v)::BIGINT AS s, count(*) AS n FROM (
          SELECT a.cid, unnest(qv.q) AS v,
                 generate_subscripts(qv.q, 1) AS d
          FROM {assign} a JOIN qv USING (vec_id))
        GROUP BY 1, 2))
    GROUP BY cid) u ON u.cid = {cent_in}.cid
)"""


def _ivf_sql() -> str:
    k, nprobe, topk, pmax = _IVF_K, _IVF_NPROBE, _IVF_TOPK, _IVF_PROBE_MAX
    d2p = _ivf_dist2_sql("p.pq", "c2.cvec")
    d2c = _ivf_dist2_sql("p.pq", "qv.q")
    return f"""
WITH qv AS (
  SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(embedding, x -> round(x::DOUBLE / s)::BIGINT)
              ELSE list_transform(embedding, x -> 0::BIGINT) END AS q
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE)))/127.0 AS s
        FROM embeddings)
), c0 AS (
  SELECT (row_number() OVER (ORDER BY h, vec_id) - 1)::BIGINT AS cid,
         q AS cvec
  FROM (SELECT vec_id, q,
               ('0x'||substr(md5('ivf:'||vec_id::VARCHAR),1,15))::BIGINT AS h
        FROM qv ORDER BY h, vec_id LIMIT {k})
), {_ivf_assign_cte("c0", "a1", k)},
{_ivf_update_cte("a1", "c0", "c1")},
{_ivf_assign_cte("c1", "a2", k)},
{_ivf_update_cte("a2", "c1", "c2")},
{_ivf_assign_cte("c2", "a3", k)},
probes AS (
  SELECT vec_id AS probe_id, q AS pq FROM qv WHERE vec_id < {pmax}
), pc AS (
  SELECT probe_id, pq, cid FROM (
    SELECT p.probe_id, p.pq, c2.cid,
           row_number() OVER (PARTITION BY p.probe_id
                              ORDER BY {d2p} * {k} + c2.cid) AS r
    FROM probes p CROSS JOIN c2)
  WHERE r <= {nprobe}
), cand AS (
  SELECT p.probe_id, qv.vec_id, {d2c} AS dist2
  FROM pc p JOIN a3 ON a3.cid = p.cid JOIN qv ON qv.vec_id = a3.vec_id
  WHERE qv.vec_id != p.probe_id
)
SELECT probe_id, rank, vec_id, dist2 FROM (
  SELECT probe_id, vec_id, dist2,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY dist2, vec_id)::BIGINT AS rank
  FROM cand)
WHERE rank <= {topk}
"""


EXTRA5_QUERIES["emb_ivf_int_topk"] = emb_ivf_int_topk
EXTRA5_ORACLE["emb_ivf_int_topk"] = _ivf_sql()


# --------------------------------------------------------------------------
# Deterministic-integer product quantization with ADC search
# --------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_K = 16  # codes per subspace
_PQ_SUB = 16  # dims per subspace (64 / m)
_PQ_ITERS = 2
_PQ_TOPK = 5
_PQ_PROBE_MAX = 10

# memoized trained codebooks + encoded corpus per sf_dir (train-once /
# probe-per-query, like _IVF_INT_MODEL)
_PQ_INT_MODEL: dict[str, tuple] = {}


def _pq_int_paths(root: str, sf_dir: str) -> tuple[str, str]:
    import os

    corpus = os.path.basename(sf_dir.rstrip("/"))
    base = f"{root}/{corpus}/pqint{_PQ_M}x{_PQ_K}x{_PQ_ITERS}"
    return f"{base}/codebooks", f"{base}/codes"


def _load_pq_int(spark: SparkSession, sf_dir: str):
    """Stored-index path for the integer PQ model (codebooks parquet ->
    numpy, encoded code table) — same contract as _load_ivf_int."""
    import numpy as np

    from clickhouse_metrics_pipeline_spark.sources.writer import load_index
    from clickhouse_metrics_pipeline_spark.workloads import index_root

    root = index_root()
    if root is None:
        return None
    bp, cp = _pq_int_paths(root, sf_dir)
    bdf, codes = load_index(spark, bp), load_index(spark, cp)
    if bdf is None or codes is None:
        return None
    books = np.zeros((_PQ_M, _PQ_K, 64 // _PQ_M), dtype=np.int64)
    for r in bdf.collect():  # m*k rows — bounded model collect
        books[r.sub, r.cid] = np.asarray(r.cvec, dtype=np.int64)
    return books, codes


def store_pq_int_index(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> tuple[str, str]:
    """Materialize the trained integer-PQ model (m*k codebook rows +
    the encoded code table) — ingest-time job; deterministic training
    makes stored == retrained exactly."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int_pq_fit_encode,
    )
    from clickhouse_metrics_pipeline_spark.sources.writer import write_index
    from clickhouse_metrics_pipeline_spark.workloads import index_root

    root = root or index_root()
    if root is None:
        raise ValueError("no index root: pass root= or set SPARK_GRAFT_INDEX_DIR")
    books, encoded = int_pq_fit_encode(
        _t(spark, sf_dir, "embeddings"),
        m_subs=_PQ_M,
        k_codes=_PQ_K,
        iters=_PQ_ITERS,
    )
    rows = [
        (s, c, [int(x) for x in books[s, c]])
        for s in range(_PQ_M)
        for c in range(_PQ_K)
    ]
    bdf = spark.createDataFrame(
        rows, "sub bigint, cid bigint, cvec array<bigint>"
    )
    bp, cp = _pq_int_paths(root, sf_dir)
    write_index(bdf, bp)
    write_index(encoded, cp)
    return bp, cp


def emb_pq_int_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with ADC lookup-table search, in
    deterministic integer arithmetic end to end — the PQ counterpart
    of emb_ivf_int_topk, giving the second trained-ANN family a full
    value-hash oracle (the float-codebook emb_pq_adc_topk stays
    rows-only/pytest): md5-hash-order seeds donate their sub-vectors
    to every subspace's initial codebook, integer Lloyd per subspace
    (all subspaces in one pass per iteration), truncating-division
    updates, 4x16 codebooks over 16-dim subspaces, exact integer
    ADC distances summed over 4 table lookups per corpus vector.

    Scale: fit is iters+1 map-only passes; the probe scan reads the
    code table (4 bigints/vector) with m lookups per row — ADC's
    memory-bound operating point next to IVF's compute-bound one.
    Model memoized per corpus."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int_pq_fit_encode,
        pq_int_adc_topk,
    )

    if sf_dir not in _PQ_INT_MODEL:
        _PQ_INT_MODEL[sf_dir] = _load_pq_int(spark, sf_dir) or int_pq_fit_encode(
            _t(spark, sf_dir, "embeddings"),
            m_subs=_PQ_M,
            k_codes=_PQ_K,
            iters=_PQ_ITERS,
        )
    books, encoded = _PQ_INT_MODEL[sf_dir]
    return pq_int_adc_topk(
        books, encoded, topk=_PQ_TOPK, probe_max_id=_PQ_PROBE_MAX
    )


def _pq_dist2_sql(a: str, b: str, n: int) -> str:
    return (
        f"list_sum([({a}[i+1]-{b}[i+1])*({a}[i+1]-{b}[i+1]) "
        f"for i in range(0,{n})])::BIGINT"
    )


def _pq_assign_cte(books: str, name: str) -> str:
    d2 = _pq_dist2_sql("sv.subvec", f"{books}.cvec", _PQ_SUB)
    return f"""{name} AS (
  SELECT vec_id, sub, min(skey) % {_PQ_K} AS cid FROM (
    SELECT sv.vec_id, sv.sub, {d2} * {_PQ_K} + {books}.cid AS skey
    FROM sv JOIN {books} ON {books}.sub = sv.sub)
  GROUP BY vec_id, sub
)"""


def _pq_update_cte(assign: str, books_in: str, books_out: str) -> str:
    return f"""{books_out} AS (
  SELECT {books_in}.sub, {books_in}.cid,
         coalesce(u.cvec, {books_in}.cvec) AS cvec
  FROM {books_in} LEFT JOIN (
    SELECT sub, cid, list(m ORDER BY d) AS cvec FROM (
      SELECT sub, cid, d, CAST((s - s % n) / n AS BIGINT) AS m FROM (
        SELECT sub, cid, d, sum(v)::BIGINT AS s, count(*) AS n FROM (
          SELECT a.sub, a.cid, unnest(sv.subvec) AS v,
                 generate_subscripts(sv.subvec, 1) AS d
          FROM {assign} a JOIN sv ON sv.vec_id = a.vec_id AND sv.sub = a.sub)
        GROUP BY 1, 2, 3))
    GROUP BY sub, cid) u
    ON u.sub = {books_in}.sub AND u.cid = {books_in}.cid
)"""


def _pq_sql() -> str:
    d2lut = _pq_dist2_sql("p.subvec", "b2.cvec", _PQ_SUB)
    return f"""
WITH qv AS (
  SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(embedding, x -> round(x::DOUBLE / s)::BIGINT)
              ELSE list_transform(embedding, x -> 0::BIGINT) END AS q
  FROM (SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE)))/127.0 AS s
        FROM embeddings)
), sv AS (
  SELECT vec_id, sub, q[sub*{_PQ_SUB}+1 : (sub+1)*{_PQ_SUB}] AS subvec
  FROM qv CROSS JOIN (SELECT unnest(range(0,{_PQ_M})) AS sub)
), seeds AS (
  SELECT (row_number() OVER (ORDER BY h, vec_id) - 1)::BIGINT AS cid, q
  FROM (SELECT vec_id, q,
               ('0x'||substr(md5('pq:'||vec_id::VARCHAR),1,15))::BIGINT AS h
        FROM qv ORDER BY h, vec_id LIMIT {_PQ_K})
), b0 AS (
  SELECT sub, cid, q[sub*{_PQ_SUB}+1 : (sub+1)*{_PQ_SUB}] AS cvec
  FROM seeds CROSS JOIN (SELECT unnest(range(0,{_PQ_M})) AS sub)
), {_pq_assign_cte("b0", "a1")},
{_pq_update_cte("a1", "b0", "b1")},
{_pq_assign_cte("b1", "a2")},
{_pq_update_cte("a2", "b1", "b2")},
{_pq_assign_cte("b2", "codes")},
probes AS (
  SELECT vec_id AS probe_id, sub, subvec FROM sv WHERE vec_id < {_PQ_PROBE_MAX}
), lut AS (
  SELECT p.probe_id, p.sub, b2.cid, {d2lut} AS d2
  FROM probes p JOIN b2 ON b2.sub = p.sub
), scored AS (
  SELECT l.probe_id, c.vec_id, sum(l.d2)::BIGINT AS adc_dist2
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.cid = c.cid
  WHERE c.vec_id != l.probe_id
  GROUP BY l.probe_id, c.vec_id
)
SELECT probe_id, rank, vec_id, adc_dist2 FROM (
  SELECT probe_id, vec_id, adc_dist2,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY adc_dist2, vec_id)::BIGINT AS rank
  FROM scored)
WHERE rank <= {_PQ_TOPK}
"""


EXTRA5_QUERIES["emb_pq_int_adc_topk"] = emb_pq_int_adc_topk
EXTRA5_ORACLE["emb_pq_int_adc_topk"] = _pq_sql()


# --------------------------------------------------------------------------
# Recording rules (plans/rules.py) as a catalog query
# --------------------------------------------------------------------------


def events_recording_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A five-rule recording-rule set evaluated by the rules engine
    (plans/rules.py): per-type hourly count / cents sum / half-up
    scaled average / window share, plus the global error-ratio rule —
    all derived from ONE scan and ONE shuffle (the per-type hourly
    integer partials; global rules re-aggregate the tiny partial
    relation, never the stream). Long-format output, exact integers.
    The Prometheus recording_rules / reference-MV surface
    (schema.sql:146-192), generalized from three fixed views to a rule
    set where adding a rule never adds a scan."""
    from clickhouse_metrics_pipeline_spark.plans.rules import (
        Rule,
        evaluate_rules,
    )

    rules = [
        Rule("job:events:count_1h", "count"),
        Rule("job:value:sum_cents_1h", "sum_cents"),
        Rule("job:value:avg_scaled_1h", "avg_scaled"),
        Rule("job:events:share_ppm_1h", "share_ppm"),
        Rule("job:errors:ratio_ppm_1h", "error_ratio_ppm"),
    ]
    return evaluate_rules(_events(spark, sf_dir), rules)


EVENTS_RECORDING_RULES_SQL = f"""
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         count(*) AS n, sum({_CENTS})::BIGINT AS c
  FROM {_EV_SQL}
  GROUP BY 1, 2
), win AS (
  SELECT *, (sum(n) OVER (PARTITION BY bucket_ts))::BIGINT AS n_window
  FROM base
)
SELECT 'job:events:count_1h' AS record, event_type, bucket_ts, n AS value
FROM win
UNION ALL
SELECT 'job:value:sum_cents_1h', event_type, bucket_ts, c FROM win
UNION ALL
SELECT 'job:value:avg_scaled_1h', event_type, bucket_ts,
       (CASE WHEN c < 0 THEN -1 ELSE 1 END)
         * ((200 * abs(c)::HUGEINT + n) // (2 * n))::BIGINT
FROM win
UNION ALL
SELECT 'job:events:share_ppm_1h', event_type, bucket_ts,
       ((n * 1000000) // n_window)::BIGINT
FROM win
UNION ALL
SELECT 'job:errors:ratio_ppm_1h', NULL, bucket_ts,
       ((sum(CASE WHEN event_type = 'error' THEN n ELSE 0 END) * 1000000)
         // sum(n))::BIGINT
FROM base GROUP BY bucket_ts
"""

EXTRA5_QUERIES["events_recording_rules"] = events_recording_rules
EXTRA5_ORACLE["events_recording_rules"] = EVENTS_RECORDING_RULES_SQL


# --------------------------------------------------------------------------
# PromQL front-end (plans/promql.py) as catalog queries: the compiled
# plan is graded against a hand-written SQL statement of the same
# semantics — text query in, value-hash-checked relational result out
# --------------------------------------------------------------------------

PROMQL_COUNT_QUERY = (
    'sum by (event_type) (count_over_time(events{event_type!~"^v.*"}[1h]))'
)
PROMQL_AVG_QUERY = "avg by (event_type) (sum_over_time(events[1h]))"


def promql_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PromQL text query — parsed, compiled through the matcher
    kernel (F8-F10) onto the events series frame, evaluated at the
    range grain. Semantics under test: NRE matcher (absent label
    matches, '^v.*' drops view), per-series count_over_time, sum by
    event_type re-aggregation. See plans/promql.py for the subset
    grammar and the exactness contract."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_COUNT_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_COUNT_SQL = f"""
SELECT event_type,
       time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
       count(*) AS value
FROM {_EV_SQL}
WHERE NOT regexp_matches(event_type, '^v.*')
GROUP BY 1, 2
"""


def promql_avg_sum_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg-by over per-series sum_over_time: per (event_type, user,
    1h) integer-cents sums, then the half-up x10000 mean of those
    per-series values within each (event_type, window) — the
    "average series contribution" panel. All integer; the oracle
    restates both aggregation levels."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        compile_promql,
        events_as_series,
    )

    return compile_promql(
        PROMQL_AVG_QUERY, events_as_series(_events(spark, sf_dir))
    )


PROMQL_AVG_SQL = f"""
WITH per_series AS (
  SELECT event_type, user_id,
         time_bucket(INTERVAL 1 HOUR, ts) AS bucket_ts,
         sum({_CENTS}) AS v
  FROM {_EV_SQL}
  GROUP BY 1, 2, 3
), g AS (
  SELECT event_type, bucket_ts, sum(v) AS s, count(*) AS n
  FROM per_series GROUP BY 1, 2
)
SELECT event_type, bucket_ts,
       (CASE WHEN s < 0 THEN -1 ELSE 1 END)
         * ((2 * abs(s)::HUGEINT * 10000 + n) // (2 * n))::BIGINT AS value
FROM g
"""

EXTRA5_QUERIES["promql_count_by_type"] = promql_count_by_type
EXTRA5_QUERIES["promql_avg_sum_by_type"] = promql_avg_sum_by_type
EXTRA5_ORACLE["promql_count_by_type"] = PROMQL_COUNT_SQL
EXTRA5_ORACLE["promql_avg_sum_by_type"] = PROMQL_AVG_SQL
