"""Third extended catalog (round 4): alerting, product analytics,
sketch-served quantiles, chart downsampling, and curation extensions.

Metrics/observability: rolling z-score anomaly flags (exact integer
DECIMAL algebra), two-window SLO error-budget burn rate (integer
cross-multiplied page condition), interval-union uptime coverage
(sweep line, the ClickHouse intervalLengthSum shape).

Product analytics (ClickHouse-aggregate parity): windowFunnel ordered
chains (linear per-user state machine, cubic declarative oracle),
retention() daily cohort matrices, largestTriangleThreeBuckets chart
downsampling (exact-integer LTTB, recursive-CTE oracle).

Sketch-served quantiles: deterministic bottom-k-by-hash row samples
(functions/sketch.py) — per-group estimates and a minute→hour→day
cascade whose oracle computes the DIRECT sample, pinning merge
losslessness.

LLM-data curation: embedding-space cluster dedup over the stored pair
index, BPE merge-candidate induction (row-local zip_with pairs), and
deterministic token-budget mixture sampling (operators/mixture.py).

Reference anchors: none of these exist in the reference (its engine
stops at pairwise SQL joins and fixed-grain rollups); several are
surface-parity with ClickHouse aggregates its users would reach for.
Every query keeps the catalog contract: exact cross-engine-stable
arithmetic (integer cents / epoch micros / DECIMAL(38,0) / HUGEINT),
a DuckDB oracle twin, and an inline 100 TB scale note.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_metrics_pipeline_spark.functions.hashing import portable_hash60
from clickhouse_metrics_pipeline_spark.functions.text import (
    BPE_TOKEN_RE,
    token_count,
)
from clickhouse_metrics_pipeline_spark.oracle_fragments import (
    portable_hash60_sql,
    sql_tokens,
)
from clickhouse_metrics_pipeline_spark.tables import _events, _t

_EV_SQL = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events) events"


# --------------------------------------------------------------------------
# Embedding-cluster dedup
# --------------------------------------------------------------------------


def emb_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level embedding dedup: connected components over the
    exact cosine>=0.45 pair graph (the same edges emb_neardup_pairs
    emits), labeling every involved vector with its component's min
    vec_id and the component size — the embedding-space twin of
    docs_neardup_clusters. Pairwise drop-the-higher-id over-deletes on
    similarity chains; component keepers are what semantic dedup ships.

    Scale: edges come from the stored verified-pair artifact
    (``embpairs045``, the embedding twin of ``pairs08`` — materialized
    once at ingest, probed by every downstream job); in production the
    pairs come from the SRP-LSH candidate path
    (operators.similarity.lsh_neardup_pairs) — the clustering kernel is
    identical either way (adaptive: driver union-find under 1M edges,
    O(log diameter) min-label propagation rounds above, per-round eager
    localCheckpoint keeping lineage O(1))."""
    from clickhouse_metrics_pipeline_spark.operators.dedup import (
        neardup_components,
    )
    from clickhouse_metrics_pipeline_spark.workloads import dedup_index

    pairs = dedup_index(spark, sf_dir, "embpairs045").select("id_a", "id_b")
    comp = neardup_components(pairs)
    w = Window.partitionBy("keeper_id")
    return comp.select(
        F.col("doc_id").alias("vec_id"),
        "keeper_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    )


EMB_CLUSTERS_SQL = """
WITH RECURSIVE pj AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a, embeddings b
  WHERE a.vec_id < 1000 AND b.vec_id < 1000 AND a.vec_id < b.vec_id
    AND round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.45
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pj
  UNION
  SELECT id_b, id_a FROM pj
), reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
), labels AS (
  SELECT id AS vec_id, min(r) AS keeper_id FROM reach GROUP BY id
)
SELECT vec_id, keeper_id,
       count(*) OVER (PARTITION BY keeper_id) AS cluster_size
FROM labels
"""


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection (exact integer form)
# --------------------------------------------------------------------------


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series event-rate anomaly detection: hourly event counts per
    event_type, each bucket compared against the trailing 24 buckets'
    sample mean/stddev; flag |z| > 2. The alerting query a metrics
    store exists to serve, over the same rollup grain as the 1h MV.

    EXACT arithmetic: with k = trailing bucket count, S = sum of
    trailing counts, SS = sum of squares, sample variance is
    (k*SS - S^2) / (k*(k-1)) and z^2 > 4 rearranges to the all-integer
    comparison  (k*n - S)^2 * (k-1) > 4 * k * (k*SS - S^2)  — no
    division, no sqrt, no float at any point, so the flag is
    bit-identical across engines and combine orders. Everything is
    computed in DECIMAL(38,0) (DuckDB: HUGEINT): with per-bucket counts
    up to ~1e9 (100 TB scale) the cross-multiplied terms reach ~1e21,
    past int64 — decimal keeps the comparison exact instead of silently
    wrapping. A zero-variance history (k*SS = S^2) flags ANY deviation
    (z is infinite); buckets with fewer than 12 trailing buckets are
    never flagged (cold-start guard).

    Scale: one shuffle to the (event_type, hour) grain — the rollup
    cardinality, not the raw one — then a bounded ROWS window per
    series. No self-join, no explosion; identical shape at 1000x."""
    ev = _events(spark, sf_dir)
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = Window.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(-24, -1)
    b = b.select(
        "event_type",
        "bucket_ts",
        "n_events",
        F.count(F.lit(1)).over(w).alias("trail_k"),
        F.sum(dec(F.col("n_events"))).over(w).alias("_s"),
        F.sum(dec(F.col("n_events")) * dec(F.col("n_events")))
        .over(w)
        .alias("_ss"),
    )
    k, n = dec(F.col("trail_k")), dec(F.col("n_events"))
    s, ss = F.col("_s"), F.col("_ss")
    dev = k * n - s
    lhs = dev * dev * (k - F.lit(1))
    rhs = F.lit(4) * k * (k * ss - s * s)
    return b.select(
        "event_type",
        "bucket_ts",
        "n_events",
        F.col("trail_k").cast("bigint").alias("trail_k"),
        ((F.col("trail_k") >= 12) & (lhs > rhs)).alias("is_anomaly"),
    )


EVENTS_ANOMALY_SQL = f"""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         count(*)::HUGEINT AS n
  FROM {_EV_SQL} GROUP BY 1, 2
), t AS (
  SELECT event_type, bucket_ts, n,
         count(*) OVER w AS k,
         coalesce(sum(n) OVER w, 0::HUGEINT) AS s,
         coalesce(sum(n * n) OVER w, 0::HUGEINT) AS ss
  FROM b
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket_ts, n::BIGINT AS n_events, k::BIGINT AS trail_k,
       (k >= 12 AND
        (k * n - s) * (k * n - s) * (k - 1) > 4 * k * (k * ss - s * s))
         AS is_anomaly
FROM t
"""


# --------------------------------------------------------------------------
# BPE merge-candidate induction
# --------------------------------------------------------------------------


def docs_bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: the 20 most frequent adjacent pretoken
    bigrams over the corpus — the first merge step of BPE training
    applied at pretoken granularity (letter runs / digit runs / single
    punctuation, the same BPE_TOKEN_RE pretokenizer bpe_token_count
    uses). Ties broken by pair text so the cut at rank 20 is total.

    Scale: pairs are built ROW-LOCALLY as zip_with over two shifted
    slices of the pretoken array (no explode of anything bigger than
    the document's own pairs), then one count shuffle on the pair key
    with map-side partial aggregation; the top-20 is a 20-row
    TakeOrdered on already-aggregated counts. At 100 TB the pair-key
    space is vocabulary-bounded (~1e6 distinct), so the final
    aggregate is tiny regardless of corpus size."""
    d = _t(spark, sf_dir, "documents")

    # r11 optimization: bind the pretoken array once per row (row_let —
    # the zip_with chain is CodegenFallback, so the unbound form re-ran
    # the whole-document regexp_extract_all ~5x per row: the when
    # guard, both slice sizes, and both slices)
    from clickhouse_metrics_pipeline_spark.functions.expr import row_let

    def _pairs_of(pre: Column) -> Column:
        m = F.size(pre) - 1
        return F.when(
            m >= 1,
            F.zip_with(
                F.slice(pre, 1, m),
                F.slice(pre, 2, m),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))

    pairs = row_let(
        {
            "p": F.regexp_extract_all(
                F.col("text"), F.lit(BPE_TOKEN_RE), F.lit(0)
            )
        },
        lambda s: _pairs_of(s["p"]),
    )
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .orderBy(F.desc("n_pair"), "pair")
        .limit(20)
    )


DOCS_BPE_MERGES_SQL = """
WITH pre AS (
  SELECT regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS p
  FROM documents
), pairs AS (
  SELECT unnest(CASE WHEN len(p) >= 2
                     THEN [p[i] || ' ' || p[i+1] for i in range(1, len(p))]
                     ELSE [] END) AS pair
  FROM pre
)
SELECT pair, count(*)::BIGINT AS n_pair
FROM pairs GROUP BY pair
ORDER BY n_pair DESC, pair
LIMIT 20
"""


# --------------------------------------------------------------------------
# Deterministic mixture sampling
# --------------------------------------------------------------------------

# Target mixture over the corpus's sources, in basis points (sums to
# 10000): a few heavy sources, a mid tier, a long tail — the shape a
# real pretraining mixture has (cf. the published LLaMA / Pile
# mixtures' few-heavy-many-light source weighting).
MIXTURE_BP: dict[str, int] = {
    **{f"src{i}": 1500 for i in range(4)},
    **{f"src{i}": 500 for i in range(4, 10)},
    **{f"src{i}": 100 for i in range(10, 20)},
}

# Global token budget = 40% of the corpus's total tokens; each source's
# quota is budget * weight. Expressed as a single integer division so
# both engines agree exactly: quota = (total_tok * w_bp) div 25000
# (= total * 0.4 * w_bp / 10000).
_MIX_DIV = 25000


def docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: select documents per source to
    fill a token budget distributed per MIXTURE_BP — the
    curation step that turns a raw crawl into a training mixture.
    Within each source, documents are ordered by a portable md5-derived
    hash (reproducible "random" order, identical in any engine and on
    any retry — never rand()) and kept while the source's running token
    total stays within quota.

    Scale: the only global aggregate is a 1-row total that broadcasts
    into every task; quota assignment is a map-side expression; the
    keep decision is one running-sum window per (source, shard)
    partition. This pinned query runs the operator
    (operators/mixture.py) at num_shards=1 so the DuckDB oracle is a
    single per-source window; production passes a cluster-proportional
    shard count — the exact quota split keeps per-source totals within
    quota at any shard count (tests/test_mixture.py)."""
    from clickhouse_metrics_pipeline_spark.operators.mixture import (
        mixture_sample,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tok")
    )
    return mixture_sample(
        d,
        weights_bp=MIXTURE_BP,
        budget_divisor=_MIX_DIV,
        num_shards=1,
    ).select("doc_id", "source", "n_tok", "cum_tok", "quota_tok")


def _mixture_sample_sql() -> str:
    vals = ", ".join(
        f"('{s}', {bp})" for s, bp in sorted(MIXTURE_BP.items())
    )
    return f"""
WITH d AS (
  SELECT doc_id, source, len({sql_tokens()})::BIGINT AS n_tok
  FROM documents
), t AS (
  SELECT sum(n_tok)::BIGINT AS total_tok FROM d
), w AS (
  SELECT * FROM (VALUES {vals}) v(source, w_bp)
), q AS (
  SELECT d.doc_id, d.source, d.n_tok,
         ((t.total_tok * w.w_bp) // {_MIX_DIV})::BIGINT AS quota_tok,
         sum(d.n_tok) OVER (
           PARTITION BY d.source
           ORDER BY {portable_hash60_sql("d.doc_id::VARCHAR")}, d.doc_id
           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tok
  FROM d CROSS JOIN t JOIN w ON w.source = d.source
)
SELECT doc_id, source, n_tok, cum_tok, quota_tok
FROM q WHERE cum_tok <= quota_tok
"""


# --------------------------------------------------------------------------
# Deterministic bottom-k sample quantiles (mergeable quantile state)
# --------------------------------------------------------------------------


def events_hash_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type quantile estimates from a DETERMINISTIC bottom-k row
    sample (k=256, smallest portable event-id hashes — the
    embarrassingly-parallel replacement for sequential reservoir
    sampling; see functions/sketch.py). Emits the exact row count, the
    sample size, p50/p90/p99 type-1 quantile estimates in all-integer
    position arithmetic over integer cents, and an order-sensitive md5
    pinning every sampled (hash, cents) pair — the oracle match proves
    the sample CONTENT, not just the estimates, is engine-independent.

    Scale: one shuffle to the group grain; collect_set state here, the
    kmv_partial-style Arrow map-side cut bounds shuffle rows at 100 TB
    (same argument as the KMV sketch — any global bottom-k row survives
    every batch's local bottom-k cut)."""
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        hash_sample,
        hash_sample_md5,
        hash_sample_quantile,
    )
    from clickhouse_metrics_pipeline_spark.tables import value_cents

    k = 256
    ev = _events(spark, sf_dir)
    h = portable_hash60(F.col("event_id").cast("string"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        hash_sample(h, value_cents("value"), k).alias("sk"),
    )
    return g.select(
        "event_type",
        "n_rows",
        F.size("sk").cast("bigint").alias("sample_n"),
        hash_sample_quantile("sk", 5000).alias("p50"),
        hash_sample_quantile("sk", 9000).alias("p90"),
        hash_sample_quantile("sk", 9900).alias("p99"),
        hash_sample_md5("sk").alias("sample_md5"),
    )


def _hash_sample_quantiles_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        hash_sample_quantile_sql,
    )

    k = 256
    q = lambda bp: hash_sample_quantile_sql("s.cs", "s.sample_n", bp)  # noqa: E731
    return f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {portable_hash60_sql("event_id::VARCHAR")} AS h,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM {_EV_SQL}
), n AS (
  SELECT event_type, count(*)::BIGINT AS n_rows FROM {_EV_SQL} GROUP BY 1
), r AS (
  SELECT event_type, h, c,
         row_number() OVER (PARTITION BY event_type ORDER BY h, c) AS rn
  FROM h
), s AS (
  SELECT event_type, count(*)::BIGINT AS sample_n,
         list_sort(list(c)) AS cs,
         md5(string_agg(h::VARCHAR || ':' || c::VARCHAR, ',' ORDER BY h, c))
           AS sample_md5
  FROM r WHERE rn <= {k} GROUP BY event_type
)
SELECT s.event_type, n.n_rows, s.sample_n,
       {q(5000)} AS p50, {q(9000)} AS p90, {q(9900)} AS p99,
       s.sample_md5
FROM s JOIN n USING (event_type)
"""


def events_hash_sample_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles served FROM STORED ROLLUP STATE: per-minute bottom-k
    samples (k=48) merged minute→hour→day — the re-aggregation ladder
    of the reference's MV cascade (schema.sql:146-373) with a mergeable
    SAMPLE state in place of sum/count, answering the quantile queries
    exact rollup columns cannot. The DuckDB oracle computes the DIRECT
    per-day sample from raw rows, so one hash match proves cross-engine
    determinism AND that the two-level merge is lossless (bottom-k of
    union of partial bottom-ks ≡ global bottom-k over the total (h, c)
    order). k=48 < per-day row counts, so the cut branch (not the
    small-group exact branch) is what's pinned."""
    from clickhouse_metrics_pipeline_spark.functions.sketch import (
        hash_sample,
        hash_sample_md5,
        hash_sample_merge,
        hash_sample_quantile,
    )
    from clickhouse_metrics_pipeline_spark.tables import value_cents

    k = 48
    ev = _events(spark, sf_dir)
    h = portable_hash60(F.col("event_id").cast("string"))
    per_min = (
        ev.select(
            "event_type",
            F.date_trunc("minute", "ts").alias("m"),
            h.alias("h"),
            value_cents("value").alias("c"),
        )
        .groupBy("event_type", "m")
        .agg(hash_sample("h", "c", k).alias("sk"))
    )
    per_hour = per_min.groupBy(
        "event_type", F.date_trunc("hour", "m").alias("hr")
    ).agg(hash_sample_merge("sk", k).alias("sk"))
    per_day = per_hour.groupBy(
        "event_type", F.to_date("hr").alias("day")
    ).agg(hash_sample_merge("sk", k).alias("sk"))
    return per_day.select(
        "event_type",
        "day",
        F.size("sk").cast("bigint").alias("sample_n"),
        hash_sample_quantile("sk", 5000).alias("p50"),
        hash_sample_quantile("sk", 9500).alias("p95"),
        hash_sample_md5("sk").alias("sample_md5"),
    )


def _hash_sample_cascade_sql() -> str:
    from clickhouse_metrics_pipeline_spark.oracle_fragments import (
        hash_sample_quantile_sql,
    )

    k = 48
    q = lambda bp: hash_sample_quantile_sql("cs", "sample_n", bp)  # noqa: E731
    return f"""
WITH h AS (
  SELECT DISTINCT event_type, ts::DATE AS day,
         {portable_hash60_sql("event_id::VARCHAR")} AS h,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM {_EV_SQL}
), r AS (
  SELECT event_type, day, h, c,
         row_number() OVER (PARTITION BY event_type, day ORDER BY h, c) AS rn
  FROM h
), s AS (
  SELECT event_type, day, count(*)::BIGINT AS sample_n,
         list_sort(list(c)) AS cs,
         md5(string_agg(h::VARCHAR || ':' || c::VARCHAR, ',' ORDER BY h, c))
           AS sample_md5
  FROM r WHERE rn <= {k} GROUP BY event_type, day
)
SELECT event_type, day, sample_n,
       {q(5000)} AS p50, {q(9500)} AS p95, sample_md5
FROM s
"""


# --------------------------------------------------------------------------
# SLO multi-window burn-rate alerting
# --------------------------------------------------------------------------

# SLI: share of "bad" events (value >= _SLO_BAD_MIN) per service (event
# type). Error budget in basis points; the page policy is the Google
# SRE-workbook two-window AND: short AND long burn both above 14.4x.
_SLO_BAD_MIN = 95.0
_SLO_BUDGET_BP = 100  # 1% error budget
_SLO_THRESH_X10 = 144  # 14.4x, in tenths


def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting: per service (event_type)
    and 1h bucket, the error-budget burn rate over the bucket itself
    (short window) and over the trailing 6 hours (long window, a RANGE
    window on the epoch-hour index so calendar gaps count as empty —
    true time semantics, not row counts), with the two-window page
    condition burn_1h > 14.4x AND burn_6h > 14.4x evaluated in
    cross-multiplied integer form
    ``bad · 10000 · 10 > thresh_x10 · total · budget_bp`` — no float
    in the flag, so it cannot flip between engines. The reported burn
    values are one single IEEE division each (bad·10000 /
    (total·budget_bp)), rounded to 4 — deterministic cross-engine.

    Scale: one shuffle to the (service, hour) grain — rollup
    cardinality — then a bounded RANGE window per service; the shape
    the 1h rollup MV serves directly at 100 TB."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("total_1h"),
        F.sum(
            F.when(F.col("value") >= _SLO_BAD_MIN, 1).otherwise(0)
        ).alias("bad_1h"),
    )
    hr = (F.unix_timestamp("bucket_ts") / 3600).cast("long")
    w6 = (
        Window.partitionBy("event_type")
        .orderBy(hr)
        .rangeBetween(-5, Window.currentRow)
    )
    b = hourly.select(
        "event_type",
        "bucket_ts",
        "total_1h",
        "bad_1h",
        F.sum("total_1h").over(w6).alias("total_6h"),
        F.sum("bad_1h").over(w6).alias("bad_6h"),
    )
    burn = lambda bad, tot: F.round(  # noqa: E731
        bad * F.lit(10000.0) / (tot * F.lit(_SLO_BUDGET_BP)), 4
    )
    page = lambda bad, tot: (  # noqa: E731
        bad * F.lit(10000 * 10) > F.lit(_SLO_THRESH_X10 * _SLO_BUDGET_BP) * tot
    )
    return b.select(
        "event_type",
        "bucket_ts",
        "total_1h",
        "bad_1h",
        burn(F.col("bad_1h"), F.col("total_1h")).alias("burn_1h"),
        burn(F.col("bad_6h"), F.col("total_6h")).alias("burn_6h"),
        (
            page(F.col("bad_1h"), F.col("total_1h"))
            & page(F.col("bad_6h"), F.col("total_6h"))
        ).alias("page_alert"),
    )


EVENTS_SLO_BURN_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         count(*)::BIGINT AS total_1h,
         sum(CASE WHEN value >= {_SLO_BAD_MIN} THEN 1 ELSE 0 END)::BIGINT
           AS bad_1h
  FROM {_EV_SQL} GROUP BY 1, 2
), b AS (
  SELECT event_type, bucket_ts, total_1h, bad_1h,
         sum(total_1h) OVER w6 AS total_6h,
         sum(bad_1h) OVER w6 AS bad_6h
  FROM hourly
  WINDOW w6 AS (PARTITION BY event_type
                ORDER BY (epoch(bucket_ts)::BIGINT // 3600)
                RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket_ts, total_1h, bad_1h,
       round(bad_1h * 10000.0 / (total_1h * {_SLO_BUDGET_BP}), 4) AS burn_1h,
       round(bad_6h * 10000.0 / (total_6h * {_SLO_BUDGET_BP}), 4) AS burn_6h,
       (bad_1h * {10000 * 10} > {_SLO_THRESH_X10 * _SLO_BUDGET_BP} * total_1h
        AND bad_6h * {10000 * 10} > {_SLO_THRESH_X10 * _SLO_BUDGET_BP} * total_6h)
         AS page_alert
FROM b
"""


# --------------------------------------------------------------------------
# LTTB chart downsampling
# --------------------------------------------------------------------------

_LTTB_N_OUT = 150


def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample each event-type value series to 150 chart points with
    exact-integer LTTB (operators/downsample.py — ClickHouse ships this
    as ``largestTriangleThreeBuckets``, so it is reference-ecosystem
    surface). The DuckDB oracle replays the identical selection as a
    HUGEINT recursive CTE (one recursion step per bucket, argmax via a
    correlated max_by with the same area·C − j tie-break key), so the
    hash pins the full selected point set, indices included — a
    sequential chart algorithm cross-engine-verified end to end."""
    from clickhouse_metrics_pipeline_spark.operators.downsample import (
        lttb_downsample,
    )

    ev = _events(spark, sf_dir)
    return lttb_downsample(ev, n_out=_LTTB_N_OUT)


def _lttb_sql() -> str:
    nb = _LTTB_N_OUT - 2
    # tie-break constant: must exceed any point index; series here are
    # <= ~1e6 points, C = 1e9 with HUGEINT arithmetic never overflows
    key = (
        "abs((s.x::HUGEINT * t.nn - t.sx) * (m.y - s.y)"
        " - (s.x - m.x)::HUGEINT * (t.sy - t.nn * s.y))"
        " * 1000000000::HUGEINT - m.j"
    )
    sub = (
        "(SELECT max_by(m.{col}, " + key + ") FROM mid m"
        " WHERE m.event_type = s.event_type AND m.b = s.b + 1)"
    )
    return f"""
WITH RECURSIVE
pts AS (
  SELECT event_type, ts, value, epoch_us(ts) AS x,
         CAST(round(value * 100) AS HUGEINT) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) - 1 AS j,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM {_EV_SQL}
),
mid AS (
  SELECT *, ((j - 1) * {nb}) // (n - 2) AS b
  FROM pts WHERE j BETWEEN 1 AND n - 2
),
nstats AS (
  SELECT event_type, b, sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         count(*)::HUGEINT AS nn
  FROM mid GROUP BY 1, 2
),
targets AS (
  SELECT event_type, b - 1 AS b, sx, sy, nn FROM nstats WHERE b >= 1
  UNION ALL
  SELECT event_type, {nb} - 1, x::HUGEINT, y, 1::HUGEINT
  FROM pts WHERE j = n - 1
),
sel(event_type, b, x, y, j) AS (
  SELECT event_type, -1, x, y, j FROM pts WHERE j = 0
  UNION ALL
  SELECT s.event_type, s.b + 1,
         {sub.format(col="x")},
         {sub.format(col="y")},
         {sub.format(col="j")}
  FROM sel s JOIN targets t
    ON t.event_type = s.event_type AND t.b = s.b + 1
)
SELECT p.event_type, p.ts, p.value, p.j::BIGINT AS j
FROM pts p JOIN sel s ON s.event_type = p.event_type AND s.j = p.j
UNION ALL
SELECT event_type, ts, value, j::BIGINT FROM pts WHERE j = n - 1
"""


# --------------------------------------------------------------------------
# windowFunnel (ordered event chains within a time window)
# --------------------------------------------------------------------------

# funnel steps and window (6h), ClickHouse-windowFunnel-style semantics:
# a user reaches level k when SOME chain event_1 <= ... <= event_k of
# the first k steps exists with every event inside `window` of the
# chain's first event, ordered by (ts, event_id) so ties cannot flip
# the level between engines. 6h (not 1h) so the driver corpus's event
# density exercises every level including full conversions.
_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_S = 6 * 3600


def events_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (the ClickHouse ``windowFunnel``
    aggregate — reference-ecosystem surface): how many users progressed
    view → click → purchase with the whole chain inside six hours.
    Emits one row per funnel level 0..3 with its user count.

    Spark side is the LINEAR windowFunnel state machine as one
    ``F.aggregate`` walk over each user's (ts, id)-sorted events —
    accumulator carries (best level-1 chain start, best completed
    level-2 chain start, level-3 reached). Greedy max-chain-start is
    complete: extending from the latest admissible chain start
    maximizes remaining window slack, so if ANY chain reaches level k,
    so does the tracked one. The DuckDB oracle deliberately keeps the
    independent CUBIC nested-EXISTS formulation, so the hash match
    also proves the linear state machine ≡ the declarative spec.
    Per-user cost is linear in that user's events — no hot-user blowup
    at 100 TB; the only shuffle is the per-user collect."""
    ev = _events(spark, sf_dir)
    s1, s2, s3 = _FUNNEL_STEPS
    # (us, eid, et): array_sort orders lexicographically, giving the
    # strict (ts, event_id) processing order the semantics require
    per_user = (
        ev.where(F.col("event_type").isin(*_FUNNEL_STEPS))
        .select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
    )
    win = _FUNNEL_WINDOW_S * 1_000_000
    neg = F.lit(-1).cast("long")
    init = F.named_struct(
        F.lit("c1"), neg, F.lit("c2"), neg, F.lit("l3"), F.lit(False)
    )

    def stepper(acc, e):
        # pre-update state = strict predecessors of e in sort order
        c1 = F.when(
            e["et"] == s1, F.greatest(acc["c1"], e["us"])
        ).otherwise(acc["c1"])
        c2 = F.when(
            (e["et"] == s2)
            & (acc["c1"] >= 0)
            & (e["us"] - acc["c1"] <= win),
            F.greatest(acc["c2"], acc["c1"]),
        ).otherwise(acc["c2"])
        l3 = acc["l3"] | (
            (e["et"] == s3)
            & (acc["c2"] >= 0)
            & (e["us"] - acc["c2"] <= win)
        )
        return F.named_struct(
            F.lit("c1"), c1, F.lit("c2"), c2, F.lit("l3"), l3
        )

    fin = F.aggregate(F.col("es"), init, stepper)
    lvl = (
        F.when(fin["l3"], 3)
        .when(fin["c2"] >= 0, 2)
        .when(fin["c1"] >= 0, 1)
        .otherwise(0)
    ).alias("funnel_level")
    return (
        per_user.select(lvl)
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def _funnel_sql() -> str:
    s1, s2, s3 = _FUNNEL_STEPS
    win = _FUNNEL_WINDOW_S * 1_000_000
    later = (
        "({b}.us > {a}.us OR ({b}.us = {a}.us AND {b}.eid > {a}.eid))"
    )
    return f"""
WITH eu AS (
  SELECT user_id,
         list(struct_pack(et := event_type,
                          us := epoch_us(ts),
                          eid := event_id)) AS es
  FROM {_EV_SQL}
  WHERE event_type IN ('{s1}', '{s2}', '{s3}')
  GROUP BY user_id
), lv AS (
  SELECT user_id,
    list_filter(es, e -> e.et = '{s1}') AS l1,
    list_filter(es, e -> e.et = '{s2}') AS l2,
    list_filter(es, e -> e.et = '{s3}') AS l3
  FROM eu
), lvl AS (
  SELECT user_id,
    CASE
      WHEN len(list_filter(l1, v ->
             len(list_filter(l2, c -> {later.format(a="v", b="c")}
               AND len(list_filter(l3, p -> {later.format(a="c", b="p")}
                 AND p.us - v.us <= {win})) > 0)) > 0)) > 0 THEN 3
      WHEN len(list_filter(l1, v ->
             len(list_filter(l2, c -> {later.format(a="v", b="c")}
               AND c.us - v.us <= {win})) > 0)) > 0 THEN 2
      WHEN len(l1) > 0 THEN 1
      ELSE 0
    END AS funnel_level
  FROM lv
)
SELECT funnel_level, count(*)::BIGINT AS n_users
FROM lvl GROUP BY funnel_level
"""


# --------------------------------------------------------------------------
# Cohort retention (ClickHouse retention() surface)
# --------------------------------------------------------------------------


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-retention cohorts — the ClickHouse ``retention()``
    aggregate's product-analytics shape: users are cohorted by their
    FIRST purchase's epoch day; for each (cohort day, day offset 0..6)
    emit how many cohort members purchased again that day and the
    retention rate in basis points (integer-exact:
    ``active · 10000 div cohort_size`` — no float division anywhere).
    Purchase events (not all activity) so the corpus's density still
    yields a discriminating matrix rather than a wall of 100%.

    Shape: two shuffles at user grain (first-day min, then distinct
    user-days), one broadcast cohort-size relation; the output is a
    (cohorts × 7) matrix. Day buckets are unix_timestamp div 86400 —
    pure integer arithmetic, identical in both engines."""
    ev = _events(spark, sf_dir)
    u = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.expr("unix_timestamp(ts) div 86400").alias("w"))
        .distinct()
    )
    first = u.groupBy("user_id").agg(F.min("w").alias("w0"))
    sizes = first.groupBy("w0").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    act = (
        u.join(first, "user_id")
        .select("user_id", "w0", (F.col("w") - F.col("w0")).alias("off"))
        .where(F.col("off") <= 6)
        .groupBy("w0", "off")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        act.join(F.broadcast(sizes), "w0")
        .select(
            F.col("w0").alias("cohort_day"),
            F.col("off").alias("day_offset"),
            "n_active",
            "cohort_size",
            F.expr("(n_active * 10000) div cohort_size").alias(
                "retention_bp"
            ),
        )
    )


EVENTS_RETENTION_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch(ts)::BIGINT // 86400 AS w
  FROM {_EV_SQL} WHERE event_type = 'purchase'
), first AS (
  SELECT user_id, min(w) AS w0 FROM uw GROUP BY user_id
), sizes AS (
  SELECT w0, count(DISTINCT user_id) AS cohort_size FROM first GROUP BY w0
), act AS (
  SELECT f.w0, uw.w - f.w0 AS off, count(DISTINCT uw.user_id) AS n_active
  FROM uw JOIN first f USING (user_id)
  WHERE uw.w - f.w0 <= 6
  GROUP BY 1, 2
)
SELECT a.w0 AS cohort_day, a.off AS day_offset,
       a.n_active::BIGINT AS n_active, s.cohort_size::BIGINT AS cohort_size,
       ((a.n_active * 10000) // s.cohort_size)::BIGINT AS retention_bp
FROM act a JOIN sizes s USING (w0)
"""


# --------------------------------------------------------------------------
# sequenceCount (repeated non-overlapping funnel conversions)
# --------------------------------------------------------------------------


def events_funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-conversion counting — the ClickHouse ``sequenceCount``
    surface: how many DISJOINT view→click→purchase chains (6h window,
    the same steps/window as events_funnel_levels) each user completed,
    as a (n_conversions → n_users) histogram. Semantics are the greedy
    reset-on-complete machine (complete a chain as early as possible,
    then reset — the exchange-argument-optimal schedule for disjoint
    subsequences): the funnel accumulator gains a counter, and a
    completing purchase increments it and clears both chain starts.

    The Spark side runs the machine as one F.aggregate walk per user
    (linear); the DuckDB oracle replays the IDENTICAL machine as a
    per-event recursive CTE (one recursion step per event index), so
    the hash pins cross-engine machine equality; the independent
    correctness anchor is the pytest greedy reference
    (tests/test_workloads_ext3.py)."""
    ev = _events(spark, sf_dir)
    s1, s2, s3 = _FUNNEL_STEPS
    per_user = (
        ev.where(F.col("event_type").isin(*_FUNNEL_STEPS))
        .select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
    )
    win = _FUNNEL_WINDOW_S * 1_000_000
    neg = F.lit(-1).cast("long")
    init = F.named_struct(
        F.lit("c1"), neg, F.lit("c2"), neg,
        F.lit("cnt"), F.lit(0).cast("long"),
    )

    def stepper(acc, e):
        complete = (
            (e["et"] == s3) & (acc["c2"] >= 0) & (e["us"] - acc["c2"] <= win)
        )
        c1 = F.when(complete, neg).otherwise(
            F.when(e["et"] == s1, F.greatest(acc["c1"], e["us"])).otherwise(
                acc["c1"]
            )
        )
        c2 = F.when(complete, neg).otherwise(
            F.when(
                (e["et"] == s2)
                & (acc["c1"] >= 0)
                & (e["us"] - acc["c1"] <= win),
                F.greatest(acc["c2"], acc["c1"]),
            ).otherwise(acc["c2"])
        )
        cnt = acc["cnt"] + complete.cast("long")
        return F.named_struct(
            F.lit("c1"), c1, F.lit("c2"), c2, F.lit("cnt"), cnt
        )

    fin = F.aggregate(F.col("es"), init, stepper)
    return (
        per_user.select(fin["cnt"].alias("n_conversions"))
        .groupBy("n_conversions")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def _funnel_conversions_sql() -> str:
    s1, s2, s3 = _FUNNEL_STEPS
    win = _FUNNEL_WINDOW_S * 1_000_000
    complete = f"(e.et = '{s3}' AND m.c2 >= 0 AND e.us - m.c2 <= {win})"
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_type AS et, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS j
  FROM {_EV_SQL}
  WHERE event_type IN ('{s1}', '{s2}', '{s3}')
), m(user_id, j, c1, c2, cnt) AS (
  SELECT user_id, 0, -1::BIGINT, -1::BIGINT, 0::BIGINT
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT m.user_id, m.j + 1,
    CASE WHEN {complete} THEN -1
         WHEN e.et = '{s1}' THEN greatest(m.c1, e.us)
         ELSE m.c1 END,
    CASE WHEN {complete} THEN -1
         WHEN e.et = '{s2}' AND m.c1 >= 0 AND e.us - m.c1 <= {win}
           THEN greatest(m.c2, m.c1)
         ELSE m.c2 END,
    m.cnt + CASE WHEN {complete} THEN 1 ELSE 0 END
  FROM m JOIN ev e ON e.user_id = m.user_id AND e.j = m.j + 1
), fin AS (
  SELECT user_id, max_by(cnt, j) AS n_conversions FROM m GROUP BY user_id
)
SELECT n_conversions, count(*)::BIGINT AS n_users
FROM fin GROUP BY n_conversions
"""


# --------------------------------------------------------------------------
# Interval-union coverage (ClickHouse intervalLengthSum surface)
# --------------------------------------------------------------------------

_COVERAGE_HOLD_S = 300  # each event "covers" [ts, ts + 5m)


def events_coverage_uptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage — the ClickHouse ``intervalLengthSum``
    aggregate's shape, as the uptime/SLA question: treating each event
    as covering [ts, ts+5m), how many seconds of each (event_type,
    day) were covered at least once? Overlaps must not double-count,
    so this is a sweep line: order intervals by start, carry the
    running max end over PRIOR intervals, and each interval contributes
    ``max(0, end − max(start, prior_max_end))``. All epoch-microsecond
    integer arithmetic; an interval belongs to its start's day (a tail
    crossing midnight counts toward the start day — documented
    grouping, identical in both engines).

    Shape: one shuffle to (type, day), then one ordered window per
    group carrying a single running max — the sweep line is linear and
    never materializes the O(n²) overlap pairs."""
    ev = _events(spark, sf_dir)
    hold = _COVERAGE_HOLD_S * 1_000_000
    base = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(hold)).alias("e"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col("e")
        - F.greatest(F.col("s"), F.coalesce(F.max("e").over(w), F.lit(0))),
    )
    return (
        base.select("event_type", "day", contrib.alias("c"))
        .groupBy("event_type", "day")
        .agg(
            F.expr("sum(c) div 1000000").alias("covered_s"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


EVENTS_COVERAGE_SQL = f"""
WITH iv AS (
  SELECT event_type, ts::DATE AS day, epoch_us(ts) AS s,
         epoch_us(ts) + {_COVERAGE_HOLD_S * 1_000_000} AS e, event_id
  FROM {_EV_SQL}
), sw AS (
  SELECT event_type, day,
         greatest(0, e - greatest(s, coalesce(
           max(e) OVER (PARTITION BY event_type, day ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0))) AS c
  FROM iv
)
SELECT event_type, day, (sum(c) // 1000000)::BIGINT AS covered_s,
       count(*)::BIGINT AS n_intervals
FROM sw GROUP BY event_type, day
"""


# --------------------------------------------------------------------------
# Top movers (largest day-over-day rate changes)
# --------------------------------------------------------------------------


def events_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "what changed?" dashboard: per (event_type, day) event
    counts versus the PREVIOUS observed day, ranked by absolute
    relative change — emit the top 10 movers. Relative change rides as
    integer basis points (``(n - prev) · 10000 div prev``) and the rank
    is a deterministic dense order over (|change_bp|, event_type, day)
    so the cut at 10 cannot flip between engines.

    Shape: one shuffle to the (type, day) grain, a lag-1 window per
    type, and a 10-row TakeOrdered — rollup-cardinality work
    throughout."""
    ev = _events(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    d = d.select(
        "event_type",
        "day",
        "n_events",
        F.lag("n_events").over(w).alias("prev_n"),
    ).where(F.col("prev_n").isNotNull())
    chg = F.expr("((n_events - prev_n) * 10000) div prev_n")
    return (
        d.select(
            "event_type", "day", "n_events", "prev_n",
            chg.alias("change_bp"),
        )
        .orderBy(
            F.abs(F.col("change_bp")).desc(), "event_type", "day"
        )
        .limit(10)
    )


EVENTS_TOP_MOVERS_SQL = f"""
WITH d AS (
  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n_events
  FROM {_EV_SQL} GROUP BY 1, 2
), l AS (
  SELECT event_type, day, n_events,
         lag(n_events) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
  FROM d
)
SELECT event_type, day, n_events, prev_n,
       (((n_events - prev_n) * 10000) // prev_n)::BIGINT AS change_bp
FROM l WHERE prev_n IS NOT NULL
ORDER BY abs((((n_events - prev_n) * 10000) // prev_n)) DESC, event_type, day
LIMIT 10
"""


# --------------------------------------------------------------------------
# Label-centroid embedding analytics
# --------------------------------------------------------------------------


def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level embedding diagnostics: pairwise cosine similarity
    between per-label centroid vectors — the "are my clusters/sources
    semantically distinct?" check a curation pipeline runs before
    trusting label- or source-conditioned sampling.

    EXACT aggregation: components are scaled to integers
    (``round(v·10⁶)``) so per-(label, dim) sums are order-independent
    bigints; centroid dot products accumulate those sums in
    DECIMAL(38,0)/HUGEINT (per-term ≲ 2.5e17, 64-dim totals pass
    int64), and only the final cosine performs float math — one cast,
    two sqrts, one divide, identical IEEE in both engines, rounded
    to 6. (Cosine of sum-vectors equals cosine of mean-vectors — the
    1/n factors cancel — so no division ever enters the aggregate.)

    Scale: one explode to (label, dim) — 64·n rows, the standard
    distributed shape for element-wise vector aggregation — one
    sum-shuffle to (label, dim) cardinality (labels × 64), then a tiny
    per-dim self-join; nothing downstream of the first aggregate
    depends on corpus size."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label", "dim",
        F.round(F.col("v").cast("double") * 1_000_000).cast("long").alias("q"),
    )
    s = q.groupBy("label", "dim").agg(F.sum("q").alias("sq"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a, b = s.alias("a"), s.alias("b")
    pairs = (
        a.join(b, (F.col("a.dim") == F.col("b.dim"))
               & (F.col("a.label") < F.col("b.label")))
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.sum(dec(F.col("a.sq")) * dec(F.col("b.sq"))).alias("dot"),
            F.sum(dec(F.col("a.sq")) * dec(F.col("a.sq"))).alias("na"),
            F.sum(dec(F.col("b.sq")) * dec(F.col("b.sq"))).alias("nb"),
        )
    )
    n = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    cos = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        6,
    )
    return (
        pairs.join(
            F.broadcast(n.select(F.col("label").alias("label_a"),
                                 F.col("n_vecs").alias("n_a"))), "label_a")
        .join(
            F.broadcast(n.select(F.col("label").alias("label_b"),
                                 F.col("n_vecs").alias("n_b"))), "label_b")
        .select("label_a", "label_b", "n_a", "n_b",
                cos.alias("centroid_cosine"))
    )


EMB_CENTROIDS_SQL = """
WITH q AS (
  SELECT label, u['dim'] AS dim, u['q'] AS q
  FROM (
    SELECT label,
           unnest([{'dim': i - 1,
                    'q': CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)}
                   for i in range(1, len(embedding) + 1)]) AS u
    FROM embeddings)
), s AS (
  SELECT label, dim, sum(q)::BIGINT AS sq FROM q GROUP BY 1, 2
), p AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(a.sq::HUGEINT * b.sq::HUGEINT) AS dot,
         sum(a.sq::HUGEINT * a.sq::HUGEINT) AS na,
         sum(b.sq::HUGEINT * b.sq::HUGEINT) AS nb
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2
), n AS (
  SELECT label, count(*)::BIGINT AS n_vecs FROM embeddings GROUP BY label
)
SELECT p.label_a, p.label_b, na2.n_vecs AS n_a, nb2.n_vecs AS n_b,
       round(p.dot::DOUBLE / (sqrt(p.na::DOUBLE) * sqrt(p.nb::DOUBLE)), 6)
         AS centroid_cosine
FROM p
JOIN n na2 ON na2.label = p.label_a
JOIN n nb2 ON nb2.label = p.label_b
"""


# --------------------------------------------------------------------------
# Catalog
# --------------------------------------------------------------------------

EXTRA3_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "emb_neardup_clusters": emb_neardup_clusters,
    "events_anomaly_zscore": events_anomaly_zscore,
    "docs_bpe_top_merges": docs_bpe_top_merges,
    "docs_mixture_sample": docs_mixture_sample,
    "events_hash_sample_quantiles": events_hash_sample_quantiles,
    "events_hash_sample_cascade": events_hash_sample_cascade,
    "events_slo_burn_rate": events_slo_burn_rate,
    "events_lttb_downsample": events_lttb_downsample,
    "events_funnel_levels": events_funnel_levels,
    "events_retention_cohorts": events_retention_cohorts,
    "events_coverage_uptime": events_coverage_uptime,
    "events_funnel_conversions": events_funnel_conversions,
    "events_top_movers": events_top_movers,
    "emb_label_centroids": emb_label_centroids,
}

EXTRA3_ORACLE: dict[str, str] = {
    "emb_neardup_clusters": EMB_CLUSTERS_SQL,
    "events_anomaly_zscore": EVENTS_ANOMALY_SQL,
    "docs_bpe_top_merges": DOCS_BPE_MERGES_SQL,
    "docs_mixture_sample": _mixture_sample_sql(),
    "events_hash_sample_quantiles": _hash_sample_quantiles_sql(),
    "events_hash_sample_cascade": _hash_sample_cascade_sql(),
    "events_slo_burn_rate": EVENTS_SLO_BURN_SQL,
    "events_lttb_downsample": _lttb_sql(),
    "events_funnel_levels": _funnel_sql(),
    "events_retention_cohorts": EVENTS_RETENTION_SQL,
    "events_coverage_uptime": EVENTS_COVERAGE_SQL,
    "events_funnel_conversions": _funnel_conversions_sql(),
    "events_top_movers": EVENTS_TOP_MOVERS_SQL,
    "emb_label_centroids": EMB_CENTROIDS_SQL,
}
