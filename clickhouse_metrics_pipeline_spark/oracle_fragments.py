"""Shared DuckDB-oracle SQL fragments.

Lives outside the workload catalogs so workloads.py and
workloads_ext2.py can both build oracle strings from one definition
without a circular import (workloads imports the ext catalogs at the
end of its own module body; any ext module importing back into
workloads at module scope would deadlock the partial import).

Every fragment here has a Column-builder twin in workloads.py /
functions/ pinned by the driver's hash comparison.
"""

from __future__ import annotations

from clickhouse_metrics_pipeline_spark.functions.text import (
    BPE_TOKEN_RE,
    LANG_MARKERS,
    STOPWORDS_EN,
)

# fixed histogram bounds shared by the H1-H5 event-histogram queries
BOUNDS = [10.0, 25.0, 50.0, 100.0, 200.0, 500.0]

LE_SQL = (
    "CASE "
    + " ".join(f"WHEN value <= {b} THEN {b}" for b in BOUNDS)
    + " ELSE 'infinity'::DOUBLE END"
)


def hist_walk_sql(p: int) -> str:
    """SQL cumulative-walk percentile (golden interpolation frac*le)."""
    return f"""
    round(arg_min(CASE WHEN cnt = 0 THEN le
                       WHEN isinf(le) THEN coalesce(prev, 0)
                       ELSE ((total * {p} / 100.0) - (cum - cnt)) / cnt * le END,
                  le) FILTER (WHERE cum >= total * {p} / 100.0), 4)"""


def hist_walk_scaled_sql(p: int, scale: int = 10000) -> str:
    """Exact-integer SQL percentile walk -> BIGINT value*scale; twin of
    functions.histogram.bucket_percentile_scaled (golden mode). HUGEINT
    products + ``//`` mirror the Spark side's DECIMAL(38,0) exact floor
    division term-for-term, so the hash is engine-invariant (no float
    tail - the round-4 hist_quantile_over_time driver mismatch)."""
    assert scale % 100 == 0
    f = scale // 100
    return f"""
    arg_min(CASE WHEN cnt = 0 THEN le::BIGINT * {scale}
                 WHEN isinf(le) THEN coalesce(prev, 0.0)::BIGINT * {scale}
                 ELSE (((total::HUGEINT * {p} - 100 * (cum - cnt))
                        * le::BIGINT * {f}) // cnt)::BIGINT END,
            le) FILTER (WHERE cum * 100 >= total * {p})"""


def hist_walk_prom_scaled_sql(p: int, scale: int = 10000) -> str:
    """Exact-integer walk, Prometheus interpolation (prev + frac*(le-prev));
    twin of bucket_percentile_scaled(interpolation="prometheus")."""
    assert scale % 100 == 0
    f = scale // 100
    return f"""
    arg_min(CASE WHEN cnt = 0 THEN le::BIGINT * {scale}
                 WHEN isinf(le) THEN coalesce(prev, 0.0)::BIGINT * {scale}
                 ELSE coalesce(prev, 0.0)::BIGINT * {scale}
                      + (((total::HUGEINT * {p} - 100 * (cum - cnt))
                          * (le - coalesce(prev, 0.0))::BIGINT * {f}) // cnt)::BIGINT END,
            le) FILTER (WHERE cum * 100 >= total * {p})"""


def hist_walk_prom_sql(p: int) -> str:
    """SQL cumulative-walk percentile, Prometheus interpolation
    (prev + frac * (le - prev)); same walk/edge cases as
    :func:`hist_walk_sql`, mirroring functions.histogram
    bucket_percentile(interpolation="prometheus")."""
    return f"""
    round(arg_min(CASE WHEN cnt = 0 THEN le
                       WHEN isinf(le) THEN coalesce(prev, 0)
                       ELSE prev + ((total * {p} / 100.0) - (cum - cnt)) / cnt
                            * (le - prev) END,
                  le) FILTER (WHERE cum >= total * {p} / 100.0), 4)"""


SHINGLE_SQL = """
WITH docs AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS words
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 3
           THEN [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                 for i in range(1, len(words) - 1)]
           ELSE [] END) AS shingles
  FROM docs
)
"""

def jaccard_pairs_sql(max_doc_freq: int | None = None) -> str:
    """Exact n-gram Jaccard pairs oracle; with ``max_doc_freq`` it
    mirrors dedup.ngram_jaccard_pairs' df-cap semantics exactly —
    shingles in more than that many documents are dropped from both the
    inverted index and the per-doc set sizes before Jaccard."""
    cap = (
        f""", hot AS (
  SELECT s FROM ex GROUP BY s HAVING count(*) > {max_doc_freq}
), exc AS (
  SELECT ex.* FROM ex ANTI JOIN hot USING (s)
)"""
        if max_doc_freq is not None
        else ""
    )
    src = "exc" if max_doc_freq is not None else "ex"
    return (
        SHINGLE_SQL
        + f""", ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0
){cap}, pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM {src} a JOIN {src} b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, count(*) AS n FROM {src} GROUP BY doc_id)
SELECT id_a, id_b,
       round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
FROM pairs JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
"""
    )


JACCARD_PAIRS_SQL = jaccard_pairs_sql()


def sql_tokens() -> str:
    return "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"


def sql_list_lit(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def docs_text_stats_sql() -> str:
    toks = sql_tokens()
    sw = sql_list_lit(STOPWORDS_EN)
    hits = {
        lang: f"len(list_filter({toks}, x -> list_contains({sql_list_lit(ws)}, x)))"
        for lang, ws in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    lang_case = f"""CASE WHEN {best} = 0 THEN 'und'
        WHEN {hits['en']} = {best} THEN 'en'
        WHEN {hits['de']} = {best} THEN 'de'
        WHEN {hits['es']} = {best} THEN 'es'
        WHEN {hits['fr']} = {best} THEN 'fr'
        ELSE 'und' END"""
    n_tokens = f"len({toks})"
    mtl = f"(list_sum(list_transform({toks}, x -> len(x))) * 1.0 / greatest({n_tokens}, 1))"
    swr = f"(len(list_filter({toks}, x -> list_contains({sw}, x))) * 1.0 / greatest({n_tokens}, 1))"
    punct = r"(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1.0 / greatest(len(text), 1))"
    quality = f"""(CASE WHEN {n_tokens} BETWEEN 10 AND 100000 THEN 0.3 ELSE 0 END
        + CASE WHEN {mtl} BETWEEN 3.0 AND 12.0 THEN 0.3 ELSE 0 END
        + CASE WHEN {punct} <= 0.2 THEN 0.2 ELSE 0 END
        + CASE WHEN {swr} >= 0.01 THEN 0.2 ELSE 0 END)"""
    return f"""
SELECT doc_id,
       {n_tokens} AS n_tokens,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
       round({mtl}, 4) AS mean_token_len,
       round({swr}, 4) AS stopword_ratio,
       round({punct}, 4) AS punct_ratio,
       round(({quality})::DOUBLE, 2) AS quality,
       {lang_case} AS lang_pred
FROM documents
"""


# --------------------------------------------------------------------------
# Exact value arithmetic
# --------------------------------------------------------------------------
# events.value carries exactly two decimals (driver generator), so value
# sums/averages are computed over integer CENTS: the integer sum is
# associative, hence identical under Spark's nondeterministic
# partial-aggregation combine order and DuckDB's sequential/segment-tree
# orders (float sums of the same rows flipped three rollup hashes at
# sf0.1). Sums need nothing more: S/100.0 has <= 2 true decimals, so
# round(.,4) is boundary-free. AVERAGES are the treacherous case — an
# avg of 2-decimal values frequently lands EXACTLY on a 4th-decimal
# half (e.g. 1583.79/24 = 65.99125), where Spark's exact-decimal
# HALF_UP and DuckDB's float re-quantization can disagree — so the
# half-up rounding itself is done in integer space:
#   round(S/(100 n), 4) = floor((200 S + n) / (2 n)) / 10000
# The double division (200S+n)/(2n) is exact enough for floor (the
# fractional part is never within 1/(2n) of 1, far above double ulp at
# these magnitudes), and exact-boundary cases divide exactly; both
# engines floor the same double. Column twins live in tables.py and
# must match token for token.


def sum_value_sql(expr: str = "value") -> str:
    return f"round(sum(CAST(round({expr} * 100) AS BIGINT)) / 100.0, 4)"


def avg_value_sql(expr: str = "value") -> str:
    s = f"sum(CAST(round({expr} * 100) AS BIGINT))"
    n = f"count({expr})"
    return f"floor((200 * {s} + {n}) / (2 * {n})) / 10000.0"


def avg_from_cents_sql(sum_cents: str, n: str) -> str:
    """Same exact half-up rounding over pre-aggregated (cents, count);
    sign-aware magnitude form, identical to tables.avg_from_cents (and,
    for non-negative sums, to the plain floor form rounds 1-3 used)."""
    return (
        f"(case when {sum_cents} < 0 then -1 else 1 end)"
        f" * floor((200 * abs({sum_cents}) + {n}) / (2 * {n})) / 10000.0"
    )


def portable_hash60_sql(expr: str) -> str:
    """DuckDB twin of functions.hashing.portable_hash60."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def kmv_sketch_sql(hash_expr: str, k: int) -> str:
    """DuckDB twin of functions.sketch.kmv_sketch: the group's k
    smallest distinct hashes as a sorted list."""
    return f"list_slice(list_sort(list(DISTINCT {hash_expr})), 1, {k})"


def kmv_estimate_sql(sk: str, k: int) -> str:
    """DuckDB twin of functions.sketch.kmv_estimate. The numerator is
    the same exactly-representable double literal Spark uses, so the
    floor((k-1)·2^60 / h_(k)) division is bit-identical IEEE math."""
    num = repr(float((k - 1) << 60))
    return (
        f"(CASE WHEN len({sk}) < {k} THEN len({sk})::BIGINT "
        f"ELSE floor({num} / list_extract({sk}, {k})::DOUBLE)::BIGINT END)"
    )


def kmv_sketch_md5_sql(sk: str) -> str:
    """DuckDB twin of functions.sketch.kmv_sketch_md5."""
    return f"md5(array_to_string({sk}, ','))"


def hash_sample_quantile_sql(cs: str, n: str, q_bp: int) -> str:
    """DuckDB twin of functions.sketch.hash_sample_quantile over a
    value-sorted cents list ``cs`` of size ``n``: the element at the
    all-integer type-1 position ``max(1, (q_bp·n + 9999) div 10000)``,
    over 100. Token-for-token the same arithmetic as the Column form."""
    pos = f"greatest(1, (({q_bp} * {n} + 9999) // 10000))::INT"
    return f"(list_extract({cs}, {pos}) / 100.0)"
