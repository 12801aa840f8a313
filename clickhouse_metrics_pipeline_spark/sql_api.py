"""SQL surface of the engine: temp views + SQL UDFs.

The reference's entire query surface is SQL strings shipped to
ClickHouse (``pkg/promread/handler.go:227-302`` compiles matchers to
SQL; ``scripts``/``Makefile`` recipes are raw SQL). This module gives
our engine the same ergonomics natively in Spark: register the tables
as temp views and the histogram/text/series kernels as SQL UDFs
(``CREATE TEMPORARY FUNCTION ... RETURN <expr>``), and any reference
SQL recipe can be ported 1:1 and run through ``spark.sql``.

The UDF bodies are pure SQL expressions (higher-order functions - no
Python, fully Catalyst-optimizable and codegen'd; a SQL UDF is inlined
into the calling plan at analysis time, so using these costs nothing
vs. the Column-builder forms in ``functions/``). Each body mirrors a
Column builder and is pinned equal to it by ``tests/test_sql_api.py``.

Naming: ``hist_*`` = histogram kernels (H1-H5), ``series_*`` = identity
(K1/K2), ``doc_*``/``text_*`` = text analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_metrics_pipeline_spark.functions.text import (
    BPE_TOKEN_RE,
    LANG_MARKERS,
    STOPWORDS_EN,
)
from clickhouse_metrics_pipeline_spark.tables import _events, _t

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_BUCKETS = "ARRAY<STRUCT<le: DOUBLE, count: BIGINT>>"

# normalized whitespace tokens of a text column (shared SQL fragment)
_TOKENS = r"split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')"


def _sql_in_list(words: list[str]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def _lang_hits(lang: str) -> str:
    return (
        f"size(filter({_TOKENS}, x -> x IN {_sql_in_list(LANG_MARKERS[lang])}))"
    )


_EXP_BUCKETS = "ARRAY<STRUCT<index: INT, count: BIGINT>>"

# bit masks 2^0..2^61 for the SimHash kernel (operators.dedup.simhash64)
_SIMHASH_MASKS_SQL = (
    "array(" + ", ".join(f"{1 << j}L" for j in range(62)) + ")"
)


def _exp_percentile_ddl() -> str:
    """H6 as one SQL expression (mirrors ``exp_histogram_percentile``)."""
    base = "power(2.0D, power(2.0D, -CAST(scale AS DOUBLE)))"

    def mid(idx: str) -> str:
        return (
            f"(power({base}, CAST({idx} AS DOUBLE))"
            f" + power({base}, CAST({idx} AS DOUBLE) + 1)) / 2"
        )

    empty = f"CAST(array() AS {_EXP_BUCKETS})"
    unified = f"""concat(
      transform(reverse(array_sort(coalesce(neg, {empty}))),
                x -> named_struct('v', -({mid('x.index')}), 'count', x.count)),
      array(named_struct('v', CAST(0.0 AS DOUBLE),
                         'count', coalesce(zero_count, CAST(0 AS BIGINT)))),
      transform(array_sort(coalesce(pos, {empty})),
                x -> named_struct('v', {mid('x.index')}, 'count', x.count)))"""
    total = f"aggregate({unified}, CAST(0 AS BIGINT), (a, x) -> a + x.count)"
    target = f"CAST({total} AS DOUBLE) * (p / 100.0)"
    overflow = f"""CASE WHEN size(coalesce(pos, {empty})) > 0
      THEN {mid(f"element_at(array_sort(coalesce(pos, {empty})), -1).index")}
      ELSE 0.0D END"""
    return f"""CREATE OR REPLACE TEMPORARY FUNCTION exp_hist_percentile(
          scale INT, zero_count BIGINT,
          pos {_EXP_BUCKETS}, neg {_EXP_BUCKETS}, p DOUBLE)
        RETURNS DOUBLE RETURN
        CASE WHEN {total} > 0 THEN
          aggregate(
            {unified},
            named_struct('cum', CAST(0 AS BIGINT), 'res', CAST(NULL AS DOUBLE)),
            (acc, x) -> CASE WHEN acc.res IS NOT NULL THEN acc
              ELSE named_struct(
                'cum', acc.cum + x.count,
                'res', CASE WHEN CAST(acc.cum + x.count AS DOUBLE) >= {target}
                            THEN x.v ELSE CAST(NULL AS DOUBLE) END) END,
            acc -> coalesce(acc.res, {overflow}))
        ELSE CAST(NULL AS DOUBLE) END"""


def _functions() -> list[str]:
    """DDL for every SQL UDF, dependency order (later bodies call earlier)."""
    canon = (
        "array_join(transform(array_sort(map_entries(coalesce(attributes, "
        "CAST(map() AS MAP<STRING, STRING>)))), "
        "e -> concat_ws('=', e.key, e.value)), ',')"
    )
    langs = list(LANG_MARKERS)
    detect = f"greatest({', '.join(_lang_hits(lg) for lg in langs)})"
    # no scalar subquery in the body (keeps the UDF inlinable anywhere):
    # the best-hit count is re-stated per branch; marker arrays are tiny
    lang_case = "CASE "
    for lg in langs:
        lang_case += f"WHEN {_lang_hits(lg)} = {detect} THEN '{lg}' "
    lang_case += "ELSE 'und' END"
    return [
        # --- histogram kernels (H1-H5) over delta-bucket arrays ---
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hist_total(
              buckets {_BUCKETS}) RETURNS BIGINT RETURN
            aggregate(buckets, CAST(0 AS BIGINT), (acc, x) -> acc + x.count)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hist_percentile(
              buckets {_BUCKETS}, p DOUBLE) RETURNS DOUBLE RETURN
            CASE WHEN hist_total(buckets) > 0 AND size(buckets) > 0 THEN
              aggregate(
                array_sort(buckets),
                named_struct('cum', CAST(0 AS BIGINT),
                             'prev', CAST(0.0 AS DOUBLE),
                             'res', CAST(NULL AS DOUBLE)),
                (acc, x) -> CASE WHEN acc.res IS NOT NULL THEN acc
                  ELSE named_struct(
                    'cum', acc.cum + x.count,
                    'prev', x.le,
                    'res', CASE
                      WHEN CAST(acc.cum + x.count AS DOUBLE)
                           >= CAST(hist_total(buckets) AS DOUBLE) * (p / 100.0)
                      THEN CASE
                        WHEN x.count = 0 THEN x.le
                        WHEN x.le = double('Infinity') THEN acc.prev
                        ELSE (CAST(hist_total(buckets) AS DOUBLE) * (p / 100.0)
                              - CAST(acc.cum AS DOUBLE))
                             / CAST(x.count AS DOUBLE) * x.le END
                      ELSE CAST(NULL AS DOUBLE) END) END,
                acc -> coalesce(acc.res,
                  CASE WHEN element_at(array_sort(buckets), -1).le
                            != double('Infinity')
                       THEN element_at(array_sort(buckets), -1).le
                       ELSE acc.prev END))
            ELSE CAST(NULL AS DOUBLE) END""",
        # corrected interpolation (prev + frac*(le-prev)): monotone in p,
        # unlike the reference-faithful golden mode above (frac*le), which
        # can yield P95 < P50 when the target lands barely inside a wide
        # bucket (see functions/histogram.py interpolation notes)
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hist_percentile_prom(
              buckets {_BUCKETS}, p DOUBLE) RETURNS DOUBLE RETURN
            CASE WHEN hist_total(buckets) > 0 AND size(buckets) > 0 THEN
              aggregate(
                array_sort(buckets),
                named_struct('cum', CAST(0 AS BIGINT),
                             'prev', CAST(0.0 AS DOUBLE),
                             'res', CAST(NULL AS DOUBLE)),
                (acc, x) -> CASE WHEN acc.res IS NOT NULL THEN acc
                  ELSE named_struct(
                    'cum', acc.cum + x.count,
                    'prev', x.le,
                    'res', CASE
                      WHEN CAST(acc.cum + x.count AS DOUBLE)
                           >= CAST(hist_total(buckets) AS DOUBLE) * (p / 100.0)
                      THEN CASE
                        WHEN x.count = 0 THEN x.le
                        WHEN x.le = double('Infinity') THEN acc.prev
                        ELSE acc.prev
                             + (CAST(hist_total(buckets) AS DOUBLE) * (p / 100.0)
                                - CAST(acc.cum AS DOUBLE))
                               / CAST(x.count AS DOUBLE) * (x.le - acc.prev) END
                      ELSE CAST(NULL AS DOUBLE) END) END,
                acc -> coalesce(acc.res,
                  CASE WHEN element_at(array_sort(buckets), -1).le
                            != double('Infinity')
                       THEN element_at(array_sort(buckets), -1).le
                       ELSE acc.prev END))
            ELSE CAST(NULL AS DOUBLE) END""",
        # exact-integer percentile walk (round 5): BIGINT value*scale,
        # golden interpolation, DECIMAL(38,0)-exact floor division —
        # the SQL twin of functions.histogram.bucket_percentile_scaled
        # (scale must be a multiple of 100, as there)
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hist_percentile_scaled(
              buckets {_BUCKETS}, p INT, scale INT) RETURNS BIGINT RETURN
            CASE WHEN hist_total(buckets) > 0 AND size(buckets) > 0 THEN
              aggregate(
                array_sort(buckets),
                named_struct('cum', CAST(0 AS BIGINT),
                             'prev', CAST(0 AS BIGINT),
                             'res', CAST(NULL AS BIGINT)),
                (acc, x) -> CASE WHEN acc.res IS NOT NULL THEN acc
                  ELSE named_struct(
                    'cum', acc.cum + x.count,
                    'prev', CASE WHEN x.le = double('Infinity') THEN acc.prev
                                 ELSE CAST(x.le AS BIGINT) END,
                    'res', CASE
                      WHEN (acc.cum + x.count) * 100
                           >= hist_total(buckets) * CAST(p AS BIGINT)
                      THEN CASE
                        WHEN x.count = 0 THEN CAST(x.le AS BIGINT) * scale
                        WHEN x.le = double('Infinity') THEN acc.prev * scale
                        ELSE CAST((
                          (CAST(hist_total(buckets) AS DECIMAL(38,0)) * p
                           - CAST(100 AS DECIMAL(38,0)) * acc.cum)
                          * CAST(x.le AS BIGINT) * (scale div 100)
                          - ((CAST(hist_total(buckets) AS DECIMAL(38,0)) * p
                              - CAST(100 AS DECIMAL(38,0)) * acc.cum)
                             * CAST(x.le AS BIGINT) * (scale div 100))
                            % CAST(x.count AS DECIMAL(38,0))
                        ) / CAST(x.count AS DECIMAL(38,0)) AS BIGINT) END
                      ELSE CAST(NULL AS BIGINT) END) END,
                acc -> coalesce(acc.res,
                  CASE WHEN element_at(array_sort(buckets), -1).le
                            != double('Infinity')
                       THEN CAST(element_at(array_sort(buckets), -1).le
                                 AS BIGINT) * scale
                       ELSE acc.prev * scale END))
            ELSE CAST(NULL AS BIGINT) END""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hist_delta_to_cumulative(
              buckets {_BUCKETS}) RETURNS {_BUCKETS} RETURN
            transform(array_sort(buckets), (x, i) -> named_struct(
              'le', x.le,
              'count', aggregate(slice(array_sort(buckets), 1, i + 1),
                                 CAST(0 AS BIGINT), (acc, y) -> acc + y.count)))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hist_cumulative_to_delta(
              buckets {_BUCKETS}) RETURNS {_BUCKETS} RETURN
            transform(array_sort(buckets), (x, i) -> named_struct(
              'le', x.le,
              'count', x.count - CASE WHEN i = 0 THEN CAST(0 AS BIGINT)
                ELSE element_at(array_sort(buckets), i).count END))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION hist_merge(
              arrays ARRAY<{_BUCKETS}>) RETURNS {_BUCKETS} RETURN
            array_sort(transform(
              array_distinct(transform(flatten(arrays), x -> x.le)),
              le -> named_struct('le', le,
                'count', aggregate(filter(flatten(arrays), x -> x.le = le),
                                   CAST(0 AS BIGINT), (acc, x) -> acc + x.count))))""",
        # --- exponential histograms (H6; H7's merge is a relational op,
        #     see operators... merge_exp_histograms_agg) ---
        _exp_percentile_ddl(),
        # --- series identity (K1/K2, canonical sorted-attribute form) ---
        f"""CREATE OR REPLACE TEMPORARY FUNCTION series_key(
              metric STRING, attributes MAP<STRING, STRING>) RETURNS STRING
            RETURN concat(metric, '{{', {canon}, '}}')""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION series_hash(
              metric STRING, workspaceId STRING,
              attributes MAP<STRING, STRING>) RETURNS BIGINT
            RETURN xxhash64(metric, workspaceId, {canon})""",
        # --- text analysis ---
        f"""CREATE OR REPLACE TEMPORARY FUNCTION text_token_count(
              text STRING) RETURNS INT RETURN size({_TOKENS})""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION text_bpe_token_count(
              text STRING) RETURNS INT
            RETURN regexp_count(text, '{BPE_TOKEN_RE.replace(chr(92), chr(92) * 2)}')""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION text_punct_ratio(
              text STRING) RETURNS DOUBLE
            RETURN CAST(regexp_count(text, '[^A-Za-z0-9\\\\s]') AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION text_stopword_ratio(
              text STRING) RETURNS DOUBLE
            RETURN CAST(size(filter({_TOKENS},
                     x -> x IN {_sql_in_list(STOPWORDS_EN)})) AS DOUBLE)
                   / CAST(greatest(size({_TOKENS}), 1) AS DOUBLE)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION text_mean_token_length(
              text STRING) RETURNS DOUBLE
            RETURN CAST(aggregate({_TOKENS}, CAST(0 AS BIGINT),
                     (acc, x) -> acc + length(x)) AS DOUBLE)
                   / CAST(greatest(size({_TOKENS}), 1) AS DOUBLE)""",
        """CREATE OR REPLACE TEMPORARY FUNCTION text_quality_score(
              text STRING) RETURNS DOUBLE RETURN
            CAST(text_token_count(text) BETWEEN 10 AND 100000 AS DOUBLE) * 0.3
            + CAST(text_mean_token_length(text) BETWEEN 3.0 AND 12.0 AS DOUBLE) * 0.3
            + CAST(text_punct_ratio(text) <= 0.2 AS DOUBLE) * 0.2
            + CAST(text_stopword_ratio(text) >= 0.01 AS DOUBLE) * 0.2""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION text_detect_language(
              text STRING) RETURNS STRING RETURN
            CASE WHEN {detect} > 0 THEN {lang_case} ELSE 'und' END""",
        """CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(
              text STRING) RETURNS STRING
            RETURN md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION doc_rolling_fingerprint(
              text STRING, window INT) RETURNS BIGINT RETURN
            array_min(transform(
              sequence(0, greatest(size({_TOKENS}) - window, 0)),
              i -> xxhash64(array_join(slice({_TOKENS}, i + 1, window), ' '))))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION text_chunks(
              text STRING, chunk INT, stride INT) RETURNS ARRAY<STRING> RETURN
            transform(
              sequence(CAST(0 AS BIGINT), greatest(CAST(0 AS BIGINT),
                CAST(floor((size({_TOKENS}) - (chunk - stride + 1))
                           / CAST(stride AS DOUBLE)) AS BIGINT))),
              k -> array_join(slice({_TOKENS}, CAST(k AS INT) * stride + 1, chunk), ' '))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION doc_simhash(
              text STRING) RETURNS BIGINT RETURN
            aggregate(
              zip_with(
                aggregate(
                  transform({_TOKENS}, t -> xxhash64(t)),
                  array_repeat(CAST(0 AS BIGINT), 62),
                  (acc, h) -> zip_with(acc, {_SIMHASH_MASKS_SQL},
                    (a, m) -> a + IF(h & m != 0, 1, -1))),
                {_SIMHASH_MASKS_SQL},
                (c, m) -> IF(c > 0, m, CAST(0 AS BIGINT))),
              CAST(0 AS BIGINT), (a, x) -> a + x)""",
        _pii_scrub_sql(),
        # --- KMV distinct-sketch kernels (functions/sketch.py) ---
        """CREATE OR REPLACE TEMPORARY FUNCTION kmv_estimate(
              sk ARRAY<BIGINT>, k INT) RETURNS BIGINT RETURN
            CASE WHEN size(sk) < k THEN CAST(size(sk) AS BIGINT)
                 ELSE CAST(floor(CAST(k - 1 AS DOUBLE) * 1152921504606846976.0D
                                 / CAST(element_at(sk, k) AS DOUBLE))
                           AS BIGINT) END""",
        """CREATE OR REPLACE TEMPORARY FUNCTION kmv_merge2(
              a ARRAY<BIGINT>, b ARRAY<BIGINT>, k INT) RETURNS ARRAY<BIGINT>
            RETURN slice(array_sort(array_distinct(concat(
              coalesce(a, array()), coalesce(b, array())))), 1, k)""",
        """CREATE OR REPLACE TEMPORARY FUNCTION kmv_sketch_md5(
              sk ARRAY<BIGINT>) RETURNS STRING RETURN
            md5(array_join(transform(sk, x -> CAST(x AS STRING)), ','))""",
        # --- bottom-k sample kernels (functions/sketch.py) ---
        """CREATE OR REPLACE TEMPORARY FUNCTION hash_sample_quantile(
              sk ARRAY<STRUCT<h: BIGINT, c: BIGINT>>, q_bp INT)
            RETURNS DOUBLE RETURN
            element_at(array_sort(transform(sk, s -> s.c)),
              greatest(1, CAST((q_bp * size(sk) + 9999) / 10000 AS INT)))
            / 100.0""",
        """CREATE OR REPLACE TEMPORARY FUNCTION hash_sample_merge2(
              a ARRAY<STRUCT<h: BIGINT, c: BIGINT>>,
              b ARRAY<STRUCT<h: BIGINT, c: BIGINT>>, k INT)
            RETURNS ARRAY<STRUCT<h: BIGINT, c: BIGINT>> RETURN
            slice(array_sort(array_distinct(concat(
              IF(a IS NULL, array(), a), IF(b IS NULL, array(), b)))), 1, k)""",
        """CREATE OR REPLACE TEMPORARY FUNCTION hash_sample_md5(
              sk ARRAY<STRUCT<h: BIGINT, c: BIGINT>>) RETURNS STRING RETURN
            md5(array_join(transform(sk,
              s -> concat(CAST(s.h AS STRING), ':', CAST(s.c AS STRING))), ','))""",
        # --- Z-order layout kernel (sources/writer.py) ---
        """CREATE OR REPLACE TEMPORARY FUNCTION zorder_val(
              a BIGINT, b BIGINT, bits INT) RETURNS BIGINT RETURN
            aggregate(sequence(0, bits - 1), CAST(0 AS BIGINT),
              (acc, i) -> acc
                | shiftleft(shiftright(a, i) & CAST(1 AS BIGINT), 2 * i)
                | shiftleft(shiftright(b, i) & CAST(1 AS BIGINT), 2 * i + 1))""",
        """CREATE OR REPLACE TEMPORARY FUNCTION vec_quantize_int8(
              v ARRAY<FLOAT>) RETURNS STRUCT<scale: DOUBLE, q: ARRAY<TINYINT>>
            RETURN named_struct(
              'scale',
              IF(array_max(transform(v, x -> abs(CAST(x AS DOUBLE)))) > 0,
                 array_max(transform(v, x -> abs(CAST(x AS DOUBLE)))) / 127.0,
                 CAST(0.0 AS DOUBLE)),
              'q',
              IF(array_max(transform(v, x -> abs(CAST(x AS DOUBLE)))) > 0,
                 transform(v, x -> CAST(round(CAST(x AS DOUBLE)
                   / (array_max(transform(v, y -> abs(CAST(y AS DOUBLE)))) / 127.0))
                   AS TINYINT)),
                 transform(v, x -> CAST(0 AS TINYINT))))""",
    ]


def _pii_scrub_sql() -> str:
    """pii_scrub UDF from the same PII_PATTERNS the Column form uses —
    one chained regexp_replace per pattern, single source of truth."""
    from clickhouse_metrics_pipeline_spark.functions.text import PII_PATTERNS

    body = "text"
    for pattern, repl in PII_PATTERNS.values():
        pat_sql = pattern.replace("\\", "\\\\").replace("'", "''")
        body = f"regexp_replace({body}, '{pat_sql}', '{repl}')"
    return (
        "CREATE OR REPLACE TEMPORARY FUNCTION pii_scrub(text STRING) "
        f"RETURNS STRING RETURN {body}"
    )


def register_functions(spark: SparkSession) -> list[str]:
    """Register every SQL UDF; returns the registered names."""
    names = []
    for ddl in _functions():
        spark.sql(ddl)
        names.append(ddl.split("FUNCTION", 1)[1].split("(", 1)[0].strip())
    return names


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the driver tables as temp views (events with µs ts)."""
    for t in TABLES:
        df = _events(spark, sf_dir) if t == "events" else _t(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
    return list(TABLES)


def open_sql(spark: SparkSession, sf_dir: str) -> SparkSession:
    """One call: views + functions; then ``spark.sql(...)`` is the API."""
    register_tables(spark, sf_dir)
    register_functions(spark)
    return spark


def sql(spark: SparkSession, query: str, sf_dir: str) -> DataFrame:
    """Run a SQL query against the registered engine surface."""
    open_sql(spark, sf_dir)
    return spark.sql(query)
