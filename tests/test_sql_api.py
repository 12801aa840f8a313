"""SQL surface: every SQL UDF must equal its Column-builder twin.

The SQL bodies in ``sql_api`` are hand-written mirrors of the
``functions/`` kernels; these tests run both forms over the same data
and assert exact equality, so the two surfaces cannot drift.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from clickhouse_metrics_pipeline_spark import sql_api
from clickhouse_metrics_pipeline_spark.functions.hashing import (
    series_hash,
    series_key,
)
from clickhouse_metrics_pipeline_spark.functions.histogram import (
    bucket_percentile,
    bucket_total,
    cumulative_to_delta_buckets,
    delta_to_cumulative_buckets,
    merge_bucket_arrays,
)
from clickhouse_metrics_pipeline_spark.operators.dedup import simhash64
from clickhouse_metrics_pipeline_spark.functions.text import (
    bpe_token_count,
    detect_language,
    doc_fingerprint,
    mean_token_length,
    punct_ratio,
    quality_score,
    rolling_hash_fingerprint,
    stopword_ratio,
    text_chunks,
    token_count,
)

SF_DIR = "/root/testdata/sf0.001"

INF = float("inf")
BUCKET_ROWS = [
    Row(id=1, buckets=[Row(le=0.1, count=5), Row(le=0.5, count=3),
                       Row(le=1.0, count=2), Row(le=INF, count=1)]),
    Row(id=2, buckets=[Row(le=INF, count=4), Row(le=0.25, count=7)]),  # unsorted
    Row(id=3, buckets=[Row(le=2.0, count=0), Row(le=4.0, count=9)]),
    Row(id=4, buckets=[]),
]


@pytest.fixture(scope="module")
def sql_spark(spark):
    sql_api.open_sql(spark, SF_DIR)
    return spark


def _hist_df(spark):
    return spark.createDataFrame(
        BUCKET_ROWS,
        "id INT, buckets ARRAY<STRUCT<le: DOUBLE, count: BIGINT>>",
    )


def _assert_cols_equal(df, sql_expr: str, col, tol=None):
    rows = df.select(
        F.expr(sql_expr).alias("sql"), col.alias("py")
    ).collect()
    assert rows, "empty comparison input"
    for r in rows:
        if tol is not None and r.sql is not None and r.py is not None:
            assert math.isclose(r.sql, r.py, rel_tol=tol, abs_tol=1e-12), r
        else:
            assert r.sql == r.py, r


class TestHistogramSqlUdfs:
    def test_total(self, sql_spark):
        _assert_cols_equal(_hist_df(sql_spark), "hist_total(buckets)",
                           bucket_total("buckets"))

    @pytest.mark.parametrize("p", [0.0, 50.0, 95.0, 99.9, 100.0])
    def test_percentile(self, sql_spark, p):
        _assert_cols_equal(_hist_df(sql_spark), f"hist_percentile(buckets, {p})",
                           bucket_percentile("buckets", p), tol=1e-12)

    @pytest.mark.parametrize("p", [0.0, 50.0, 95.0, 99.9, 100.0])
    def test_percentile_prom(self, sql_spark, p):
        _assert_cols_equal(
            _hist_df(sql_spark), f"hist_percentile_prom(buckets, {p})",
            bucket_percentile("buckets", p, interpolation="prometheus"),
            tol=1e-12)

    @pytest.mark.parametrize("p", [1, 50, 95, 99, 100])
    def test_percentile_scaled(self, sql_spark, p):
        from clickhouse_metrics_pipeline_spark.functions.histogram import (
            bucket_percentile_scaled,
        )

        # integer bounds (the scaled walk's precondition, like the
        # catalog's fixed BOUNDS); includes zero-count + inf buckets
        df = sql_spark.createDataFrame(
            [
                (1, [(10.0, 7), (25.0, 13), (50.0, 5), (200.0, 1),
                     (float("inf"), 2)]),
                (2, [(10.0, 1), (float("inf"), 0)]),
                (3, [(10.0, 0), (25.0, 4), (float("inf"), 9)]),
                (4, [(10.0, 3), (50.0, 3)]),
                (5, []),
            ],
            "id INT, buckets ARRAY<STRUCT<le: DOUBLE, count: BIGINT>>",
        )
        _assert_cols_equal(
            df,
            f"hist_percentile_scaled(buckets, {p}, 10000)",
            bucket_percentile_scaled("buckets", p, 10000),
        )

    def test_delta_to_cumulative(self, sql_spark):
        _assert_cols_equal(_hist_df(sql_spark),
                           "hist_delta_to_cumulative(buckets)",
                           delta_to_cumulative_buckets("buckets"))

    def test_cumulative_to_delta(self, sql_spark):
        _assert_cols_equal(_hist_df(sql_spark),
                           "hist_cumulative_to_delta(buckets)",
                           cumulative_to_delta_buckets("buckets"))

    def test_merge(self, sql_spark):
        df = (
            _hist_df(sql_spark)
            .agg(F.collect_list("buckets").alias("arrays"))
        )
        _assert_cols_equal(df, "hist_merge(arrays)",
                           merge_bucket_arrays("arrays"))

    def test_percentile_on_events(self, sql_spark):
        # real data end-to-end: bucket events.value per type in SQL,
        # then merge + percentile through the SQL UDFs; P95 >= P50
        out = sql_spark.sql(
            """WITH bucketed AS (
                 SELECT event_type,
                        array_sort(collect_list(b)) AS buckets
                 FROM (SELECT event_type,
                              named_struct('le', CAST(ceil(value) AS DOUBLE),
                                           'count', count(*)) AS b
                       FROM events GROUP BY event_type, ceil(value))
                 GROUP BY event_type)
               SELECT event_type,
                      hist_percentile_prom(buckets, 50.0) AS p50,
                      hist_percentile_prom(buckets, 95.0) AS p95
               FROM bucketed"""
        ).collect()
        assert out
        for r in out:
            assert r.p50 is not None and r.p95 is not None
            assert r.p95 >= r.p50


class TestExpHistSqlUdf:
    ROWS = [
        Row(id=1, scale=2, zero_count=100,
            pos=[Row(index=0, count=10), Row(index=3, count=5),
                 Row(index=1, count=8)],
            neg=[Row(index=0, count=4), Row(index=2, count=2)]),
        Row(id=2, scale=0, zero_count=0,
            pos=[Row(index=-2, count=7), Row(index=5, count=1)], neg=[]),
        Row(id=3, scale=1, zero_count=0, pos=[], neg=[]),
        Row(id=4, scale=3, zero_count=9, pos=None, neg=None),
    ]

    @pytest.mark.parametrize("p", [0.0, 50.0, 95.0, 99.0, 100.0])
    def test_matches_builder(self, sql_spark, p):
        from clickhouse_metrics_pipeline_spark.functions.histogram import (
            exp_histogram_percentile,
        )

        df = sql_spark.createDataFrame(
            self.ROWS,
            "id INT, scale INT, zero_count BIGINT, "
            "pos ARRAY<STRUCT<index: INT, count: BIGINT>>, "
            "neg ARRAY<STRUCT<index: INT, count: BIGINT>>",
        )
        _assert_cols_equal(
            df,
            f"exp_hist_percentile(scale, zero_count, pos, neg, {p})",
            exp_histogram_percentile("scale", "zero_count", "pos", "neg", p),
            tol=1e-12,
        )


class TestSeriesSqlUdfs:
    def test_series_key_and_hash(self, sql_spark):
        df = sql_spark.createDataFrame(
            [("m1", "ws", {"b": "2", "a": "1"}), ("m2", "ws", {}),
             ("m3", "ws", None)],
            "metric STRING, ws STRING, attributes MAP<STRING, STRING>",
        )
        _assert_cols_equal(df, "series_key(metric, attributes)",
                           series_key("metric", "attributes"))
        _assert_cols_equal(df, "series_hash(metric, ws, attributes)",
                           series_hash("metric", "ws", "attributes"))


class TestTextSqlUdfs:
    PAIRS = [
        ("text_token_count(text)", token_count, None),
        ("text_bpe_token_count(text)", bpe_token_count, None),
        ("text_punct_ratio(text)", punct_ratio, 1e-12),
        ("text_stopword_ratio(text)", stopword_ratio, 1e-12),
        ("text_mean_token_length(text)", mean_token_length, 1e-12),
        ("text_quality_score(text)", quality_score, 1e-12),
        ("text_detect_language(text)", detect_language, None),
        ("doc_fingerprint(text)", doc_fingerprint, None),
        ("doc_rolling_fingerprint(text, 8)", rolling_hash_fingerprint, None),
        ("doc_simhash(text)", simhash64, None),
        ("text_chunks(text, 32, 24)", lambda t: text_chunks(t, 32, 24), None),
    ]

    @pytest.mark.parametrize("sql_expr,builder,tol",
                             PAIRS, ids=[p[0].split("(")[0] for p in PAIRS])
    def test_on_documents(self, sql_spark, sql_expr, builder, tol):
        docs = sql_spark.table("documents").limit(300)
        _assert_cols_equal(docs, sql_expr, builder("text"), tol=tol)


class TestSqlEndToEnd:
    def test_reference_style_recipe(self, sql_spark):
        # the README.md:163-170 quantile recipe shape, natively in SQL
        out = sql_spark.sql(
            """SELECT event_type,
                      count(*) AS n,
                      round(avg(value), 4) AS avg_value
               FROM events GROUP BY event_type ORDER BY event_type"""
        )
        assert out.count() > 0


class TestPiiAndQuantizeSqlUdfs:
    def test_pii_scrub_sql_equals_column(self, sql_spark):
        from clickhouse_metrics_pipeline_spark.functions.text import pii_scrub

        df = sql_spark.createDataFrame(
            [
                ("mail a.b@c.org, call +1 (555) 123-4567, host 10.0.0.1",),
                ("plain text with 3.14 and v1.2.3.4.5 left intact",),
            ],
            "text STRING",
        )
        df.createOrReplaceTempView("_pii_rows")
        _assert_cols_equal(df, "pii_scrub(text)", pii_scrub("text"))
        got = sql_spark.sql(
            "SELECT pii_scrub(text) AS c FROM _pii_rows ORDER BY c"
        ).collect()
        assert got[0].c == "mail <EMAIL>, call <PHONE>, host <IP>"

    def test_vec_quantize_sql_equals_column(self, sql_spark):
        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            int8_quantize,
        )

        emb = sql_spark.table("embeddings").limit(100)
        _assert_cols_equal(
            emb, "vec_quantize_int8(embedding)", int8_quantize("embedding")
        )


class TestKmvSqlUdfs:
    def test_kmv_udfs_equal_column_builders(self, sql_spark):
        from clickhouse_metrics_pipeline_spark.functions.hashing import (
            portable_hash60,
        )
        from clickhouse_metrics_pipeline_spark.functions.sketch import (
            kmv_estimate,
            kmv_sketch,
            kmv_sketch_md5,
        )

        k = 8
        sk = (
            sql_spark.table("events")
            .groupBy("event_type")
            .agg(
                kmv_sketch(
                    portable_hash60(F.col("user_id").cast("string")), k
                ).alias("sk")
            )
        )
        sk.createOrReplaceTempView("kmv_t")
        got = sql_spark.sql(
            f"""SELECT event_type,
                       kmv_estimate(sk, {k}) AS est,
                       kmv_sketch_md5(sk) AS md5,
                       kmv_merge2(sk, sk, {k}) AS merged
                FROM kmv_t"""
        ).collect()
        want = {
            r["event_type"]: r
            for r in sk.select(
                "event_type",
                kmv_estimate("sk", k).alias("est"),
                kmv_sketch_md5("sk").alias("md5"),
                F.col("sk").alias("merged"),  # self-merge is identity
            ).collect()
        }
        assert got
        for r in got:
            w = want[r["event_type"]]
            assert r["est"] == w["est"]
            assert r["md5"] == w["md5"]
            assert list(r["merged"]) == list(w["merged"])


class TestSampleAndZorderUdfs:
    """SQL twins of the bottom-k sample kernels and the Z-order Morton
    code equal their Column builders (§2.8 contract for round-4
    kernels)."""

    def test_hash_sample_udfs_equal_column_builders(self, sql_spark):
        from clickhouse_metrics_pipeline_spark.functions.hashing import (
            portable_hash60,
        )
        from clickhouse_metrics_pipeline_spark.functions.sketch import (
            hash_sample,
            hash_sample_md5,
            hash_sample_quantile,
        )
        from clickhouse_metrics_pipeline_spark.tables import value_cents

        k = 8
        sk = (
            sql_spark.table("events")
            .groupBy("event_type")
            .agg(
                hash_sample(
                    portable_hash60(F.col("event_id").cast("string")),
                    value_cents("value"),
                    k,
                ).alias("sk")
            )
        )
        sk.createOrReplaceTempView("hs_t")
        got = {
            r["event_type"]: r
            for r in sql_spark.sql(
                """SELECT event_type,
                          hash_sample_quantile(sk, 5000) AS p50,
                          hash_sample_quantile(sk, 9900) AS p99,
                          hash_sample_md5(sk) AS m,
                          hash_sample_merge2(sk, sk, 8) AS merged
                   FROM hs_t"""
            ).collect()
        }
        want = {
            r["event_type"]: r
            for r in sk.select(
                "event_type",
                hash_sample_quantile("sk", 5000).alias("p50"),
                hash_sample_quantile("sk", 9900).alias("p99"),
                hash_sample_md5("sk").alias("m"),
                F.col("sk").alias("merged"),  # self-merge is identity
            ).collect()
        }
        assert got
        for et, r in got.items():
            w = want[et]
            assert (r["p50"], r["p99"], r["m"]) == (w["p50"], w["p99"], w["m"])
            assert r["merged"] == w["merged"]

    def test_zorder_udf_equals_column_builder(self, sql_spark):
        from clickhouse_metrics_pipeline_spark.sources.writer import (
            zorder_value,
        )

        df = sql_spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (5, 9), (65535, 65535)], "a long, b long"
        )
        df.createOrReplaceTempView("z_t")
        got = [
            r["z"]
            for r in sql_spark.sql(
                "SELECT zorder_val(a, b, 16) AS z FROM z_t ORDER BY a, b"
            ).collect()
        ]
        want = [
            r["z"]
            for r in df.select(zorder_value("a", "b", 16).alias("z"))
            .orderBy("a", "b")
            .collect()
        ]
        assert got == want and len(set(got)) == len(got)
