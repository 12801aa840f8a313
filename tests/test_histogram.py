"""Golden tests for the histogram kernel library.

Every expected value is pinned by the reference's test suite
(``test/histogram_test.go``, see FIXTURES.md SS4) - these are ports, not
re-derivations.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_metrics_pipeline_spark.schema import BUCKET_TYPE
from clickhouse_metrics_pipeline_spark.functions.histogram import (
    bucket_percentile,
    bucket_percentile_scaled,
    bucket_percentiles,
    bucket_total,
    cumulative_to_delta_buckets,
    delta_to_cumulative_buckets,
    exp_histogram_percentile,
    merge_bucket_arrays,
    merge_buckets_agg,
)

INF = float("inf")

# test/histogram_test.go:11-87
GOLDEN_BUCKETS = [
    (0.005, 100), (0.01, 200), (0.025, 300), (0.05, 200), (0.1, 150),
    (0.25, 30), (0.5, 15), (1.0, 5), (INF, 0),
]


def _bucket_df(spark, rows):
    schema = T.StructType([T.StructField("buckets", BUCKET_TYPE)])
    return spark.createDataFrame([(r,) for r in rows], schema)


def _one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


class TestBucketPercentile:
    def test_golden_percentiles(self, spark):
        df = _bucket_df(spark, [GOLDEN_BUCKETS])
        p50 = _one(df, bucket_percentile("buckets", 50.0))
        p95 = _one(df, bucket_percentile("buckets", 95.0))
        p99 = _one(df, bucket_percentile("buckets", 99.0))
        assert p50 == pytest.approx(0.0167, abs=0.001)  # histogram_test.go:36
        assert p95 == pytest.approx(0.0933, abs=0.01)  # histogram_test.go:49
        assert p99 == pytest.approx(0.4, abs=0.1)  # histogram_test.go:62

    def test_multiple_percentiles(self, spark):
        df = _bucket_df(spark, [GOLDEN_BUCKETS])
        vals = _one(df, bucket_percentiles("buckets", [50.0, 95.0, 99.0]))
        assert vals[0] == pytest.approx(0.0167, abs=0.001)
        assert vals[1] == pytest.approx(0.0933, abs=0.01)
        assert vals[2] == pytest.approx(0.4, abs=0.1)

    def test_unsorted_input_is_sorted(self, spark):
        df = _bucket_df(spark, [list(reversed(GOLDEN_BUCKETS))])
        assert _one(df, bucket_percentile("buckets", 50.0)) == pytest.approx(
            0.0167, abs=0.001
        )

    def test_empty_and_zero_total_return_null(self, spark):
        df = _bucket_df(spark, [[], [(0.1, 0), (1.0, 0)]])
        vals = df.select(bucket_percentile("buckets", 50.0).alias("v")).collect()
        assert vals[0]["v"] is None and vals[1]["v"] is None

    def test_inf_bucket_hit_returns_previous_bound(self, spark):
        # p high enough to land in +Inf bucket -> previous finite bound
        df = _bucket_df(spark, [[(0.1, 10), (INF, 90)]])
        assert _one(df, bucket_percentile("buckets", 99.0)) == pytest.approx(0.1)

    def test_golden_mode_inversion_documented_in_readme(self, spark):
        # The reference's frac*le interpolation is NOT monotone in p:
        # crossing into a wide bucket collapses the value toward 0
        # (README "Percentile interpolation modes"). Pin the example.
        df = _bucket_df(spark, [[(10.0, 50), (1000.0, 51)]])
        g49 = _one(df, bucket_percentile("buckets", 49.0, "golden"))
        g50 = _one(df, bucket_percentile("buckets", 50.0, "golden"))
        assert g49 == pytest.approx(9.898, abs=0.001)
        assert g50 == pytest.approx(9.804, abs=0.001)
        assert g50 < g49  # the inversion golden mode permits
        p49 = _one(df, bucket_percentile("buckets", 49.0, "prometheus"))
        p50 = _one(df, bucket_percentile("buckets", 50.0, "prometheus"))
        assert p50 > p49  # prometheus mode stays monotone

    def test_total(self, spark):
        df = _bucket_df(spark, [GOLDEN_BUCKETS])
        assert _one(df, bucket_total("buckets")) == 1000


# integer-bound fixtures for the exact-integer walk (catalog BOUNDS shape)
INT_BUCKETS = [
    [(10.0, 7), (25.0, 13), (50.0, 5), (100.0, 2), (200.0, 1), (500.0, 3), (INF, 2)],
    [(10.0, 1), (INF, 0)],
    [(10.0, 0), (25.0, 4), (INF, 9)],  # zero-count bucket + inf hit
    [(10.0, 3), (25.0, 0), (50.0, 3)],  # no inf bucket (tail = last bound)
]


class TestBucketPercentileScaled:
    """The exact-integer walk must agree with the double kernel to the
    floor at every integer-bound case and percentile - it IS the same
    walk, just with the float tail removed (the round-4 driver-hash
    fragility fix)."""

    @pytest.mark.parametrize("mode", ["golden", "prometheus"])
    @pytest.mark.parametrize("p", [1, 25, 50, 75, 90, 95, 99, 100])
    def test_matches_double_kernel(self, spark, mode, p):
        df = _bucket_df(spark, INT_BUCKETS)
        rows = df.select(
            bucket_percentile("buckets", float(p), mode).alias("d"),
            bucket_percentile_scaled("buckets", p, 10000, mode).alias("s"),
        ).collect()
        for r in rows:
            assert r["s"] is not None and r["d"] is not None
            # scaled = floor(double * 10000) up to the double's own ulp
            assert abs(r["s"] - r["d"] * 10000) <= 1, (mode, p, r)

    def test_empty_and_zero_total_return_null(self, spark):
        df = _bucket_df(spark, [[], [(10.0, 0), (25.0, 0)]])
        vals = df.select(
            bucket_percentile_scaled("buckets", 50).alias("v")
        ).collect()
        assert vals[0]["v"] is None and vals[1]["v"] is None

    def test_inf_hit_returns_previous_bound_scaled(self, spark):
        df = _bucket_df(spark, [[(10.0, 10), (INF, 90)]])
        assert _one(df, bucket_percentile_scaled("buckets", 99)) == 100000

    def test_exact_interpolation_value(self, spark):
        # 4 in first bucket, 4 in second; p50 target=4 -> frac=4/4=1.0
        # golden: 1.0 * 10 = 10; p75 target=6 -> frac=(6-4)/4=0.5 in
        # (10,25] -> golden 12.5, prometheus 10 + 0.5*15 = 17.5
        df = _bucket_df(spark, [[(10.0, 4), (25.0, 4)]])
        assert _one(df, bucket_percentile_scaled("buckets", 50)) == 100000
        assert _one(df, bucket_percentile_scaled("buckets", 75)) == 125000
        assert (
            _one(df, bucket_percentile_scaled("buckets", 75, 10000, "prometheus"))
            == 175000
        )

    def test_scale_must_be_multiple_of_100(self):
        with pytest.raises(ValueError):
            bucket_percentile_scaled("buckets", 50, scale=123)


class TestBucketConversions:
    BOUNDS = [0.005, 0.01, 0.025, 0.05, 0.1]

    def test_delta_to_cumulative(self, spark):
        # histogram_test.go:89-124
        delta = list(zip(self.BOUNDS, [10, 20, 30, 15, 5]))
        df = _bucket_df(spark, [delta])
        out = _one(df, delta_to_cumulative_buckets("buckets"))
        assert [b["count"] for b in out] == [10, 30, 60, 75, 80]
        assert [b["le"] for b in out] == self.BOUNDS

    def test_cumulative_to_delta(self, spark):
        # histogram_test.go:126-161
        cum = list(zip(self.BOUNDS, [10, 30, 60, 75, 80]))
        df = _bucket_df(spark, [cum])
        out = _one(df, cumulative_to_delta_buckets("buckets"))
        assert [b["count"] for b in out] == [10, 20, 30, 15, 5]

    def test_roundtrip(self, spark):
        delta = list(zip(self.BOUNDS, [10, 20, 30, 15, 5]))
        df = _bucket_df(spark, [delta])
        out = _one(
            df, cumulative_to_delta_buckets(delta_to_cumulative_buckets("buckets"))
        )
        assert [b["count"] for b in out] == [10, 20, 30, 15, 5]


class TestMergeBuckets:
    # histogram_test.go:163-211: three groups merge to
    # {0.005:15, 0.01:35, 0.025:55, 0.05:35, 0.1:20}
    GROUPS = [
        [(0.005, 5), (0.01, 10), (0.025, 20)],
        [(0.005, 10), (0.01, 15), (0.05, 25)],
        [(0.01, 10), (0.025, 35), (0.05, 10), (0.1, 20)],
    ]
    EXPECTED = {0.005: 15, 0.01: 35, 0.025: 55, 0.05: 35, 0.1: 20}

    def test_merge_bucket_arrays_column(self, spark):
        schema = T.StructType([T.StructField("groups", T.ArrayType(BUCKET_TYPE))])
        df = spark.createDataFrame([(self.GROUPS,)], schema)
        out = _one(df, merge_bucket_arrays("groups"))
        assert {b["le"]: b["count"] for b in out} == self.EXPECTED
        assert [b["le"] for b in out] == sorted(self.EXPECTED)

    def test_merge_buckets_agg(self, spark):
        schema = T.StructType(
            [T.StructField("g", T.StringType()), T.StructField("buckets", BUCKET_TYPE)]
        )
        df = spark.createDataFrame([("a", g) for g in self.GROUPS], schema)
        out = merge_buckets_agg(df, ["g"]).collect()[0]["buckets"]
        assert {b["le"]: b["count"] for b in out} == self.EXPECTED


class TestExpHistogram:
    # histogram_test.go:213-273: scale=0, positive buckets, percentiles >= 0
    POS = [(-2, 10), (-1, 20), (0, 100), (1, 50), (2, 15), (3, 5)]

    def _df(self, spark, zero_count):
        schema = T.StructType(
            [
                T.StructField("exp_scale", T.IntegerType()),
                T.StructField("exp_zero_count", T.LongType()),
                T.StructField(
                    "pos",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("index", T.IntegerType()),
                                T.StructField("count", T.LongType()),
                            ]
                        )
                    ),
                ),
                T.StructField(
                    "neg",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("index", T.IntegerType()),
                                T.StructField("count", T.LongType()),
                            ]
                        )
                    ),
                ),
            ]
        )
        return spark.createDataFrame([(0, zero_count, self.POS, [])], schema)

    @pytest.mark.parametrize("zero_count", [0, 10])
    @pytest.mark.parametrize("p", [50.0, 95.0, 99.0])
    def test_non_negative(self, spark, zero_count, p):
        df = self._df(spark, zero_count)
        v = _one(
            df,
            exp_histogram_percentile(
                "exp_scale", "exp_zero_count", "pos", "neg", p
            ),
        )
        assert v is not None and v >= 0

    def test_midpoint_formula(self, spark):
        # scale=0 -> base=2; bucket index 0 covers (1,2] -> midpoint 1.5.
        # Single bucket: every percentile returns its midpoint.
        schema = "exp_scale INT, exp_zero_count BIGINT, pos ARRAY<STRUCT<index: INT, count: BIGINT>>, neg ARRAY<STRUCT<index: INT, count: BIGINT>>"
        df = spark.createDataFrame([(0, 0, [(0, 10)], [])], schema)
        v = _one(
            df,
            exp_histogram_percentile("exp_scale", "exp_zero_count", "pos", "neg", 50.0),
        )
        assert v == pytest.approx((2**0 + 2**1) / 2)

    def test_zero_bucket_returns_zero(self, spark):
        schema = "exp_scale INT, exp_zero_count BIGINT, pos ARRAY<STRUCT<index: INT, count: BIGINT>>, neg ARRAY<STRUCT<index: INT, count: BIGINT>>"
        df = spark.createDataFrame([(0, 100, [(0, 1)], [])], schema)
        v = _one(
            df,
            exp_histogram_percentile("exp_scale", "exp_zero_count", "pos", "neg", 50.0),
        )
        assert v == 0.0

    def test_negative_buckets_walked_most_negative_first(self, spark):
        # 10 samples in neg index 2 (values ~ -(4,8] midpoint -6), 10 in neg
        # index 0 (midpoint -1.5). P25 must land in the MORE negative bucket.
        schema = "exp_scale INT, exp_zero_count BIGINT, pos ARRAY<STRUCT<index: INT, count: BIGINT>>, neg ARRAY<STRUCT<index: INT, count: BIGINT>>"
        df = spark.createDataFrame([(0, 0, [], [(0, 10), (2, 10)])], schema)
        v = _one(
            df,
            exp_histogram_percentile("exp_scale", "exp_zero_count", "pos", "neg", 25.0),
        )
        assert v == pytest.approx(-(4 + 8) / 2)


class TestMergeExpHistograms:
    """H7 merge across scales (percentile.go:227-297 semantics with the
    documented floor-div fix for negative-index downscale)."""

    SCHEMA = (
        "g STRING, exp_scale INT, exp_zero_count BIGINT, "
        "exp_zero_threshold DOUBLE, "
        "exp_positive_buckets ARRAY<STRUCT<index: INT, count: BIGINT>>, "
        "exp_negative_buckets ARRAY<STRUCT<index: INT, count: BIGINT>>"
    )

    def test_downscale_to_min_scale(self, spark):
        from clickhouse_metrics_pipeline_spark.functions.histogram import (
            merge_exp_histograms_agg,
        )

        # scale-2 indexes 4..7 all cover scale-0 index 1 (floor(i/4)=1);
        # scale-0 row contributes index 1 directly -> merged count 4+6+5+7+3
        rows = [
            ("a", 2, 10, 0.001, [(4, 4), (5, 6), (6, 5), (7, 7)], []),
            ("a", 0, 5, 0.01, [(1, 3)], []),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = merge_exp_histograms_agg(df, ["g"]).collect()[0]
        assert out["exp_scale"] == 0
        assert out["exp_zero_count"] == 15
        assert out["exp_zero_threshold"] == 0.01
        assert [(b["index"], b["count"]) for b in out["exp_positive_buckets"]] == [
            (1, 25)
        ]

    def test_negative_index_floor_division(self, spark):
        from clickhouse_metrics_pipeline_spark.functions.histogram import (
            merge_exp_histograms_agg,
        )

        # scale-1 index -1 -> scale-0 floor(-1/2) = -1 (Go truncation
        # would give 0 - the documented deviation)
        rows = [
            ("a", 1, 0, 0.0, [(-1, 2)], []),
            ("a", 0, 0, 0.0, [(-1, 3)], []),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = merge_exp_histograms_agg(df, ["g"]).collect()[0]
        assert [(b["index"], b["count"]) for b in out["exp_positive_buckets"]] == [
            (-1, 5)
        ]
