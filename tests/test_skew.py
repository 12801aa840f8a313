"""Salted-join skew mitigation: result parity + salt spread."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.operators.skew import SALT_COL, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share key 7; dim has one row per key
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    return big, small


def test_inner_parity(spark, skewed):
    big, small = skewed
    got = salted_join(big, small, ["k"]).orderBy("payload").collect()
    want = big.join(small, ["k"]).orderBy("payload").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_left_parity_keeps_unmatched_rows(spark, skewed):
    big, small = skewed
    dangling = big.unionAll(
        spark.range(1).select(F.lit(999).alias("k"), F.lit(-1).alias("payload"))
    )
    got = salted_join(dangling, small, ["k"], how="left").orderBy("payload").collect()
    want = dangling.join(small, ["k"], "left").orderBy("payload").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_hot_key_spreads_over_salt_buckets(spark, skewed):
    big, _ = skewed
    salted = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(16))
    )
    spread = (
        salted.where(F.col("k") == 7).select(SALT_COL).distinct().count()
    )
    assert spread == 16  # 9000 hot rows hit every salt bucket


def test_rejects_right_joins(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="right")
