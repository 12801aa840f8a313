"""Bucketed write path: the co-located-join lever for fact-fact joins.

Pins the property that justifies bucketing at 100 TB: two tables
bucketed on the join key with the same bucket count join with NO
Exchange on either side (each bucket zips locally), while the same join
over plain parquet shuffles both sides.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.sources.writer import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed_table(
        li, "t_li_bucketed", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"]
    )
    write_bucketed_table(
        orders, "t_ord_bucketed", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"]
    )
    yield "t_li_bucketed", "t_ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def _join(li, orders):
    return li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty"))


def test_bucketed_join_has_no_exchange_before_the_join(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    # force the SMJ path: at test scale the small side would broadcast,
    # which hides the property under test (at 100 TB neither fact side
    # fits a broadcast)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            _join(spark.table(li_t), spark.table(ord_t))
            ._jdf.queryExecution().executedPlan().toString()
        )
        # children of the join print below it; the aggregate's exchange
        # prints above, so the tail holds only the join's input plans
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, plan
        assert "SelectedBucketsCount: 8 out of 8" in join_part, plan

        # the unbucketed baseline DOES shuffle both sides
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        base = (
            _join(li, orders)._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in base, base
        assert "Exchange" in base.split("SortMergeJoin")[-1], base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_join_matches_unbucketed_results(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    got = {
        r["o_orderpriority"]: float(r["qty"])
        for r in _join(spark.table(li_t), spark.table(ord_t)).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = {
        r["o_orderpriority"]: float(r["qty"]) for r in _join(li, orders).collect()
    }
    assert got == pytest.approx(want)
