"""Pins for the r11 fused by-aggregation (plans/promql.py):

``sum by (L) (count_over_time/sum_over_time ...)`` (and min/min,
max/max, group/any) collapse the per-series intermediate grain into
ONE HashAggregate on the by-grain — same values, one Exchange instead
of two. Non-composable outer aggs (avg, count, quantile) must keep the
two-stage path: avg-of-series is not the row avg and count counts
SERIES.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.plans.promql import compile_promql

T0 = dt.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def series(spark):
    rows, sid = [], 0
    # two series share event_type=a so composition across series is
    # actually exercised; values differ per series
    for et, u, base in (("a", "u1", 2.0), ("a", "u2", 5.0), ("b", "u3", 3.0)):
        for i in range(4):
            rows.append(
                (
                    "events",
                    {"event_type": et, "user": u},
                    T0 + dt.timedelta(minutes=10 * i),
                    base + i,
                    sid,
                )
            )
            sid += 1
    return spark.createDataFrame(
        rows,
        "metric string, attributes map<string,string>, "
        "ts timestamp, value double, sample_id long",
    )


def _vec(df):
    return {
        tuple(r[c] for c in df.columns if c != "value"): r["value"]
        for r in df.collect()
    }


def _two_stage(q_inner, series, agg):
    """The reference two-stage evaluation: compile the BARE per-series
    call, then aggregate the per-series vector in the test."""
    g = compile_promql(q_inner, series)
    keyed = g.select(
        F.coalesce(
            F.element_at("labels", F.lit("event_type")), F.lit("")
        ).alias("event_type"),
        "bucket_ts",
        "value",
    )
    fn = {"sum": F.sum, "min": F.min, "max": F.max}[agg]
    return keyed.groupBy("event_type", "bucket_ts").agg(
        fn("value").cast("bigint").alias("value")
    )


@pytest.mark.parametrize(
    "agg,func",
    [
        ("sum", "count_over_time"),
        ("sum", "sum_over_time"),
        ("min", "min_over_time"),
        ("max", "max_over_time"),
    ],
)
def test_fused_values_equal_two_stage(spark, series, agg, func):
    fused = compile_promql(
        f"{agg} by (event_type) ({func}(events[20m]))", series
    )
    expected = _two_stage(f"{func}(events[20m])", series, agg)
    assert _vec(fused) == _vec(expected)
    assert _vec(fused)  # non-empty fixture


def test_group_fuses_for_any_tail_func(spark, series):
    fused = compile_promql(
        "group by (event_type) (last_over_time(events[20m]))", series
    )
    # plan BEFORE collect: a finalized AQE plan string prints both the
    # final and the initial plan, double-counting every Exchange
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    vals = _vec(fused)
    assert vals and set(vals.values()) == {1}


def test_fused_plan_has_one_exchange(spark, series):
    fused = compile_promql(
        "sum by (event_type) (count_over_time(events[20m]))", series
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortAggregate" not in plan


def test_avg_keeps_two_stage_path(spark, series):
    # avg of per-series values != row avg: pin both the plan shape and
    # the value (event_type=a has series sums 1400 and 2600 cents over
    # [0,40m); avg = 2000 cents -> 20000000 in the cents x10000
    # encoding)
    avg = compile_promql(
        "avg by (event_type) (sum_over_time(events[1h]))", series
    )
    plan = avg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    vals = _vec(avg)
    assert vals[("a", T0)] == 20000000


SHARE_Q = (
    "sum by (event_type, user) (count_over_time(events[20m])) "
    "/ on(event_type) group_left "
    "sum by (event_type) (count_over_time(events[20m]))"
)


def test_window_fused_binop_matches_join_form(spark, series):
    """r12: a binop whose coarse side re-aggregates the fine side
    compiles to ONE aggregate + a window function — values must equal
    the independent two-compile join evaluation."""
    from clickhouse_metrics_pipeline_spark.plans.promql import (
        _floordiv_exact,
        parse,
    )

    fused = compile_promql(SHARE_Q, series)
    b = parse(SHARE_Q)
    lhs = compile_promql(b.lhs, series).withColumnRenamed("value", "_l")
    rhs = compile_promql(b.rhs, series).withColumnRenamed("value", "_r")
    j = lhs.join(rhs.select("event_type", "bucket_ts", "_r"),
                 ["event_type", "bucket_ts"]).where(F.col("_r") != 0)
    sign = F.when(
        (F.col("_l") < 0) != (F.col("_r") < 0), F.lit(-1)
    ).otherwise(F.lit(1))
    expected = j.select(
        "event_type", "user", "bucket_ts",
        (sign * _floordiv_exact(
            F.abs(F.col("_l")) * F.lit(1_000_000), F.abs(F.col("_r"))
        )).cast("bigint").alias("value"),
    )
    assert _vec(fused) == _vec(expected)
    assert _vec(fused)


def test_window_fused_binop_plan_has_no_join_one_scan(spark, series):
    fused = compile_promql(SHARE_Q, series)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one aggregate exchange + one window exchange, nothing else
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("LocalTableScan") <= 1


def test_count_counts_series_not_rows(spark, series):
    out = compile_promql(
        "count by (event_type) (count_over_time(events[1h]))", series
    )
    vals = _vec(out)
    assert vals[("a", T0)] == 2  # two series, eight rows
    assert vals[("b", T0)] == 1
