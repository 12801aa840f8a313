"""Pins for the r12 plan-construction memos (tables.py frame memos +
plans/promql.compile_promql).

The memos cache LOGICAL PLANS only. Three honesty properties must
hold:

1. a memo hit returns a FRESH Dataset (never the same object), so AQE
   can never reuse a previous execution's materialized shuffle stages
   across invocations;
2. data-dependent dispatch probes run on EVERY invocation — a memo
   hit replays the recorded probe jobs against the live data before
   serving the cached expression tree;
3. hits compile to the same values as misses.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.plans import promql as P
from clickhouse_metrics_pipeline_spark.tables import _events, _t

T0 = dt.datetime(2026, 1, 1)


def test_read_frame_memo_is_per_session_and_stable(spark):
    a = _t(spark, "/root/testdata/sf0.001", "events")
    b = _t(spark, "/root/testdata/sf0.001", "events")
    assert a is b
    c = _events(spark, "/root/testdata/sf0.001")
    d = _events(spark, "/root/testdata/sf0.001")
    assert c is d


def test_compile_memo_returns_fresh_dataset_same_values(spark):
    series = P.events_as_series(_events(spark, "/root/testdata/sf0.001"))
    q = "sum by (event_type) (count_over_time(events[1h]))"
    a = P.compile_promql(q, series)
    b = P.compile_promql(q, series)
    assert a is not b  # fresh Dataset per call — no stage reuse
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and ra


def test_probed_plan_reruns_probe_jobs_on_every_hit(spark):
    rows = [
        (
            "m",
            {"k": "v"},
            T0 + dt.timedelta(minutes=i),
            float(i),
            i,
            [10.0, 20.0],
            [i + 1, 2 * i + 2],
        )
        for i in range(6)
    ]
    frame = spark.createDataFrame(
        rows,
        "metric string, attributes map<string,string>, ts timestamp, "
        "value double, sample_id long, buckets_le array<double>, "
        "buckets_count array<bigint>",
    )
    q = "histogram_quantile(0.95, sum by (k) (count_over_time(m[1h])))"
    p0 = P._PROBES_RUN[0]
    a = P.compile_promql(q, frame)
    probes_per_compile = P._PROBES_RUN[0] - p0
    assert probes_per_compile >= 1  # the dispatch really probed
    p1, r1 = P._PROBES_RUN[0], P._REPLAYS_RUN[0]
    b = P.compile_promql(q, frame)
    # the hit replayed every recorded probe against the live data
    assert P._REPLAYS_RUN[0] - r1 == probes_per_compile
    assert a is not b
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_uncacheable_series_frame_still_compiles(spark):
    # a fresh frame object per call must simply miss the memo
    q = "sum by (event_type) (count_over_time(events[1h]))"
    f1 = P.events_as_series(_events(spark, "/root/testdata/sf0.001"))
    out1 = P.compile_promql(q, f1)
    f2 = f1.where(F.lit(True))
    out2 = P.compile_promql(q, f2)
    assert sorted(map(tuple, out1.collect())) == sorted(
        map(tuple, out2.collect())
    )
