"""Validation filter tests (F1-F4), negative fixtures from FIXTURES.md SS7
(``internal/processor/processor.go:120-172``)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.schema import (
    METRICS_RAW_SCHEMA,
    METRIC_TYPE_GAUGE,
    METRIC_TYPE_HISTOGRAM,
    METRIC_TYPE_SUM,
    METRIC_TYPE_SUMMARY,
)
from clickhouse_metrics_pipeline_spark.operators.validate import (
    split_valid_invalid,
    validate,
)

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)
OK_TS = NOW - dt.timedelta(hours=1)


def _row(metric="m", ts=OK_TS, mtype=METRIC_TYPE_GAUGE, value=1.0, count=None,
         total=None, buckets=None, exemplars=None):
    return ("ws", 1, metric, "svc", ts, mtype, 0, False, value, count, total,
            buckets, None, None, None, None, None, {}, exemplars, None)


def _mk(spark, rows):
    return spark.createDataFrame(rows, METRICS_RAW_SCHEMA)


def _now_col():
    return F.to_timestamp(F.lit(NOW.strftime("%Y-%m-%d %H:%M:%S")))


def test_negative_fixtures_dropped(spark):
    rows = [
        _row(metric=""),                                        # empty name
        _row(ts=NOW + dt.timedelta(hours=25)),                  # too far future
        _row(ts=NOW - dt.timedelta(days=8)),                    # too old
        _row(mtype=METRIC_TYPE_GAUGE, value=None),              # gauge no value
        _row(mtype=METRIC_TYPE_SUM, value=None),                # sum no value
        _row(mtype=METRIC_TYPE_HISTOGRAM, value=None),          # hist all empty
        _row(mtype=METRIC_TYPE_SUMMARY, value=None, count=5),   # summary no sum
        _row(mtype=0, value=1.0),                               # unknown type
    ]
    valid, dropped = split_valid_invalid(_mk(spark, rows), now=_now_col())
    assert valid.count() == 0
    assert dropped.count() == len(rows)


def test_positive_fixtures_kept(spark):
    rows = [
        _row(),                                                              # gauge
        _row(mtype=METRIC_TYPE_SUM, value=5.0),                              # sum
        _row(mtype=METRIC_TYPE_HISTOGRAM, value=None, count=10),             # hist count only
        _row(mtype=METRIC_TYPE_HISTOGRAM, value=None, total=1.5),            # hist sum only
        _row(mtype=METRIC_TYPE_HISTOGRAM, value=None, buckets=[(0.1, 1)]),   # hist buckets only
        _row(mtype=METRIC_TYPE_SUMMARY, value=None, count=5, total=2.0),     # summary
        _row(ts=NOW + dt.timedelta(hours=23)),                               # within +24h
        _row(ts=NOW - dt.timedelta(days=6)),                                 # within -7d
    ]
    valid, dropped = split_valid_invalid(_mk(spark, rows), now=_now_col())
    assert valid.count() == len(rows)
    assert dropped.count() == 0


def test_validate_stamps_and_caps(spark):
    exemplars = [
        (f"s{i}", f"t{i}", float(i), OK_TS, {}) for i in range(15)
    ]
    df = _mk(spark, [_row(exemplars=exemplars)])
    out = validate(df, workspace_id="ws-override", max_exemplars=10, now=_now_col())
    row = out.collect()[0]
    assert row["workspaceId"] == "ws-override"          # F2
    assert row["_ttl"] == NOW + dt.timedelta(hours=3)   # F3
    assert len(row["exemplars"]) == 10                  # F4
    assert [e["spanId"] for e in row["exemplars"]] == [f"s{i}" for i in range(10)]


def test_validate_exemplars_disabled(spark):
    df = _mk(spark, [_row(exemplars=[("s", "t", 1.0, OK_TS, {})])])
    out = validate(df, workspace_id="ws", exemplars_enabled=False, now=_now_col())
    assert out.collect()[0]["exemplars"] is None
