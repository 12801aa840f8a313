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


class TestRejectReasons:
    """Dead-letter annotation: every dropped row carries its FIRST
    failing check's reason code, in the reference's check order."""

    def test_reason_codes_first_match(self, spark):
        import datetime as dt

        from clickhouse_metrics_pipeline_spark.operators.validate import (
            split_valid_invalid,
        )

        now = F.to_timestamp(F.lit("2026-08-14 12:00:00"))
        ok_ts = dt.datetime(2026, 8, 14, 11, 0, 0)

        def row(rid, metric="m", ts=ok_ts, mtype=1, value=1.0):
            r = [None] * 20
            r[0] = "w1"; r[1] = rid; r[2] = metric; r[3] = "svc"
            r[4] = ts; r[5] = mtype; r[6] = 0; r[7] = False; r[8] = value
            r[17] = {}
            return tuple(r)

        rows = [
            row(1),                                        # valid
            row(2, metric=""),                             # empty name
            row(3, ts=dt.datetime(1970, 1, 1, 0, 0)),      # epoch ts
            row(4, ts=dt.datetime(2026, 8, 16, 0, 0)),     # too new
            row(5, ts=dt.datetime(2026, 8, 1, 0, 0)),      # too old
            row(6, mtype=9),                               # unknown type
            row(7, value=None),                            # missing fields
            # empty name AND epoch ts -> FIRST failing check wins
            row(8, metric="", ts=dt.datetime(1970, 1, 1, 0, 0)),
        ]
        df = spark.createDataFrame(rows, METRICS_RAW_SCHEMA)
        valid, dropped = split_valid_invalid(df, now=now)
        assert [r.series_hash for r in valid.collect()] == [1]
        got = {r.series_hash: r.reject_reason for r in dropped.collect()}
        assert got == {
            2: "empty_metric_name",
            3: "null_or_epoch_timestamp",
            4: "timestamp_too_new",
            5: "timestamp_too_old",
            6: "unknown_metric_type",
            7: "missing_type_fields",
            8: "empty_metric_name",
        }

    def test_dead_letter_stream_partitions_by_reason(self, spark, tmp_path):
        import datetime as dt
        import os

        from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
            dead_letter_stream,
        )

        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        ok_ts = now - dt.timedelta(minutes=5)

        def row(rid, metric="m", ts=ok_ts, value=1.0):
            r = [None] * 20
            r[0] = "w1"; r[1] = rid; r[2] = metric; r[3] = "svc"
            r[4] = ts; r[5] = 1; r[6] = 0; r[7] = False; r[8] = value
            r[17] = {}
            return tuple(r)

        rows = [
            row(1),                 # valid -> NOT in DLQ
            row(2, metric=""),      # empty name
            row(3, value=None),     # missing fields
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(rows, METRICS_RAW_SCHEMA).coalesce(
            1
        ).write.parquet(src)
        dlq, ckpt = str(tmp_path / "dlq"), str(tmp_path / "ck")
        q = dead_letter_stream(
            spark.readStream.schema(METRICS_RAW_SCHEMA).parquet(src),
            dlq,
            ckpt,
            available_now=True,
        )
        q.awaitTermination(120)
        q.stop()
        out = spark.read.parquet(dlq)
        got = {r.series_hash: r.reject_reason for r in out.collect()}
        assert got == {2: "empty_metric_name", 3: "missing_type_fields"}
        # reason is a partition directory (prunable diagnostics)
        date_dirs = [d for d in os.listdir(dlq) if d.startswith("date=")]
        assert date_dirs
        reasons = {
            d
            for dd in date_dirs
            for d in os.listdir(os.path.join(dlq, dd))
            if d.startswith("reject_reason=")
        }
        assert reasons == {
            "reject_reason=empty_metric_name",
            "reject_reason=missing_type_fields",
        }
