"""Canonical fixture DataFrames (S8), ported from the reference's seed data
and integration-test payloads (FIXTURES.md SS2-SS3).

- ``seed_metrics``: the 4 rows of ``scripts/init-clickhouse.sh:45-85``
  (gauge, 2-point cumulative counter, 12-bucket delta histogram).
- ``integration_metrics``: the 4 points pushed by
  ``test/integration_test.go:70-149`` (gauge 75.5, cumulative pair
  100/150, 9-bucket delta histogram with one exemplar).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.functions.hashing import series_hash
from clickhouse_metrics_pipeline_spark.schema import (
    METRICS_RAW_SCHEMA,
    METRIC_TYPE_GAUGE,
    METRIC_TYPE_HISTOGRAM,
    METRIC_TYPE_SUM,
    TEMPORALITY_CUMULATIVE,
    TEMPORALITY_DELTA,
    TEMPORALITY_UNSPECIFIED,
)

INF = float("inf")

_SEED_NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


def _finish(spark: SparkSession, rows) -> DataFrame:
    df = spark.createDataFrame(rows, METRICS_RAW_SCHEMA)
    # recompute canonical hash from identity (overrides placeholder zeros)
    return df.withColumn(
        "series_hash", series_hash("metric", "workspaceId", "attributes")
    )


def seed_metrics(spark: SparkSession, now: dt.datetime = _SEED_NOW) -> DataFrame:
    """Seed rows from scripts/init-clickhouse.sh:45-85."""
    attrs_test = {"env": "test", "host": "localhost"}
    attrs_http = {"endpoint": "/api/users", "method": "GET", "status": "200"}
    hd_le = [0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, INF]
    hd_ct = [100, 200, 300, 200, 150, 100, 80, 60, 40, 20, 10, 5]
    rows = [
        ("test", 0, "test_gauge", "test-service", now - dt.timedelta(minutes=1),
         METRIC_TYPE_GAUGE, TEMPORALITY_UNSPECIFIED, False, 42.5, None, None,
         None, None, None, None, None, None, attrs_test, None, None),
        ("test", 0, "test_counter", "test-service", now - dt.timedelta(minutes=1),
         METRIC_TYPE_SUM, TEMPORALITY_CUMULATIVE, True, 100.0, None, None,
         None, None, None, None, None, None, attrs_test, None, None),
        ("test", 0, "test_counter", "test-service", now,
         METRIC_TYPE_SUM, TEMPORALITY_CUMULATIVE, True, 150.0, None, None,
         None, None, None, None, None, None, attrs_test, None, None),
        ("test", 0, "http_duration", "api-service", now - dt.timedelta(minutes=5),
         METRIC_TYPE_HISTOGRAM, TEMPORALITY_DELTA, False, None, 1000, 5000.0,
         list(zip(hd_le, hd_ct)), None, None, None, None, None, attrs_http,
         None, None),
    ]
    return _finish(spark, rows)


def integration_metrics(spark: SparkSession, now: dt.datetime = _SEED_NOW) -> DataFrame:
    """The integration test's pushed points (integration_test.go:70-149)."""
    h_le = [0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, INF]
    h_ct = [100, 200, 300, 200, 150, 40, 8, 2, 0]
    exemplar = [("abc123def456", "trace-12345", 0.025, now, {"user_id": "12345"})]
    rows = [
        ("integration_test", 0, "cpu_usage", "test-service", now,
         METRIC_TYPE_GAUGE, TEMPORALITY_UNSPECIFIED, False, 75.5, None, None,
         None, None, None, None, None, None,
         {"host": "server-1", "env": "test"}, None, None),
        ("integration_test", 0, "requests_total", "test-service", now,
         METRIC_TYPE_SUM, TEMPORALITY_CUMULATIVE, True, 100.0, None, None,
         None, None, None, None, None, None,
         {"endpoint": "/api/users", "method": "GET"}, None, None),
        ("integration_test", 0, "requests_total", "test-service",
         now + dt.timedelta(seconds=1),
         METRIC_TYPE_SUM, TEMPORALITY_CUMULATIVE, True, 150.0, None, None,
         None, None, None, None, None, None,
         {"endpoint": "/api/users", "method": "GET"}, None, None),
        ("integration_test", 0, "request_duration", "test-service", now,
         METRIC_TYPE_HISTOGRAM, TEMPORALITY_DELTA, False, None, 1000, 5000.0,
         list(zip(h_le, h_ct)), None, None, None, None, None,
         {"endpoint": "/api/orders", "method": "POST"}, exemplar, None),
    ]
    return _finish(spark, rows)
