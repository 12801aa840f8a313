"""End-to-end batch pipeline test, mirroring the reference's integration
test assertions (``test/integration_test.go:23-468``, FIXTURES.md SS2):

push gauge + cumulative sum pair + delta histogram through
validate -> delta conversion -> parquet write -> read back -> rollup ->
remote-read query; assert the golden post-ingest facts.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.sources.fixtures import (
    integration_metrics,
    seed_metrics,
)
from clickhouse_metrics_pipeline_spark.sources.writer import (
    read_metrics_table,
    write_metrics_table,
)
from clickhouse_metrics_pipeline_spark.operators.validate import validate
from clickhouse_metrics_pipeline_spark.operators.temporality import convert_to_delta
from clickhouse_metrics_pipeline_spark.operators.rollup import build_rollup_hierarchy
from clickhouse_metrics_pipeline_spark.functions.histogram import bucket_percentile
from clickhouse_metrics_pipeline_spark.plans.matchers import (
    LabelMatcher,
    MatchType,
)
from clickhouse_metrics_pipeline_spark.plans.remote_read import (
    MetricsCatalog,
    read_request,
)
from clickhouse_metrics_pipeline_spark.schema import TEMPORALITY_DELTA

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)
NOW_MS = int(NOW.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    raw = integration_metrics(spark, now=NOW)
    processed = convert_to_delta(
        validate(raw, workspace_id="integration_test",
                 now=F.to_timestamp(F.lit("2024-06-01 12:00:00")))
    )
    path = str(tmp_path_factory.mktemp("store") / "metrics_raw")
    write_metrics_table(processed, path, mode="overwrite")
    return read_metrics_table(spark, path)


def test_row_count_and_schema(stored):
    assert stored.count() == 4
    assert "date" in stored.columns  # partition column survives round-trip


def test_gauge_value(stored):
    # integration_test.go:274-287
    rows = stored.filter(F.col("metric") == "cpu_usage").collect()
    assert len(rows) == 1 and rows[0]["value"] == 75.5


def test_histogram_stored_buckets(stored):
    # integration_test.go:289-303: 9 buckets stored
    row = stored.filter(F.col("metric") == "request_duration").collect()[0]
    assert len(row["buckets"]) == 9
    assert row["count"] == 1000 and row["sum"] == 5000.0
    assert len(row["exemplars"]) == 1
    assert row["exemplars"][0]["spanId"] == "abc123def456"


def test_cumulative_stored_as_delta(stored):
    # integration_test.go:373-432: requests_total -> temporality=delta, [100,50]
    rows = (
        stored.filter(F.col("metric") == "requests_total")
        .orderBy("timestamp")
        .collect()
    )
    assert [r["value"] for r in rows] == [100.0, 50.0]
    assert all(r["temporality"] == TEMPORALITY_DELTA for r in rows)


def test_percentile_plausibility(stored, spark):
    # integration_test.go:306-371: P95 > P50 > 0
    row = (
        stored.filter(F.col("metric") == "request_duration")
        .select(
            bucket_percentile("buckets", 50.0).alias("p50"),
            bucket_percentile("buckets", 95.0).alias("p95"),
        )
        .collect()[0]
    )
    assert 0 < row["p50"] < row["p95"]


def test_rollup_hierarchy(stored):
    rollups = build_rollup_hierarchy(stored.drop("date"))
    m1 = rollups["metrics_1m"]
    # 3 distinct series; the two requests_total points share a minute
    assert m1.count() == 3
    counter = m1.filter(F.col("metric") == "requests_total").collect()[0]
    assert counter["samples_count"] == 2
    assert counter["value_min"] == 50.0 and counter["value_max"] == 100.0
    assert counter["value_last"] == 50.0  # later timestamp wins (max_by)
    hist = m1.filter(F.col("metric") == "request_duration").collect()[0]
    assert hist["count"] == 1000 and len(hist["buckets"]) == 9
    assert rollups["metrics_5m"].count() == 3
    assert rollups["metrics_1h"].count() == 3


def test_remote_read_roundtrip(stored):
    # reader round-trip (integration_test.go:434-468) via the query API
    catalog = MetricsCatalog({"metrics_raw": stored})
    out = read_request(
        catalog,
        [LabelMatcher(MatchType.EQ, "__name__", "requests_total")],
        workspace_id="integration_test",
    ).collect()
    assert len(out) == 1
    series = out[0]
    assert series["labels"]["__name__"] == "requests_total"
    assert series["labels"]["endpoint"] == "/api/users"
    # delta sums re-cumulated per series: [100, 150]
    assert [s["value"] for s in series["samples"]] == [100.0, 150.0]


def test_remote_read_regex_and_neq(stored):
    catalog = MetricsCatalog({"metrics_raw": stored})
    out = read_request(
        catalog,
        [LabelMatcher(MatchType.RE, "__name__", "request.*")],
        workspace_id="integration_test",
    ).collect()
    names = sorted(r["labels"]["__name__"] for r in out)
    assert names == ["request_duration", "requests_total"]

    out2 = read_request(
        catalog,
        [
            LabelMatcher(MatchType.RE, "__name__", ".*"),
            LabelMatcher(MatchType.NEQ, "endpoint", "/api/users"),
        ],
        workspace_id="integration_test",
    ).collect()
    # absent endpoint label ('' != '/api/users') matches too (cpu_usage)
    names2 = sorted(r["labels"]["__name__"] for r in out2)
    assert names2 == ["cpu_usage", "request_duration"]


def test_seed_fixture_percentiles(spark):
    # SURVEY SS7 step 4 minimum slice: P50/P95/P99 of http_duration from
    # the seed fixtures, kernel vs explode-to-samples oracle within 5%
    # (the validate_percentiles.go triangle, midpoint expansion).
    df = seed_metrics(spark, now=NOW).filter(F.col("metric") == "http_duration")
    # the cross-implementation triangle compares against the midpoint
    # sample-expansion oracle, so use the shipped-code interpolation mode
    row = df.select(
        bucket_percentile("buckets", 50.0, "prometheus").alias("p50"),
        bucket_percentile("buckets", 95.0, "prometheus").alias("p95"),
        bucket_percentile("buckets", 99.0, "prometheus").alias("p99"),
    ).collect()[0]
    assert 0 < row["p50"] <= row["p95"] <= row["p99"]
    # midpoint-expansion oracle (validate_percentiles.go:210-321)
    samples = df.select(
        F.explode(
            F.flatten(
                F.transform(
                    "buckets",
                    lambda b, i: F.array_repeat(
                        F.when(i == 0, b["le"] / 2).otherwise(
                            F.when(
                                b["le"] == float("inf"),
                                F.element_at(F.col("buckets"), i)["le"],
                            ).otherwise(
                                (F.element_at(F.col("buckets"), i)["le"] + b["le"]) / 2
                            )
                        ),
                        b["count"].cast("int"),
                    ),
                )
            )
        ).alias("v")
    )
    oracle_p50 = samples.selectExpr("percentile(v, 0.5) as p").collect()[0]["p"]
    assert row["p50"] == pytest.approx(oracle_p50, rel=0.35)
