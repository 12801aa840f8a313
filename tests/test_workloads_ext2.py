"""Semantics pins for the second extended catalog (workloads_ext2).

The oracle harness proves sf-scale equality; these tests pin the edge
semantics the docstrings promise, on tiny hand-built frames where the
expected value is computed by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.operators.asof import asof_join
from clickhouse_metrics_pipeline_spark.plans.router import select_resolution

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


# --------------------------------------------------------------------------
# Session window: merge iff gap <= 30 min (strictly-greater starts new)
# --------------------------------------------------------------------------


def test_session_exact_gap_merges(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0),
        (2, "2024-01-01 00:30:00", 7, "click", 1.0),  # exactly 30:00 -> merge
        (3, "2024-01-01 01:00:01", 7, "click", 1.0),  # 30:01 -> new session
    ]
    out = (
        _ev(spark, rows)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sw.start")
        .collect()
    )
    assert [r["n"] for r in out] == [2, 1]
    assert out[0]["sw"]["end"].strftime("%H:%M:%S") == "01:00:00"


# --------------------------------------------------------------------------
# As-of join: backward, tie at equal ts decided by tiebreak order
# --------------------------------------------------------------------------


def test_asof_backward_and_ties(spark):
    purchases = _ev(
        spark,
        [
            (10, "2024-01-01 01:00:00", 7, "purchase", 5.0),
            (20, "2024-01-01 02:00:00", 7, "purchase", 5.0),
            (30, "2024-01-01 00:10:00", 8, "purchase", 5.0),  # no prior click
        ],
    )
    clicks = _ev(
        spark,
        [
            (1, "2024-01-01 00:30:00", 7, "click", 1.0),
            (15, "2024-01-01 02:00:00", 7, "click", 1.0),  # same ts as p20, id<20
            (25, "2024-01-01 02:00:00", 7, "click", 1.0),  # same ts, id>20: invisible
            (99, "2024-01-01 09:00:00", 8, "click", 1.0),  # future: invisible
        ],
    ).select("user_id", "ts", "event_id")
    out = {
        r["event_id"]: r
        for r in asof_join(
            purchases, clicks, keys=["user_id"], payload=["event_id", "ts"]
        ).collect()
    }
    assert out[10]["asof_event_id"] == 1
    assert out[20]["asof_event_id"] == 15  # id 15 visible at tie, id 25 not
    assert out[30]["asof_event_id"] is None  # nothing at-or-before


def test_asof_null_payload_is_row_atomic(spark):
    """The latest right row wins AS A ROW: a NULL payload value in the
    newest right row must come through as NULL, not be backfilled from an
    older right row (and multi-column payloads must never be stitched
    from different right rows)."""
    purchases = _ev(spark, [(10, "2024-01-01 03:00:00", 7, "purchase", 5.0)])
    clicks = spark.createDataFrame(
        [
            (1, "2024-01-01 01:00:00", 7, 111.0),
            (2, "2024-01-01 02:00:00", 7, None),  # latest: value is NULL
        ],
        "event_id BIGINT, ts STRING, user_id BIGINT, value DOUBLE",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value")
    row = asof_join(
        purchases, clicks, keys=["user_id"], payload=["event_id", "value"]
    ).collect()[0]
    assert row["asof_event_id"] == 2
    assert row["asof_value"] is None  # NOT 111.0 from the older row


# --------------------------------------------------------------------------
# Exemplar cap: top-3 by value, ties by event_id, slice is exact
# --------------------------------------------------------------------------


def test_exemplar_cap_top3(spark):
    from clickhouse_metrics_pipeline_spark.workloads_ext2 import events_exemplar_cap

    out = events_exemplar_cap(spark, SF)
    g = out.groupBy("user_id", "event_type").count().agg(F.max("count")).first()[0]
    assert g <= 3
    # rank 1 must be the per-series max value
    ranked = out.where(F.col("exemplar_rank") == 1).alias("r")
    raw = (
        _raw_events(spark)
        .groupBy("user_id", "event_type")
        .agg(F.round(F.max("value"), 4).alias("vmax"))
        .alias("m")
    )
    joined = ranked.join(raw, ["user_id", "event_type"])
    assert joined.where(F.col("value") != F.col("vmax")).count() == 0


def _raw_events(spark):
    from clickhouse_metrics_pipeline_spark.tables import _events

    return _events(spark, SF)


# --------------------------------------------------------------------------
# Rollup cascade == direct 1h aggregation (losslessness, small frame)
# --------------------------------------------------------------------------


def test_cascade_equals_direct(spark):
    from clickhouse_metrics_pipeline_spark.workloads_ext2 import events_rollup_cascade

    cascade = events_rollup_cascade(spark, SF)
    ev = _raw_events(spark)
    direct = (
        ev.groupBy("user_id", "event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            F.round(F.min("value"), 4).alias("value_min"),
            F.round(F.max("value"), 4).alias("value_max"),
            F.round(F.avg("value"), 4).alias("value_avg"),
            F.round(F.max_by("value", F.struct("ts", "event_id")), 4).alias("value_last"),
            F.count(F.lit(1)).alias("samples_count"),
        )
    )
    assert cascade.exceptAll(direct).count() == 0
    assert direct.exceptAll(cascade).count() == 0


# --------------------------------------------------------------------------
# Resolution router: the documented ladder
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "age_h,span_h,expect",
    [
        (1, 0.5, "metrics_raw"),
        (10, 0.5, "metrics_1m"),  # too old for raw
        (10, 30, "metrics_5m"),  # span too wide for 1m
        (30 * 24, 0.5, "metrics_5m"),  # too old for 1m
        (100 * 24, 0.5, "metrics_1h"),  # too old for 5m
        (10, 10 * 24, "metrics_1h"),  # span too wide for 5m
    ],
)
def test_router_ladder(age_h, span_h, expect):
    now = 1_706_745_600_000
    start = now - int(age_h * 3_600_000)
    end = start + int(span_h * 3_600_000)
    assert select_resolution(start, end, now) == expect


# --------------------------------------------------------------------------
# Approx distinct (HLL) within 5% of the exact catalog query
# --------------------------------------------------------------------------


def test_approx_distinct_tolerance(spark):
    ev = _raw_events(spark)
    got = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert len(got) > 0
    for r in got:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.05 * r["exact"])


# --------------------------------------------------------------------------
# Sliding window: every event lands in exactly size/hop windows
# --------------------------------------------------------------------------


def test_sliding_window_duplication_factor(spark):
    from clickhouse_metrics_pipeline_spark.workloads_ext2 import events_sliding_window

    total = events_sliding_window(spark, SF).agg(F.sum("n_events")).first()[0]
    n = _raw_events(spark).count()
    assert total == 2 * n


class TestPartitionCountDeterminism:
    """Results must be invariant to shuffle parallelism — the property
    that holds on a 1000-executor cluster exactly when no output
    depends on float combine order. The full catalog sweep passes (81 queries as of round 3)
    (see PLAN_AUDIT.md methodology); this pins the families that were
    combine-order-sensitive before the integer-cents conversion plus
    one representative per operator family."""

    QUERIES = [
        "events_rollup_5m_weighted",  # flipped at sf0.1 pre-conversion
        "events_rollup_1h",           # flipped at sf0.1 pre-conversion
        "events_resolution_route",    # flipped at sf0.1 pre-conversion
        "events_rollup_cascade",
        "events_session_window",
        "events_topk_series",
        "docs_pack_sequences",
        "emb_cosine_topk",
        pytest.param(
            "docs_minhash_lsh",
            marks=pytest.mark.slow,  # r12: fast-gate budget
        ),
        "hist_percentile_prom_events",
        "q1_pricing_summary",
        # round-4 second batch: integer least-squares + span sweep
        "events_predict_linear",
        "events_changes_1h",
        pytest.param(
            "docs_repeated_spans",
            marks=pytest.mark.slow,  # r12: fast-gate budget
        ),
        # round-4 third batch: bloom pre-filter + linear classifier
        pytest.param(
            "docs_bloom_decontaminate",
            marks=pytest.mark.slow,  # r12: fast-gate budget
        ),
        "docs_quality_classifier",
        pytest.param(
            "emb_srp_int8_pairs",
            marks=pytest.mark.slow,  # r12: fast-gate budget
        ),
        pytest.param(
            "emb_srp_semantic_dedup",
            marks=pytest.mark.slow,  # r12: fast-gate budget
        ),
        pytest.param(
            "docs_training_pipeline_v2",
            marks=pytest.mark.slow,  # r12: fast-gate budget
        ),
        "events_holt_winters",
        "events_alert_for",
        "events_absent_series",
        "docs_rare_bigram_rate",
        "events_series_correlation",
        "events_seasonal_profile",
    ]

    @pytest.mark.parametrize("name", QUERIES)
    def test_invariant_under_shuffle_parallelism(self, spark, name):
        from clickhouse_metrics_pipeline_spark.workloads import QUERIES

        fn = QUERIES[name]
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = sorted(map(tuple, fn(spark, SF).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = sorted(map(tuple, fn(spark, SF).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b


class TestPromRateGoldens:
    """Hand-computed Prometheus extrapolatedRate goldens for
    events_rate_5m's kernel — pins the SEMANTICS (the oracle hash only
    pins cross-engine agreement)."""

    def _rate(self, spark, samples):
        """samples: [(sec_into_window, value)] for one series in the
        window [0, 300)."""
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, base + dt.timedelta(seconds=s), 1, "t", float(v), "{}")
            for s, v in samples
        ]
        df = spark.createDataFrame(
            rows,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
            " event_type STRING, value DOUBLE, props STRING",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(f"{d}/events.parquet")
            from clickhouse_metrics_pipeline_spark.workloads_ext2 import (
                events_rate_5m,
            )

            out = events_rate_5m(spark, d).collect()
        assert len(out) == 1
        return out[0]["rate"]

    def test_monotone_counter_interior_samples(self, spark):
        # samples at 60s..240s, values 0..30: increase=30, sampled=180,
        # avg_iv=60, threshold=66; durToStart=60<66 -> +60 (zero-clamp:
        # durationToZero = 180*0/30 = 0 < 60 -> start ext 0!);
        # durToEnd=300-240=60<66 -> +60
        # factor=(180+0+60)/180, rate=30*(240/180)/300
        got = self._rate(
            spark, [(60, 0.0), (120, 10.0), (180, 20.0), (240, 30.0)]
        )
        assert got == round(30.0 * (240.0 / 180.0) / 300.0, 6)

    def test_extrapolation_capped_at_half_interval(self, spark):
        # samples at 140s,160s: sampled=20, avg_iv=20, threshold=22;
        # durToStart=140 >= 22 -> +10 (avg_iv/2); zero-clamp:
        # durationToZero = 20*(5/5)=20 < 140 -> dur_start=20 < 22 -> +20!
        # durToEnd=140 >= 22 -> +10
        # factor=(20+20+10)/20, rate=5*(50/20)/300
        got = self._rate(spark, [(140, 5.0), (160, 10.0)])
        assert got == round(5.0 * (50.0 / 20.0) / 300.0, 6)

    def test_counter_reset_correction(self, spark):
        # 100 -> 20 is a reset: increase = 20 - 100 + 100 = 20
        # samples at 100s,200s: sampled=100, avg_iv=100, threshold=110;
        # zero-clamp: durationToZero = 100*(100/20) = 500 >= 100 ->
        # dur_start stays 100 < 110 -> +100; durToEnd=100<110 -> +100
        # factor=(100+100+100)/100=3, rate=20*3/300=0.2
        got = self._rate(spark, [(100, 100.0), (200, 20.0)])
        assert got == pytest.approx(0.2, abs=1e-9)  # 0.2 is exact at 6dp

    def test_single_sample_is_null(self, spark):
        assert self._rate(spark, [(100, 5.0)]) is None
