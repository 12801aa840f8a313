"""Tests for the third extended catalog: anomaly z-score exact algebra,
mixture-sample quota semantics, BPE merge goldens, embedding clusters."""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# events_anomaly_zscore
# --------------------------------------------------------------------------


def _expected_flags(rows):
    """Reimplement the z-score flag with exact Fractions over the
    (event_type, bucket_ts, n) series — an independent check of the
    cross-multiplied integer algebra."""
    by_type: dict = {}
    for et, ts, n in rows:
        by_type.setdefault(et, []).append((ts, n))
    out = {}
    for et, series in by_type.items():
        series.sort()
        for i, (ts, n) in enumerate(series):
            trail = [x for _, x in series[max(0, i - 24) : i]]
            k = len(trail)
            if k < 12:
                out[(et, ts)] = False
                continue
            s = sum(trail)
            mean = Fraction(s, k)
            ss = sum(x * x for x in trail)
            var = Fraction(k * ss - s * s, k * (k - 1))
            if var == 0:
                out[(et, ts)] = Fraction(n) != mean
            else:
                out[(et, ts)] = (Fraction(n) - mean) ** 2 > 4 * var
    return out


def test_anomaly_zscore_matches_fraction_reference(spark):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_anomaly_zscore,
    )

    got = {
        (r.event_type, r.bucket_ts): (r.n_events, r.trail_k, r.is_anomaly)
        for r in events_anomaly_zscore(spark, SF).collect()
    }
    exp = _expected_flags(
        [(et, ts, n) for (et, ts), (n, _, _) in got.items()]
    )
    assert got and set(got) == set(exp)
    mismatches = {
        key: (got[key][2], exp[key]) for key in got if got[key][2] != exp[key]
    }
    assert mismatches == {}
    # the detector must actually fire somewhere and the cold-start
    # guard must hold (trail_k < 12 is never flagged)
    assert any(v[2] for v in got.values())
    assert not any(v[2] for v in got.values() if v[1] < 12)


def test_anomaly_zero_variance_flags_any_deviation(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_anomaly_zscore,
    )

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    # series "flat": 13 hourly buckets of 5 events - never anomalous.
    # series "step": 12 buckets of 5, then one bucket of 6 - the
    # trailing window has zero variance, so ANY deviation flags.
    for h in range(13):
        for series, n in (("flat", 5), ("step", 6 if h == 12 else 5)):
            for _ in range(n):
                rows.append(
                    (eid, base + dt.timedelta(hours=h), 1, series, 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    out = {
        (r.event_type, r.bucket_ts.hour): r.is_anomaly
        for r in events_anomaly_zscore(spark, str(tmp_path)).collect()
    }
    assert out[("step", 12)] is True
    assert not any(v for (et, h), v in out.items() if (et, h) != ("step", 12))


# --------------------------------------------------------------------------
# docs_mixture_sample
# --------------------------------------------------------------------------


def test_mixture_sample_is_maximal_greedy_prefix(spark):
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )
    from clickhouse_metrics_pipeline_spark.functions.text import token_count
    from clickhouse_metrics_pipeline_spark.tables import _t
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        _MIX_DIV,
        MIXTURE_BP,
        docs_mixture_sample,
    )

    sampled = docs_mixture_sample(spark, SF).collect()
    assert sampled

    docs = (
        _t(spark, SF, "documents")
        .select(
            "doc_id",
            "source",
            token_count("text").alias("n_tok"),
            portable_hash60(F.col("doc_id").cast("string")).alias("h"),
        )
        .collect()
    )
    total = sum(r.n_tok for r in docs)
    expect: set = set()
    for src in MIXTURE_BP:
        quota = (total * MIXTURE_BP[src]) // _MIX_DIV
        cum = 0
        for r in sorted(
            (r for r in docs if r.source == src), key=lambda r: (r.h, r.doc_id)
        ):
            if cum + r.n_tok > quota:
                break  # greedy prefix: stop at the first overflow
            cum += r.n_tok
            expect.add(r.doc_id)
        # quota respected with equality semantics (cum <= quota)
        assert cum <= quota
    assert {r.doc_id for r in sampled} == expect
    for r in sampled:
        assert r.cum_tok <= r.quota_tok


# --------------------------------------------------------------------------
# docs_bpe_top_merges
# --------------------------------------------------------------------------


def test_bpe_merges_golden(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        docs_bpe_top_merges,
    )

    rows = [
        (1, "a b a b", "en", "src0", 7),
        (2, "a b, c", "en", "src0", 6),
        (3, "", "en", "src0", 0),  # empty text: no pairs, no crash
        (4, "solo", "en", "src0", 4),  # single pretoken: no pairs
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {
        r.pair: r.n_pair
        for r in docs_bpe_top_merges(spark, str(tmp_path)).collect()
    }
    # doc1 pretokens [a,b,a,b] -> pairs "a b","b a","a b";
    # doc2 pretokens [a,b,",",c] -> "a b", "b ,", ", c"
    assert got == {"a b": 3, "b a": 1, "b ,": 1, ", c": 1}


# --------------------------------------------------------------------------
# emb_neardup_clusters
# --------------------------------------------------------------------------


def test_emb_clusters_label_invariants(spark):
    from clickhouse_metrics_pipeline_spark.workloads import emb_neardup_pairs
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        emb_neardup_clusters,
    )

    labels = {
        r.vec_id: (r.keeper_id, r.cluster_size)
        for r in emb_neardup_clusters(spark, SF).collect()
    }
    edges = [
        (r.id_a, r.id_b) for r in emb_neardup_pairs(spark, SF).collect()
    ]
    assert labels and edges
    # every edge endpoint is labeled, and both endpoints share a keeper
    for a, b in edges:
        assert labels[a][0] == labels[b][0]
    # exactly the edge endpoints are labeled
    assert set(labels) == {v for e in edges for v in e}
    # keeper is the component minimum and sizes count members
    by_keeper: dict = {}
    for vid, (k, _) in labels.items():
        by_keeper.setdefault(k, []).append(vid)
    for k, members in by_keeper.items():
        assert k == min(members)
        assert all(labels[m][1] == len(members) for m in members)


# --------------------------------------------------------------------------
# determinism under shuffle parallelism (transfers to a real cluster)
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "emb_neardup_clusters",
        "events_anomaly_zscore",
        "docs_bpe_top_merges",
        "docs_mixture_sample",
        "events_hash_sample_quantiles",
        "events_hash_sample_cascade",
        "events_slo_burn_rate",
        "events_lttb_downsample",
        "events_funnel_levels",
        "events_retention_cohorts",
        "events_coverage_uptime",
        "events_funnel_conversions",
        "events_top_movers",
        "emb_label_centroids",
    ],
)
def test_ext3_invariant_under_shuffle_parallelism(spark, name):
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


# --------------------------------------------------------------------------
# events_slo_burn_rate
# --------------------------------------------------------------------------


def test_slo_burn_rate_gap_and_two_window_semantics(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_slo_burn_rate,
    )

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)

    def add(hour, n_good, n_bad, et="svc"):
        nonlocal eid
        for i in range(n_good):
            rows.append((eid, base + dt.timedelta(hours=hour, seconds=i), 1, et, 10.0, "{}"))
            eid += 1
        for i in range(n_bad):
            rows.append((eid, base + dt.timedelta(hours=hour, seconds=60 + i), 1, et, 99.0, "{}"))
            eid += 1

    # hour 0: clean. hour 1: 20% bad (burn 20x > 14.4 short) but the
    # 6h window dilutes to 10/110 ~ 9.1x -> NO page (two-window AND).
    add(0, 100, 0)
    add(1, 40, 10)
    # hours 2-7 empty (calendar gap). hour 8: 50% bad; 6h RANGE window
    # covers hours 3-8 = only hour 8 itself -> both windows 50x -> page.
    add(8, 5, 5)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    out = {
        r.bucket_ts.hour: (r.burn_1h, r.burn_6h, r.page_alert)
        for r in events_slo_burn_rate(spark, str(tmp_path)).collect()
    }
    assert out[0] == (0.0, 0.0, False)
    assert out[1][0] == 20.0 and out[1][2] is False
    assert round(out[1][1], 4) == round(10 * 10000.0 / (150 * 100), 4)
    # the gap matters: hour 8's long window must NOT reach back to hour 1
    assert out[8] == (50.0, 50.0, True)


def test_slo_burn_rate_fires_on_fixture(spark):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_slo_burn_rate,
    )

    got = events_slo_burn_rate(spark, SF).collect()
    assert got
    assert any(r.page_alert for r in got)
    assert any(not r.page_alert for r in got)


# --------------------------------------------------------------------------
# events_lttb_downsample
# --------------------------------------------------------------------------


def test_lttb_kernel_golden():
    from clickhouse_metrics_pipeline_spark.operators.downsample import (
        lttb_select_indices,
    )

    ys = [0, 5, 1, 8, 2, 9, 3, 7, 4, 6]
    xs = list(range(10))
    # hand-replayed: first/last fixed; bucket picks 3, 4, 7
    assert lttb_select_indices(xs, ys, 5) == [0, 3, 4, 7, 9]
    # n <= n_out: identity
    assert lttb_select_indices(xs, ys, 10) == list(range(10))
    assert lttb_select_indices(xs, ys, 12) == list(range(10))
    with pytest.raises(ValueError):
        lttb_select_indices(xs, ys, 2)


def test_lttb_endpoints_and_counts(spark):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        _LTTB_N_OUT,
        events_lttb_downsample,
    )

    rows = events_lttb_downsample(spark, SF).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for et, pts in by_type.items():
        assert len(pts) == _LTTB_N_OUT  # sf0.001 series are ~200 > 150
        js = sorted(p.j for p in pts)
        assert js[0] == 0  # first point kept
        assert len(set(js)) == len(js)  # no duplicate picks


def test_lttb_structural_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clickhouse_metrics_pipeline_spark.operators.downsample import (
        lttb_select_indices,
    )

    @given(
        st.lists(st.integers(min_value=-(10**6), max_value=10**6),
                 min_size=3, max_size=60),
        st.integers(min_value=3, max_value=20),
    )
    @settings(max_examples=300, deadline=None)
    def check(ys, n_out):
        n = len(ys)
        xs = list(range(0, 2 * n, 2))
        sel = lttb_select_indices(xs, ys, n_out)
        if n <= n_out:
            assert sel == list(range(n))
            return
        assert len(sel) == n_out
        assert sel[0] == 0 and sel[-1] == n - 1
        assert sel == sorted(set(sel))  # strictly increasing, no dups
        # exactly one pick per middle bucket, inside its bucket range
        m, nb = n - 2, n_out - 2
        for b, j in enumerate(sel[1:-1]):
            assert ((j - 1) * nb) // m == b

    check()


# --------------------------------------------------------------------------
# events_funnel_levels
# --------------------------------------------------------------------------


def test_funnel_levels_golden(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_funnel_levels,
    )

    base = dt.datetime(2024, 1, 1)
    H = dt.timedelta(hours=1)
    rows = [
        # u1: full chain inside 6h -> level 3
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + H, 1, "click", 1.0, "{}"),
        (3, base + 5 * H, 1, "purchase", 1.0, "{}"),
        # u2: purchase BEFORE click -> order broken -> level 2 only
        (4, base, 2, "view", 1.0, "{}"),
        (5, base + 2 * H, 2, "purchase", 1.0, "{}"),
        (6, base + 3 * H, 2, "click", 1.0, "{}"),
        # u3: chain exceeds the 6h window (purchase at +7h) -> level 2
        (7, base, 3, "view", 1.0, "{}"),
        (8, base + H, 3, "click", 1.0, "{}"),
        (9, base + 7 * H, 3, "purchase", 1.0, "{}"),
        # u4: only a click (no view) -> windowFunnel gives level 0
        (10, base, 4, "click", 1.0, "{}"),
        # u5: window-boundary EXACTLY 6h (inclusive <=) -> level 3
        (11, base, 5, "view", 1.0, "{}"),
        (12, base + 3 * H, 5, "click", 1.0, "{}"),
        (13, base + 6 * H, 5, "purchase", 1.0, "{}"),
        # u6: same-timestamp view->click tie broken by event_id -> level 2
        (14, base, 6, "view", 1.0, "{}"),
        (15, base, 6, "click", 1.0, "{}"),
        # u7: non-step events only -> excluded entirely (no row)
        (16, base, 7, "error", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    got = {
        r.funnel_level: r.n_users
        for r in events_funnel_levels(spark, str(tmp_path)).collect()
    }
    # u1, u5 -> 3; u2, u3, u6 -> 2; u4 -> 0; u7 absent
    assert got == {3: 2, 2: 3, 0: 1}


# --------------------------------------------------------------------------
# events_retention_cohorts
# --------------------------------------------------------------------------


def test_retention_cohorts_golden(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_retention_cohorts,
    )

    base = dt.datetime(2024, 1, 1)
    D = dt.timedelta(days=1)
    rows, eid = [], 0

    def buy(user, day):
        nonlocal eid
        rows.append((eid, base + day * D, user, "purchase", 1.0, "{}"))
        eid += 1

    # cohort day0: u1 buys d0,d1,d3; u2 buys d0 only; u3 buys d0,d1
    for u, days in ((1, [0, 1, 3]), (2, [0]), (3, [0, 1])):
        for d in days:
            buy(u, d)
    # cohort day2: u4 buys d2,d9 (offset 7 > 6: outside the matrix)
    buy(4, 2)
    buy(4, 9)
    # non-purchase activity never counts
    rows.append((eid, base, 1, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    got = {
        (r.cohort_day, r.day_offset): (r.n_active, r.cohort_size, r.retention_bp)
        for r in events_retention_cohorts(spark, str(tmp_path)).collect()
    }
    d0 = 19723  # 2024-01-01 in epoch days
    assert got == {
        (d0, 0): (3, 3, 10000),
        (d0, 1): (2, 3, 6666),
        (d0, 3): (1, 3, 3333),
        (d0 + 2, 0): (1, 1, 10000),
    }


def test_retention_cohorts_discriminates(spark):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_retention_cohorts,
    )

    rows = events_retention_cohorts(spark, SF).collect()
    assert rows
    assert len({r.retention_bp for r in rows}) > 3  # not a wall of 100%
    for r in rows:
        assert 0 <= r.retention_bp <= 10000
        assert r.day_offset == 0 or r.n_active <= r.cohort_size
        if r.day_offset == 0:
            assert r.retention_bp == 10000  # cohort day is full by def


# --------------------------------------------------------------------------
# events_coverage_uptime
# --------------------------------------------------------------------------


def test_coverage_uptime_golden(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        events_coverage_uptime,
    )

    base = dt.datetime(2024, 1, 1)
    M = dt.timedelta(minutes=1)
    rows = [
        # svc a: events at 0m and 2m -> intervals overlap (5m hold):
        # union = [0, 7m) = 420s, not 600
        (1, base, 1, "a", 1.0, "{}"),
        (2, base + 2 * M, 1, "a", 1.0, "{}"),
        # svc b: events at 0m and 10m -> disjoint: 2 * 300 = 600s
        (3, base, 1, "b", 1.0, "{}"),
        (4, base + 10 * M, 1, "b", 1.0, "{}"),
        # svc c: duplicate timestamps -> identical intervals: 300s
        (5, base, 1, "c", 1.0, "{}"),
        (6, base, 1, "c", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")

    got = {
        r.event_type: (r.covered_s, r.n_intervals)
        for r in events_coverage_uptime(spark, str(tmp_path)).collect()
    }
    assert got == {"a": (420, 2), "b": (600, 2), "c": (300, 2)}


def test_coverage_sweep_equals_bruteforce_union(spark):
    """Property: the sweep-line union length equals a brute-force
    second-by-second union over random interval sets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        _COVERAGE_HOLD_S,
    )

    @given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1,
                    max_size=40))
    @settings(max_examples=300, deadline=None)
    def check(starts):
        hold = _COVERAGE_HOLD_S
        ivs = sorted((s, s + hold) for s in starts)
        # the query's sweep line, replayed in plain python
        total, max_end = 0, 0
        for s, e in ivs:
            total += max(0, e - max(s, max_end))
            max_end = max(max_end, e)
        covered = set()
        for s, e in ivs:
            covered.update(range(s, e))
        assert total == len(covered)

    check()


# --------------------------------------------------------------------------
# events_funnel_conversions
# --------------------------------------------------------------------------


def _greedy_conversions(events, win_us):
    """Independent reference: greedy reset-on-complete chain counting
    over (us, eid, et) triples."""
    c1 = c2 = -1
    cnt = 0
    for us, _eid, et in sorted(events):
        if et == "purchase" and c2 >= 0 and us - c2 <= win_us:
            cnt += 1
            c1 = c2 = -1
        elif et == "view":
            c1 = max(c1, us)
        elif et == "click" and c1 >= 0 and us - c1 <= win_us:
            c2 = max(c2, c1)
    return cnt


def test_funnel_conversions_matches_greedy_reference(spark):
    from clickhouse_metrics_pipeline_spark.tables import _events
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        _FUNNEL_STEPS,
        _FUNNEL_WINDOW_S,
        events_funnel_conversions,
    )

    got = {
        r.n_conversions: r.n_users
        for r in events_funnel_conversions(spark, SF).collect()
    }
    rows = (
        _events(spark, SF)
        .where(F.col("event_type").isin(*_FUNNEL_STEPS))
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id",
                "event_type")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.us, r.event_id, r.event_type)
        )
    expect: dict = {}
    for evs in by_user.values():
        c = _greedy_conversions(evs, _FUNNEL_WINDOW_S * 1_000_000)
        expect[c] = expect.get(c, 0) + 1
    assert got == expect
    # discriminating at this sf: converters and non-converters coexist
    # (repeated >=2 conversions appear at sf0.01, covered by the oracle)
    assert any(k >= 1 for k in got) and 0 in got


# --------------------------------------------------------------------------
# emb_label_centroids
# --------------------------------------------------------------------------


def test_label_centroids_golden(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
        emb_label_centroids,
    )

    rows = [
        # label 0 and label 1 have IDENTICAL centroids -> cosine 1.0
        (0, [1.0, 0.0, 1.0], 0),
        (1, [0.0, 1.0, 0.0], 0),
        (2, [1.0, 0.0, 1.0], 1),
        (3, [0.0, 1.0, 0.0], 1),
        # label 2 is orthogonal to the (1,1,1)-ish centroid? build truly
        # orthogonal: centroid of 0/1 is (0.5,0.5,0.5); use (1,-1,0)
        (4, [1.0, -1.0, 0.0], 2),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")

    got = {
        (r.label_a, r.label_b): (r.n_a, r.n_b, r.centroid_cosine)
        for r in emb_label_centroids(spark, str(tmp_path)).collect()
    }
    assert got[(0, 1)] == (2, 2, 1.0)
    # (0.5, 0.5, 0.5) . (1, -1, 0) = 0 -> orthogonal
    assert got[(0, 2)][2] == 0.0 and got[(1, 2)][2] == 0.0
    for (_, _), (_, _, c) in got.items():
        assert -1.0 <= c <= 1.0
