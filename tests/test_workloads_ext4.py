"""Golden tests for the fourth catalog batch against independent
(numpy/pandas) recomputation at sf0.001 — separate arithmetic paths
from both the Spark queries and their DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
    events_changes_1h,
    events_predict_linear,
)

SF = "/root/testdata/sf0.001"


def _events_pdf() -> pd.DataFrame:
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    # driver files store ns timestamps; floor to micros like _events
    pdf["ts"] = pdf["ts"].dt.floor("us")
    return pdf


def test_changes_1h_matches_pandas(spark):
    got = {
        (r.event_type, r.bucket_ts): (r.n_points, r.n_changes)
        for r in events_changes_1h(spark, SF).collect()
    }
    pdf = _events_pdf()
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    want = {}
    for (et, b), g in pdf.groupby(["event_type", "bucket"]):
        g = g.sort_values(["ts", "event_id"])
        v = g["value"].to_numpy()
        want[(et, b.to_pydatetime())] = (
            len(v),
            int((v[1:] != v[:-1]).sum()),
        )
    assert len(got) == len(want)
    for key, (n, c) in want.items():
        assert got[key] == (n, c), key


def test_predict_linear_matches_numpy_lstsq(spark):
    rows = events_predict_linear(spark, SF).collect()
    pdf = _events_pdf()
    pdf["minute"] = (
        pdf["ts"].astype("datetime64[us]").astype("int64") // 60_000_000
    )  # us->minute
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    b = (
        pdf.groupby(["event_type", "minute"])["cents"].sum().reset_index()
    )
    maxm = int(b["minute"].max())
    b = b[b["minute"] > maxm - 10080]
    for r in rows:
        g = b[b["event_type"] == r.event_type]
        assert r.n_points == len(g)
        x = g["minute"].to_numpy(dtype=float)
        y = g["cents"].to_numpy(dtype=float)
        if len(np.unique(x)) < 2:
            assert r.slope_cents_per_min is None
            continue
        slope, intercept = np.polyfit(x - x.min(), y, 1)
        assert abs(r.slope_cents_per_min - slope) < 1e-4 * max(
            1.0, abs(slope)
        )
        pred = (intercept + slope * (maxm + 60 - x.min())) / 100.0
        assert abs(r.predict_60m_value - pred) < 1e-3 * max(1.0, abs(pred))


def test_predict_linear_null_on_degenerate_series(spark):
    # a series with one minute bucket has den == 0 -> NULL slope; build
    # one via the operator arithmetic on a crafted frame through the
    # same query body by checking the real output instead: every
    # non-null slope implies >= 2 distinct minutes
    for r in events_predict_linear(spark, SF).collect():
        if r.slope_cents_per_min is None:
            assert r.n_points <= 1
        else:
            assert r.n_points >= 2


# --------------------------------------------------------------------------
# Bloom-filter decontamination
# --------------------------------------------------------------------------


def _gram8_set(t: str) -> set[str]:
    import re

    w = re.sub(r"\s+", " ", t).strip().lower().split(" ")
    if len(w) < 8:
        return set()
    return {" ".join(w[i : i + 8]) for i in range(len(w) - 7)}


def test_bloom_decontaminate_matches_exact_sharing(spark):
    """No false negatives (every truly contaminated train doc appears
    with its exact shared-gram count) and every flagged-but-clean row
    is an explicit Bloom false positive, against an independent pandas
    8-gram recomputation."""
    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        docs_bloom_decontaminate,
    )

    rows = {
        r.doc_id: r for r in docs_bloom_decontaminate(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    ev_sets = [_gram8_set(t) for t in pdf[pdf.doc_id % 50 == 0].text]
    ev = set().union(*ev_sets) if ev_sets else set()
    want = {}
    for r in pdf[pdf.doc_id % 50 != 0].itertuples():
        shared = len(_gram8_set(r.text) & ev)
        if shared:
            want[r.doc_id] = shared
    assert want, "fixture must contain real contamination"
    for doc_id, n_shared in want.items():
        got = rows[doc_id]
        assert got.contaminated
        assert got.n_true_shared == n_shared
        # the Bloom candidate set is a superset of the true hits
        assert got.n_candidate_grams >= n_shared
    for doc_id, r in rows.items():
        assert r.contaminated == (doc_id in want)


def test_bloom_filter_bits_are_portable(spark):
    """The filter's word/bit layout is pure integer arithmetic on the
    portable 60-bit hash — recompute three inserted positions by hand
    and assert each probe slice of a known hash tests positive."""
    from pyspark.sql import functions as F

    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        _BLOOM_MASK,
        _bloom_positions,
    )

    h = 0x0123456789ABCDE  # 60-bit value
    df = spark.range(1).select(F.lit(h).alias("h"))
    got = df.select(*[p.alias(f"p{i}") for i, p in enumerate(_bloom_positions(F.col("h")))]).collect()[0]
    assert got.p0 == h & _BLOOM_MASK
    assert got.p1 == (h >> 20) & _BLOOM_MASK
    assert got.p2 == (h >> 40) & _BLOOM_MASK
    for p in (got.p0, got.p1, got.p2):
        assert 0 <= p <= _BLOOM_MASK


# --------------------------------------------------------------------------
# Hash-bucketed linear quality classifier
# --------------------------------------------------------------------------


def test_quality_classifier_matches_python_model(spark):
    """Independent recomputation of the hash-bucket linear model in
    plain python (hashlib md5, int arithmetic) — third implementation
    alongside the Spark expressions and the DuckDB oracle."""
    import hashlib
    import re

    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        _CLS_BUCKETS,
        _CLS_MULT,
        _CLS_RANGE,
        docs_quality_classifier,
    )

    got = {
        r.doc_id: (r.n_tok, r.score, r.keep)
        for r in docs_quality_classifier(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    for r in pdf.itertuples():
        toks = re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
        score = 0
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            score += (h % _CLS_BUCKETS) * _CLS_MULT % _CLS_RANGE - (
                _CLS_RANGE - 1
            ) // 2
        assert got[r.doc_id] == (len(toks), score, score * 100 >= len(toks) * 5)


def test_quality_classifier_weights_are_bounded(spark):
    """Every bucket weight lies in [-500, 500] and both signs occur
    (the closed-form 'model' is not degenerate)."""
    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        _CLS_BUCKETS,
        _CLS_MULT,
        _CLS_RANGE,
    )

    ws = {
        b * _CLS_MULT % _CLS_RANGE - (_CLS_RANGE - 1) // 2
        for b in range(_CLS_BUCKETS)
    }
    assert min(ws) >= -500 and max(ws) <= 500
    assert any(w < 0 for w in ws) and any(w > 0 for w in ws)


# --------------------------------------------------------------------------
# Bloom filter mergeability
# --------------------------------------------------------------------------


def test_bloom_filters_merge_by_bitwise_or(spark):
    """filter(A ∪ B) == filter(A) | filter(B) word-for-word — the
    property that lets a 100 TB deployment build per-shard filters in
    parallel and OR them, and maintain the artifact incrementally as
    new eval sets arrive."""
    import numpy as np

    from clickhouse_metrics_pipeline_spark.operators.dedup import (
        BLOOM_MASK,
        BLOOM_WORDS,
    )

    rng = np.random.RandomState(7)
    ha = rng.randint(0, 1 << 60, 500, dtype=np.int64)
    hb = rng.randint(0, 1 << 60, 500, dtype=np.int64)

    def build(hashes):
        words = np.zeros(BLOOM_WORDS, dtype=np.uint64)
        h = hashes.view(np.uint64)
        for shift in (0, 20, 40):
            p = (h >> np.uint64(shift)) & np.uint64(BLOOM_MASK)
            np.bitwise_or.at(
                words,
                (p >> np.uint64(5)).astype(np.intp),
                np.uint64(1) << (p & np.uint64(31)),
            )
        return words

    merged = build(np.concatenate([ha, hb]))
    assert np.array_equal(merged, build(ha) | build(hb))


# --------------------------------------------------------------------------
# Integer SRP-LSH semantic near-dup
# --------------------------------------------------------------------------


def _int8_quantized(V: "np.ndarray") -> "np.ndarray":
    s = np.abs(V).max(axis=1, keepdims=True) / 127.0
    with np.errstate(invalid="ignore", divide="ignore"):
        q = np.where(s > 0, np.round(V / s), 0.0)
    return q.astype(np.int64)


def test_srp_pairs_subset_of_integer_ceiling_with_recall(spark):
    """Emitted pairs must be exactly the LSH-candidate subset of the
    brute-force integer-criterion pair set (precision 1.0 by
    construction, verified independently in numpy), with recall
    bounded below — and the whole result deterministic, since planes
    derive from md5, not a seed."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        srp_int8_pairs,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        (r.vec_a, r.vec_b): r.dot_q
        for r in srp_int8_pairs(e).collect()
    }
    pdf = e.toPandas()
    V = np.vstack(pdf["embedding"].values).astype(np.float64)
    q = _int8_quantized(V)
    ids = pdf["vec_id"].to_numpy()
    G = q @ q.T
    n2 = np.diag(G)
    ceiling = {}
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            d = int(G[i, j])
            if d > 0 and 400 * d * d >= 81 * int(n2[i]) * int(n2[j]):
                a, b = sorted((int(ids[i]), int(ids[j])))
                ceiling[(a, b)] = d
    # every emitted pair is a true integer-criterion pair with the
    # exact integer dot (precision 1.0)
    for pair, dot in got.items():
        assert ceiling[pair] == dot
    # banded SRP recall floor at this operating point (deterministic)
    assert ceiling, "fixture must contain qualifying pairs"
    assert len(got) / len(ceiling) >= 0.2

    # determinism: a second run returns the identical pair set
    again = {
        (r.vec_a, r.vec_b): r.dot_q
        for r in srp_int8_pairs(e).collect()
    }
    assert again == got


def test_srp_planes_are_md5_derived(spark):
    """The hyperplane bank regenerates from md5 coordinates — spot
    check plane[3][17] against hashlib."""
    import hashlib

    from pyspark.sql import functions as F

    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        SRP_WEIGHT_RANGE,
        srp_plane_expr,
    )

    got = (
        spark.range(1)
        .select(F.element_at(F.element_at(srp_plane_expr(48, 64), 4), 18))
        .collect()[0][0]
    )
    h = int(hashlib.md5(b"srp:3:17").hexdigest()[:15], 16)
    assert got == h % SRP_WEIGHT_RANGE - (SRP_WEIGHT_RANGE - 1) // 2


def test_srp_bucket_cap_is_sound(spark):
    """A capped run emits a subset of the uncapped pair set (hot
    buckets only ever REMOVE candidates), every survivor keeps its
    exact integer dot, and the wide scale configuration agrees with
    the brute-force integer criterion on everything it emits."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        srp_int8_pairs,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    full = {
        (r.vec_a, r.vec_b): r.dot_q for r in srp_int8_pairs(e).collect()
    }
    capped = {
        (r.vec_a, r.vec_b): r.dot_q
        for r in srp_int8_pairs(e, max_bucket=8).collect()
    }
    assert set(capped) <= set(full)
    for pair, dot in capped.items():
        assert full[pair] == dot
    wide = {
        (r.vec_a, r.vec_b): r.dot_q
        for r in srp_int8_pairs(
            e, n_bands=8, rows_per_band=12, max_bucket=64
        ).collect()
    }
    pdf = e.toPandas()
    V = np.vstack(pdf["embedding"].values).astype(np.float64)
    q = _int8_quantized(V)
    ids = {int(v): i for i, v in enumerate(pdf["vec_id"])}
    for (a, b), dot in wide.items():
        qa, qb = q[ids[a]], q[ids[b]]
        d = int(qa @ qb)
        assert d == dot and d > 0
        assert 400 * d * d >= 81 * int(qa @ qa) * int(qb @ qb)


# --------------------------------------------------------------------------
# PromQL holt_winters (fixed-point double exponential smoothing)
# --------------------------------------------------------------------------


def test_holt_winters_matches_python_replay(spark):
    """Independent python replay of the fixed-point recursion at
    sf0.001 — third implementation alongside the Spark fold and the
    recursive-CTE oracle."""
    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        _HW_SCALE,
        _HW_SF,
        _HW_TF,
        events_holt_winters,
    )

    got = {
        r.event_type: (r.n_buckets, r.smooth_cents, r.trend_cents)
        for r in events_holt_winters(spark, SF).collect()
    }
    pdf = _events_pdf()
    pdf["m"] = pdf["ts"].dt.floor("h")
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")

    def fd(x: int) -> int:
        return x // _HW_SCALE  # python // is floor division

    for et, g in pdf.groupby("event_type"):
        ys = g.groupby("m")["cents"].sum().sort_index().to_list()
        s, b = ys[0], (ys[1] - ys[0] if len(ys) >= 2 else 0)
        for y in ys[1:]:
            s2 = fd(_HW_SF * y + (_HW_SCALE - _HW_SF) * (s + b))
            b = fd(_HW_TF * (s2 - s) + (_HW_SCALE - _HW_TF) * b)
            s = s2
        assert got[et] == (len(ys), s, b)


def test_holt_winters_floor_div_matches_python(spark):
    """_hw_fd == python floor division for both signs (the remainder
    trick must floor, not truncate)."""
    from pyspark.sql import functions as F

    from clickhouse_metrics_pipeline_spark.workloads_ext4 import _hw_fd

    vals = [-2001, -2000, -1999, -1, 0, 1, 999, 1000, 1001, 12_345_678]
    df = spark.createDataFrame([(v,) for v in vals], "x BIGINT")
    got = [r.fd for r in df.select(_hw_fd(F.col("x")).alias("fd")).collect()]
    assert got == [v // 1000 for v in vals]


# --------------------------------------------------------------------------
# Alert `for:` debounce lifecycle
# --------------------------------------------------------------------------


def test_alert_for_lifecycle_on_crafted_series(spark, tmp_path):
    """inactive -> pending (1-2 true evals) -> firing (3rd consecutive)
    -> a missing bucket resets the streak back to pending."""
    import datetime as dt

    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        events_alert_for,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0

    def hour(h: int, n: int):
        nonlocal eid
        for i in range(n):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(hours=h, minutes=i), 1, "err", 1.0)
            )

    hour(0, 2)   # inactive (below threshold 4)
    hour(1, 5)   # pending (true #1)
    hour(2, 5)   # pending (true #2)
    hour(3, 5)   # firing  (true #3, consecutive)
    hour(4, 5)   # firing
    # hour 5 missing entirely -> streak broken
    hour(6, 5)   # pending again (gap reset)
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.bucket_ts.hour: r.state
        for r in events_alert_for(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: "inactive",
        1: "pending",
        2: "pending",
        3: "firing",
        4: "firing",
        6: "pending",
    }


def test_absent_series_flags_gaps_within_staleness(spark, tmp_path):
    """A one-hour gap is flagged with staleness 1; hours inside a gap
    longer than 24h stop being flagged once staleness exceeds 24; the
    series' own first hour is never flagged (no last-seen yet)."""
    import datetime as dt

    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        events_absent_series,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i, h in enumerate([0, 1, 3] + list(range(30, 60))):
        rows.append((i + 1, t0 + dt.timedelta(hours=h), 1, "err", 1.0))
    spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.bucket_ts - t0).total_seconds() // 3600: r.hours_silent
        for r in events_absent_series(spark, str(tmp_path)).collect()
    }
    # hour 2 silent (staleness 1); hours 4..27 silent with staleness
    # 1..24; hours 28-29 exceed the 24h staleness bound -> unflagged
    want = {2.0: 1}
    want.update({float(h): h - 3 for h in range(4, 28)})
    assert got == want


# --------------------------------------------------------------------------
# Bloom kernel property: no false negatives, candidates bound truth
# --------------------------------------------------------------------------


def test_bloom_kernel_never_misses_a_true_member(spark):
    """Property (hypothesis): for arbitrary eval/doc hash sets, the
    streaming kernel's n_true_shared equals the exact intersection
    size and n_candidate_grams >= n_true_shared — a Bloom filter can
    only add candidates, never lose a member."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clickhouse_metrics_pipeline_spark.operators.dedup import (
        BLOOM_MASK,
        BLOOM_WORDS,
        bloom_decontaminate_kernel,
    )

    h60 = st.integers(min_value=0, max_value=(1 << 60) - 1)

    @settings(max_examples=30, deadline=None)
    @given(
        ev=st.lists(h60, min_size=0, max_size=200, unique=True),
        doc=st.lists(h60, min_size=0, max_size=100, unique=True),
        overlap=st.integers(min_value=0, max_value=50),
    )
    def check(ev, doc, overlap):
        # force a known overlap: splice eval members into the doc
        doc = list(dict.fromkeys(doc + ev[:overlap]))
        eva = np.array(sorted(ev), dtype=np.int64)
        words = np.zeros(BLOOM_WORDS, dtype=np.uint64)
        h = eva.view(np.uint64)
        for shift in (0, 20, 40):
            p = (h >> np.uint64(shift)) & np.uint64(BLOOM_MASK)
            np.bitwise_or.at(
                words,
                (p >> np.uint64(5)).astype(np.intp),
                np.uint64(1) << (p & np.uint64(31)),
            )
        udf = bloom_decontaminate_kernel(words, eva)
        score = udf.func  # the inner pandas function
        res = score(pd.Series([doc]))
        n_cand, n_true = int(res.iloc[0, 0]), int(res.iloc[0, 1])
        exact = len(set(doc) & set(ev))
        assert n_true == exact
        assert n_cand >= n_true

    check()


def test_series_correlation_matches_numpy(spark):
    """np.corrcoef over the shared-hour-aligned count vectors must
    match to 6 dp (the query's rounding)."""
    from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
        events_series_correlation,
    )

    got = {
        (r.type_a, r.type_b): (r.n_shared_hours, r.corr_r)
        for r in events_series_correlation(spark, SF).collect()
    }
    pdf = _events_pdf()
    pdf["h"] = pdf["ts"].dt.floor("h")
    counts = (
        pdf.groupby(["event_type", "h"]).size().unstack(0)
    )  # hours x types, NaN where absent
    types = sorted(counts.columns)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            sub = counts[[a, b]].dropna()
            want_n = len(sub)
            x, y = sub[a].to_numpy(float), sub[b].to_numpy(float)
            n, r = got[(a, b)]
            assert n == want_n
            if x.std() == 0 or y.std() == 0:
                assert r is None
            else:
                assert abs(r - np.corrcoef(x, y)[0, 1]) < 1e-6


class TestSingleTokenizationPlans:
    """r11 optimization pins: the curation pipelines tokenize each
    document ONCE per row — the optimizer must neither substitute the
    scoring expression into a pushed-down filter (v2's old shape paid
    the md5 score walk plus three tokenizations per doc) nor collapse
    the bound-struct split projection back into duplicate evaluations."""

    def _optimized(self, df) -> str:
        return df._jdf.queryExecution().optimizedPlan().toString()

    def test_quality_classifier_tokenizes_once(self, spark):
        from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
            docs_quality_classifier,
        )

        plan = self._optimized(docs_quality_classifier(spark, SF))
        assert plan.count("split(") == 1

    def test_training_pipeline_v2_tokenizes_once_outside_sides(
        self, spark
    ):
        # the corpus-scoring side must hold exactly ONE tokenization;
        # the bloom/contamination side relations tokenize their own
        # (tiny) inputs — count splits only in corpus-scan fragments
        # by pinning the total against the side-relation count
        from clickhouse_metrics_pipeline_spark.workloads_ext4 import (
            docs_training_pipeline_v2,
        )

        plan = self._optimized(docs_training_pipeline_v2(spark, SF))
        # side relations (bloom decontaminate probes) contribute a fixed
        # number of tokenizations; the old shape added three corpus-scan
        # copies (filter score + filter size + project size), the new
        # shape exactly one
        assert plan.count("aggregate(") <= 2  # score walk once (+side)
        head = plan.split("Join")[0]
        assert head.count("split(") <= 1
