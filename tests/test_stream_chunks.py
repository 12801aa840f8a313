"""Cross-chunk ordering in the keyed streaming state UDFs (r7 verdict
item 2).

A series whose per-micro-batch rows exceed
``spark.sql.execution.arrow.maxRecordsPerBatch`` reaches
``applyInPandasWithState`` as MULTIPLE pandas chunks in shuffle order.
The r7 code sorted each chunk separately, so rows were delta-converted
out of timestamp order across chunk boundaries — wrong deltas and
false resets (reference semantics ``converter/temporality.go:43-113``
are order-dependent). These tests drive ``_convert_group`` directly
with a fake GroupState and adversarially-split chunks: fast (no Spark
session), deterministic, and they fail on the per-chunk-sort shape.
The end-to-end twin (a real stream with maxRecordsPerBatch forced low)
lives in tests/test_streaming.py::TestMultiChunkGroups.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from clickhouse_metrics_pipeline_spark.schema import (
    METRIC_TYPE_HISTOGRAM,
    METRIC_TYPE_SUM,
    TEMPORALITY_CUMULATIVE,
    TEMPORALITY_DELTA,
)
from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
    _convert_group,
    _whole_group,
)


class _FakeState:
    """The GroupState slice _convert_group touches."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self._v = None


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i)


def _sum_pdf(points):
    return pd.DataFrame(
        [
            {
                "series_hash": 1,
                "timestamp": _ts(i),
                "metric": "m",
                "workspaceId": "w",
                "serviceName": "s",
                "metric_type": METRIC_TYPE_SUM,
                "temporality": TEMPORALITY_CUMULATIVE,
                "is_monotonic": True,
                "value": float(v),
                "count": None,
                "sum": None,
                "buckets_le": None,
                "buckets_count": None,
                "attributes": {},
                "exemplars": None,
            }
            for i, v in points
        ]
    )


def _run(chunks):
    st = _FakeState()
    out = list(_convert_group((1,), iter(chunks), st, ttl_ms=None))
    assert len(out) == 1
    pdf = pd.concat(out).sort_values("timestamp")
    return pdf, st


class TestWholeGroup:
    def test_concat_and_single_sort(self):
        a = pd.DataFrame({"t": [5, 3], "v": [50, 30]})
        b = pd.DataFrame({"t": [4, 1], "v": [40, 10]})
        empty = pd.DataFrame({"t": [], "v": []})
        merged = _whole_group(iter([a, empty, b]), ["t"])
        assert list(merged["t"]) == [1, 3, 4, 5]
        assert list(merged["v"]) == [10, 30, 40, 50]

    def test_all_empty_is_none(self):
        assert _whole_group(iter([pd.DataFrame({"t": []})]), ["t"]) is None
        assert _whole_group(iter([]), ["t"]) is None

    def test_stable_on_ties(self):
        a = pd.DataFrame({"t": [1, 1], "v": ["first", "second"]})
        b = pd.DataFrame({"t": [1], "v": ["third"]})
        merged = _whole_group(iter([a, b]), ["t"])
        assert list(merged["v"]) == ["first", "second", "third"]


class TestConvertGroupMultiChunkSum:
    # cumulative [100, 150, 200, 20, 50] -> deltas [100, 50, 50, 20, 30]
    # (first point as-is per test/temporality_test.go:51; 200->20 is a
    # reset, emitted raw)
    POINTS = [(1, 100), (2, 150), (3, 200), (4, 20), (5, 50)]
    EXPECT = [100.0, 50.0, 50.0, 20.0, 30.0]

    def test_single_chunk_reference(self):
        pdf, st = _run([_sum_pdf(self.POINTS)])
        assert list(pdf["value"]) == self.EXPECT
        assert set(pdf["temporality"]) == {TEMPORALITY_DELTA}
        assert st.get[0] == 50.0  # last raw cumulative carried

    def test_chunks_in_shuffle_order(self):
        # chunk boundaries split the timeline AND arrive out of order:
        # per-chunk sorting would process [t4,t5] before [t1..t3],
        # turning the t4 reset into a first point and the t1 sample
        # into a phantom reset
        chunks = [
            _sum_pdf(self.POINTS[3:]),
            _sum_pdf(self.POINTS[:2]),
            _sum_pdf(self.POINTS[2:3]),
        ]
        pdf, st = _run(chunks)
        assert list(pdf["value"]) == self.EXPECT
        assert st.get[0] == 50.0

    def test_interleaved_chunks(self):
        # rows of the same timeline interleaved across chunks
        chunks = [
            _sum_pdf([self.POINTS[4], self.POINTS[0], self.POINTS[2]]),
            _sum_pdf([self.POINTS[3], self.POINTS[1]]),
        ]
        pdf, _ = _run(chunks)
        assert list(pdf["value"]) == self.EXPECT

    def test_state_carries_across_calls(self):
        st = _FakeState()
        list(_convert_group((1,), iter([_sum_pdf(self.POINTS[:3])]), st, ttl_ms=None))
        out = list(
            _convert_group((1,), iter([_sum_pdf(self.POINTS[3:])]), st, ttl_ms=None)
        )
        pdf = pd.concat(out).sort_values("timestamp")
        assert list(pdf["value"]) == [20.0, 30.0]


def _hist_pdf(points):
    # points: (i, count, sum, bucket_counts) over the fixed le ladder
    return pd.DataFrame(
        [
            {
                "series_hash": 2,
                "timestamp": _ts(i),
                "metric": "h",
                "workspaceId": "w",
                "serviceName": "s",
                "metric_type": METRIC_TYPE_HISTOGRAM,
                "temporality": TEMPORALITY_CUMULATIVE,
                "is_monotonic": False,
                "value": None,
                "count": c,
                "sum": float(s),
                "buckets_le": [1.0, 5.0],
                "buckets_count": list(bc),
                "attributes": {},
                "exemplars": None,
            }
            for i, c, s, bc in points
        ]
    )


class TestConvertGroupMultiChunkHistogram:
    # cumulative (count, sum, buckets): reset at t3 (count 9 -> 3)
    POINTS = [
        (1, 5, 50.0, (2, 5)),
        (2, 9, 90.0, (4, 9)),
        (3, 3, 30.0, (1, 3)),  # reset: emitted raw
        (4, 7, 70.0, (3, 7)),
    ]
    EXPECT = [
        (5, 50.0, [2, 5]),  # first point as-is
        (4, 40.0, [2, 4]),
        (3, 30.0, [1, 3]),  # reset row raw
        (4, 40.0, [2, 4]),
    ]

    def _check(self, pdf):
        got = [
            (int(r["count"]), float(r["sum"]), list(r["buckets_count"]))
            for _, r in pdf.iterrows()
        ]
        assert got == [(c, s, b) for c, s, b in self.EXPECT]

    def test_single_chunk_reference(self):
        st = _FakeState()
        out = list(
            _convert_group((2,), iter([_hist_pdf(self.POINTS)]), st, ttl_ms=None)
        )
        self._check(pd.concat(out).sort_values("timestamp"))

    def test_chunks_in_shuffle_order(self):
        st = _FakeState()
        chunks = [
            _hist_pdf(self.POINTS[2:]),
            _hist_pdf(self.POINTS[:2]),
        ]
        out = list(_convert_group((2,), iter(chunks), st, ttl_ms=None))
        self._check(pd.concat(out).sort_values("timestamp"))
        # state holds the last RAW cumulative buckets
        assert st.get[1] == 7 and st.get[4] == [3, 7]


class TestConvertGroupProperty:
    """Property pin: for ANY cumulative sum series and ANY chunking /
    chunk order, _convert_group equals the lag restatement (first
    point as-is; reset-on-decrease emits raw; otherwise the
    difference) — the converter/temporality.go:43-79 contract."""

    @staticmethod
    def _lag_form(values):
        out = []
        for i, v in enumerate(values):
            if i == 0 or (v < values[i - 1]):
                out.append(float(v))
            else:
                out.append(float(v - values[i - 1]))
        return out

    def test_random_series_and_chunking(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            values=st.lists(
                st.integers(min_value=0, max_value=10**6),
                min_size=1,
                max_size=40,
            ),
            data=st.data(),
        )
        def run(values, data):
            points = list(enumerate(values))
            # random partition of the timeline into chunks, then a
            # random arrival order of those chunks
            cuts = data.draw(
                st.lists(
                    st.integers(1, max(1, len(points) - 1)),
                    max_size=4,
                    unique=True,
                )
            )
            bounds = sorted({0, len(points), *cuts})
            chunks = [
                _sum_pdf(points[a:b])
                for a, b in zip(bounds, bounds[1:])
            ]
            order = data.draw(st.permutations(range(len(chunks))))
            st_ = _FakeState()
            out = list(
                _convert_group(
                    (1,),
                    iter([chunks[i] for i in order]),
                    st_,
                    ttl_ms=None,
                )
            )
            pdf = pd.concat(out).sort_values("timestamp")
            assert list(pdf["value"]) == self._lag_form(values)
            assert st_.get[0] == float(values[-1])

        run()


def _hist_pdf_ragged(points):
    """Histogram rows with a PER-ROW bucket ladder (or no buckets):
    points = (i, count, sum, les_or_None, counts_or_None)."""
    return pd.DataFrame(
        [
            {
                "series_hash": 2,
                "timestamp": _ts(i),
                "metric": "h",
                "workspaceId": "w",
                "serviceName": "s",
                "metric_type": METRIC_TYPE_HISTOGRAM,
                "temporality": TEMPORALITY_CUMULATIVE,
                "is_monotonic": False,
                "value": None,
                "count": c,
                "sum": float(s),
                "buckets_le": None if les is None else list(les),
                "buckets_count": None if bc is None else list(bc),
                "attributes": {},
                "exemplars": None,
            }
            for i, c, s, les, bc in points
        ]
    )


class TestConvertGroupHistogramProperty:
    """r8 verdict item 6: the histogram branch of _convert_group under
    ARBITRARY (count, sum, buckets) sequences — including resets,
    zero-count/zero-sum edge cases hitting the LastCount>0 / LastSum>0
    guards, per-row ladders, and missing bucket arrays — and ARBITRARY
    chunking / chunk arrival order, pinned against an independent lag
    restatement of converter/temporality.go:81-105."""

    @staticmethod
    def _lag_form(seq):
        """seq: list of (count, sum, les_or_None, counts_or_None) ->
        expected (count, sum, bucket_counts) per emitted row."""
        out = []
        prev_c, prev_s, prev_b = 0, 0.0, {}
        first = True
        for c, s, les, bc in seq:
            if first or c < prev_c:
                # first point as-is (temporality_test.go:51) or reset
                # on count decrease: emitted raw
                out.append((c, float(s), None if bc is None else list(bc)))
            else:
                dc = c - prev_c if prev_c > 0 else c
                ds = float(s - prev_s) if prev_s > 0 else float(s)
                if bc is None:
                    db = None
                else:
                    db = [
                        cnt - prev_b[le] if le in prev_b else cnt
                        for le, cnt in zip(les, bc)
                    ]
                out.append((dc, ds, db))
            prev_c, prev_s = c, s
            if bc is not None:
                prev_b = dict(zip(les, bc))
            first = False
        return out

    def test_random_histograms_and_chunking(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        ladder = st.lists(
            st.sampled_from([1.0, 2.0, 5.0]),
            min_size=1,
            max_size=3,
            unique=True,
        ).map(sorted)

        def point(les):
            return st.tuples(
                st.integers(min_value=0, max_value=10**6),  # count
                st.integers(min_value=0, max_value=10**6),  # sum
                st.just(les),
                st.lists(
                    st.integers(min_value=0, max_value=10**6),
                    min_size=len(les) if les else 0,
                    max_size=len(les) if les else 0,
                ).map(lambda counts: counts if les else None),
            )

        seq_strategy = st.lists(
            st.one_of(st.just(None), ladder).flatmap(point),
            min_size=1,
            max_size=25,
        )

        @settings(max_examples=60, deadline=None)
        @given(seq=seq_strategy, data=st.data())
        def run(seq, data):
            points = [
                (i, c, s, les, bc)
                for i, (c, s, les, bc) in enumerate(seq)
            ]
            cuts = data.draw(
                st.lists(
                    st.integers(1, max(1, len(points) - 1)),
                    max_size=4,
                    unique=True,
                )
            )
            bounds = sorted({0, len(points), *cuts})
            chunks = [
                _hist_pdf_ragged(points[a:b])
                for a, b in zip(bounds, bounds[1:])
            ]
            order = data.draw(st.permutations(range(len(chunks))))
            st_ = _FakeState()
            out = list(
                _convert_group(
                    (2,),
                    iter([chunks[i] for i in order]),
                    st_,
                    ttl_ms=None,
                )
            )
            pdf = pd.concat(out).sort_values("timestamp")
            got = [
                (
                    int(r["count"]),
                    float(r["sum"]),
                    None
                    if r["buckets_count"] is None
                    else [int(x) for x in r["buckets_count"]],
                )
                for _, r in pdf.iterrows()
            ]
            assert got == self._lag_form(
                [(c, s, les, bc) for _, c, s, les, bc in points]
            )
            assert set(pdf["temporality"]) == {TEMPORALITY_DELTA}
            # state carries the last RAW cumulative point
            last_c, last_s = points[-1][1], points[-1][2]
            assert st_.get[1] == last_c and st_.get[2] == float(last_s)

        run()
