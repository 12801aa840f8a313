"""PromQL front-end (plans/promql.py): parser goldens, compile
equivalence against hand-built DataFrame plans, and subset-boundary
errors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.plans.matchers import MatchType
from clickhouse_metrics_pipeline_spark.plans.promql import (
    PromQLError,
    compile_promql,
    events_as_series,
    parse,
)

SF = "/root/testdata/sf0.001"


class TestParser:
    def test_full_expression(self):
        q = parse(
            'sum by (event_type, user) '
            '(count_over_time(events{event_type!~"^v.*", user="7"}[30m]))'
        )
        assert q.agg == "sum" and q.by == ("event_type", "user")
        assert q.func == "count_over_time" and q.metric == "events"
        assert q.range_s == 1800
        # regex matchers are fully anchored (real PromQL semantics,
        # documented divergence from the Remote Read matcher kernel)
        assert [(m.type, m.name, m.value) for m in q.matchers] == [
            (MatchType.NRE, "event_type", "^(?:^v.*)$"),
            (MatchType.EQ, "user", "7"),
        ]

    def test_bare_call_without_agg(self):
        q = parse("delta(events[2h])")
        assert q.agg is None and q.range_s == 7200 and not q.matchers

    @pytest.mark.parametrize(
        "bad",
        [
            "sum by () (count_over_time(events[1h]))",
            "count_over_time(events[1x])",
            "count_over_time(events[1h]) extra",
            'topk(5, count_over_time(events[1h]))',
            'count_over_time(events{event_type~"x"}[1h])',
        ],
    )
    def test_rejects_out_of_subset(self, bad):
        with pytest.raises(PromQLError):
            parse(bad)

    def test_escaped_quote_in_matcher_value(self):
        q = parse('count_over_time(events{a="x\\"y"}[1m])')
        assert q.matchers[0].value == 'x"y'

    def test_backslash_escape_pass(self):
        # \\" decodes to backslash-then-quote (a single str.replace
        # would mis-decode it as a bare quote)
        q = parse('count_over_time(events{a="x\\\\\\"y"}[1m])')
        assert q.matchers[0].value == 'x\\"y'
        q2 = parse('count_over_time(events{a="a\\\\b"}[1m])')
        assert q2.matchers[0].value == "a\\b"

    def test_regex_matcher_is_anchored(self, spark):
        # 'v' must NOT regex-match 'view' under PromQL anchoring
        got = compile_promql(
            'sum by (event_type) '
            '(count_over_time(events{event_type=~"v"}[1h]))',
            events_as_series(
                spark.read.parquet(f"{SF}/events.parquet")
            ),
        ).collect()
        assert got == []


class TestParserProperties:
    """Hypothesis: the parser is total — arbitrary input either parses
    or raises PromQLError, never anything else; and every query the
    subset grammar can produce round-trips through parse()."""

    from hypothesis import given, settings, strategies as st

    @given(st.text(max_size=120))
    @settings(max_examples=300, deadline=None)
    def test_garbage_never_crashes(self, text):
        try:
            parse(text)
        except PromQLError:
            pass

    _label = st.sampled_from(["event_type", "user", "env", "a_b"])
    _dur = st.tuples(
        st.integers(1, 90), st.sampled_from(["m", "h", "d"])
    ).map(lambda t: f"{t[0]}{t[1]}")
    @given(
        fname=st.sampled_from(
            [
                "count_over_time", "sum_over_time", "avg_over_time",
                "min_over_time", "max_over_time", "last_over_time",
                "present_over_time", "delta", "rate", "increase",
                "irate", "resets", "changes", "stdvar_over_time",
                "stddev_over_time", "deriv",
            ]
        ),
        dur=_dur,
        off=st.one_of(st.none(), _dur),
        agg=st.one_of(
            st.none(),
            st.sampled_from(["sum", "avg", "min", "max", "count", "group"]),
        ),
        mode=st.sampled_from(["by", "without"]),
        labels=st.lists(_label, min_size=1, max_size=3, unique=True),
        vals=st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_characters='"\\',
                    blacklist_categories=("Cs",),
                ),
                max_size=8,
            ),
            min_size=0,
            max_size=2,
        ),
        ops=st.lists(
            st.sampled_from(["=", "!=", "=~", "!~"]),
            min_size=2,
            max_size=2,
        ),
    )
    @settings(max_examples=200, deadline=None)
    def test_generated_queries_round_trip(
        self, fname, dur, off, agg, mode, labels, vals, ops
    ):
        sel = "events"
        if vals:
            ms = ",".join(
                f'l{i}{ops[i]}"{v}"' for i, v in enumerate(vals)
            )
            sel += "{" + ms + "}"
        call = f"{fname}({sel}[{dur}]"
        if off:
            call += f" offset {off}"
        call += ")"
        text = (
            f"{agg} {mode} ({','.join(labels)}) ({call})" if agg else call
        )
        q = parse(text)
        assert q.func == fname and q.metric == "events"
        assert len(q.matchers) == len(vals)
        if agg:
            assert q.agg == agg
            got = q.without if mode == "without" else q.by
            assert got == tuple(labels)
        if off:
            assert q.offset_s > 0


class TestAtModifier:
    """r10: sel[r] @ T pins evaluation to the tumbling-grid window
    containing unix-second T, composing with offset in either order;
    subquery/binop placements are rejected (subset)."""

    def test_parse_both_orders(self):
        a = parse("sum by (t) (count_over_time(e[1h] @ 1767225600))")
        assert a.at_s == 1767225600 and a.offset_s == 0
        b = parse(
            "sum by (t) "
            "(count_over_time(e[1h] @ 1767225600 offset 2h))"
        )
        c = parse(
            "sum by (t) "
            "(count_over_time(e[1h] offset 2h @ 1767225600))"
        )
        assert b.at_s == c.at_s == 1767225600
        assert b.offset_s == c.offset_s == 7200

    def test_rejections(self):
        with pytest.raises(PromQLError, match="whole unix seconds"):
            parse("count_over_time(e[1h] @ 17.5)")
        with pytest.raises(PromQLError, match="subquery"):
            parse("max_over_time(rate(e[5m] @ 17)[1h:5m])")
        with pytest.raises(PromQLError, match="outside the subset"):
            parse(
                "sum by (t) (count_over_time(e[1h] @ 17)) / "
                "sum by (t) (count_over_time(e[1h]))"
            )

    def test_sort_wrappers_parse_and_leave_the_plan_alone(self, spark):
        # r10: sort()/sort_desc() are presentation order for the
        # instant payload; the compiled frame is identical
        a = parse("sort(sum by (t) (count_over_time(e[1h])))")
        d = parse("sort_desc(sum by (t) (count_over_time(e[1h])) > 2)")
        assert a.sort_dir == "asc" and d.sort_dir == "desc"
        assert d.scalar_op == ">"
        import datetime as dt

        df = spark.createDataFrame(
            [("e", {"t": "a"}, dt.datetime(2026, 1, 1), 1.0)],
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double",
        )
        plain = compile_promql(
            "sum by (t) (count_over_time(e[1h]))", df
        ).collect()
        wrapped = compile_promql(
            "sort_desc(sum by (t) (count_over_time(e[1h])))", df
        ).collect()
        assert plain == wrapped

    def test_compile_keeps_only_the_pinned_window(self, spark):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            ("e", {"t": "a"}, t0 + dt.timedelta(minutes=90 * i), 1.0)
            for i in range(4)  # windows h0, h1, h3 (two rows in h1+h3)
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double",
        )
        t = int(
            (t0 + dt.timedelta(minutes=100) - dt.datetime(1970, 1, 1))
            .total_seconds()
        )  # inside hour-window 1
        pinned = compile_promql(
            f"sum by (t) (count_over_time(e[1h] @ {t}))", df
        ).collect()
        assert len(pinned) == 1
        assert pinned[0].bucket_ts == t0 + dt.timedelta(hours=1)
        assert pinned[0].value == 1  # the 90-minute sample
        # equals the full grid filtered to that window
        full = {
            r.bucket_ts: r.value
            for r in compile_promql(
                "sum by (t) (count_over_time(e[1h]))", df
            ).collect()
        }
        assert full[pinned[0].bucket_ts] == pinned[0].value


class TestBinopMatrixProperty:
    """r10 (r9 verdict item 5): the r9 binop surface — on/ignoring ×
    group_left × set ops × comparisons × encodings — generated as a
    hypothesis property. Every structurally or encoding-invalid
    combination must raise at PARSE time (the _check_binop rejection
    matrix plus the per-op encoding rules in plans/promql.py); every
    valid one must round-trip into a BinQuery carrying the generated
    fields. Covers all three _bin_plan entry arms (set-op, arithmetic,
    comparison)."""

    from hypothesis import given, settings, strategies as st

    _POOL = ["event_type", "user", "env"]
    # encoding of sum by (...) (fn(...)): count / cents / micro
    _FN_ENC = {
        "count_over_time": "count",
        "sum_over_time": "value_x100",
        "rate": "rate_micro",
    }
    _SET = {"and", "or", "unless"}
    _CMP = {">", ">=", "<", "<=", "==", "!="}

    @staticmethod
    def _expect_valid(op, enc_l, enc_r, lby, rby, on, ignoring, gl,
                      same_range, gr=False):
        set_ops = {"and", "or", "unless"}
        if not same_range:
            return False
        if op in set_ops and gl is not None:
            return False
        if gr:
            # group_right (r11) desugars to the mirror group_left
            # with the sides structurally swapped — every structural
            # check below therefore runs on the swapped tuple order
            # (encoding rules are side-symmetric)
            lby, rby = rby, lby
        if on is None and ignoring is None:
            if tuple(lby) != tuple(rby):
                return False
        else:
            if op == "or":
                return False
            key = (
                tuple(on)
                if on is not None
                else tuple(x for x in lby if x not in ignoring)
            )
            if not key:
                return False
            if on is not None and not set(key) <= set(lby):
                return False
            if op in set_ops:
                if not set(key) <= set(rby):
                    return False
            elif gl is None:
                if set(lby) != set(key) or set(rby) != set(key):
                    return False
            else:
                extras = tuple(gl)
                if set(extras) & (set(lby) | set(key)):
                    return False
                if set(rby) != set(key) | set(extras):
                    return False
        if op == "*":
            return enc_l == enc_r or "count" in (enc_l, enc_r)
        if op in ("and", "unless"):
            return True
        # '/', '+', '-', 'or', and every comparison: equal encodings
        return enc_l == enc_r

    _lbls = st.lists(
        st.sampled_from(_POOL), min_size=1, max_size=2, unique=True
    )

    @given(
        op=st.sampled_from(
            ["/", "+", "-", "*", ">", ">=", "<", "<=", "==", "!=",
             "and", "or", "unless"]
        ),
        lf=st.sampled_from(sorted(_FN_ENC)),
        rf=st.sampled_from(sorted(_FN_ENC)),
        lby=_lbls,
        rby=_lbls,
        mod=st.one_of(
            st.none(),
            st.tuples(st.sampled_from(["on", "ignoring"]), _lbls),
        ),
        gl=st.one_of(
            st.none(),
            st.just(()),
            st.lists(
                st.sampled_from(_POOL), min_size=1, max_size=1
            ).map(tuple),
        ),
        same_range=st.booleans(),
        gr=st.booleans(),
    )
    @settings(max_examples=500, deadline=None)
    def test_binop_matrix(
        self, op, lf, rf, lby, rby, mod, gl, same_range, gr
    ):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            BinQuery,
        )

        if mod is None:
            gl = None  # grammar: group_left only follows on/ignoring
        if gl is None:
            gr = False  # group_right only exists with a group clause
        on = tuple(mod[1]) if mod is not None and mod[0] == "on" else None
        ignoring = (
            tuple(mod[1])
            if mod is not None and mod[0] == "ignoring"
            else None
        )
        dur_r = "1h" if same_range else "2h"
        lhs = f"sum by ({', '.join(lby)}) ({lf}(events[1h]))"
        rhs = f"sum by ({', '.join(rby)}) ({rf}(e2[{dur_r}]))"
        mod_txt = ""
        kw = "group_right" if gr else "group_left"
        if mod is not None:
            mod_txt = f"{mod[0]}({', '.join(mod[1])}) "
            if gl == ():
                mod_txt += f"{kw} "
            elif gl:
                mod_txt += f"{kw}({', '.join(gl)}) "
        text = f"{lhs} {op} {mod_txt}{rhs}"
        want = self._expect_valid(
            op, self._FN_ENC[lf], self._FN_ENC[rf],
            lby, rby, on, ignoring, gl, same_range, gr,
        )
        try:
            b = parse(text)
            ok = True
        except PromQLError:
            ok = False
        assert ok == want, text
        if ok:
            assert isinstance(b, BinQuery)
            assert b.op == op
            assert b.match_on == on and b.match_ignoring == ignoring
            assert b.group_left == gl
            assert b.swapped == gr
            if gr:  # structural sides are the user's sides swapped
                assert b.lhs.by == tuple(rby) and b.rhs.by == tuple(lby)
            else:
                assert b.lhs.by == tuple(lby) and b.rhs.by == tuple(rby)

    @given(
        cmp=st.sampled_from([">", ">=", "<", "<=", "==", "!="]),
        use_bool=st.booleans(),
        thr=st.integers(0, 10**6),
    )
    @settings(max_examples=60, deadline=None)
    def test_scalar_comparison_and_bool_round_trip(
        self, cmp, use_bool, thr
    ):
        # the scalar half of the r9 surface: `> INT` filters, `> bool
        # INT` emits 0/1 flags — both parse into PromQuery fields, and
        # bool flips the output encoding to count
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            output_encoding,
        )

        kw = "bool " if use_bool else ""
        q = parse(
            f"sum by (event_type) (count_over_time(events[1h])) "
            f"{cmp} {kw}{thr}"
        )
        assert q.scalar_op == cmp and q.scalar_bool == use_bool
        if use_bool:
            assert output_encoding(q) == "count"


class TestCompile:
    def _series(self, spark):
        # the series-frame contract is a micros TIMESTAMP ts — use the
        # same normalization the catalog queries apply (tables._events)
        from clickhouse_metrics_pipeline_spark.tables import _events

        return events_as_series(_events(spark, SF))

    def test_count_matches_hand_built(self, spark):
        got = sorted(
            map(
                tuple,
                compile_promql(
                    'sum by (event_type) '
                    '(count_over_time(events{event_type!~"^v.*"}[1h]))',
                    self._series(spark),
                ).collect(),
            )
        )
        ev = spark.read.parquet(f"{SF}/events.parquet")
        want = sorted(
            map(
                tuple,
                ev.where(~F.col("event_type").rlike("^v.*"))
                .groupBy(
                    "event_type", F.window("ts", "1 hour")["start"].alias("b")
                )
                .agg(F.count(F.lit(1)).alias("v"))
                .collect(),
            )
        )
        assert got == want and got

    def test_min_max_sum_per_series(self, spark):
        df = compile_promql(
            "max_over_time(events[1h])", self._series(spark)
        )
        r = df.collect()
        assert r and all(isinstance(x.value, int) for x in r)
        # labels map carries the series identity
        assert all(set(x.labels) == {"event_type", "user"} for x in r)

    def test_hist_quantile_parse_goldens(self):
        q = parse(
            "histogram_quantile(0.95, sum by (event_type) "
            "(count_over_time(events[1h])))"
        )
        assert q.quantile == 95 and q.agg == "sum"
        assert q.func == "count_over_time" and q.by == ("event_type",)

    @pytest.mark.parametrize(
        "bad",
        [
            # phi outside (0,1) / not whole-percent
            "histogram_quantile(1.5, sum by (t) (count_over_time(e[1h])))",
            "histogram_quantile(0.955, sum by (t) (count_over_time(e[1h])))",
            # inner must be sum by (...) (count_over_time(...))
            "histogram_quantile(0.95, sum by (t) (sum_over_time(e[1h])))",
            "histogram_quantile(0.95, count_over_time(e[1h]))",
            "histogram_quantile(0.95, avg by (t) (count_over_time(e[1h])))",
            # without-form has no by-columns to group the histograms on
            # (was silently accepted and merged all series globally)
            "histogram_quantile(0.95, sum without (u) "
            "(count_over_time(e[1h])))",
        ],
    )
    def test_hist_quantile_rejects_out_of_subset(self, bad):
        with pytest.raises(PromQLError):
            parse(bad)

    def test_hist_quantile_matches_hand_built_walk(self, spark):
        from clickhouse_metrics_pipeline_spark.functions.histogram import (
            bucket_percentile_scaled,
        )
        from clickhouse_metrics_pipeline_spark.workloads import _le_expr

        got = sorted(
            map(
                tuple,
                compile_promql(
                    "histogram_quantile(0.95, sum by (event_type) "
                    "(count_over_time(events[1h])))",
                    self._series(spark),
                ).collect(),
            )
        )
        ev = spark.read.parquet(f"{SF}/events.parquet")
        hand = (
            ev.select(
                "event_type",
                F.window("ts", "1 hour")["start"].alias("bucket_ts"),
                _le_expr(F.col("value")).alias("le"),
            )
            .groupBy("event_type", "bucket_ts", "le")
            .agg(F.count(F.lit(1)).alias("count"))
            .groupBy("event_type", "bucket_ts")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("le", "count"))
                ).alias("buckets")
            )
            .select(
                "event_type",
                "bucket_ts",
                bucket_percentile_scaled(
                    "buckets", 95, interpolation="prometheus"
                ).alias("value"),
            )
        )
        assert got == sorted(map(tuple, hand.collect())) and got

    def _dense_events(self, spark):
        # sf0.001 has no 5-minute window with >=2 samples per series,
        # so rate tests use a dense counter-with-reset fixture
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for u in (1, 2):
            for i in range(20):
                v = float((i * 7) % 50)  # resets at the wrap
                rows.append(
                    (
                        eid,
                        base + dt.timedelta(seconds=45 * i),
                        u,
                        "view" if u == 1 else "click",
                        v,
                        None,
                    )
                )
                eid += 1
        return spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )

    def test_bare_rate_matches_dedicated_kernel(self, spark):
        from clickhouse_metrics_pipeline_spark.functions.rate import (
            rate_over_window,
        )

        ev = self._dense_events(spark)
        got = {
            (r.labels["event_type"], r.labels["user"], r.bucket_ts): r.value
            for r in compile_promql(
                "rate(events[5m])", events_as_series(ev)
            ).collect()
        }
        want = {
            (r.event_type, str(r.user_id), r.bucket_ts): r.rate
            for r in rate_over_window(
                ev, ["user_id", "event_type"], 300
            ).collect()
            if r.rate is not None
        }
        assert got == want and got

    def test_increase_is_rate_times_range(self, spark):
        s = events_as_series(self._dense_events(spark))
        rate = {
            (str(r.labels), r.bucket_ts): r.value
            for r in compile_promql("rate(events[5m])", s).collect()
        }
        inc = {
            (str(r.labels), r.bucket_ts): r.value
            for r in compile_promql("increase(events[5m])", s).collect()
        }
        assert set(rate) == set(inc) and rate
        for k, v in rate.items():
            assert abs(inc[k] - v * 300.0) < 1e-3

    def test_agg_rate_is_integer_micro_units(self, spark):
        rows = compile_promql(
            "sum by (event_type) (rate(events[5m]))",
            events_as_series(self._dense_events(spark)),
        ).collect()
        assert rows and all(isinstance(r.value, int) for r in rows)

    def test_last_and_present_over_time(self, spark):
        from clickhouse_metrics_pipeline_spark.tables import _events

        ev = _events(spark, SF)
        last = {
            (r.labels["event_type"], r.labels["user"], r.bucket_ts): r.value
            for r in compile_promql(
                "last_over_time(events[1h])", self._series(spark)
            ).collect()
        }
        want = {
            (r.event_type, str(r.user_id), r.b): r.v
            for r in ev.groupBy(
                "event_type",
                "user_id",
                F.window("ts", "1 hour")["start"].alias("b"),
            )
            .agg(
                F.max_by(
                    F.round(F.col("value") * 100).cast("bigint"),
                    F.struct("ts", "event_id"),
                ).alias("v")
            )
            .collect()
        }
        assert last == want and last
        present = compile_promql(
            "present_over_time(events[1h])", self._series(spark)
        ).collect()
        assert present and all(r.value == 1 for r in present)
        assert len(present) == len(last)

    def test_quantile_over_time_matches_python(self, spark):
        got = {
            (r.labels["event_type"], r.labels["user"], r.bucket_ts): r.value
            for r in compile_promql(
                "quantile_over_time(0.9, events[6h])", self._series(spark)
            ).collect()
        }
        from clickhouse_metrics_pipeline_spark.tables import _events

        ev = _events(spark, SF)
        groups: dict = {}
        for r in ev.collect():
            b = r.ts.replace(
                minute=0, second=0, microsecond=0,
            )
            b = b.replace(hour=(b.hour // 6) * 6)
            groups.setdefault(
                (r.event_type, str(r.user_id), b), []
            ).append(int(round(r.value * 100)))
        want = {}
        for k, vs in groups.items():
            vs.sort()
            pos = 90 * (len(vs) - 1)
            lo, rem = pos // 100, pos % 100
            hi = min(lo + 1, len(vs) - 1)
            want[k] = vs[lo] * 10000 + (vs[hi] - vs[lo]) * rem * 100
        assert got == want and got

    def test_quantile_over_time_rejects_double_phi_stack(self):
        with pytest.raises(PromQLError):
            parse(
                "quantile by (t) (0.5, quantile_over_time(0.9, e[1h]))"
            )

    def test_offset_shifts_the_evaluation_grid(self, spark):
        # offset 90m: hourly windows over ts+90m == grid at :30
        got = sorted(
            map(
                tuple,
                compile_promql(
                    "sum by (event_type) "
                    "(count_over_time(events[1h] offset 90m))",
                    self._series(spark),
                ).collect(),
            )
        )
        from clickhouse_metrics_pipeline_spark.tables import _events

        ev = _events(spark, SF)
        want = sorted(
            map(
                tuple,
                ev.groupBy(
                    "event_type",
                    F.window(
                        F.col("ts") + F.expr("INTERVAL 90 MINUTES"),
                        "1 hour",
                    )["start"].alias("b"),
                )
                .agg(F.count(F.lit(1)).alias("v"))
                .collect(),
            )
        )
        assert got == want and got

    def test_topk_keeps_k_extremes_deterministically(self, spark):
        full = compile_promql(
            "sum by (event_type) (count_over_time(events[6h]))",
            self._series(spark),
        ).collect()
        top = compile_promql(
            "topk(2, sum by (event_type) (count_over_time(events[6h])))",
            self._series(spark),
        ).collect()
        by_bucket: dict = {}
        for r in full:
            by_bucket.setdefault(r.bucket_ts, []).append(r)
        want = set()
        for b, rows in by_bucket.items():
            rows.sort(key=lambda r: (-r.value, r.event_type))
            want |= {(r.event_type, b, r.value) for r in rows[:2]}
        assert {(r.event_type, r.bucket_ts, r.value) for r in top} == want
        assert top

    def test_topk_two_phase_matches_single_phase(self, spark):
        # high-cardinality by-label (user): more groups than _TOPK_SALTS
        # so phase 1 genuinely prunes across multiple salt buckets; the
        # result must equal the single-phase python reference, and the
        # plan must carry the two-phase shape (two Window nodes)
        import datetime

        from pyspark.sql import Row

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            Row(event_id=u * 100 + i, ts=t0 + datetime.timedelta(minutes=i),
                user_id=u, event_type="a", value=1.0, props="")
            for u in range(100)
            for i in range(u % 7 + 1)  # varied per-user counts, with ties
        ]
        series = events_as_series(spark.createDataFrame(rows))
        full = compile_promql(
            "sum by (user) (count_over_time(events[1d]))", series
        ).collect()
        df = compile_promql(
            "topk(3, sum by (user) (count_over_time(events[1d])))", series
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Window") >= 2, plan
        top = df.collect()
        by_bucket: dict = {}
        for r in full:
            by_bucket.setdefault(r.bucket_ts, []).append(r)
        want = set()
        for b, rows in by_bucket.items():
            rows.sort(key=lambda r: (-r.value, r.user))
            want |= {(r.user, b, r.value) for r in rows[:3]}
        assert {(r.user, r.bucket_ts, r.value) for r in top} == want
        assert len({r.user for r in full}) > 32  # beats the salt count

    def test_quantile_agg_matches_python_interpolation(self, spark):
        got = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "quantile by (event_type) (0.5, sum_over_time(events[1h]))",
                self._series(spark),
            ).collect()
        }
        per_series = compile_promql(
            "sum_over_time(events[1h])", self._series(spark)
        ).collect()
        groups: dict = {}
        for r in per_series:
            groups.setdefault(
                (r.labels["event_type"], r.bucket_ts), []
            ).append(r.value)
        want = {}
        for k, vs in groups.items():
            vs.sort()
            pos = 50 * (len(vs) - 1)
            lo, rem = pos // 100, pos % 100
            hi = min(lo + 1, len(vs) - 1)
            want[k] = vs[lo] * 10000 + (vs[hi] - vs[lo]) * rem * 100
        assert got == want and got

    @pytest.mark.parametrize(
        "bad",
        [
            # topk needs an aggregated inner and integer K
            "topk(2, count_over_time(events[1h]))",
            "topk(0, sum by (t) (count_over_time(events[1h])))",
            # quantile rejects double-valued calls and bad phi
            "quantile by (t) (0.5, rate(events[5m]))",
            "quantile by (t) (1.5, sum_over_time(events[1h]))",
        ],
    )
    def test_batch2_rejects_out_of_subset(self, bad):
        with pytest.raises(PromQLError):
            parse(bad)

    def test_without_matches_by_complement(self, spark):
        # labels are {event_type, user}: without (user) == by (event_type)
        s = self._series(spark)
        wo = {
            (r.labels["event_type"], r.bucket_ts): r.value
            for r in compile_promql(
                "sum without (user) (count_over_time(events[1h]))", s
            ).collect()
        }
        by = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (count_over_time(events[1h]))", s
            ).collect()
        }
        assert wo == by and wo
        # the pruned map no longer carries the dropped key
        one = compile_promql(
            "sum without (user) (count_over_time(events[1h]))", s
        ).first()
        assert set(one.labels) == {"event_type"}

    def test_without_all_labels_gives_global_series(self, spark):
        rows = compile_promql(
            "sum without (user, event_type) (count_over_time(events[1h]))",
            self._series(spark),
        ).collect()
        assert rows and all(r.labels == {} for r in rows)
        # one row per window, the global count
        assert len({r.bucket_ts for r in rows}) == len(rows)

    def test_topk_rejects_without_form(self):
        with pytest.raises(PromQLError):
            parse(
                "topk(2, sum without (user) (count_over_time(e[1h])))"
            )

    def test_binary_ops_match_python_join(self, spark):
        s = self._series(spark)
        counts = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (count_over_time(events[6h]))", s
            ).collect()
        }
        sums = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (sum_over_time(events[6h]))", s
            ).collect()
        }
        mins = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (min_over_time(events[6h]))", s
            ).collect()
        }
        # same-encoding division (cents / cents — the r7 encoding
        # guard rejects the old cents/count mix): scales cancel, so
        # the ppm ratio is the true raw-unit ratio
        ratio = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (sum_over_time(events[6h])) / "
                "sum by (event_type) (min_over_time(events[6h]))",
                s,
            ).collect()
        }
        want = {
            k: (sums[k] * 1_000_000) // mins[k]
            for k in sums
            if k in mins and mins[k] != 0 and sums[k] >= 0 and mins[k] > 0
        }
        # sums/mins are non-negative on this corpus, so plain // matches
        # the sign-aware truncation
        assert ratio == want and ratio
        assert counts  # corpus sanity for the reject cases below
        plus = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (sum_over_time(events[6h])) + "
                "sum by (event_type) (sum_over_time(events[6h]))",
                s,
            ).collect()
        }
        assert plus == {k: 2 * v for k, v in sums.items()} and plus

    @pytest.mark.parametrize(
        "bad",
        [
            # mismatched by-labels
            "sum by (event_type) (count_over_time(e[1h])) / "
            "sum by (user) (count_over_time(e[1h]))",
            # mismatched ranges (windows would not align)
            "sum by (t) (count_over_time(e[1h])) / "
            "sum by (t) (count_over_time(e[2h]))",
            # unaggregated side
            "sum by (t) (count_over_time(e[1h])) / count_over_time(e[1h])",
            # without-form side (no by-columns to match on)
            "sum without (u) (count_over_time(e[1h])) / "
            "sum without (u) (count_over_time(e[1h]))",
            # mismatched output encodings (the r7 ADVICE guard):
            # cents vs count
            "sum by (t) (sum_over_time(e[1h])) / "
            "sum by (t) (count_over_time(e[1h]))",
            # cents vs value*10000
            "sum by (t) (sum_over_time(e[1h])) + "
            "avg by (t) (avg_over_time(e[1h]))",
            # micro-units vs count
            "sum by (t) (rate(e[1h])) - "
            "sum by (t) (count_over_time(e[1h]))",
        ],
    )
    def test_binary_op_rejects_out_of_subset(self, bad):
        with pytest.raises(PromQLError):
            parse(bad)

    def test_output_encoding_labels(self):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            output_encoding,
        )

        cases = {
            "sum by (t) (count_over_time(e[1h]))": "count",
            "sum by (t) (sum_over_time(e[1h]))": "value_x100",
            "avg by (t) (sum_over_time(e[1h]))": "value_x1000000",
            "avg by (t) (avg_over_time(e[1h]))": "value_x100000000",
            "quantile by (t) (0.5, sum_over_time(e[1h]))": "value_x1000000",
            "sum by (t) (rate(e[5m]))": "rate_micro",
            "rate(e[5m])": "rate_double",
            "count by (t) (rate(e[5m]))": "count",
            "histogram_quantile(0.95, sum by (t) "
            "(count_over_time(e[1h])))": "value_x10000",
        }
        for text, enc in cases.items():
            assert output_encoding(parse(text)) == enc, text

    def test_mul_overflow_raises(self, spark):
        # cents*cents beyond BIGINT must raise, not wrap: one series
        # whose 6h sum is ~2^35 cents — squared is ~2^70 > 2^63-1
        import datetime

        from pyspark.sql import Row

        big = float(2**35) / 100.0
        t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            Row(event_id=i, ts=t0 + datetime.timedelta(minutes=i),
                user_id=1, event_type="a", value=big, props="")
            for i in range(2)
        ]
        s = events_as_series(spark.createDataFrame(rows))
        q = (
            "sum by (event_type) (sum_over_time(events[6h])) * "
            "sum by (event_type) (sum_over_time(events[6h]))"
        )
        with pytest.raises(Exception, match="overflow"):
            compile_promql(q, s).collect()
        # and a small product still multiplies exactly
        small = [
            Row(event_id=i, ts=t0 + datetime.timedelta(minutes=i),
                user_id=1, event_type="a", value=2.0, props="")
            for i in range(2)
        ]
        s2 = events_as_series(spark.createDataFrame(small))
        got = compile_promql(q, s2).collect()
        assert [r.value for r in got] == [400 * 400]

    def test_scalar_compare_filters_and_arith_rescales(self, spark):
        s = self._series(spark)
        base = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (count_over_time(events[6h]))", s
            ).collect()
        }
        hot = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (count_over_time(events[6h])) > 5",
                s,
            ).collect()
        }
        assert hot == {k: v for k, v in base.items() if v > 5}
        assert hot and len(hot) < len(base)
        tripled = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (count_over_time(events[6h])) * 3",
                s,
            ).collect()
        }
        assert tripled == {k: 3 * v for k, v in base.items()}

    @pytest.mark.parametrize(
        "bad",
        [
            # scalar division by zero (division itself is in the
            # subset since r11 — see TestScalarDivision)
            "sum by (t) (count_over_time(e[1h])) / 0",
            # float scalar breaks the exactness contract
            "sum by (t) (count_over_time(e[1h])) > 1.5",
            # unaggregated side
            "count_over_time(e[1h]) > 5",
        ],
    )
    def test_scalar_rejects_out_of_subset(self, bad):
        with pytest.raises(PromQLError):
            parse(bad)

    def test_matcher_absent_label_semantics(self, spark):
        # a label that never exists: NEQ matches everything (Prometheus
        # absent-label rule), EQ matches nothing
        n_all = compile_promql(
            'count_over_time(events{nope!="x"}[1h])', self._series(spark)
        ).count()
        n_none = compile_promql(
            'count_over_time(events{nope="x"}[1h])', self._series(spark)
        ).count()
        assert n_all > 0 and n_none == 0

    # ---- round-7 additions: irate / absent / no-by scalar agg ----

    def test_bare_irate_matches_dedicated_kernel(self, spark):
        from clickhouse_metrics_pipeline_spark.workloads_ext2 import (
            events_irate_5m,
        )

        got = {
            (r.labels["event_type"], r.labels["user"], r.bucket_ts): r.value
            for r in compile_promql(
                "irate(events[5m])", self._series(spark)
            ).collect()
        }
        want = {
            (r.event_type, str(r.user_id), r.bucket_ts): r.irate
            for r in events_irate_5m(spark, SF).collect()
            if r.irate is not None
        }
        assert got == want and got

    def test_agg_irate_is_integer_micro_units(self, spark):
        bare = {}
        for r in compile_promql(
            "irate(events[5m])", self._series(spark)
        ).collect():
            k = (r.labels["event_type"], r.bucket_ts)
            bare.setdefault(k, []).append(r.value)
        got = {
            (r.event_type, r.bucket_ts): r.value
            for r in compile_promql(
                "sum by (event_type) (irate(events[5m]))",
                self._series(spark),
            ).collect()
        }
        want = {
            k: sum(int(round(v * 1_000_000)) for v in vs)
            for k, vs in bare.items()
        }
        assert got == want and got
        assert all(isinstance(v, int) for v in got.values())

    def test_absent_is_grid_minus_present(self, spark):
        got = {
            r.bucket_ts: r.value
            for r in compile_promql(
                'absent(events{event_type="purchase"}[30m])',
                self._series(spark),
            ).collect()
        }
        ev = spark.read.parquet(f"{SF}/events.parquet")
        from clickhouse_metrics_pipeline_spark.tables import _events

        evn = _events(spark, SF)
        win = F.timestamp_seconds(
            (F.unix_timestamp("ts") / 1800).cast("bigint") * 1800
        )
        buckets = [r[0] for r in evn.select(win.alias("b")).collect()]
        present = {
            r[0]
            for r in evn.where(F.col("event_type") == "purchase")
            .select(win.alias("b"))
            .distinct()
            .collect()
        }
        import datetime

        lo, hi = min(buckets), max(buckets)
        want = {}
        t = lo
        while t <= hi:
            if t not in present:
                want[t] = 1
            t += datetime.timedelta(minutes=30)
        assert got == want and got

    def test_absent_rejects_aggregation(self):
        for bad in (
            "sum by (t) (absent(e[1h]))",
            "sum(absent(e[1h]))",
            "quantile by (t) (0.5, absent(e[1h]))",
        ):
            with pytest.raises(PromQLError):
                parse(bad)

    def test_no_by_scalar_agg_matches_by_sum(self, spark):
        # sum(count_over_time) == the by-form re-summed per window
        by = {}
        for r in compile_promql(
            "sum by (event_type) (count_over_time(events[1h]))",
            self._series(spark),
        ).collect():
            by[r.bucket_ts] = by.get(r.bucket_ts, 0) + r.value
        got = {
            r.bucket_ts: r.value
            for r in compile_promql(
                "sum(count_over_time(events[1h]))", self._series(spark)
            ).collect()
        }
        assert got == by and got
        # and the rate form stays integer micro-units
        rates = compile_promql(
            "sum(rate(events[1d]))", self._series(spark)
        ).collect()
        assert rates and all(isinstance(r.value, int) for r in rates)
        assert rates[0].asDict().keys() == {"bucket_ts", "value"}

    def test_no_by_rejects_topk_and_binop(self):
        for bad in (
            "topk(3, sum(count_over_time(e[1h])))",
            "sum(count_over_time(e[1h])) / sum(count_over_time(e[1h]))",
        ):
            with pytest.raises(PromQLError):
                parse(bad)

    def test_resets_changes_hand_built_sequence(self, spark):
        # one series, values 1,2,2,1,3 inside a single 5m window:
        # adjacent pairs (1,2)(2,2)(2,1)(1,3) -> 1 reset, 3 changes;
        # a second single-sample series contributes 0 to both
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (
                "events",
                {"event_type": "a", "user": "u1"},
                t0 + dt.timedelta(seconds=10 * i),
                v,
                i,
            )
            for i, v in enumerate([1.0, 2.0, 2.0, 1.0, 3.0])
        ] + [("events", {"event_type": "a", "user": "u2"}, t0, 5.0, 99)]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        r = compile_promql("sum by (event_type) (resets(events[5m]))", df)
        c = compile_promql("sum by (event_type) (changes(events[5m]))", df)
        assert [(x.event_type, x.value) for x in r.collect()] == [("a", 1)]
        assert [(x.event_type, x.value) for x in c.collect()] == [("a", 3)]
        bare = {
            x.labels["user"]: x.value
            for x in compile_promql("changes(events[5m])", df).collect()
        }
        assert bare == {"u1": 3, "u2": 0}

    def test_resets_comparison_is_window_local(self, spark):
        # 5 at t=0s, 1 at t=90s: consecutive samples of one series but
        # in DIFFERENT 1m windows -> the decrease must NOT be counted
        # (PromQL's range vector holds only in-window samples)
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            ("events", {"event_type": "a", "user": "u"}, t0, 5.0, 0),
            (
                "events",
                {"event_type": "a", "user": "u"},
                t0 + dt.timedelta(seconds=90),
                1.0,
                1,
            ),
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        out = compile_promql("resets(events[1m])", df).collect()
        assert sorted(x.value for x in out) == [0, 0]

    def test_resets_changes_encoding_and_binop(self):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            output_encoding,
        )

        assert output_encoding(parse("resets(e[1h])")) == "count"
        assert (
            output_encoding(parse("sum by (t) (changes(e[1h]))")) == "count"
        )
        # count-encoded sides compose in binops...
        parse(
            "sum by (t) (resets(e[1h])) + "
            "sum by (t) (count_over_time(e[1h]))"
        )
        # ...but cents-encoded sides still don't
        with pytest.raises(PromQLError):
            parse(
                "sum by (t) (changes(e[1h])) + "
                "sum by (t) (sum_over_time(e[1h]))"
            )

    def test_stdvar_stddev_hand_built(self, spark):
        # values 1,2,3,4 in one window: population variance 1.25
        # -> cents^2 12500; stddev floor(sqrt(12500)) = 111 cents
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (
                "events",
                {"event_type": "a", "user": "u1"},
                t0 + dt.timedelta(seconds=10 * i),
                v,
                i,
            )
            for i, v in enumerate([1.0, 2.0, 3.0, 4.0])
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        sv = compile_promql("stdvar_over_time(events[5m])", df).collect()
        sd = compile_promql("stddev_over_time(events[5m])", df).collect()
        assert [r.value for r in sv] == [12500]
        assert [r.value for r in sd] == [111]

    def test_stddev_isqrt_exact_at_perfect_squares(self, spark):
        # variance an exact perfect square: 1,3 -> var cents^2 =
        # ((100-200)^2 + (300-200)^2)/2 = 10000 -> stddev exactly 100;
        # the +-1 correction must not overshoot
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (
                "events",
                {"event_type": "a", "user": "u1"},
                t0 + dt.timedelta(seconds=10 * i),
                v,
                i,
            )
            for i, v in enumerate([1.0, 3.0])
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        sd = compile_promql("stddev_over_time(events[5m])", df).collect()
        assert [r.value for r in sd] == [100]

    def test_stdvar_stddev_encodings(self):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            output_encoding,
        )

        assert output_encoding(parse("stdvar_over_time(e[1h])")) == (
            "value2_x10000"
        )
        assert output_encoding(
            parse("avg by (t) (stdvar_over_time(e[1h]))")
        ) == "value2_x100000000"
        assert output_encoding(parse("stddev_over_time(e[1h])")) == (
            "value_x100"
        )
        # stddev is cents-encoded, so it composes with cents sides
        parse(
            "max by (t) (stddev_over_time(e[1h])) + "
            "sum by (t) (sum_over_time(e[1h]))"
        )
        # stdvar (value^2) must not mix with cents
        with pytest.raises(PromQLError):
            parse(
                "sum by (t) (stdvar_over_time(e[1h])) + "
                "sum by (t) (sum_over_time(e[1h]))"
            )

    def test_deriv_exact_linear_series(self, spark):
        # value = 2*t + 1 sampled at t=0,10,20,30s: least-squares
        # slope exactly 2.0/s; aggregated form 2_000_000 micro-units;
        # a single-sample series window emits nothing (den = 0)
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (
                "events",
                {"event_type": "a", "user": "u1"},
                t0 + dt.timedelta(seconds=10 * i),
                2.0 * 10 * i + 1.0,
                i,
            )
            for i in range(4)
        ] + [("events", {"event_type": "a", "user": "u2"}, t0, 9.0, 99)]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        bare = compile_promql("deriv(events[5m])", df).collect()
        assert [(r.labels["user"], r.value) for r in bare] == [("u1", 2.0)]
        agg = compile_promql(
            "sum by (event_type) (deriv(events[5m]))", df
        ).collect()
        assert [(r.event_type, r.value) for r in agg] == [("a", 2_000_000)]
        # deriv is double-valued -> rejected under quantile, like rate
        with pytest.raises(PromQLError):
            parse("quantile by (t) (0.5, deriv(e[5m]))")

    def test_predict_linear_exact_forecast(self, spark):
        # value = 2t+1 over t=0..30s in an epoch-aligned 5m window:
        # prediction at window end + 60s = x*=360s -> 2*360+1 = 721
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (
                "events",
                {"event_type": "a", "user": "u1"},
                t0 + dt.timedelta(seconds=10 * i),
                2.0 * 10 * i + 1.0,
                i,
            )
            for i in range(4)
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        bare = compile_promql(
            "predict_linear(events[5m], 60)", df
        ).collect()
        assert [r.value for r in bare] == [721.0]
        agg = compile_promql(
            "sum by (event_type) (predict_linear(events[5m], 60))", df
        ).collect()
        assert [(r.event_type, r.value) for r in agg] == [("a", 721_000_000)]
        # raw-value encoding must not mix with the rate family
        with pytest.raises(PromQLError):
            parse(
                "sum by (t) (predict_linear(e[5m], 60)) + "
                "sum by (t) (rate(e[5m]))"
            )
        # fractional horizons rejected
        with pytest.raises(PromQLError):
            parse("predict_linear(e[5m], 1.5)")

    def test_group_agg_emits_one_per_group(self, spark):
        got = compile_promql(
            "group by (event_type) (count_over_time(events[1h]))",
            self._series(spark),
        ).collect()
        assert got and all(r.value == 1 for r in got)
        # same group set as count
        cnt = compile_promql(
            "count by (event_type) (count_over_time(events[1h]))",
            self._series(spark),
        ).collect()
        assert {(r.event_type, r.bucket_ts) for r in got} == {
            (r.event_type, r.bucket_ts) for r in cnt
        }
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            output_encoding,
        )

        assert output_encoding(
            parse("group by (t) (sum_over_time(e[1h]))")
        ) == "count"
        assert output_encoding(
            parse("group by (t) (rate(e[5m]))")
        ) == "count"

    def test_stdvar_survives_huge_values(self, spark):
        # sum(c^2) for 20 samples of 1e7-valued points (1e9 cents)
        # exceeds BIGINT; the moments must accumulate in DECIMAL —
        # previously this threw ArithmeticException under ANSI mode
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = [
            (
                "events",
                {"event_type": "a", "user": "u1"},
                t0 + dt.timedelta(seconds=i),
                1.0e7 + (i % 2),  # variance 0.25 in raw units
                i,
            )
            for i in range(20)
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        sv = compile_promql("stdvar_over_time(events[5m])", df).collect()
        sd = compile_promql("stddev_over_time(events[5m])", df).collect()
        # population variance of alternating +0/+1 cents offsets:
        # 0.25 raw^2 -> 2500 cents^2; stddev 50 cents
        assert [r.value for r in sv] == [2500]
        assert [r.value for r in sd] == [50]


class TestQuantileDispatchMatrix:
    """r10 verdict item 7: the histogram_quantile dispatch ladder
    (rate-form -> classic presence probe -> exp presence probe -> raw
    ladder) is probe-dependent; pin the full
    {populated, NULL, absent} x {classic, exp} matrix so a storage-
    shape change can't silently reroute a cell."""

    import datetime as _dt

    T0 = _dt.datetime(2026, 1, 1)

    def _frame(self, spark, classic, exp):
        """classic/exp in {'populated', 'null', 'absent'}; 3 samples
        in one 1h window with cumulative counters (rate-able)."""
        import datetime as dt

        cols = (
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double"
        )
        if classic != "absent":
            cols += ", buckets array<struct<le:double,count:bigint>>"
        if exp != "absent":
            cols += (
                ", exp_scale int, exp_zero_count bigint"
                ", exp_zero_threshold double"
                ", exp_positive_buckets array<struct<index:int,count:bigint>>"
                ", exp_negative_buckets array<struct<index:int,count:bigint>>"
            )
        rows = []
        for i in range(3):
            r = [
                "m",
                {"t": "x"},
                self.T0 + dt.timedelta(minutes=10 * i),
                float(i),
            ]
            if classic != "absent":
                r.append(
                    [(10.0, 2 * (i + 1)), (50.0, 3 * (i + 1))]
                    if classic == "populated"
                    else None
                )
            if exp != "absent":
                if exp == "populated":
                    r += [0, 1 * (i + 1), 0.0,
                          [(0, 4 * (i + 1))], None]
                else:
                    r += [None, None, None, None, None]
            rows.append(tuple(r))
        return spark.createDataFrame(rows, cols)

    Q_COUNT = (
        "histogram_quantile(0.95, sum by (t) (count_over_time(m[1h])))"
    )
    Q_RATE = "histogram_quantile(0.95, sum by (t) (rate(m[1h])))"

    class _Hit(Exception):
        def __init__(self, name):
            self.name = name

    def _dispatch(self, spark, monkeypatch, query, classic, exp):
        """Which plan the cell lands on: a named stored/exp plan (via
        recorder), 'ladder' (the raw-value fallback ran for real), or
        'error' (PromQLError)."""
        import clickhouse_metrics_pipeline_spark.plans.promql as P

        for fn in (
            "_stored_bucket_quantile_plan",
            "_exp_hist_quantile_plan",
            "_exp_rate_quantile_plan",
        ):
            def _mk(name):
                def _rec(q, df):
                    raise self._Hit(name)
                return _rec
            monkeypatch.setattr(P, fn, _mk(fn))
        df = self._frame(spark, classic, exp)
        try:
            out = compile_promql(query, df)
        except self._Hit as h:
            return h.name
        except PromQLError:
            return "error"
        rows = out.collect()
        assert rows  # the fallback ladder actually answered
        return "ladder"

    @pytest.mark.parametrize(
        "classic,exp,want",
        [
            ("populated", "absent", "_stored_bucket_quantile_plan"),
            ("populated", "populated", "_stored_bucket_quantile_plan"),
            ("null", "populated", "_exp_hist_quantile_plan"),
            ("null", "null", "ladder"),
            ("absent", "populated", "_exp_hist_quantile_plan"),
            ("absent", "null", "ladder"),
            ("absent", "absent", "ladder"),
        ],
    )
    def test_count_form_matrix(self, spark, monkeypatch, classic, exp, want):
        got = self._dispatch(spark, monkeypatch, self.Q_COUNT, classic, exp)
        assert got == want

    @pytest.mark.parametrize(
        "classic,exp,want",
        [
            # populated classic runs the stored rate plan inline
            ("null", "populated", "_exp_rate_quantile_plan"),
            ("absent", "populated", "_exp_rate_quantile_plan"),
            # r10 ADVICE item: NULL-bucket metrics must 400, not
            # silently answer empty
            ("null", "null", "error"),
            ("null", "absent", "error"),
            ("absent", "null", "error"),
            ("absent", "absent", "error"),
        ],
    )
    def test_rate_form_matrix(self, spark, monkeypatch, classic, exp, want):
        got = self._dispatch(spark, monkeypatch, self.Q_RATE, classic, exp)
        assert got == want

    def test_rate_form_classic_populated_runs_stored_plan(self, spark):
        # no monkeypatch: the cumulative bucket counters rate for real
        out = compile_promql(
            self.Q_RATE, self._frame(spark, "populated", "absent")
        ).collect()
        assert len(out) == 1 and out[0].value is not None

    def test_empty_classic_arrays_fall_back(self, spark, monkeypatch):
        # size-0 arrays are 'no buckets' for the probe, like NULL
        import datetime as dt

        rows = [
            (
                "m", {"t": "x"},
                self.T0 + dt.timedelta(minutes=10 * i), float(i), [],
            )
            for i in range(3)
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, "
            "buckets array<struct<le:double,count:bigint>>",
        )
        out = compile_promql(self.Q_COUNT, df).collect()
        assert out  # raw-value ladder answered


class TestExpScaleChangeRate:
    """r10 ADVICE item (low): a series that changes exp_scale inside a
    rate window must behave exactly like two separate constant-scale
    series (a scale change is a counter boundary) — no prev_v leak
    across scale groups, no double-counted window."""

    def _rows(self, split_series: bool):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        rows = []
        for i in range(4):
            scale = 0 if i < 2 else 1
            name = (
                {"t": "x"}
                if not split_series
                else {"t": "x", "seg": str(scale)}
            )
            rows.append(
                (
                    "m", name, t0 + dt.timedelta(minutes=10 * i),
                    0.0, scale, 0, 0.0,
                    [(0, 10 * (i + 1))], None,
                )
            )
        return rows

    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, exp_scale int, "
            "exp_zero_count bigint, exp_zero_threshold double, "
            "exp_positive_buckets array<struct<index:int,count:bigint>>, "
            "exp_negative_buckets array<struct<index:int,count:bigint>>",
        )
        return {
            (r.t, r.bucket_ts): r.value
            for r in compile_promql(
                "histogram_quantile(0.95, sum by (t) (rate(m[1h])))",
                df,
            ).collect()
        }

    def test_scale_change_equals_split_series(self, spark):
        merged = self._run(spark, self._rows(split_series=False))
        split = self._run(spark, self._rows(split_series=True))
        assert merged == split and merged


class TestLabelReplaceDialectValidation:
    """r10 ADVICE item (low): escape-aware regex marker scan + Java's
    greedy-legal-prefix $N replacement rule."""

    def _v(self, regex, repl="$0"):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            _validate_label_replace,
        )

        _validate_label_replace(regex, repl)

    def test_escaped_literals_accepted(self):
        # literal backslash + Z: NOT the \Z anchor
        self._v(r"x\\Zy(a)")
        # escaped paren before ?-ish text is a literal, not a group
        self._v(r"\(a\)(b)")

    def test_real_divergent_constructs_rejected(self):
        for bad in (r"x\Zy", "(?P<n>a)", "a(?#c)b"):
            with pytest.raises(PromQLError):
                self._v(bad)
        # the anchor hidden after an escaped backslash pair still fires
        with pytest.raises(PromQLError):
            self._v("a\\\\\\Zb")

    def test_replacement_greedy_legal_prefix(self):
        # $12 with one group = group 1 then literal '2' in Java
        self._v("(a)", "$12")
        self._v("(a)(b)", "$12")  # two groups: $12 -> group 12? no,
        # 12 > 2 so Java consumes $1 and leaves '2' — legal either way
        self._v("(a)", "$0suffix")  # group 0 always legal
        with pytest.raises(PromQLError):
            self._v("(a)", "$2")  # first digit already illegal
        with pytest.raises(PromQLError):
            self._v("a", "$1")  # no groups at all


class TestIncreaseInQuantile:
    """r10 verdict item 5: increase() accepted inside
    histogram_quantile — Grafana's other canonical latency spelling,
    histogram_quantile(0.95, sum(increase(x_bucket[5m])) by (le)).
    The extrapolatedRate kernel runs in increase mode (rate × range on
    the same micro-units) before the identical walk, so the quantile
    is pinned by an exact hand-derived golden and agrees with the
    rate form up to independent micro-unit rounding."""

    import datetime as _dt

    T0 = _dt.datetime(2026, 1, 1)

    def _classic_frame(self, spark):
        """3 cumulative samples at 0/10/20 min of the [T0, T0+1h)
        window; le-delta buckets le=10 counter 2(i+1), le=50 counter
        3(i+1). extrapolatedRate: dur_start=0 (first sample on the
        window edge), dur_end=2400 ≥ 1.1·avg_iv=660 → extend by
        avg_iv/2=300 → increase = Δv·(1200+300)/1200 = 1.25·Δv."""
        import datetime as dt

        rows = [
            (
                "m",
                {"t": "x"},
                self.T0 + dt.timedelta(minutes=10 * i),
                float(i),
                [(10.0, 2 * (i + 1)), (50.0, 3 * (i + 1))],
            )
            for i in range(3)
        ]
        return spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, "
            "buckets array<struct<le:double,count:bigint>>",
        )

    Q_INC = "histogram_quantile(0.95, sum by (t) (increase(m[1h])))"
    Q_RATE = "histogram_quantile(0.95, sum by (t) (rate(m[1h])))"

    def test_increase_quantile_exact_golden(self, spark):
        # increases: le10 1.25·4=5.0 → 5_000_000 micro; le50 1.25·6=7.5
        # → 7_500_000. total=12_500_000, p95 target total·95; le10's
        # (cum+count)·100=5e8 < 1.1875e9 → hit le50. prometheus walk:
        # 10·10000 + floor((1_187_500_000 − 100·5_000_000)·40·100
        # / 7_500_000) = 100000 + 366_666 = 466_666.
        out = compile_promql(self.Q_INC, self._classic_frame(spark)).collect()
        assert len(out) == 1
        assert out[0].t == "x" and out[0].value == 466666

    def test_increase_agrees_with_rate_form(self, spark):
        # the walk is scale-free in the counts; the two forms differ
        # only by independent round(·1e6) of rate vs rate·range
        # (hand-derived: rate form floors to 466_663)
        df = self._classic_frame(spark)
        inc = compile_promql(self.Q_INC, df).collect()[0].value
        rat = compile_promql(self.Q_RATE, df).collect()[0].value
        assert abs(inc - rat) <= 10  # ≤ 1e-3 quantile units at ×10000

    def test_increase_routes_to_exp_rate_plan(self, spark, monkeypatch):
        import clickhouse_metrics_pipeline_spark.plans.promql as P

        class Hit(Exception):
            pass

        def _rec(q, df):
            assert q.func == "increase"
            raise Hit()

        monkeypatch.setattr(P, "_exp_rate_quantile_plan", _rec)
        helper = TestQuantileDispatchMatrix()
        df = helper._frame(spark, "absent", "populated")
        with pytest.raises(Hit):
            compile_promql(self.Q_INC, df)

    def test_increase_null_buckets_is_clear_400(self, spark):
        helper = TestQuantileDispatchMatrix()
        df = helper._frame(spark, "null", "null")
        with pytest.raises(PromQLError):
            compile_promql(self.Q_INC, df)


class TestExpHistogramFraction:
    """r10 verdict item 6: histogram_fraction over EXP histograms —
    kernel goldens for every mass_le branch (full bucket, zero/neg
    mass, in-bucket interpolation at a binary-exact point, the 0.0
    -Inf sentinel, hi=inf, empty→NULL) plus the text-level H7
    mixed-scale merge and the dispatch probe."""

    import datetime as _dt

    T0 = _dt.datetime(2026, 1, 1)

    SCHEMA = (
        "scale int, zc bigint, "
        "pos array<struct<index:int,count:bigint>>, "
        "neg array<struct<index:int,count:bigint>>"
    )

    def _frac(self, spark, row, lo, hi):
        from clickhouse_metrics_pipeline_spark.functions.histogram import (
            exp_histogram_fraction,
        )

        df = spark.createDataFrame([row], self.SCHEMA)
        return df.select(
            exp_histogram_fraction("scale", "zc", "pos", "neg", lo, hi)
            .alias("v")
        ).collect()[0].v

    # scale 0 (base 2): buckets (2,4] c=4 and (8,16] c=4, zero c=2
    ROW = (0, 2, [(1, 4), (3, 4)], None)

    def test_edge_bounds_exact(self, spark):
        # mass_le(16)=2+4+4=10, mass_le(4)=2+4=6 → floor(4e6/10)
        assert self._frac(spark, self.ROW, 4.0, 16.0) == 400000

    def test_in_bucket_interpolation_scale0(self, spark):
        # B=3 inside (2,4]: 4·(3−2)/(4−2)=2 exactly → mass_le(3)=4
        assert self._frac(spark, self.ROW, 3.0, 16.0) == 600000

    def test_lo_zero_is_minus_inf_sentinel(self, spark):
        assert self._frac(spark, self.ROW, 0.0, 4.0) == 600000

    def test_hi_inf_counts_everything(self, spark):
        assert self._frac(spark, self.ROW, 0.0, float("inf")) == 1000000
        assert self._frac(spark, self.ROW, 4.0, float("inf")) == 400000

    def test_zero_and_negative_mass_sits_below_any_bound(self, spark):
        # zc=1, neg total=3, pos (2,4] c=4 → total 8
        row = (0, 1, [(1, 4)], [(0, 3)])
        assert self._frac(spark, row, 0.0, 4.0) == 1000000
        assert self._frac(spark, row, 4.0, float("inf")) == 0

    def test_negative_scale_base4_interpolation(self, spark):
        # scale −1 → base 4, bucket (4,16] c=8: B=8 straddles,
        # 8·(8−4)/(16−4) = 8/3 → floor((8 − 8/3)·1e6/8) = 666666
        row = (-1, 0, [(1, 8)], None)
        assert self._frac(spark, row, 4.0, 16.0) == 1000000
        assert self._frac(spark, row, 8.0, 16.0) == 666666

    def test_empty_histogram_is_null(self, spark):
        assert self._frac(spark, (0, 0, [], None), 0.0, 4.0) is None

    Q = "histogram_fraction(4, 16, sum by (t) (count_over_time(m[1d])))"

    def _exp_frame(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, exp_scale int, "
            "exp_zero_count bigint, exp_zero_threshold double, "
            "exp_positive_buckets array<struct<index:int,count:bigint>>, "
            "exp_negative_buckets array<struct<index:int,count:bigint>>",
        )

    def test_text_mixed_scale_merge_golden(self, spark):
        # series 1 at scale 0: (4,8] c=4, zc=1; series 2 at scale −1:
        # (4,16] c=2, zc=1. H7 merge to min scale −1 shifts index 2
        # → floor(2/2)=1 → merged (4,16] c=6, zc=2, total 8:
        # fraction(4,16) = 6/8 → 750000 ppm
        import datetime as dt

        rows = [
            ("m", {"t": "x"}, self.T0, 1.0, 0, 1, 0.0, [(2, 4)], None),
            (
                "m", {"t": "x"}, self.T0 + dt.timedelta(hours=1),
                1.0, -1, 1, 0.0, [(1, 2)], None,
            ),
        ]
        out = compile_promql(self.Q, self._exp_frame(spark, rows)).collect()
        assert len(out) == 1 and out[0].value == 750000

    def test_dispatch_probes_exp_presence(self, spark, monkeypatch):
        import clickhouse_metrics_pipeline_spark.plans.promql as P

        class Hit(Exception):
            pass

        def _rec(q, df):
            raise Hit()

        monkeypatch.setattr(P, "_exp_hist_fraction_plan", _rec)
        rows = [("m", {"t": "x"}, self.T0, 1.0, 0, 1, 0.0, [(2, 4)], None)]
        with pytest.raises(Hit):
            compile_promql(self.Q, self._exp_frame(spark, rows))
        # exp columns present but all NULL: the probe says no native
        # histogram — fall through to the classic raw-value ladder
        null_rows = [
            ("m", {"t": "x"}, self.T0, 12.0, None, None, None, None, None),
            ("m", {"t": "x"}, self.T0, 3.0, None, None, None, None, None),
        ]
        out = compile_promql(
            self.Q, self._exp_frame(spark, null_rows)
        ).collect()
        assert out and out[0].value is not None


class TestScalarDivision:
    """r11 (r10 verdict's 'smaller text-path residuals'): scalar
    division `aggop / N`. The stored integer becomes sign-truncated
    (value x 1e6) DIV N through the exact decimal divider; the
    encoding gains a composite '<base>/ppm' label whose scale is
    base_scale x 1e6 — so the HTTP raw-unit decode reads back
    raw(value)/N, PromQL's `vector / N`."""

    import datetime as _dt

    T0 = _dt.datetime(2026, 1, 1)

    def _series(self, spark, values):
        import datetime as dt

        rows = [
            (
                "events", {"t": "a"},
                self.T0 + dt.timedelta(minutes=i), float(v), i,
            )
            for i, v in enumerate(values)
        ]
        return spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )

    def test_cents_division_golden(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            output_encoding,
            result_scale,
        )

        q = parse("sum by (t) (sum_over_time(events[1h])) / 60")
        assert output_encoding(q) == "value_x100/ppm"
        assert result_scale(q) == 100 * 10**6
        # sum 1..5 = 15 raw = 1500 cents; floor(1500e6/60) = 25e6;
        # raw read-back 25e6 / 1e8 = 0.25 = 15/60
        out = compile_promql(q, self._series(spark, [1, 2, 3, 4, 5]))
        assert out.collect()[0].value == 25_000_000

    def test_sign_truncates_toward_zero(self, spark):
        # delta can go negative: values 10 -> 3 over the window gives
        # -7 raw = -700 cents; sign-truncated: -floor(700e6/3000)
        q = parse("sum by (t) (delta(events[1h])) / 3000")
        out = compile_promql(q, self._series(spark, [10, 3])).collect()
        # delta extrapolates: hand-check only sign/truncation identity
        v = out[0].value
        q0 = parse("sum by (t) (delta(events[1h]))")
        base = compile_promql(
            q0, self._series(spark, [10, 3])
        ).collect()[0].value
        assert base < 0 and v < 0
        assert v == -((abs(base) * 10**6) // 3000)

    def test_micro_encoding_division(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            output_encoding,
            result_scale,
        )

        q = parse("sum by (t) (rate(events[1h])) / 2")
        assert output_encoding(q) == "rate_micro/ppm"
        assert result_scale(q) == 10**6 * 10**6
        base = compile_promql(
            parse("sum by (t) (rate(events[1h]))"),
            self._series(spark, [1, 2, 3]),
        ).collect()[0].value
        halved = compile_promql(
            q, self._series(spark, [1, 2, 3])
        ).collect()[0].value
        assert halved == (base * 10**6) // 2

    def test_http_raw_unit_decode(self, spark):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            result_scale,
        )
        from clickhouse_metrics_pipeline_spark.plans.promql_http import (
            promql_result_payload,
        )

        q = parse("sum by (t) (sum_over_time(events[1h])) / 60")
        payload = promql_result_payload(
            compile_promql(q, self._series(spark, [1, 2, 3, 4, 5])),
            scale=result_scale(q),
        )
        vals = payload["data"]["result"][0]["values"]
        assert [v for _, v in vals] == ["0.25"]  # 15 / 60

    def test_rejections(self):
        with pytest.raises(PromQLError):
            parse("sum by (t) (count_over_time(events[1h])) / 0")
        with pytest.raises(PromQLError):
            parse("count_over_time(events[1h]) / 60")  # bare side
        with pytest.raises(PromQLError):
            # fractional divisor stays outside the exactness contract
            parse("sum by (t) (count_over_time(events[1h])) / 1.5")

    def test_division_side_cannot_enter_binop(self):
        # a '/ N' side carries a composite encoding no other side can
        # match — the combination fails at parse time, not silently
        with pytest.raises(PromQLError):
            parse(
                "sum by (t) (count_over_time(events[1h])) / 60 "
                "+ sum by (t) (count_over_time(events[1h]))"
            )

    def test_vfn_then_division_stays_rejected(self):
        # the vfn grammar ends the expression — no trailing scalar of
        # any kind composes after clamp/abs (pre-existing subset
        # boundary, unchanged by the '/' addition)
        with pytest.raises(PromQLError):
            parse(
                "clamp_min(sum by (t) (sum_over_time(events[1h])), 20)"
                " / 60"
            )


class TestScalarDivisionProperty:
    """Parse-level property for '/ N' (r11): any nonzero integer
    divisor parses, the composite encoding is the side's label +
    '/ppm', and the whole-query scale is base_scale x 1e6 — N never
    enters the scale (it lives in the stored value)."""

    from hypothesis import given, settings, strategies as st

    _FNS = {
        "count_over_time": "count",
        "sum_over_time": "value_x100",
        "rate": "rate_micro",
    }

    # divisors are positive: the lexer has no signed numbers (the
    # same pre-existing boundary as '+ - *' scalars)
    @given(
        fn=st.sampled_from(sorted(_FNS)),
        n=st.integers(1, 10**6),
    )
    @settings(max_examples=60, deadline=None)
    def test_divisor_round_trip(self, fn, n):
        from clickhouse_metrics_pipeline_spark.plans.promql import (
            encoding_scale,
            output_encoding,
            result_scale,
        )

        q = parse(
            f"sum by (event_type) ({fn}(events[1h])) / {n}"
        )
        assert q.scalar_op == "/" and q.scalar == n
        base = self._FNS[fn]
        assert output_encoding(q) == base + "/ppm"
        assert result_scale(q) == encoding_scale(base) * 10**6


class TestExpFractionMassLaws:
    """Batched mass-law check for exp_histogram_fraction (r11): 200
    seeded random histograms (scales -1/0/1, indexes 0..5, counts
    1..9, zero-counts 0..3, optional negative buckets) evaluated in
    ONE Spark pass. Bounds 4 and 16 are bucket edges at every one of
    those scales (powers of two), so each mass term is integer-exact
    and the only slack is the ppm floor per part:
    - frac(0, inf) == 1_000_000 exactly on any nonempty histogram;
    - the three-way partition frac(0,4) + frac(4,16) + frac(16,inf)
      recovers 1e6 minus at most 3 (one floor per part);
    - every part sits in [0, 1e6]."""

    def test_partition_of_unity(self, spark):
        import random

        from pyspark.sql import functions as F

        from clickhouse_metrics_pipeline_spark.functions.histogram import (
            exp_histogram_fraction,
        )

        rng = random.Random(1123)
        rows = []
        for i in range(200):
            scale = rng.choice([-1, 0, 1])
            npos = rng.randint(1, 4)
            idxs = rng.sample(range(6), npos)
            pos = [(j, rng.randint(1, 9)) for j in sorted(idxs)]
            neg = (
                [(rng.randint(0, 3), rng.randint(1, 5))]
                if rng.random() < 0.3
                else None
            )
            rows.append((i, scale, rng.randint(0, 3), pos, neg))
        df = spark.createDataFrame(
            rows,
            "id int, scale int, zc bigint, "
            "pos array<struct<index:int,count:bigint>>, "
            "neg array<struct<index:int,count:bigint>>",
        )

        def frac(lo, hi, name):
            return exp_histogram_fraction(
                "scale", "zc", "pos", "neg", lo, hi
            ).alias(name)

        out = df.select(
            "id",
            frac(0.0, float("inf"), "whole"),
            frac(0.0, 4.0, "p1"),
            frac(4.0, 16.0, "p2"),
            frac(16.0, float("inf"), "p3"),
        ).collect()
        assert len(out) == 200
        for r in out:
            assert r.whole == 1_000_000, r
            for part in (r.p1, r.p2, r.p3):
                assert 0 <= part <= 1_000_000, r
            total = r.p1 + r.p2 + r.p3
            assert 1_000_000 - 3 <= total <= 1_000_000, r


class TestRateFraction:
    """r11: rate()/increase() inside histogram_fraction — Prometheus's
    canonical native-histogram fraction spelling. Classic stored
    buckets route through the shared rated merge +
    ``bucket_fraction_ppm`` (exact rational over micro-rate counts);
    exp columns route to the rated min-scale merge + two-bound mass
    difference; a gauge is a clear 400. Goldens derive on the
    micro-rate lattice: the 0/10/20-min fixture extrapolates to
    increase = 1.25 x delta, so increases are micro-exact (le10 ->
    5_000_000, le50 -> 7_500_000) while the rate form's counts are
    round(inc/3600 x 1e6) = (1389, 2083)."""

    import datetime as _dt

    T0 = _dt.datetime(2026, 1, 1)

    def _classic(self, spark):
        import datetime as dt

        rows = [
            (
                "m", {"t": "x"},
                self.T0 + dt.timedelta(minutes=10 * i), float(i),
                [(10.0, 2 * (i + 1)), (50.0, 3 * (i + 1))],
            )
            for i in range(3)
        ]
        return spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, "
            "buckets array<struct<le:double,count:bigint>>",
        )

    def _exp(self, spark):
        import datetime as dt

        rows = [
            (
                "m", {"t": "x"},
                self.T0 + dt.timedelta(minutes=10 * i), float(i),
                0, 1 * (i + 1), 0.0,
                [(1, 4 * (i + 1)), (3, 2 * (i + 1))], None,
            )
            for i in range(3)
        ]
        return spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, exp_scale int, "
            "exp_zero_count bigint, exp_zero_threshold double, "
            "exp_positive_buckets array<struct<index:int,count:bigint>>, "
            "exp_negative_buckets array<struct<index:int,count:bigint>>",
        )

    @pytest.mark.parametrize(
        "q, want",
        [
            # rate counts (1389, 2083), total 3472:
            # frac(10,50) = floor(2083e6/3472) = 599_942
            ("histogram_fraction(10, 50, sum by (t) (rate(m[1h])))",
             599942),
            # frac(0,10) = floor(1389e6/3472) = 400_057... compute:
            # 1389*1e6//3472 = 400_057 — pin the computed value below
            # increase counts are micro-exact -> clean thirds
            ("histogram_fraction(10, 50, sum by (t) (increase(m[1h])))",
             600000),
            ("histogram_fraction(0, 10, sum by (t) (increase(m[1h])))",
             400000),
            # off-ladder B=30 interpolates on the increase lattice:
            # X30/D = 5e6 + 7.5e6*20/40 = 8.75e6 -> 700_000
            ("histogram_fraction(0, 30, sum by (t) (increase(m[1h])))",
             700000),
            # and on the rate lattice: X = 1389*40 + 2083*20 = 97_220,
            # ppm = floor(97_220e6 / (3472*40)) = 700_028
            ("histogram_fraction(0, 30, sum by (t) (rate(m[1h])))",
             700028),
        ],
    )
    def test_classic_rate_fraction_goldens(self, spark, q, want):
        out = compile_promql(q, self._classic(spark)).collect()
        assert len(out) == 1 and out[0].value == want

    def test_exp_rate_fraction_golden(self, spark):
        # increases: zero 2.5e6, (2,4] 1e7, (8,16] 5e6; total 17.5e6
        # frac(4,16) = 5e6/17.5e6 -> floor = 285_714
        q = "histogram_fraction(4, 16, sum by (t) (increase(m[1h])))"
        out = compile_promql(q, self._exp(spark)).collect()
        assert len(out) == 1 and out[0].value == 285714

    def test_exp_route_hits_exp_plan(self, spark, monkeypatch):
        import clickhouse_metrics_pipeline_spark.plans.promql as P

        class Hit(Exception):
            pass

        def _rec(q, df):
            assert q.func == "rate" and q.frac_lo == 4.0
            raise Hit()

        monkeypatch.setattr(P, "_exp_rate_fraction_plan", _rec)
        q = "histogram_fraction(4, 16, sum by (t) (rate(m[1h])))"
        with pytest.raises(Hit):
            compile_promql(q, self._exp(spark))

    def test_gauge_is_clear_400(self, spark):
        helper = TestQuantileDispatchMatrix()
        df = helper._frame(spark, "null", "null")
        q = "histogram_fraction(10, 50, sum by (t) (rate(m[1h])))"
        with pytest.raises(PromQLError, match="rate.*form of histogram_fraction"):
            compile_promql(q, df)

    def test_count_form_unchanged(self, spark):
        # the pre-r11 count_over_time fraction still takes the
        # raw-sample ladder path on a plain value frame
        import datetime as dt

        rows = [
            ("m", {"t": "x"}, self.T0 + dt.timedelta(minutes=i),
             float(v), i)
            for i, v in enumerate([5.0, 30.0, 60.0, 300.0])
        ]
        df = spark.createDataFrame(
            rows,
            "metric string, attributes map<string,string>, "
            "ts timestamp, value double, sample_id long",
        )
        q = "histogram_fraction(10, 50, sum by (t) (count_over_time(m[1h])))"
        out = compile_promql(q, df).collect()
        assert out[0].value == 250000  # 1 of 4 samples in (10, 50]
