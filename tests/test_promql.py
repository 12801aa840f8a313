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
            "rate(events[5m])",  # outside the subset (dedicated kernel)
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


class TestCompile:
    def _series(self, spark):
        return events_as_series(spark.read.parquet(f"{SF}/events.parquet"))

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
