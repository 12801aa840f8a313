"""PromQL-subset front-end: text query -> Catalyst plan.

The reference's query surface stops at Prometheus matcher lists
compiled to SQL (``pkg/promread/handler.go:227-302``); the text
queries users actually type are PromQL. This module adds the missing
front-end for a well-defined subset, compiled onto the same engine
kernels the catalog queries use:

    expr     := aggop | call
    aggop    := ('sum'|'avg'|'min'|'max'|'count')
                'by' '(' label (',' label)* ')' '(' call ')'
    call     := fname '(' selector '[' N ('m'|'h') ']' ')'
    fname    := 'count_over_time' | 'sum_over_time' | 'avg_over_time'
              | 'min_over_time' | 'max_over_time' | 'delta'
    selector := name ( '{' matcher (',' matcher)* '}' )?
    matcher  := label ('=' | '!=' | '=~' | '!~') '"' value '"'

Evaluation model: RANGE queries at the bucket grain — the range
``[1h]`` is both the lookback and the step, so the result is one row
per (series labels / by-labels, window), the shape the rollup MVs and
Remote Read serve. Matchers compile through the same
``plans.matchers`` kernel (F8-F10) Remote Read uses, inheriting the
absent-label-matches-NEQ/NRE Prometheus semantics.

Exactness contract (same as the catalog): every emitted value is an
integer — counts, integer cents (sum/min/max/delta), or half-up
value*10000 (avg) — so compiled queries hash identically on any
engine. ``rate``/``increase``/histogram quantiles are deliberately NOT
in the subset: their full-fidelity semantics (extrapolation, reset
correction, bucket interpolation) live in the dedicated kernels
(events_rate_5m, bucket_percentile_scaled) and a lossy re-derivation
here would shadow them.

Series frame contract: a DataFrame with (metric STRING,
attributes MAP<STRING,STRING>, ts TIMESTAMP, value DOUBLE) plus an
optional ``sample_id`` (any orderable unique-per-sample column) — the
metrics_raw projection; ``events_as_series`` adapts the events table
and carries ``event_id`` as the sample_id. When present, sample_id
joins ``ts`` in every order-sensitive kernel (``delta``'s
min_by/max_by) so results are deterministic even when a series has two
samples at the same timestamp; without it, delta requires unique
timestamps per series.

Regex matcher semantics: ``=~``/``!~`` values are anchored as
``^(?:re)$`` — real PromQL's fully-anchored matching. This
deliberately DIVERGES from the matcher kernel's unanchored rlike
(which mirrors the reference's ClickHouse ``match()``,
``handler.go:227-302``): users typing PromQL text expect PromQL
anchoring; the Remote Read wire path keeps reference semantics.

Scale: a compiled plan is selector pushdown (metric equality +
attribute predicates at the scan) -> one shuffle to the
(series, window) grain -> optional tiny re-aggregation to the
by-labels — the same template every hand-built rollup query follows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.functions.histogram import (
    _floordiv_exact,
)
from clickhouse_metrics_pipeline_spark.plans.matchers import (
    LabelMatcher,
    MatchType,
    compile_matchers,
)

_FUNCS = (
    "count_over_time",
    "sum_over_time",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "delta",
)
_AGGS = ("sum", "avg", "min", "max", "count")

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<ident>[a-zA-Z_:][a-zA-Z0-9_:]*)"
    r"|(?P<str>\"(?:[^\"\\]|\\.)*\")"
    r"|(?P<num>\d+)"
    r"|(?P<op>=~|!~|!=|=|\{|\}|\(|\)|\[|\]|,))"
)

_OPS = {"=": MatchType.EQ, "!=": MatchType.NEQ, "=~": MatchType.RE, "!~": MatchType.NRE}


@dataclass(frozen=True)
class PromQuery:
    """Parsed form: optional aggregation over one range-function call."""

    func: str
    metric: str
    matchers: tuple[LabelMatcher, ...]
    range_s: int
    agg: str | None = None
    by: tuple[str, ...] = field(default_factory=tuple)


class PromQLError(ValueError):
    pass


_ESCAPES = {"\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r"}


def _unquote(raw: str) -> str:
    """Decode a quoted matcher value with a real escape pass: ``\\\\``
    before ``\\\"`` (a single str.replace mis-decodes ``\\\\\"``)."""
    body, out, i = raw[1:-1], [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise PromQLError(f"unexpected input at: {text[pos:]!r}")
            break
        pos = m.end()
        for kind in ("ident", "str", "num", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def eat(self, kind=None, value=None):
        k, v = self.peek()
        if k is None or (kind and k != kind) or (value and v != value):
            raise PromQLError(
                f"expected {value or kind}, got {v!r} at token {self.i}"
            )
        self.i += 1
        return v

    def parse(self) -> PromQuery:
        k, v = self.peek()
        if k == "ident" and v in _AGGS:
            agg = self.eat("ident")
            self.eat("ident", "by")
            self.eat("op", "(")
            by = [self.eat("ident")]
            while self.peek() == ("op", ","):
                self.eat("op", ",")
                by.append(self.eat("ident"))
            self.eat("op", ")")
            self.eat("op", "(")
            q = self._call()
            self.eat("op", ")")
            q = PromQuery(
                q.func, q.metric, q.matchers, q.range_s, agg, tuple(by)
            )
        else:
            q = self._call()
        if self.i != len(self.toks):
            raise PromQLError(f"trailing input from token {self.i}")
        return q

    def _call(self) -> PromQuery:
        fname = self.eat("ident")
        if fname not in _FUNCS:
            raise PromQLError(
                f"unsupported function {fname!r} (subset: {_FUNCS}; "
                "rate/increase/histogram_quantile live in the dedicated "
                "kernels)"
            )
        self.eat("op", "(")
        metric = self.eat("ident")
        matchers: list[LabelMatcher] = []
        if self.peek() == ("op", "{"):
            self.eat("op", "{")
            while self.peek() != ("op", "}"):
                name = self.eat("ident")
                op = self.eat("op")
                if op not in _OPS:
                    raise PromQLError(f"bad matcher op {op!r}")
                raw = self.eat("str")
                val = _unquote(raw)
                if _OPS[op] in (MatchType.RE, MatchType.NRE):
                    # PromQL fully anchors regex matchers (see module
                    # docstring for the documented divergence from the
                    # unanchored Remote Read matcher kernel).
                    val = f"^(?:{val})$"
                matchers.append(LabelMatcher(_OPS[op], name, val))
                if self.peek() == ("op", ","):
                    self.eat("op", ",")
            self.eat("op", "}")
        self.eat("op", "[")
        n = int(self.eat("num"))
        unit = self.eat("ident")
        if unit not in ("m", "h"):
            raise PromQLError(f"range unit must be m or h, got {unit!r}")
        self.eat("op", "]")
        self.eat("op", ")")
        return PromQuery(
            fname,
            metric,
            tuple(matchers),
            n * (60 if unit == "m" else 3600),
        )


def parse(text: str) -> PromQuery:
    return _Parser(_tokenize(text)).parse()


def events_as_series(events: DataFrame) -> DataFrame:
    """Adapt the driver's events table to the series-frame contract:
    metric 'events', labels {event_type, user}; event_id rides along
    as the unique sample_id tiebreaker for order-sensitive kernels."""
    return events.select(
        F.lit("events").alias("metric"),
        F.map_from_arrays(
            F.array(F.lit("event_type"), F.lit("user")),
            F.array(F.col("event_type"), F.col("user_id").cast("string")),
        ).alias("attributes"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("sample_id"),
    )


def _cents(c: Column) -> Column:
    return F.round(c * 100).cast("bigint")


def compile_promql(query: str | PromQuery, series: DataFrame) -> DataFrame:
    """Compile the parsed query onto a series frame. Output columns:
    the by-labels (or ``labels`` map for unaggregated calls),
    ``bucket_ts``, and ``value`` (BIGINT; see the exactness contract
    in the module docstring)."""
    q = parse(query) if isinstance(query, str) else query
    df = series.where(F.col("metric") == q.metric)
    if q.matchers:
        df = df.where(compile_matchers(list(q.matchers)))
    bucket = F.window("ts", f"{q.range_s} seconds").alias("w")
    c = _cents(F.col("value"))
    # sample_id (when the frame carries one) makes min_by/max_by
    # deterministic under equal-ts samples — the exactness contract
    order_key = (
        F.struct("ts", "sample_id")
        if "sample_id" in df.columns
        else F.struct("ts")
    )
    per_series = df.groupBy(F.col("attributes").alias("labels"), bucket)

    if q.func == "count_over_time":
        g = per_series.agg(F.count(F.lit(1)).alias("value"))
    elif q.func == "sum_over_time":
        g = per_series.agg(F.sum(c).alias("value"))
    elif q.func == "min_over_time":
        g = per_series.agg(F.min(c).alias("value"))
    elif q.func == "max_over_time":
        g = per_series.agg(F.max(c).alias("value"))
    elif q.func == "avg_over_time":
        g = per_series.agg(
            F.sum(c).alias("_c"), F.count(F.lit(1)).alias("_n")
        )
        # exact decimal route — BIGINT/BIGINT double division loses
        # ULPs past 2^53 (same fix as plans/rules.py)
        mag = _floordiv_exact(
            F.lit(200) * F.abs(F.col("_c")) + F.col("_n"),
            F.lit(2) * F.col("_n"),
        )
        g = g.select(
            "labels",
            "w",
            F.when(F.col("_c") < 0, -mag).otherwise(mag).alias("value"),
        )
    elif q.func == "delta":
        g = per_series.agg(
            (F.max_by(c, order_key) - F.min_by(c, order_key)).alias("value")
        )
    else:  # pragma: no cover — parser rejects unknown funcs
        raise PromQLError(f"unreachable func {q.func}")

    g = g.select(
        "labels", F.col("w.start").alias("bucket_ts"), F.col("value")
    )
    if q.agg is None:
        return g
    keys = [
        F.coalesce(
            F.element_at(F.col("labels"), F.lit(k)), F.lit("")
        ).alias(k)
        for k in q.by
    ]
    agg_fn = {
        "sum": F.sum,
        "avg": None,
        "min": F.min,
        "max": F.max,
        "count": lambda _: F.count(F.lit(1)),
    }[q.agg]
    if q.agg == "avg":
        # half-up scaled mean of the per-series integer values
        out = (
            g.groupBy(*keys, "bucket_ts")
            .agg(F.sum("value").alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        mag = _floordiv_exact(
            F.lit(2) * F.abs(F.col("_s")) * F.lit(10000) + F.col("_n"),
            F.lit(2) * F.col("_n"),
        )
        return out.select(
            *q.by,
            "bucket_ts",
            F.when(F.col("_s") < 0, -mag).otherwise(mag).alias("value"),
        )
    return (
        g.groupBy(*keys, "bucket_ts")
        .agg(agg_fn(F.col("value")).cast("bigint").alias("value"))
    )
