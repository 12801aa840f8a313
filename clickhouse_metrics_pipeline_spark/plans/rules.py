"""Recording rules: named, periodically-materialized aggregates — the
Prometheus ``recording_rules`` / ClickHouse materialized-view-per-panel
surface. The reference materializes exactly three fixed MVs
(``schema.sql:146-192``); real deployments carry dozens of rule
definitions, so the engine evaluates a RULE SET, not a hard-coded view.

Execution contract (the part that matters at 100 TB): every rule in a
set evaluates from ONE scan and ONE shuffle — the engine aggregates the
stream to the finest requested grain once (per (event_type, window)
integer partials: count, cents sum), then derives each rule row-locally
or by re-aggregating the tiny partial relation (the rollup-cascade
trick: global-grain rules sum the per-type partials instead of
rescanning). Adding a rule never adds a scan.

Values are exact integers (counts, cents, truncated ppm) in long
format: (record, event_type NULL for global rules, bucket_ts, value) —
a shape any sink (parquet rollup table, Remote Read, alerting) consumes
uniformly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.functions.histogram import (
    _floordiv_exact,
)

# Fixed-duration grains only: months/years are variable-length and not
# window()-expressible; anything unparseable must raise, never silently
# fall back (a "1 day" rule set quietly producing per-minute partials
# was the round-5 defect here).
_GRAIN_RE = re.compile(
    r"^\s*\d+\s+(millisecond|second|minute|hour|day|week)s?\s*$",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class Rule:
    """One recording rule.

    agg:
      - ``count``          samples per (event_type, window)
      - ``sum_cents``      exact integer cents sum per (event_type, window)
      - ``avg_scaled``     half-up average, BIGINT value*10000
      - ``share_ppm``      this type's share of the window's samples (ppm)
      - ``error_ratio_ppm``  GLOBAL rule: error-type samples / all
                             samples per window (ppm), event_type NULL
    """

    record: str
    agg: str
    error_type: str = "error"


_SUPPORTED = ("count", "sum_cents", "avg_scaled", "share_ppm", "error_ratio_ppm")


def _trunc_div(num: Column, den: Column) -> Column:
    """Exact truncating division for non-negative operands.

    Routed through the DECIMAL(38,0) helper the percentile kernel uses:
    BIGINT/BIGINT would detour through DOUBLE and lose ULPs past 2^53,
    which breaks the 'hashes identically on any engine' contract once
    ppm numerators reach 1e6 x multi-billion-row window counts."""
    return _floordiv_exact(num, den)


def evaluate_rules(
    events: DataFrame,
    rules: list[Rule],
    grain: str = "1 hour",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Evaluate every rule from one pass; see module docstring."""
    for r in rules:
        if r.agg not in _SUPPORTED:
            raise ValueError(f"unsupported rule agg: {r.agg}")
    if not _GRAIN_RE.match(grain):
        raise ValueError(
            f"unsupported rule grain {grain!r}: need a fixed duration "
            "like '1 hour', '5 minutes', '1 day'"
        )
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    # F.window() handles ANY fixed duration (epoch-aligned tumbling
    # windows — identical to date_trunc for '1 hour'/'1 minute'), same
    # bucketing as the streaming twin.
    base = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.window(ts_col, grain)["start"].alias("bucket_ts"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("c"),
    )
    # window totals derived from the partials (no second scan); kept as
    # a window function so per-type rules can reference them row-locally
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket_ts")
    base = base.withColumn("n_window", F.sum("n").over(w))
    # the partials relation is tiny (types x windows) and EVERY rule
    # reads it: checkpoint so a multi-branch plan (per-type fan-out +
    # one aggregate per global rule) computes the scan + shuffle once.
    # Without this, Spark re-derives the aggregate per union branch —
    # the first cut showed scans = rules in the plan audit.
    base = base.localCheckpoint(eager=False)

    # half-up scaled mean, exact at any magnitude (DECIMAL(38,0) route —
    # BIGINT/BIGINT double division is only exact below 2^53)
    mag = _floordiv_exact(
        F.lit(200) * F.abs(F.col("c")) + F.col("n"), F.lit(2) * F.col("n")
    )
    per_type_exprs = {
        "count": F.col("n"),
        "sum_cents": F.col("c"),
        "avg_scaled": F.when(F.col("c") < 0, -mag).otherwise(mag),
        "share_ppm": _trunc_div(F.col("n") * F.lit(1_000_000), F.col("n_window")),
    }
    outs: list[DataFrame] = []
    per_type = [r for r in rules if r.agg in per_type_exprs]
    if per_type:
        # all per-type rules ride ONE row-local explode over the
        # partials — adding a rule adds an array element, not a branch
        fanout = F.array(
            *[
                F.struct(
                    F.lit(r.record).alias("record"),
                    per_type_exprs[r.agg].cast("bigint").alias("value"),
                )
                for r in per_type
            ]
        )
        outs.append(
            base.select(
                "event_type", "bucket_ts", F.explode(fanout).alias("_r")
            ).select("_r.record", "event_type", "bucket_ts", "_r.value")
        )
    for r in rules:
        if r.agg != "error_ratio_ppm":
            continue
        g = base.groupBy("bucket_ts").agg(
            F.sum("n").alias("_n"),
            F.sum(
                F.when(
                    F.col("event_type") == F.lit(r.error_type), F.col("n")
                ).otherwise(0)
            ).alias("_e"),
        )
        outs.append(
            g.select(
                F.lit(r.record).alias("record"),
                F.lit(None).cast("string").alias("event_type"),
                "bucket_ts",
                _trunc_div(F.col("_e") * F.lit(1_000_000), F.col("_n")).alias(
                    "value"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
