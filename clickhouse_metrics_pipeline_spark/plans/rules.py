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

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    return ((num - num % den) / den).cast("bigint")


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
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    base = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour" if grain == "1 hour" else "minute", ts_col).alias(
            "bucket_ts"
        ),
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

    mag = F.floor(
        (F.lit(200) * F.abs(F.col("c")) + F.col("n")) / (F.lit(2) * F.col("n"))
    ).cast("bigint")
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
