"""Validation / enrichment operators (F1-F7).

Mirrors ``internal/processor/processor.go:55-172``:

- drop: empty metric name; null/zero timestamp; timestamp > now+24h;
  timestamp < now-7d; gauge/sum without value; histogram with no count, no
  sum and no buckets; summary missing count or sum; unknown metric type.
- stamp: workspaceId (F2), _ttl = now + 3h (F3).
- exemplar cap: truncate to max_exemplars, or strip when disabled (F4).

The valid/invalid split is expressed as two filters over one scan; with
whole-stage codegen both run in a single pass when the caller materializes
them together (or use ``validate`` + observation metrics for the dropped
count, mirroring ``DroppedCount`` at processor.go:69).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.schema import (
    METRIC_TYPE_EXP_HISTOGRAM,
    METRIC_TYPE_GAUGE,
    METRIC_TYPE_HISTOGRAM,
    METRIC_TYPE_SUM,
    METRIC_TYPE_SUMMARY,
)

VALID_TYPES = [
    METRIC_TYPE_GAUGE,
    METRIC_TYPE_SUM,
    METRIC_TYPE_HISTOGRAM,
    METRIC_TYPE_SUMMARY,
    METRIC_TYPE_EXP_HISTOGRAM,
]


def valid_predicate(now: Column | None = None) -> Column:
    """Compound validity predicate (processor.go:120-172).

    ``now`` is injectable for deterministic tests; defaults to
    ``current_timestamp()``.
    """
    p = _validity_parts(now)
    return (
        p["name_ok"]
        & p["ts_not_null"]
        & p["ts_not_future"]
        & p["ts_not_stale"]
        & p["type_fields_ok"]
    )


def _validity_parts(now: Column | None = None) -> dict[str, Column]:
    """The named sub-predicates of validity (single source for both
    :func:`valid_predicate` and :func:`rejection_reason`)."""
    now = F.current_timestamp() if now is None else now
    t = F.col("metric_type")
    has_buckets = F.col("buckets").isNotNull() & (F.size("buckets") > 0)
    return {
        "name_ok": F.col("metric").isNotNull() & (F.col("metric") != ""),
        "ts_not_null": F.col("timestamp").isNotNull()
        & (F.col("timestamp") > F.to_timestamp(F.lit("1970-01-01 00:00:00"))),
        "ts_not_future": F.col("timestamp") <= now + F.expr("INTERVAL 24 HOURS"),
        "ts_not_stale": F.col("timestamp") >= now - F.expr("INTERVAL 7 DAYS"),
        "type_known": t.isin(*VALID_TYPES),
        "type_fields_ok": (
            F.when(
                t.isin(METRIC_TYPE_GAUGE, METRIC_TYPE_SUM),
                F.col("value").isNotNull(),
            )
            .when(
                t == METRIC_TYPE_HISTOGRAM,
                F.col("count").isNotNull() | F.col("sum").isNotNull() | has_buckets,
            )
            .when(
                t == METRIC_TYPE_SUMMARY,
                F.col("count").isNotNull() & F.col("sum").isNotNull(),
            )
            # Exp-histogram: the reference receiver only carries count/sum
            # (receiver/otlp.go:234-258); accept like histogram incl. exp
            # buckets.
            .when(
                t == METRIC_TYPE_EXP_HISTOGRAM,
                F.col("count").isNotNull()
                | F.col("sum").isNotNull()
                | (
                    F.col("exp_positive_buckets").isNotNull()
                    & (F.size("exp_positive_buckets") > 0)
                )
                | (
                    F.col("exp_negative_buckets").isNotNull()
                    & (F.size("exp_negative_buckets") > 0)
                )
                | (F.coalesce(F.col("exp_zero_count"), F.lit(0)) > 0),
            )
            .otherwise(F.lit(False))  # unknown type -> drop
        ),
    }


#: first-match reject reason codes, in the reference's check order
#: (processor.go:120-172 validates name, then timestamp, then fields)
REJECT_REASONS = [
    ("empty_metric_name", "name_ok"),
    ("null_or_epoch_timestamp", "ts_not_null"),
    ("timestamp_too_new", "ts_not_future"),
    ("timestamp_too_old", "ts_not_stale"),
    ("unknown_metric_type", "type_known"),
    ("missing_type_fields", "type_fields_ok"),
]


def rejection_reason(now: Column | None = None) -> Column:
    """First failing check's reason code (NULL for valid rows) — the
    dead-letter annotation. The reference only counts drops
    (``DroppedCount``, processor.go:69); reason codes are what an
    operator needs to act on a rising drop rate."""
    p = _validity_parts(now)
    reason: Column = F.lit(None).cast("string")
    for code, key in reversed(REJECT_REASONS):
        reason = F.when(
            ~F.coalesce(p[key], F.lit(False)), F.lit(code)
        ).otherwise(reason)
    return reason


def split_valid_invalid(
    df: DataFrame, now: Column | None = None
) -> tuple[DataFrame, DataFrame]:
    """Return (valid, dropped) DataFrames over one logical scan; the
    dropped side carries a ``reject_reason`` column (first failing
    check, see :data:`REJECT_REASONS`) — the dead-letter annotation."""
    pred = valid_predicate(now)
    dropped = df.filter(~F.coalesce(pred, F.lit(False))).withColumn(
        "reject_reason", rejection_reason(now)
    )
    return df.filter(pred), dropped


def validate(
    df: DataFrame,
    workspace_id: str,
    max_exemplars: int = 10,
    exemplars_enabled: bool = True,
    ttl: str = "3 hours",
    now: Column | None = None,
) -> DataFrame:
    """Full processor transform: validate + stamp + cap (processor.go:55-118).

    Order matches the reference: workspace stamp, validation filter, TTL
    stamp, exemplar cap.
    """
    now_col = F.current_timestamp() if now is None else now
    out = df.withColumn("workspaceId", F.lit(workspace_id))  # F2 processor.go:62
    out = out.filter(valid_predicate(now))  # F1
    out = out.withColumn("_ttl", now_col + F.expr(f"INTERVAL {ttl}"))  # F3 processor.go:98
    if not exemplars_enabled:
        cap = F.lit(None).cast(df.schema["exemplars"].dataType)
    else:
        cap = F.when(
            F.size("exemplars") > max_exemplars,
            F.slice("exemplars", 1, max_exemplars),
        ).otherwise(F.col("exemplars"))
    out = out.withColumn("exemplars", cap)  # F4 processor.go:100-104
    return out
