"""Prometheus Remote Read semantics (Q2-Q4) over Spark tables.

Re-expresses ``pkg/promread/handler.go:125-225`` as one declarative plan:
route to a resolution table, filter with compiled matchers, project the
per-type sample value, re-cumulate delta sums PER SERIES (fixing the
reference's shared-accumulator flaw at handler.go:184-197), and assemble
one row per series with time-ordered samples.

The HTTP/snappy/protobuf edge (S7) is an API layer above the engine; this
module is the engine surface it calls.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_metrics_pipeline_spark.plans.matchers import (
    LabelMatcher,
    compile_matchers,
)
from clickhouse_metrics_pipeline_spark.plans.router import select_resolution
from clickhouse_metrics_pipeline_spark.schema import (
    METRIC_TYPE_GAUGE,
    METRIC_TYPE_HISTOGRAM,
    METRIC_TYPE_SUM,
    TEMPORALITY_DELTA,
)


@dataclass
class MetricsCatalog:
    """Resolution-table registry: name -> DataFrame (or path loader)."""

    tables: dict[str, DataFrame] = field(default_factory=dict)

    def get(self, name: str) -> DataFrame:
        if name not in self.tables:
            raise KeyError(f"table {name} not registered")
        return self.tables[name]


def _sample_value(value_col: str = "value") -> F.Column:
    """Per-type sample projection (Q2, handler.go:177-205).

    gauge -> value; sum -> value (delta sums are re-cumulated by the
    caller's window before this); histogram -> sum/count (mean).
    """
    t = F.col("metric_type")
    return (
        F.when(t == METRIC_TYPE_GAUGE, F.col(value_col))
        .when(t == METRIC_TYPE_SUM, F.col(value_col))
        .when(
            (t == METRIC_TYPE_HISTOGRAM)
            & F.col("count").isNotNull()
            & F.col("sum").isNotNull()
            & (F.col("count") > 0),
            F.col("sum") / F.col("count"),
        )
        .otherwise(F.lit(0.0))
    )


def read_request(
    catalog: MetricsCatalog,
    matchers: list[LabelMatcher],
    start_ms: int = 0,
    end_ms: int = 0,
    workspace_id: str | None = None,
    now_ms: int | None = None,
    limit: int = 100_000,
    value_col: str | None = None,
) -> DataFrame:
    """One Remote Read query -> DataFrame[labels, samples].

    labels: MAP<STRING,STRING> incl. __name__ (Q4, handler.go:323-339)
    samples: ARRAY<STRUCT<timestamp, value>> in time order (Q3).
    """
    table = select_resolution(start_ms, end_ms, now_ms)
    df = catalog.get(table)
    if value_col is None:
        value_col = "value" if "value" in df.columns else "value_last"

    df = df.filter(compile_matchers(matchers, workspace_id, start_ms, end_ms)).limit(
        limit
    )

    # Q2 with the per-series re-cumulation fix: delta sums get a running
    # sum windowed by series_hash (not a process-global accumulator).
    w = (
        Window.partitionBy("series_hash")
        .orderBy("timestamp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_delta_sum = (F.col("metric_type") == METRIC_TYPE_SUM) & (
        F.col("temporality") == TEMPORALITY_DELTA
    )
    df = df.withColumn(
        "_value",
        F.when(is_delta_sum, F.sum(value_col).over(w)).otherwise(F.col(value_col)),
    )
    df = df.withColumn("_sample", _sample_value("_value"))

    labels = F.map_concat(
        F.create_map(F.lit("__name__"), F.col("metric")),
        F.coalesce(F.col("attributes"), F.expr("map()")),
    )
    # Series assembly (Q3, handler.go:137-220): group by full label set.
    return (
        df.withColumn("labels", labels)
        .groupBy("series_hash", "labels")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("timestamp"), F.col("_sample").alias("value")))
            ).alias("samples")
        )
        .drop("series_hash")
    )
