from clickhouse_metrics_pipeline_spark.plans.matchers import (
    LabelMatcher,
    compile_matchers,
)
from clickhouse_metrics_pipeline_spark.plans.router import select_resolution
from clickhouse_metrics_pipeline_spark.plans.remote_read import (
    MetricsCatalog,
    read_request,
)

__all__ = [
    "LabelMatcher",
    "compile_matchers",
    "select_resolution",
    "MetricsCatalog",
    "read_request",
]
