from clickhouse_metrics_pipeline_spark.operators.temporality import (
    convert_to_delta,
    convert_to_cumulative,
    detect_resets,
)
from clickhouse_metrics_pipeline_spark.operators.validate import (
    split_valid_invalid,
    validate,
)

__all__ = [
    "convert_to_delta",
    "convert_to_cumulative",
    "detect_resets",
    "split_valid_invalid",
    "validate",
]
