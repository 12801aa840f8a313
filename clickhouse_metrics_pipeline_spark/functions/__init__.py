from clickhouse_metrics_pipeline_spark.functions.histogram import (
    bucket_percentile,
    bucket_percentiles,
    delta_to_cumulative_buckets,
    cumulative_to_delta_buckets,
    merge_buckets_agg,
    exp_histogram_percentile,
)
from clickhouse_metrics_pipeline_spark.functions.hashing import (
    series_hash,
    series_key,
)

__all__ = [
    "bucket_percentile",
    "bucket_percentiles",
    "delta_to_cumulative_buckets",
    "cumulative_to_delta_buckets",
    "merge_buckets_agg",
    "exp_histogram_percentile",
    "series_hash",
    "series_key",
]
