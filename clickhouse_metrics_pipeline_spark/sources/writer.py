"""Storage write/read path (S4-S5) - parquet layout mirroring the
reference's MergeTree physical design (``internal/clickhouse/schema.sql``).

| ClickHouse mechanism                      | Spark/Parquet form here           |
|-------------------------------------------|-----------------------------------|
| PARTITION BY toDate(timestamp) (:70)      | write.partitionBy("date")         |
| ORDER BY (ws, metric, hash, ts) (:71)     | sortWithinPartitions(same)        |
| bloom_filter(0.01) on metric (:65)        | parquet.bloom.filter.enabled      |
| ZSTD(1) codecs (:4-62)                    | parquet zstd (session default)    |
| TTL _ttl (:72)                            | retention job (operators.rollup)  |

Partitioning by date + sorting within partitions gives Catalyst partition
pruning on time predicates and parquet row-group min/max skipping on
(workspaceId, metric, series_hash) - the same two pruning levers the
MergeTree sparse PK provides. At 100 TB: one date partition per day per
resolution; `repartition(date, hash(series))` before the sorted write
keeps files near the target size instead of one file per shuffle task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SORT_KEY = ["workspaceId", "metric", "series_hash", "timestamp"]


def write_metrics_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    target_files_per_day: int | None = None,
) -> None:
    """Write a metrics table partitioned by ingest date, sorted like the
    reference's ORDER BY, with a bloom filter on `metric`."""
    out = df.withColumn("date", F.to_date("timestamp"))
    if target_files_per_day:
        out = out.repartition(target_files_per_day, "date", "series_hash")
    (
        out.sortWithinPartitions(*SORT_KEY)
        .write.mode(mode)
        .option("parquet.bloom.filter.enabled#metric", "true")
        .option("parquet.bloom.filter.expected.ndv#metric", "100000")
        .partitionBy("date")
        .parquet(path)
    )


def read_metrics_table(spark: SparkSession, path: str) -> DataFrame:
    """Read back; the `date` partition column stays available for pruning."""
    return spark.read.parquet(path)
