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


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (optionally bucket-sorted) managed table.

    Bucketing is the co-located-join lever the plain parquet path can't
    offer: two tables bucketed on the same key with the same bucket
    count join WITHOUT a shuffle on either side - at 100 TB that turns
    the nightly fact-fact joins (lineitem x orders on orderkey, raw x
    rollup on series_hash) from the dominant exchange into a local
    zipper per bucket. ClickHouse gets the same effect from sharing one
    ORDER BY prefix across tables (``internal/clickhouse/schema.sql``);
    parquet's equivalent is the metastore bucket spec. Requires
    ``saveAsTable`` (bucket metadata lives in the catalog, not the
    files) - plain ``.parquet(path)`` silently drops the bucket spec."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
