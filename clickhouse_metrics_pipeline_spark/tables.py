"""Shared table loaders for the workload catalogs.

Lives outside workloads.py so workloads_ext.py (and any future catalog
module) can import it without a circular dependency on the catalog
import order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalized to a microsecond TimestampType.

    The driver's events.parquet stores TIMESTAMP(NANOS); Spark reads it as
    bigint nanos (legacy.parquet.nanosAsLong) - truncate to micros, same
    flooring DuckDB applies when surfacing ns timestamps to clients."""
    ev = _t(spark, sf_dir, "events")
    dt = dict(ev.dtypes)["ts"]
    if dt == "bigint":
        # integer `div`, NOT `/`: float division loses ULPs at 1e18 nanos
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        # micros-precision files read as NTZ; session tz is pinned UTC so
        # this cast is value-identity - gives every sf the same ts type
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev
