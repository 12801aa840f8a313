"""Shared table loaders for the workload catalogs.

Lives outside workloads.py so workloads_ext.py (and any future catalog
module) can import it without a circular dependency on the catalog
import order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# r12 optimization (guide §1.2 step 2, driver side): ``spark.read
# .parquet`` costs 100-300 ms of driver work PER CALL (file listing,
# footer schema inference, py4j round trips) and every workload
# invocation paid it again for the same immutable input table. The
# memo below caches the constructed DataFrame — an analyzed logical
# PLAN over the parquet relation, never rows or results: every action
# on it still scans the parquet files. Keyed by the live SparkSession
# object (a restarted session builds fresh plans; stale entries of a
# stopped session can never be reached because the key holds the old
# session). The input dirs this loader serves are the driver's
# read-only test-data directories, so a cached file listing cannot go
# stale; workloads that write-and-re-read intermediates use their own
# tempdirs and never pass through here.
_FRAME_MEMO: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark, sf_dir, name)
    df = _FRAME_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _FRAME_MEMO[key] = df
    return df


def workload_plan_memo(fn):
    """Memoize a PURE ``(spark, sf_dir) -> DataFrame`` workload's plan
    construction. Differs from :func:`frame_memo` in one crucial way:
    the memoized DataFrame is the object the bench EXECUTES directly,
    so a hit returns ``cached.select("*")`` — a fresh Dataset over the
    cached logical plan — never the same object (re-executing one
    Dataset would let AQE reuse its already-materialized shuffle
    stages across runs, i.e. warm runs would skip recomputation).
    Only for workloads whose construction has NO side effects and NO
    data-dependent decisions (audited: the 22 TPC-H plan builders);
    workloads that write intermediates (events_rollup_incremental) or
    train in-session models (IVF/PQ) must never be wrapped."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (
            spark,
            sf_dir,
            "workload:" + fn.__module__ + "." + fn.__qualname__,
        )
        df = _FRAME_MEMO.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _FRAME_MEMO[key] = df
        return df.select("*")

    wrapper.__wrapped__ = fn
    return wrapper


def frame_memo(fn):
    """Memoize a ``(spark, sf_dir) -> DataFrame`` frame BUILDER by
    (session, dir): the constructed logical plan is cached, never rows
    — every action on the returned frame still computes from parquet.
    For the promql series-frame builders this removes 60-200 ms of
    per-invocation py4j construction on top of the `_t` read memo
    (same r12 rationale as the header comment above)."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (spark, sf_dir, fn.__module__ + "." + fn.__qualname__)
        df = _FRAME_MEMO.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _FRAME_MEMO[key] = df
        return df

    wrapper.__wrapped__ = fn
    return wrapper


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalized to a microsecond TimestampType.

    The driver's events.parquet stores TIMESTAMP(NANOS); Spark reads it as
    bigint nanos (legacy.parquet.nanosAsLong) - truncate to micros, same
    flooring DuckDB applies when surfacing ns timestamps to clients."""
    key = (spark, sf_dir, "events#ts-normalized")
    cached = _FRAME_MEMO.get(key)
    if cached is not None:
        return cached
    ev = _t(spark, sf_dir, "events")
    dt = dict(ev.dtypes)["ts"]
    if dt == "bigint":
        # integer `div`, NOT `/`: float division loses ULPs at 1e18 nanos
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        # micros-precision files read as NTZ; session tz is pinned UTC so
        # this cast is value-identity - gives every sf the same ts type
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    _FRAME_MEMO[key] = ev
    return ev


def value_cents(col="value"):
    """Exact integer-cents form of a 2-decimal double column — see
    oracle_fragments.sum_value_sql for why sums ride on this."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def sum_value(col="value"):
    """Order-independent exact sum of a 2-decimal value, rounded to 4.
    Column twin of oracle_fragments.sum_value_sql; S/100.0 has <= 2 true
    decimals so the round is boundary-free."""
    from pyspark.sql import functions as F

    return F.round(F.sum(value_cents(col)) / F.lit(100.0), 4)


def avg_from_cents(sum_cents, n):
    """Exact half-up 4-decimal average from pre-aggregated (cents,
    count) columns — sign(S) * floor((200 |S| + n)/(2 n)) / 10000,
    entirely free of float rounding boundaries; twin of
    avg_from_cents_sql (see oracle_fragments for the exactness
    argument). The magnitude form makes HALF_UP (round away from zero)
    hold for negative sums too — for S >= 0 it is identical to the
    plain floor((200 S + n)/(2 n)) form, so catalog hashes (all
    non-negative data) are unchanged; property-pinned against
    decimal.ROUND_HALF_UP over both signs in
    tests/test_properties.py."""
    from pyspark.sql import functions as F

    mag = F.floor(
        (F.lit(200) * F.abs(sum_cents) + n) / (F.lit(2) * n)
    )
    return F.when(sum_cents < 0, -mag).otherwise(mag) / F.lit(10000.0)


def avg_value(col="value"):
    """Order-independent exact average; twin of avg_value_sql."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return avg_from_cents(F.sum(value_cents(col)), F.count(c))
