"""Z-order layout (sources/writer.py zorder_value / write_zordered):
Morton-code correctness and the quantitative skipping claim — under a
Z-ordered layout, a point predicate on EITHER dimension overlaps far
fewer files' footer min/max ranges than under a one-dimension sort."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.sources.writer import (
    write_zordered,
    zorder_value,
)

SF = "/root/testdata/sf0.01"


def _interleave(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_python_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 1), (65535, 65535)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_value("a", "b", 16)
    )
    for r in df.collect():
        assert r.z == _interleave(r.a, r.b, 16), (r.a, r.b)


def _file_ranges(path: str, col: str):
    """(min, max) of ``col`` per parquet data file, from footer stats."""
    import os

    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                out.append((lo, hi))
    return out


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """events laid out by (user bucket, time bucket): a point query on
    the user dimension overlaps <= 40% of files (a time-sorted layout
    overlaps ALL of them), while time-dimension pruning survives within
    3x of the time-sorted layout's."""
    from clickhouse_metrics_pipeline_spark.tables import _events

    mask = F.lit(0xFFFF).cast("long")
    ev = _events(spark, SF).select(
        "event_id",
        F.xxhash64("user_id").bitwiseAND(mask).alias("ub"),
        (F.unix_timestamp("ts") / F.lit(60)).cast("long").alias("tm"),
    )
    tmin = ev.agg(F.min("tm")).collect()[0][0]
    ev = ev.withColumn("tb", (F.col("tm") - F.lit(tmin)).bitwiseAND(mask))
    n_files = 16

    zpath, tpath = str(tmp_path / "zorder"), str(tmp_path / "timesort")
    write_zordered(ev, zpath, "ub", "tb", n_files=n_files)
    (
        ev.repartitionByRange(n_files, "tb")
        .sortWithinPartitions("tb")
        .write.parquet(tpath)
    )

    def overlapping(path, col, point):
        ranges = _file_ranges(path, col)
        assert len(ranges) == n_files
        return sum(1 for lo, hi in ranges if lo <= point <= hi)

    user_point, time_point = 12345, 7000
    z_user = overlapping(zpath, "ub", user_point)
    t_user = overlapping(tpath, "ub", user_point)
    z_time = overlapping(zpath, "tb", time_point)
    t_time = overlapping(tpath, "tb", time_point)

    # time-sort: perfect on its own dimension, useless on the other
    assert t_time <= 2
    assert t_user == n_files
    # z-order: BOTH dimensions skip at least half the files (each dim
    # effectively gets ~half the z bits — the sqrt tradeoff that makes
    # the layout strictly better once queries filter on either dim)
    assert z_user <= 0.5 * n_files
    assert z_time <= 0.5 * n_files
