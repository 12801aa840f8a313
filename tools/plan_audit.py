"""Physical-plan audit: one line per queries() entry summarizing the
Catalyst plan properties that matter at 100 TB.

For every query: scan count, parquet-pushed filter count, join strategy
histogram (broadcast / sort-merge / shuffled-hash / nested-loop), exchange
(shuffle) count, and Python (Arrow UDF) stage count. Counts are over the
formatted explain output, which under AQE prints the initial AND final
plan, so absolute numbers are ~2x the per-plan truth — compare queries
against each other, and watch for:

- SMJ on a dimension join (should be broadcast — add F.broadcast),
- NLJ anywhere unintentional (brute-force cosine baseline and scalar
  subqueries are the two intentional ones),
- pushed=0 on a query that filters a scanned column (pushdown lost),
- py>0 on a query with no pandas kernel (accidental Python fallback).

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")


def main() -> None:
    import importlib.util

    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location("entry", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = "/root/testdata/sf0.01"
    qs = m.queries()
    names = sys.argv[1:] or list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - audit tool, report and move on
            print(f"=== {name}: ERROR {str(e)[:120]}")
            continue
        counts = {
            "scans": plan.count("Scan parquet"),
            "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
            "BHJ": plan.count("BroadcastHashJoin"),
            "SMJ": plan.count("SortMergeJoin"),
            "SHJ": plan.count("ShuffledHashJoin"),
            "NLJ": plan.count("BroadcastNestedLoopJoin")
            + plan.count("CartesianProduct"),
            "exch": plan.count("Exchange"),
            "py": plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInPandas"),
        }
        line = " ".join(f"{k}={v}" for k, v in counts.items())
        print(f"{name:32s} {line}")
    spark.stop()


if __name__ == "__main__":
    main()
