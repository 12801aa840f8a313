"""Materialize every stored index for a corpus — the ingest-time job.

A 100 TB deployment computes fingerprints, signatures, band tables,
verified pair tables, Bloom filters, and trained ANN indexes ONCE per
corpus (reference analog: the schema's precomputed MV tables,
schema.sql:146-192) and every query probes the stored artifact. This
CLI runs that job: it builds each index kind registered in
workloads.dedup_index plus the trained IVF and PQ indexes, writes them
under the index root, and prints one JSON line per artifact.

Usage:
    SPARK_GRAFT_INDEX_DIR=/path python tools/build_indexes.py [--sf-dir DIR]
    python tools/build_indexes.py --root /path [--sf-dir DIR] [--kinds a,b]

Subsequent sessions with $SPARK_GRAFT_INDEX_DIR set load the tables
instead of rebuilding (pinned hash-identical in
tests/test_stored_index.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dedup_index kinds, dependency-ordered: derived kinds (grams3_df50,
# pairs08*, grams8_srcsets, bloom20eval) reuse the memoized base builds
DEDUP_KINDS = [
    "grams3",
    "grams8",
    "md5grams2",
    "md5grams8",
    "grams3_df50",
    "bands64x16",
    "bands64x32",
    "simhash60",
    "exact_keepers",
    "kmv_src128",
    "grams8_train",
    "grams8_srcsets",
    "bloom20eval",
    "pairs08",
    "pairs08_even",
    "embpairs045",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument(
        "--root", default=os.environ.get("SPARK_GRAFT_INDEX_DIR")
    )
    ap.add_argument(
        "--kinds",
        default=None,
        help="comma-separated subset (default: every kind + ivf/pq float + int)",
    )
    args = ap.parse_args()
    if not args.root:
        ap.error("no index root: pass --root or set SPARK_GRAFT_INDEX_DIR")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = args.root

    from clickhouse_metrics_pipeline_spark.session import get_spark
    from clickhouse_metrics_pipeline_spark.workloads import store_dedup_index
    from clickhouse_metrics_pipeline_spark.workloads_ext import store_ivf_index
    from clickhouse_metrics_pipeline_spark.workloads_ext4 import store_pq_index
    from clickhouse_metrics_pipeline_spark.workloads_ext5 import (
        store_ivf_int_index,
        store_pq_int_index,
    )

    spark = get_spark(app_name="cmp-spark-build-indexes")
    spark.sparkContext.setLogLevel("ERROR")

    wanted = (
        args.kinds.split(",")
        if args.kinds
        else DEDUP_KINDS + ["ivf", "pq", "ivf_int", "pq_int"]
    )
    for kind in wanted:
        t0 = time.time()
        if kind == "ivf":
            path = list(store_ivf_index(spark, args.sf_dir, root=args.root))
        elif kind == "pq":
            path = list(store_pq_index(spark, args.sf_dir, root=args.root))
        elif kind == "ivf_int":
            path = list(store_ivf_int_index(spark, args.sf_dir, root=args.root))
        elif kind == "pq_int":
            path = list(store_pq_int_index(spark, args.sf_dir, root=args.root))
        else:
            path = store_dedup_index(spark, args.sf_dir, kind, root=args.root)
        print(
            json.dumps(
                {"kind": kind, "path": path, "sec": round(time.time() - t0, 2)}
            )
        )


if __name__ == "__main__":
    main()
