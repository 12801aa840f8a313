"""Isolated per-query measurement for the r11/r12 optimization rounds.

Times each named query with the bench's exact protocol (cold + 2 warm
``.count()`` runs in one shared session, min-of-two-warm reported) and
additionally with the guide-§1.4 noop sink (computes every column,
bypasses count's column pruning), and writes the ``.explain("formatted")``
output to plans/r11/<name>_<tag>.txt.

Usage:
    python tools/opt_measure.py <tag> <query> [query ...]

``tag`` is typically "before" or "after". Job descriptions are set per
query (guide §1.5) so a Spark UI attached to the session stays readable.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from clickhouse_metrics_pipeline_spark.session import get_spark
    from clickhouse_metrics_pipeline_spark.workloads import QUERIES

    spark = get_spark(app_name="cmp-spark-opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: parquet footers + Python worker pool
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _warm(x):
        return x * 1.0

    spark.range(0, 64, 1, 32).select(_warm("id")).count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name} [{tag}] cold")
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        cold = round(time.time() - t0, 3)
        warms = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"{name} [{tag}] warm{i}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            warms.append(round(time.time() - t0, 3))
        noops = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"{name} [{tag}] noop{i}")
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            noops.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        out[name] = {
            "cold": cold,
            "warm": min(warms),
            "warm_samples": warms,
            "noop": min(noops),
            "noop_samples": noops,
            "rows": n,
        }
        print(f"# {name} [{tag}]: warm={min(warms)} noop={min(noops)} "
              f"cold={cold} rows={n}", file=sys.stderr)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
