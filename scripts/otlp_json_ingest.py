"""Runnable OTLP-JSON ingest adapter — the demo loop the reference runs
as a gRPC service (``internal/receiver/otlp.go:42-89`` +
``scripts/run_tests.sh`` seeded flow), re-expressed as a file-drop
Structured Streaming job.

Usage:
    python scripts/otlp_json_ingest.py DROP_DIR OUT_DIR CKPT_DIR \
        [--workspace W] [--trigger-seconds N] [--drain]

Drop OTLP/JSON ExportRequest files (one JSON object per line — the
OpenTelemetry collector ``file`` exporter format, or any dump of a
/v1/metrics JSON body) into DROP_DIR; validated, delta-converted rows
land in OUT_DIR as date-partitioned parquet. ``--drain`` processes
whatever is in DROP_DIR and exits (catch-up mode); without it the job
keeps watching on a processing-time trigger until Ctrl-C.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("drop_dir")
    ap.add_argument("out_dir")
    ap.add_argument("ckpt_dir")
    ap.add_argument("--workspace", default="default")
    ap.add_argument("--trigger-seconds", type=int, default=10)
    ap.add_argument("--drain", action="store_true", help="process what's there, then exit")
    args = ap.parse_args()

    from clickhouse_metrics_pipeline_spark.session import get_spark
    from clickhouse_metrics_pipeline_spark.sources.otlp import otlp_json_stream
    from clickhouse_metrics_pipeline_spark.streaming.pipeline import ingest_stream

    spark = get_spark(app_name="otlp-json-ingest")
    spark.sparkContext.setLogLevel("WARN")
    os.makedirs(args.drop_dir, exist_ok=True)

    q = ingest_stream(
        otlp_json_stream(spark, args.drop_dir, workspace_id=args.workspace),
        args.out_dir,
        args.ckpt_dir,
        workspace_id=args.workspace,
        trigger_seconds=args.trigger_seconds,
        available_now=args.drain,
    )
    print(f"ingesting {args.drop_dir} -> {args.out_dir} (drain={args.drain})")
    q.awaitTermination()


if __name__ == "__main__":
    main()
