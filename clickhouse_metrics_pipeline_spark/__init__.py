"""PySpark-native analytics engine with the query and data-processing
capabilities of glitchdawg/clickhouse-metrics-pipeline.

The reference is a Go metrics pipeline (OTLP ingest -> validate -> stateful
temporality conversion -> ClickHouse columnar store with a 4-resolution
rollup hierarchy -> Prometheus Remote Read query API + histogram percentile
math). This package re-expresses every operator Spark-first:

- ``schema``      - StructTypes for metrics_raw / metrics_1m / 5m / 1h
- ``session``     - tuned SparkSession builder (AQE, shuffle partitions)
- ``functions``   - histogram kernels (native SQL HOF expressions),
                    series hashing, text analysis
- ``operators``   - validation, temporality conversion (batch windows),
                    rollups, dedup, similarity search
- ``sources``     - OTLP-shaped ingest flattening, parquet write path
- ``plans``       - Prometheus matcher compiler, resolution router,
                    remote-read series assembly
- ``streaming``   - Structured Streaming variant of the ingest pipeline
"""

__version__ = "0.1.0"
