"""Storage write/read path (S4-S5) - parquet layout mirroring the
reference's MergeTree physical design (``internal/clickhouse/schema.sql``).

| ClickHouse mechanism                      | Spark/Parquet form here           |
|-------------------------------------------|-----------------------------------|
| PARTITION BY toDate(timestamp) (:70)      | write.partitionBy("date")         |
| ORDER BY (ws, metric, hash, ts) (:71)     | sortWithinPartitions(same)        |
| bloom_filter(0.01) on metric (:65)        | parquet.bloom.filter.enabled      |
| ZSTD(1) codecs (:4-62)                    | parquet zstd (session default)    |
| TTL _ttl (:72)                            | retention_sweep partition drops   |

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


def zorder_value(dim1, dim2, bits: int = 16):
    """Bit-interleave two dimension columns into a Z-value (Morton
    code): bit i of ``dim1`` lands at position 2i, of ``dim2`` at
    2i+1, over the low ``bits`` bits of each. Pure JVM bit expressions
    (whole-stage codegen), no UDF.

    Callers map each dimension to a bounded non-negative integer first
    (e.g. a uniform hash's low bits, or minutes since the table's
    epoch). Range-partitioning + sorting by the Z-value gives every
    file a square-ish region of the 2-D key space, so parquet min/max
    stats stay tight on BOTH dimensions — the multi-dimension
    data-skipping lever a single-column ORDER BY cannot provide (the
    reference's MergeTree key, schema.sql:71, skips only on its
    leading columns)."""
    a = (F.col(dim1) if isinstance(dim1, str) else dim1).cast("long")
    b = (F.col(dim2) if isinstance(dim2, str) else dim2).cast("long")
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    dim1,
    dim2,
    *,
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Z-value of (dim1, dim2) — the ZORDER BY layout job a
    100 TB deployment runs at compaction time. Point/range predicates
    on EITHER dimension then skip most files via footer min/max stats
    (pinned quantitatively in tests/test_zorder.py)."""
    z = zorder_value(dim1, dim2, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


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


def retention_sweep(
    spark: SparkSession,
    base_path: str,
    retention_days: int,
    now=None,
    ts_col: str = "timestamp",
    rewrite_boundary: bool = False,
) -> dict[str, list[str]]:
    """Partition-level TTL enforcement over a ``date=``-partitioned table
    (the job form of ``TTL _ttl`` / ``schema.sql:72``): date partitions
    entirely older than ``now - retention_days`` are DROPPED as whole
    directories — a metadata-only delete, no data read or rewritten,
    which is the only retention shape that works at 100 TB (a row-level
    ``DELETE WHERE`` sweep would rewrite the full table daily; ClickHouse
    TTL likewise drops whole parts). ``operators.rollup.apply_retention``
    is the row-level filter used inside rewrite jobs; this is the
    storage-side sweep that makes it rarely necessary.

    The boundary partition (the cutoff date itself) holds both expired
    and live rows; by default it is left intact — part-granular TTL, the
    ClickHouse behavior — or rewritten in place with the row filter when
    ``rewrite_boundary=True`` (write-to-temp, then a checked two-rename
    trash swap — a crash mid-swap leaves the old rows under a hidden
    ``.date=...__rewrite_old`` dir for manual recovery instead of lost;
    note rename is a copy on object stores).

    ``now`` defaults to the current timestamp; pass an explicit
    ``datetime`` for deterministic jobs/tests. Returns
    ``{"dropped": [...], "kept": [...], "rewritten": [...]}`` partition
    names, sorted."""
    import datetime as _dt

    if now is None:
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    horizon = now - _dt.timedelta(days=retention_days)
    cutoff = horizon.date().isoformat()

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(base_path).getFileSystem(spark._jsc.hadoopConfiguration())
    dropped, kept, rewritten = [], [], []
    for status in fs.listStatus(hpath(base_path)):
        name = status.getPath().getName()
        if not name.startswith("date="):
            continue
        day = name.split("=", 1)[1]
        if day < cutoff:
            fs.delete(status.getPath(), True)
            dropped.append(name)
        elif day == cutoff and rewrite_boundary:
            live = spark.read.parquet(f"{base_path}/{name}").filter(
                F.col(ts_col) >= horizon
            )
            _rewrite_partition_swap(
                fs, hpath, base_path, name, live, job="retention_sweep"
            )
            rewritten.append(name)
        else:
            kept.append(name)
    return {
        "dropped": sorted(dropped),
        "kept": sorted(kept),
        "rewritten": sorted(rewritten),
    }


def _rewrite_partition_swap(fs, hpath, base_path, name, df, job: str, tmp_suffix: str = "") -> None:
    """Crash-safe in-place rewrite of one partition directory: write the
    replacement rows to a hidden tmp dir, then a checked two-rename
    trash swap. A crash mid-swap leaves the old rows intact under a
    hidden ``.{name}__rewrite_old`` dir for manual recovery instead of
    lost (note rename is a copy on object stores). Shared by
    retention_sweep, compact_partitions, and compact_ingest_sink
    (``tmp_suffix`` places the rewrite under a sub-partition dir inside
    the swapped directory, e.g. ``/batch=-1`` for the batch-keyed
    ingest-sink layout)."""
    part = f"{base_path}/{name}"
    tmp = f"{base_path}/.{name}__rewrite_tmp"
    trash = f"{base_path}/.{name}__rewrite_old"
    # a leftover trash dir means a previous rewrite crashed MID-SWAP:
    # it may hold the only copy of the pre-rewrite rows, so renaming
    # onto it (which would return false forever) or deleting it is
    # never safe — fail loudly with the recovery path.
    if fs.exists(hpath(trash)):
        raise IOError(
            f"{job}: stale artifact {trash} from an interrupted "
            "rewrite; inspect it (it holds the pre-rewrite rows), "
            f"then delete it and re-run the {job}"
        )
    # r10 verdict item 3: tmp WITHOUT trash is unambiguous — the crash
    # happened between the tmp write and the first rename, so the live
    # partition is intact and the tmp holds only an incomplete
    # replacement. Auto-delete it and proceed instead of poisoning
    # every subsequent micro-batch until a human intervenes
    # (tests/test_streaming.py plants a stale tmp and asserts the next
    # sink batch self-heals).
    if fs.exists(hpath(tmp)):
        fs.delete(hpath(tmp), True)
    df.write.mode("overwrite").parquet(tmp + tmp_suffix)
    # swap via a trash rename, never delete-before-rename: a
    # crash between the two renames leaves the old data intact
    # under the trash name instead of lost. Hadoop rename
    # signals most failures by returning false, not raising.
    if not fs.rename(hpath(part), hpath(trash)):
        fs.delete(hpath(tmp), True)
        raise IOError(f"{job}: rename {part} -> {trash} failed")
    if not fs.rename(hpath(tmp), hpath(part)):
        fs.rename(hpath(trash), hpath(part))  # roll back
        raise IOError(f"{job}: rename {tmp} -> {part} failed")
    fs.delete(hpath(trash), True)


def compact_partitions(
    spark: SparkSession,
    base_path: str,
    max_files: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_key: list[str] | None = None,
) -> dict[str, list[str]]:
    """Small-file compaction over a ``date=``-partitioned table — the
    maintenance job every streaming ingest needs: a 10 s flush trigger
    (streaming/pipeline.py) lands ~8640 small files per partition per
    day, and parquet scan cost is dominated by per-file open/footer
    overhead once files shrink below a row group. ClickHouse gets this
    for free from MergeTree background merges (parts are continuously
    merged toward ~150 GB); the parquet analog is an explicit rewrite,
    same idea as OPTIMIZE/bin-packing in table formats.

    A partition is rewritten when it has more than ``max_files`` data
    files AND its mean file size is below ``target_file_bytes`` — so
    already-compacted or genuinely-large partitions are never touched
    (idempotent: a second sweep is a no-op). The rewrite coalesces to
    ``ceil(total_bytes / target_file_bytes)`` files, re-sorting by
    ``sort_key`` (default: the metrics ORDER BY) to restore row-group
    min/max skipping that interleaved micro-batches destroyed, and
    swaps atomically via the same trash-rename as retention_sweep.

    At 100 TB this runs per-partition-parallel from a scheduler (each
    date dir is independent); the driver loop here only lists
    directories and launches one Spark job per eligible partition.

    Returns ``{"compacted": [...], "skipped": [...]}`` with
    ``name:files_before->files_after`` entries for compacted ones."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(base_path).getFileSystem(spark._jsc.hadoopConfiguration())
    compacted, skipped = [], []
    for status in fs.listStatus(hpath(base_path)):
        name = status.getPath().getName()
        if not name.startswith("date="):
            continue
        files = [
            f
            for f in fs.listStatus(status.getPath())
            if f.isFile() and not f.getPath().getName().startswith(("_", "."))
        ]
        total = sum(f.getLen() for f in files)
        if len(files) <= max_files or total / max(len(files), 1) >= target_file_bytes:
            skipped.append(name)
            continue
        n_out = max(1, math.ceil(total / target_file_bytes))
        part_df = spark.read.parquet(f"{base_path}/{name}").coalesce(n_out)
        key = sort_key if sort_key is not None else SORT_KEY
        key = [c for c in key if c in part_df.columns]
        if key:
            part_df = part_df.sortWithinPartitions(*key)
        _rewrite_partition_swap(
            fs, hpath, base_path, name, part_df, job="compact_partitions"
        )
        n_after = sum(
            1
            for f in fs.listStatus(hpath(f"{base_path}/{name}"))
            if f.isFile() and not f.getPath().getName().startswith(("_", "."))
        )
        compacted.append(f"{name}:{len(files)}->{n_after}")
    return {"compacted": sorted(compacted), "skipped": sorted(skipped)}


def _count_data_files(fs, status) -> tuple[int, int]:
    """(n_files, total_bytes) over data files under a dir, recursing one
    level into sub-partition dirs (the ``date=D/batch=K`` sink layout)."""
    n, total = 0, 0
    for f in fs.listStatus(status.getPath()):
        name = f.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if f.isFile():
            n += 1
            total += f.getLen()
        else:
            for g in fs.listStatus(f.getPath()):
                gname = g.getPath().getName()
                if g.isFile() and not gname.startswith(("_", ".")):
                    n += 1
                    total += g.getLen()
    return n, total


def compact_ingest_sink(
    spark: SparkSession,
    base_path: str,
    max_files: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_key: list[str] | None = None,
    defer_batch_geq: int | None = None,
) -> dict[str, list[str]]:
    """Compaction for the batch-keyed streaming-ingest layout
    (``date=D/batch=K/part-*.parquet``, see
    ``streaming.pipeline.ingest_stream``): collapses a date partition's
    per-micro-batch sub-dirs into few files under ``batch=-1``, keeping
    the two-level partition layout intact so idempotent batch replays
    (dynamic overwrite of ``(date, batch)``) and partition discovery
    keep working. Already-compacted or large partitions are skipped
    (idempotent); the swap is the same crash-safe trash-rename as
    retention_sweep.

    MUST only fold COMMITTED batches. The ingest sink calls it at
    micro-batch START with ``defer_batch_geq=<current batch id>``: in
    the normal sequential flow every dir present is a committed earlier
    batch, but a REPLAYED batch (crash between its parquet write and
    its checkpoint commit) finds its own crashed attempt's ``batch=K``
    dir already on disk — folding that into ``batch=-1`` and then
    re-writing the batch would duplicate its rows. Any date partition
    still holding a ``batch=K`` dir with ``K >= defer_batch_geq`` is
    therefore deferred to the next boundary, by which time the batch
    has committed."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(base_path).getFileSystem(spark._jsc.hadoopConfiguration())
    compacted, skipped = [], []
    for status in fs.listStatus(hpath(base_path)):
        name = status.getPath().getName()
        if not name.startswith("date="):
            continue
        if defer_batch_geq is not None:
            sub_ids = [
                int(f.getPath().getName().split("=", 1)[1])
                for f in fs.listStatus(status.getPath())
                if f.isDirectory()
                and f.getPath().getName().startswith("batch=")
            ]
            if any(k >= defer_batch_geq for k in sub_ids):
                skipped.append(name)
                continue
        n_files, total = _count_data_files(fs, status)
        if n_files <= max_files or total / max(n_files, 1) >= target_file_bytes:
            skipped.append(name)
            continue
        n_out = max(1, math.ceil(total / target_file_bytes))
        part_df = (
            spark.read.parquet(f"{base_path}/{name}")
            .drop("batch")
            .coalesce(n_out)
        )
        key = sort_key if sort_key is not None else SORT_KEY
        key = [c for c in key if c in part_df.columns]
        if key:
            part_df = part_df.sortWithinPartitions(*key)
        _rewrite_partition_swap(
            fs,
            hpath,
            base_path,
            name,
            part_df,
            job="compact_ingest_sink",
            tmp_suffix="/batch=-1",
        )
        n_after, _ = _count_data_files(
            fs, fs.getFileStatus(hpath(f"{base_path}/{name}"))
        )
        compacted.append(f"{name}:{n_files}->{n_after}")
    return {"compacted": sorted(compacted), "skipped": sorted(skipped)}


def write_index(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a precomputed index relation as a parquet table — the
    durable form of the in-session memoized indexes (dedup gram/band/
    signature tables, IVF cell assignments). Reference analog: the
    schema's precomputed MV tables (``schema.sql:146-192``) — compute
    once at ingest, serve every query from the stored relation.

    ``partition_by`` (e.g. ``["band"]`` for an LSH band table,
    ``["cell"]`` for an IVF assignment) lets probe queries prune to the
    partitions they touch. NOTE: Spark's file index treats directory
    names starting with ``_`` or ``.`` as hidden — never partition by a
    column with a leading underscore (rename first; see
    workloads_ext.store_ivf_index)."""
    if partition_by:
        for c in partition_by:
            if c.startswith(("_", ".")):
                raise ValueError(
                    f"partition column {c!r} would create hidden "
                    "directories Spark skips; rename it first"
                )
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def load_index(spark: SparkSession, path: str) -> DataFrame | None:
    """Load a stored index table if present, else ``None`` (the caller
    falls back to building it). Presence is an FS-level check so the
    same code path works on HDFS/object stores, not just local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    return spark.read.parquet(path)
