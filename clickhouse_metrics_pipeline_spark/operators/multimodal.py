"""Multimodal column plumbing: image/audio/video as opaque BINARY payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, batching, partition sizing, UDF
signatures) is real and tested; the actual media decode is STUBBED - the
container has no image/audio libraries - behind ``decode_image_stub``,
which raises ``NotImplementedError`` unless ``fake=True``, in which case
it produces a deterministic fake feature vector from the payload bytes
(so the distributed plumbing is exercised end-to-end).

Scale notes: payloads stay in BINARY columns (never collected), batches
flow through Arrow with ``maxRecordsPerBatch`` bounding memory; a
10 MB-average image corpus at 100 TB is ~10^7 rows per task at 128 MB
splits - size ``spark.sql.files.maxPartitionBytes`` down for fat rows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload_bytes", T.IntegerType(), False),
        T.StructField("payload_sha1", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an image payload to a feature vector.

    STUB: real decode needs PIL/opencv (not in this container). With
    ``fake=True`` returns a deterministic 8-dim vector derived from the
    payload digest - stable across runs/partitions for testing."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library; not available here"
        )
    digest = hashlib.sha1(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(
    df: DataFrame, fake_decode: bool = True, with_meta: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over BINARY payloads.

    One Arrow batch at a time; nothing is collected to the driver.
    ``with_meta=True`` passes the (small) typed ``meta`` struct through
    the same Arrow batch (r11 optimization, guide §4.1 / the
    extract_features_with_frame_plan rationale): a consumer that needs
    features AND metadata of the SAME upstream kernel output would
    otherwise re-run that upstream per join branch and shuffle on
    media_id — a second full pass over the heaviest table at 100 TB."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "payload_sha1": pdf["payload"].map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "features": pdf["payload"].map(
                        lambda p: decode_image_stub(p, fake=fake_decode)
                    ),
                }
            )
            if with_meta:
                out["meta"] = pdf["meta"]
            yield out

    # guide §4.1: mapInPandas ships every input column to the Python
    # workers — project to exactly what _extract reads first
    if with_meta:
        return df.select("media_id", "payload", "meta").mapInPandas(
            _extract,
            schema=T.StructType(
                FEATURE_SCHEMA.fields + [MEDIA_SCHEMA["meta"]]
            ),
        )
    return df.select("media_id", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


FEATURE_PLAN_SCHEMA = T.StructType(
    FEATURE_SCHEMA.fields
    + [T.StructField("n_frames", T.LongType(), False)]
)


def extract_features_with_frame_plan(
    df: DataFrame, every_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """Features + planned frame count in ONE corpus pass.

    :func:`extract_features` followed by a :func:`frame_sample_plan`
    count costs two full scans of the BINARY corpus joined back on
    media_id — at 100 TB that is a second read of the heaviest table
    plus a shuffle, for a value (the frame count) that is pure
    metadata arithmetic. This fused kernel computes both in the same
    Arrow batch: per row, the frame count is
    ``max(duration_ms // every_ms, 0) + 1`` — exactly the number of
    rows :func:`frame_sample_plan` would explode (sequence 0..n
    inclusive), pinned by tests against the exploded form."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "payload_sha1": pdf["payload"].map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "features": pdf["payload"].map(
                        lambda p: decode_image_stub(p, fake=fake_decode)
                    ),
                    "n_frames": pdf["meta"].map(
                        lambda m: max(
                            int((m or {}).get("duration_ms") or 0) // every_ms, 0
                        )
                        + 1
                    ),
                }
            )

    # guide §4.1: project to the columns the kernel reads (drops mime)
    return df.select("media_id", "payload", "meta").mapInPandas(
        _extract, schema=FEATURE_PLAN_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per planned frame,
    computed from metadata only (decode stubbed). Shows the explode-shape
    a real sampler uses - rows fan out before the heavy decode stage so
    Spark can rebalance them across executors."""
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"),
        F.lit(0),
    )
    return df.select(
        "media_id",
        "mime",
        F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: the driver's documents table as a fake media corpus
    (text bytes = payload) so the plumbing is testable on shipped data."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def resize_image_stub(
    payload: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """Resize an image payload to (width, height).

    STUB: real resize needs PIL/opencv (not in this container). With
    ``fake=True`` returns a deterministic byte string of the exact size
    a 3-channel uint8 raster would occupy (w*h*3), derived from the
    payload digest - so downstream size accounting and schema handling
    are exercised for real."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an imaging library; not available here"
        )
    digest = hashlib.sha1(payload or b"").digest()
    size = max(width, 0) * max(height, 0) * 3
    return (digest * (size // len(digest) + 1))[:size]


def resize_media(
    df: DataFrame, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas resize over BINARY payloads: same MEDIA_SCHEMA out,
    payload replaced by the resized raster, meta.width/height updated.

    Keeping the output schema identical to the input makes the op
    composable with itself and with :func:`extract_features` (resize ->
    extract is the standard preprocess chain); payloads never leave the
    executors."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda p: resize_image_stub(p, width, height, fake=fake_decode)
            )
            out["meta"] = out["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    return df.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def audio_chunk_plan(
    df: DataFrame, chunk_ms: int = 30_000, hop_ms: int | None = None
) -> DataFrame:
    """Audio chunking plan: one row per (possibly overlapping) window,
    computed from metadata only — the audio analogue of
    :func:`frame_sample_plan`. ``hop_ms`` < ``chunk_ms`` gives
    overlapping windows (the ASR/embedding preprocessing shape);
    default is non-overlapping. Rows fan out BEFORE the heavy decode
    stage so Spark rebalances chunks, not files, across executors; a
    final partial chunk is emitted whenever the duration isn't a hop
    multiple."""
    hop = hop_ms if hop_ms is not None else chunk_ms
    if hop <= 0 or chunk_ms <= 0:
        raise ValueError("chunk_ms and hop_ms must be positive")
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    # number of windows starting before the end: ceil(max(dur-chunk,0)/hop)+1
    n_chunks = F.when(dur <= 0, F.lit(0)).otherwise(
        F.ceil(F.greatest(dur - chunk_ms, F.lit(0)) / hop).cast("int") + 1
    )
    return (
        df.select(
            "media_id",
            "mime",
            dur.alias("_dur"),
            # sequence(0, -1) would step BACKWARD ([0, -1]) — guard the
            # zero-chunk case with an empty array instead
            F.explode(
                F.when(
                    n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("chunk_idx"),
        )
        .select(
            "media_id",
            "mime",
            "chunk_idx",
            (F.col("chunk_idx") * hop).alias("start_ms"),
            F.least(
                F.col("chunk_idx") * hop + chunk_ms, F.col("_dur")
            ).alias("end_ms"),
        )
    )
