"""Multimodal plan ops: audio chunking and resize chain math."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from clickhouse_metrics_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_chunk_plan,
    extract_features,
    extract_features_with_frame_plan,
    frame_sample_plan,
    resize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, payload=b"a", mime="audio/wav",
            meta=Row(width=None, height=None, duration_ms=90_000)),
        Row(media_id=2, payload=b"b", mime="audio/wav",
            meta=Row(width=None, height=None, duration_ms=45_000)),
        Row(media_id=3, payload=b"c", mime="audio/wav",
            meta=Row(width=None, height=None, duration_ms=0)),
        Row(media_id=4, payload=b"d", mime="audio/wav",
            meta=Row(width=None, height=None, duration_ms=None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _chunks(df, media_id):
    return sorted(
        (r["chunk_idx"], r["start_ms"], r["end_ms"])
        for r in df.collect()
        if r["media_id"] == media_id
    )


def test_non_overlapping_chunks(spark, media):
    out = audio_chunk_plan(media, chunk_ms=30_000)
    assert _chunks(out, 1) == [(0, 0, 30_000), (1, 30_000, 60_000),
                               (2, 60_000, 90_000)]
    # 45s: full chunk + partial tail
    assert _chunks(out, 2) == [(0, 0, 30_000), (1, 30_000, 45_000)]


def test_zero_or_null_duration_emits_no_chunks(spark, media):
    out = audio_chunk_plan(media, chunk_ms=30_000)
    assert _chunks(out, 3) == []
    assert _chunks(out, 4) == []


def test_overlapping_hop(spark, media):
    out = audio_chunk_plan(media, chunk_ms=30_000, hop_ms=15_000)
    got = _chunks(out, 2)  # 45s, windows every 15s
    assert got == [(0, 0, 30_000), (1, 15_000, 45_000)]


def test_invalid_args_rejected(spark, media):
    with pytest.raises(ValueError):
        audio_chunk_plan(media, chunk_ms=0)


def test_resize_then_extract_chain(spark, media):
    out = extract_features(
        resize_media(media, width=8, height=4, fake_decode=True),
        fake_decode=True,
    ).collect()
    assert {r["payload_bytes"] for r in out} == {8 * 4 * 3}
    assert all(len(r["features"]) == 8 for r in out)


def test_fused_frame_plan_matches_exploded_form(spark, media):
    """The one-pass n_frames must equal counting frame_sample_plan rows."""
    fused = {
        r["media_id"]: r["n_frames"]
        for r in extract_features_with_frame_plan(media, every_ms=1000).collect()
    }
    exploded = {
        r["media_id"]: r["n"]
        for r in frame_sample_plan(media, every_ms=1000)
        .groupBy("media_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert fused == exploded
    # features identical to the unfused extractor
    plain = {
        r["media_id"]: (r["payload_bytes"], r["payload_sha1"], r["features"])
        for r in extract_features(media, fake_decode=True).collect()
    }
    both = {
        r["media_id"]: (r["payload_bytes"], r["payload_sha1"], r["features"])
        for r in extract_features_with_frame_plan(media).collect()
    }
    assert plain == both


def test_extract_features_meta_passthrough(spark, media):
    """r11: with_meta=True carries the typed meta struct through the
    same Arrow batch — identical feature columns, meta equal to the
    input's, and the single-pass plan has no Join and exactly one
    Python-eval stage."""
    plain = {
        r["media_id"]: (r["payload_bytes"], r["payload_sha1"], r["features"])
        for r in extract_features(media, fake_decode=True).collect()
    }
    withm = extract_features(media, fake_decode=True, with_meta=True)
    rows = withm.collect()
    assert {
        r["media_id"]: (r["payload_bytes"], r["payload_sha1"], r["features"])
        for r in rows
    } == plain
    in_meta = {r["media_id"]: r["meta"] for r in media.select("media_id", "meta").collect()}
    assert {r["media_id"]: r["meta"] for r in rows} == in_meta
    plan = withm._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("MapInPandas") == 1
