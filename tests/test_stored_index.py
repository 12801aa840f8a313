"""Stored index tables (round 4): write_index/load_index roundtrip.

The in-session memoized indexes (_DEDUP_INDEX, _IVF_INDEX) stand in for
ingest-time parquet tables. These tests pin that the on-disk form is a
drop-in: store the bands64x16 + grams3 dedup indexes and the trained
IVF index to a tmp root, clear the memos, point
$SPARK_GRAFT_INDEX_DIR at the root, and the catalog queries must
produce hash-identical output while actually reading the stored tables.
Reference analog: precomputed MV tables, schema.sql:146-192."""

from __future__ import annotations

import pytest

import clickhouse_metrics_pipeline_spark.workloads as W
import clickhouse_metrics_pipeline_spark.workloads_ext as WE
import clickhouse_metrics_pipeline_spark.workloads_ext4 as WE4

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _clear_memos():
    for d in (W._DEDUP_INDEX, WE._IVF_INDEX, WE4._PQ_CODES):
        for v in d.values():
            try:
                v.unpersist()
            except Exception:
                pass
        d.clear()
    WE._IVF_CENTROIDS.clear()
    WE4._PQ_BOOKS.clear()


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
def test_stored_index_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_INDEX_DIR", raising=False)
    try:
        from clickhouse_metrics_pipeline_spark.workloads_ext3 import (
            emb_neardup_clusters,
        )

        # in-memory baseline (also populates the memos store_* reuse)
        base_minhash = _rows(W.docs_minhash_lsh(spark, SF))
        base_ivf = _rows(WE.emb_ivf_kmeans_topk(spark, SF))
        base_embclusters = _rows(emb_neardup_clusters(spark, SF))
        base_pq = _rows(WE4.emb_pq_adc_topk(spark, SF))
        base_bloom = _rows(WE4.docs_bloom_decontaminate(spark, SF))
        assert base_minhash and base_ivf and base_embclusters and base_pq
        assert base_bloom

        # ingest-time store
        monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
        W.store_dedup_index(spark, SF, "bands64x16")
        W.store_dedup_index(spark, SF, "grams3")
        W.store_dedup_index(spark, SF, "embpairs045")
        W.store_dedup_index(spark, SF, "md5grams8")
        W.store_dedup_index(spark, SF, "bloom20eval")
        WE.store_ivf_index(spark, SF)
        WE4.store_pq_index(spark, SF)

        # fresh "session": memos gone, only the stored tables remain
        _clear_memos()
        got_minhash = _rows(W.docs_minhash_lsh(spark, SF))
        got_ivf = _rows(WE.emb_ivf_kmeans_topk(spark, SF))
        got_embclusters = _rows(emb_neardup_clusters(spark, SF))
        got_pq = _rows(WE4.emb_pq_adc_topk(spark, SF))
        got_bloom = _rows(WE4.docs_bloom_decontaminate(spark, SF))
        assert got_bloom == base_bloom
        assert got_minhash == base_minhash
        assert got_ivf == base_ivf
        assert got_embclusters == base_embclusters
        assert got_pq == base_pq

        # prove the queries really read the stored tables, not rebuilt
        # in-memory indexes: the memoized plans must scan the tmp root
        for kind in ("bands64x16", "grams3", "embpairs045", "md5grams8", "bloom20eval"):
            files = W._DEDUP_INDEX[(SF, kind)].inputFiles()
            assert files and all(str(tmp_path) in f for f in files), kind
        ivf_files = WE._IVF_INDEX[(SF, 16, 2)].inputFiles()
        assert ivf_files and all(str(tmp_path) in f for f in ivf_files)
        pq_files = WE4._PQ_CODES[(SF, 16, 64)].inputFiles()
        assert pq_files and all(str(tmp_path) in f for f in pq_files)

        # the band table is stored partitioned by band (probe pruning);
        # the IVF assignment by cell
        assert any(
            p.name.startswith("band=") for p in (tmp_path / "sf0.001" / "bands64x16").iterdir()
        )
        assert any(
            p.name.startswith("cell=")
            for p in (tmp_path / "sf0.001" / "ivf16x2" / "assigned").iterdir()
        )
    finally:
        # later tests must rebuild in-memory, not read soon-deleted tmp
        _clear_memos()


def test_load_index_absent_returns_none(spark, tmp_path):
    from clickhouse_metrics_pipeline_spark.sources.writer import load_index

    assert load_index(spark, str(tmp_path / "nope")) is None


def test_write_index_rejects_hidden_partition_column(spark):
    import pytest

    from clickhouse_metrics_pipeline_spark.sources.writer import write_index

    df = spark.range(1).withColumnRenamed("id", "_cell")
    with pytest.raises(ValueError):
        write_index(df, "/tmp/never-written", ["_cell"])


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
def test_stored_int_ann_models_equal_retrained(spark, tmp_path, monkeypatch):
    """The deterministic integer IVF/PQ models: stored (centroids +
    assignment / codebooks + codes) must reproduce the EXACT query
    output of in-session training, and the probe plans must read the
    stored parquet, not rebuild."""
    import clickhouse_metrics_pipeline_spark.workloads_ext5 as WE5

    monkeypatch.delenv("SPARK_GRAFT_INDEX_DIR", raising=False)
    WE5._IVF_INT_MODEL.clear()
    WE5._PQ_INT_MODEL.clear()
    base_ivf = _rows(WE5.emb_ivf_int_topk(spark, SF))
    base_pq = _rows(WE5.emb_pq_int_adc_topk(spark, SF))
    assert base_ivf and base_pq

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    WE5.store_ivf_int_index(spark, SF)
    WE5.store_pq_int_index(spark, SF)

    WE5._IVF_INT_MODEL.clear()
    WE5._PQ_INT_MODEL.clear()
    got_ivf = _rows(WE5.emb_ivf_int_topk(spark, SF))
    got_pq = _rows(WE5.emb_pq_int_adc_topk(spark, SF))
    assert got_ivf == base_ivf
    assert got_pq == base_pq

    # probes must scan the stored root
    cent, assigned = WE5._IVF_INT_MODEL[SF]
    files = assigned.inputFiles()
    assert files and all(str(tmp_path) in f for f in files)
    _, codes = WE5._PQ_INT_MODEL[SF]
    cfiles = codes.inputFiles()
    assert cfiles and all(str(tmp_path) in f for f in cfiles)
