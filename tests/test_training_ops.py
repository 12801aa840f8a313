"""Unit tests for the training-data operators (dedup / similarity /
text analysis) — semantics on small constructed inputs plus recall
checks on the driver's sf0.001 tables.

The oracle harness (tools/check_oracle.py) pins these end-to-end at
sf0.01; these tests pin the operator-level contracts directly so a
regression localizes to the operator, not the workload query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signature_from_text,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from clickhouse_metrics_pipeline_spark.operators.similarity import (
    cosine_topk,
    ivf_kmeans_topk,
    ivf_topk,
)
from clickhouse_metrics_pipeline_spark.functions.text import (
    bpe_token_count,
    detect_language,
    quality_score,
    token_count,
)

SF_DIR = "/root/testdata/sf0.001"

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "slowly behind the distant purple mountains of the old west"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("purple", "crimson")),  # near-dup of 1
        (4, "completely different content about database engines and "
            "distributed query processing at petabyte scale today"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


class TestExactDedup:
    def test_groups_exact_copies(self, spark):
        out = exact_duplicates(_docs(spark)).orderBy("keeper_id").collect()
        groups = {r.keeper_id: (r.n_copies, r.ids) for r in out}
        assert groups[1] == (2, [1, 2])
        assert groups[3][0] == 1
        assert groups[4][0] == 1

    def test_whitespace_and_case_normalized(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world "), (3, "hello")],
            "doc_id BIGINT, text STRING",
        )
        out = exact_duplicates(df).collect()
        assert sorted(r.n_copies for r in out) == [1, 2]


class TestMinHashLSH:
    def test_finds_near_dups_not_distinct(self, spark):
        pairs = {
            (r.id_a, r.id_b): r.jaccard
            for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
        assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
        assert not any(4 in p for p in pairs)

    def test_matches_exact_jaccard_oracle(self, spark):
        lsh = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
        }
        exact = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
        }
        assert lsh == exact

    def test_signature_null_for_short_text(self, spark):
        df = spark.createDataFrame(
            [(1, "two words"), (2, None), (3, BASE)], "doc_id BIGINT, text STRING"
        )
        out = df.select(
            "doc_id", minhash_signature_from_text("text", 16, 3).alias("sig")
        ).collect()
        by_id = {r.doc_id: r.sig for r in out}
        assert by_id[1] is None and by_id[2] is None
        assert by_id[3] is not None and len(by_id[3]) == 16

    def test_signature_deterministic_and_order_insensitive_agreement(self, spark):
        # identical text -> identical signature on every evaluation
        df = spark.createDataFrame(
            [(i, BASE) for i in range(4)], "doc_id BIGINT, text STRING"
        )
        sigs = df.select(
            minhash_signature_from_text("text", 32, 3).alias("s")
        ).collect()
        assert all(list(r.s) == list(sigs[0].s) for r in sigs)


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
class TestNgramJaccardCap:
    def test_df_cap_drops_boilerplate_shingles(self, spark):
        # every doc shares the same 12-token boilerplate prefix; pairs 1-2
        # differ only in unique tails. Uncapped: the boilerplate shingles
        # dominate every intersection; capped at df<=2 they vanish from
        # index AND sizes, so only genuinely shared tail shingles count.
        boiler = "this document is provided as is without warranty of any kind"
        df = spark.createDataFrame(
            [
                (1, boiler + " alpha beta gamma delta epsilon zeta"),
                (2, boiler + " alpha beta gamma delta epsilon eta"),
                (3, boiler + " one two three four five six"),
            ],
            "doc_id BIGINT, text STRING",
        )
        uncapped = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
        }
        capped = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(df, threshold=0.0, max_doc_freq=2).collect()
        }
        # boilerplate (df=3) inflates every uncapped pair's similarity
        assert uncapped[(1, 3)] > capped.get((1, 3), 0.0)
        # capped keeps the true near-dup pair, via tail shingles only
        assert capped[(1, 2)] > 0.0
        assert capped[(1, 2)] > capped.get((1, 3), 0.0)

    def test_cap_above_max_df_is_identity(self, spark):
        base = ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
        capped = ngram_jaccard_pairs(
            _docs(spark), threshold=0.5, max_doc_freq=1000
        ).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, capped))


class TestSimHash:
    def test_identical_zero_distance_distinct_far(self, spark):
        out = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_pairs(_docs(spark), max_hamming=3).collect()
        }
        assert out[(1, 2)] == 0
        assert (1, 4) not in out and (2, 4) not in out and (3, 4) not in out

    def test_portable_kernel_matches_expression(self, spark):
        # the Arrow kernel must be bit-identical to the expression form
        # (both are pinned to the DuckDB md5 oracle)
        from pyspark.sql import functions as F

        from clickhouse_metrics_pipeline_spark.operators.dedup import (
            simhash60_portable,
            simhash60_portable_kernel,
        )

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        diff = (
            d.select(
                simhash60_portable("text").alias("a"),
                simhash60_portable_kernel("text").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .count()
        )
        assert diff == 0


class TestTextFunctions:
    def test_token_counts(self, spark):
        df = spark.createDataFrame([("one two three",)], "text STRING")
        r = df.select(
            token_count("text").alias("t"), bpe_token_count("text").alias("b")
        ).collect()[0]
        assert r.t == 3 and r.b == 3

    def test_bpe_splits_punct_and_digits(self, spark):
        df = spark.createDataFrame([("don't stop123!",)], "text STRING")
        # don / ' / t / stop / 123 / !
        assert df.select(bpe_token_count("text").alias("b")).collect()[0].b == 6

    def test_language_id_on_markers(self, spark):
        df = spark.createDataFrame(
            [
                ("the cat and the dog are in the house",),
                ("el perro y el gato que son de la casa",),
                ("le chien et le chat sont les amis des enfants",),
                ("der Hund und die Katze sind das Licht von ist",),
            ],
            "text STRING",
        )
        out = [r.l for r in df.select(detect_language("text").alias("l")).collect()]
        assert out == ["en", "es", "fr", "de"]

    def test_quality_score_in_unit_interval(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        r = docs.select(
            F.min(quality_score("text")).alias("lo"),
            F.max(quality_score("text")).alias("hi"),
        ).collect()[0]
        assert 0.0 <= r.lo <= r.hi <= 1.0


class TestSimilaritySearch:
    def test_cosine_topk_exact_on_axes(self, spark):
        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [0.9, 0.1]),
                (3, [0.0, 1.0]),
            ],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        probes = df.filter(F.col("vec_id") == 1)
        out = cosine_topk(df, probes, k=2).orderBy("rank").collect()
        assert [r.neighbor_id for r in out] == [2, 3]
        assert out[0].cosine_sim == pytest.approx(0.9 / (0.81 + 0.01) ** 0.5, rel=1e-6)
        assert out[1].cosine_sim == pytest.approx(0.0, abs=1e-9)

    def test_fused_topk_equals_crossjoin_reference(self, spark):
        """cosine_topk_fused (probe-matrix mapInPandas, batch-local
        top-k) must be row-for-row identical to the crossJoin+window
        reference form at the same rounding — the equivalence the
        emb_cosine_topk catalog query relies on."""
        from pyspark.sql.window import Window

        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            cosine_np,
            cosine_topk_fused,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        probes = emb.filter(F.col("vec_id") < 10)
        sim = (
            F.broadcast(
                probes.select(
                    F.col("vec_id").alias("probe_id"),
                    F.col("embedding").alias("_p"),
                )
            )
            .crossJoin(
                emb.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("_c"),
                )
            )
            .where(F.col("probe_id") != F.col("neighbor_id"))
            .withColumn(
                "cosine_sim", F.round(cosine_np(F.col("_p"), F.col("_c")), 4)
            )
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("cosine_sim").desc(), F.col("neighbor_id")
        )
        ref = sorted(
            tuple(r)
            for r in sim.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("probe_id", "neighbor_id", "cosine_sim", "rank")
            .collect()
        )
        fused = sorted(
            tuple(r)
            for r in cosine_topk_fused(emb, probes, k=5, round_to=4).collect()
        )
        assert fused == ref

    def test_fused_topk_zero_norm_sorts_last(self, spark):
        """Zero-norm corpus vectors get NULL similarity and only appear
        when fewer than k finite candidates exist (try_divide parity)."""
        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            cosine_topk_fused,
        )

        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [0.5, 0.5]),
                (3, [0.0, 0.0]),  # zero norm -> NULL sim
            ],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        probes = df.filter(F.col("vec_id") == 1)
        out = cosine_topk_fused(df, probes, k=3).orderBy("rank").collect()
        assert [r.neighbor_id for r in out] == [2, 3]
        assert out[0].cosine_sim == pytest.approx(0.7071, abs=1e-4)
        assert out[1].cosine_sim is None

    # Recall context: the driver's embeddings are nearly unstructured -
    # top-5 cosine neighbors average only ~0.32 similarity and match the
    # probe's label ~9% of the time - so coarse-quantized recall has a
    # low ceiling here (random cell choice would give n_probe/num_cells).
    # Both bounds below are well above that chance line and deterministic
    # (fixed data, fixed hash/init seeds).

    def test_srp_multiprobe_recall(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        probes = emb.filter(F.col("vec_id") < 20)
        exact = cosine_topk(emb, probes, k=5)
        approx = ivf_topk(emb, probes, k=5, num_cells=16, n_probe_cells=8)
        hits = exact.join(approx, ["probe_id", "neighbor_id"], "left_semi").count()
        assert exact.count() == 100
        # measured 77/100; chance at 8/16 cells would be ~50
        assert hits / 100 >= 0.70

    def test_ivf_kmeans_recall(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        probes = emb.filter(F.col("vec_id") < 20)
        exact = cosine_topk(emb, probes, k=5)
        approx = ivf_kmeans_topk(
            emb, probes, k=5, num_cells=16, n_probe_cells=4, iters=4
        )
        hits = exact.join(approx, ["probe_id", "neighbor_id"], "left_semi").count()
        # measured 60/100; chance at 4/16 cells would be ~25
        assert hits / 100 >= 0.55

    def test_lsh_pairs_recall_at_catalog_operating_point(self, spark):
        # the emb_ann_lsh catalog config (8 tables x 6 planes,
        # threshold 0.45): theory 1-(1-0.649^6)^8 = 0.46 recall at the
        # threshold; measured 7/14 = 0.50 on this corpus at sf0.01.
        # Everything is deterministic (xxhash64 planes, exact-verified
        # candidates), so the pin carries only a small margin.
        import numpy as np

        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            lsh_ann_pairs,
        )

        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        rows = emb.collect()
        ids = [r["vec_id"] for r in rows]
        V = np.vstack([np.array(r["embedding"], dtype=np.float64) for r in rows])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        exact = {
            (min(ids[a], ids[b]), max(ids[a], ids[b]))
            for a in range(len(ids))
            for b in range(a + 1, len(ids))
            if S[a, b] >= 0.45
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in lsh_ann_pairs(
                emb, threshold=0.45, num_tables=8, planes_per_table=6
            ).collect()
        }
        assert exact, "corpus lost its planted near-dup pairs"
        # exact verification inside buckets -> zero false positives
        assert got <= exact
        assert len(got & exact) / len(exact) >= 0.4


class TestNeardupComponents:
    def test_path_graph_converges_to_one_component(self, spark):
        # worst case for propagation: a 9-node path; pointer jumping
        # must converge well inside max_iters
        from clickhouse_metrics_pipeline_spark.operators.dedup import (
            neardup_components,
        )

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 9)], ["id_a", "id_b"]
        )
        # threshold 0 forces the distributed loop (the convergence
        # property under test); the driver path is covered elsewhere
        out = neardup_components(pairs, max_iters=6, driver_threshold=0)
        rows = {r["doc_id"]: r["keeper_id"] for r in out.collect()}
        assert rows == {i: 1 for i in range(1, 10)}

    def test_chain_vs_pairwise_drop(self, spark):
        # A~B, B~C with no A~C pair: pairwise drop-the-higher-id keeps
        # only A; component labeling keeps exactly one per CLUSTER too,
        # but knows B and C are the same cluster (keeper A for both)
        from clickhouse_metrics_pipeline_spark.operators.dedup import (
            neardup_components,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
        )
        out = neardup_components(pairs)
        rows = {r["doc_id"]: r["keeper_id"] for r in out.collect()}
        assert rows == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


class TestRepetitionMetrics:
    def test_top_token_and_bigram_frac(self, spark):
        from clickhouse_metrics_pipeline_spark.functions.text import (
            top_bigram_frac,
            top_token_frac,
        )

        df = spark.createDataFrame(
            [(1, "a a a b"), (2, "x y z w"), (3, "hi")],
            ["doc_id", "text"],
        )
        out = df.select(
            "doc_id",
            F.round(top_token_frac("text"), 4).alias("tf"),
            F.round(top_bigram_frac("text"), 4).alias("bf"),
        )
        rows = {r["doc_id"]: (r["tf"], r["bf"]) for r in out.collect()}
        assert rows[1] == (0.75, 0.6667)  # 'a' 3/4 tokens; 'a a' 2/3 bigrams
        assert rows[2] == (0.25, 0.3333)  # all distinct
        assert rows[3] == (1.0, 0.0)  # single token: no bigrams


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
class TestStoredIndexEquivalence:
    """The stored-index path (caller-provided banded/shingled/signature
    relations) must produce byte-identical results to the inline path
    that builds scoped intermediates - the contract that lets ingest
    precompute fingerprints without changing query semantics."""

    def test_minhash_and_jaccard_and_simhash(self, spark):
        from clickhouse_metrics_pipeline_spark.operators.dedup import (
            gram_hashes_from_text,
            minhash_band_buckets_from_text,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash60_portable_kernel,
            simhash_pairs,
        )

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        grams = d.select(
            "doc_id", gram_hashes_from_text("text", 3).alias("sh")
        ).persist()
        banded = d.select(
            F.col("doc_id"),
            F.posexplode(
                minhash_band_buckets_from_text("text", 64, 16, 3)
            ).alias("band", "bucket"),
        ).persist()
        sigs = d.select(
            "doc_id", simhash60_portable_kernel("text").alias("sim")
        ).persist()

        inline = sorted(
            map(tuple, minhash_lsh_pairs(d, threshold=0.8).collect())
        )
        stored = sorted(
            map(
                tuple,
                minhash_lsh_pairs(
                    d, threshold=0.8, banded=banded, shingled=grams
                ).collect(),
            )
        )
        assert inline == stored and len(inline) > 0

        inline = sorted(
            map(tuple, ngram_jaccard_pairs(d, threshold=0.8).collect())
        )
        stored = sorted(
            map(
                tuple,
                ngram_jaccard_pairs(d, threshold=0.8, shingled=grams).collect(),
            )
        )
        assert inline == stored and len(inline) > 0

        inline = sorted(
            map(
                tuple,
                simhash_pairs(d, max_hamming=6, portable=True).collect(),
            )
        )
        stored = sorted(
            map(
                tuple,
                simhash_pairs(
                    d, max_hamming=6, portable=True, signatures=sigs
                ).collect(),
            )
        )
        assert inline == stored and len(inline) > 0
        for c in (grams, banded, sigs):
            c.unpersist()


class TestInt8Quantization:
    def test_roundtrip_error_bounded_by_half_scale(self, spark):
        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            int8_dequant_error,
            int8_quantize,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
        q = emb.select(
            "vec_id", "embedding", int8_quantize(F.col("embedding")).alias("q")
        )
        err = q.select(
            "vec_id",
            F.col("q.scale").alias("scale"),
            int8_dequant_error(F.col("embedding"), F.col("q")).alias("e"),
        )
        bad = err.where(
            F.col("e.max_abs_err") > F.col("scale") * 0.5 + 1e-12
        ).count()
        assert bad == 0
        # codes must use the full int8 range: every vector's absmax dim
        # quantizes to exactly +/-127
        full = q.select(
            F.array_max(F.transform(F.col("q.q"), F.abs)).alias("m")
        )
        assert full.where(F.col("m") != 127).count() == 0

    def test_zero_vector_safe(self, spark):
        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            int8_dequant_error,
            int8_quantize,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
            "vec_id BIGINT, embedding ARRAY<FLOAT>",
        )
        out = df.select(
            "vec_id",
            int8_quantize(F.col("embedding")).alias("q"),
        ).orderBy("vec_id").collect()
        assert out[0].q.scale == 0.0 and list(out[0].q.q) == [0, 0, 0]
        assert out[1].q.q[1] == -127  # absmax dim saturates the range


class TestPiiScrub:
    def test_scrubs_and_counts(self, spark):
        from clickhouse_metrics_pipeline_spark.functions.text import (
            pii_counts,
            pii_scrub,
        )

        df = spark.createDataFrame(
            [
                (1, "contact bob.smith+x@example.co.uk or +1 (555) 123-4567"),
                (2, "server at 192.168.0.1 and 10.0.0.255 replied"),
                (3, "no pii here, just 3.14 and v1.2.3.4.5 noise"),
            ],
            "doc_id BIGINT, text STRING",
        )
        out = {
            r.doc_id: r
            for r in df.select(
                "doc_id",
                pii_scrub("text").alias("clean"),
                pii_counts("text").alias("c"),
            ).collect()
        }
        assert out[1].clean == "contact <EMAIL> or <PHONE>"
        assert out[1].c.email == 1 and out[1].c.phone == 1
        assert out[2].clean == "server at <IP> and <IP> replied"
        assert out[2].c.ipv4 == 2
        # precision: decimals / dotted versions are NOT redacted
        assert out[3].clean == "no pii here, just 3.14 and v1.2.3.4.5 noise"
        assert out[3].c.email == out[3].c.phone == out[3].c.ipv4 == 0


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
class TestProductQuantization:
    """PQ codebook training / encoding / ADC search (similarity.py).

    Same recall context as the IVF tests above: the corpus is nearly
    unstructured, so 12-byte codes (16 subspaces x 64 centroids over
    64 dims) have a low recall ceiling - the pins are far above the
    2% chance line and the whole pipeline is deterministic (hash-ranked
    init, sorted partial folds, fixed LUT summation order).
    """

    def _books_codes(self, spark):
        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            pq_encode,
            pq_train_codebooks,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        books = pq_train_codebooks(emb, m=16, ksub=64, iters=2)
        return emb, books, pq_encode(emb, books)

    def test_encode_matches_numpy_and_partitioning(self, spark):
        import numpy as np

        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            pq_encode,
        )

        emb, books, codes = self._books_codes(spark)
        got = {r.vec_id: list(r.codes) for r in codes.collect()}
        B = [np.asarray(b) for b in books]
        ds = B[0].shape[1]
        for r in emb.limit(20).collect():
            x = np.asarray(r.embedding, dtype=np.float64)
            want = [
                int(((x[mi * ds : (mi + 1) * ds] - B[mi]) ** 2).sum(axis=1).argmin())
                for mi in range(len(B))
            ]
            assert got[r.vec_id] == want
        re7 = {
            r.vec_id: list(r.codes)
            for r in pq_encode(emb.repartition(7), books).collect()
        }
        assert got == re7

    def test_adc_distance_is_exact_table_sum(self, spark):
        """ADC distance == the directly-computed quantized distance
        (sum over subspaces of ||probe_sub - centroid[code]||^2)."""
        import numpy as np

        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            pq_adc_topk,
        )

        emb, books, codes = self._books_codes(spark)
        probes = emb.filter(F.col("vec_id") < 3)
        out = pq_adc_topk(codes, probes, books, k=5).collect()
        B = [np.asarray(b) for b in books]
        ds = B[0].shape[1]
        pvec = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
                for r in probes.collect()}
        cmap = {r.vec_id: list(r.codes) for r in codes.collect()}
        for r in out:
            q, c = pvec[r.probe_id], cmap[r.neighbor_id]
            want = sum(
                float(((q[mi * ds : (mi + 1) * ds] - B[mi][c[mi]]) ** 2).sum())
                for mi in range(len(B))
            )
            assert r.adist == pytest.approx(want, abs=1e-5)

    def test_pq_recall_vs_exact_l2(self, spark):
        import numpy as np

        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            pq_adc_topk,
        )

        emb, books, codes = self._books_codes(spark)
        probes = emb.filter(F.col("vec_id") < 20)
        ap: dict[int, set] = {}
        for r in pq_adc_topk(codes, probes, books, k=10).collect():
            ap.setdefault(r.probe_id, set()).add(r.neighbor_id)
        rows = emb.collect()
        ids = np.array([r.vec_id for r in rows])
        X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
        hits = tot = 0
        for p in range(20):
            pi = int(np.where(ids == p)[0][0])
            d = ((X - X[pi]) ** 2).sum(axis=1)
            d[pi] = np.inf
            exact = set(ids[np.argsort(d, kind="stable")[:10]].tolist())
            tot += 10
            hits += len(exact & ap.get(p, set()))
        # measured 0.54 on this corpus; chance would be ~0.02
        assert hits / tot >= 0.45

    def test_lsh_pairs_empty_input_and_band_cap(self, spark):
        from clickhouse_metrics_pipeline_spark.operators.similarity import (
            lsh_ann_pairs,
        )

        empty = spark.createDataFrame(
            [], "vec_id bigint, embedding array<float>"
        )
        out = lsh_ann_pairs(empty, threshold=0.5)
        assert out.columns == ["id_a", "id_b", "cosine_sim"]
        assert out.count() == 0
        with pytest.raises(AssertionError):
            lsh_ann_pairs(empty, planes_per_table=63)


def test_lsh_pairs_modal_dim_survives_ragged_first_row(spark):
    """r8 ADVICE item: the LSH dimension anchors to the MODAL
    dimension of a bounded probe sample, not the first non-null row —
    a single ragged outlier arriving first must not silently drop the
    whole valid corpus."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        lsh_ann_pairs,
    )

    rows = [(0, [1.0, 2.0, 3.0])]  # ragged outlier, id 0, dim 3
    # ten dim-4 rows, two of them identical -> a guaranteed pair
    base = [1.0, 0.5, -0.25, 2.0]
    rows += [(i, [v + (0.0 if i in (1, 2) else i) for v in base])
             for i in range(1, 11)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in lsh_ann_pairs(df, threshold=0.999).collect()
    }
    assert (1, 2) in got or (2, 1) in got
    # the dim-3 outlier cannot participate
    assert all(0 not in p for p in got)


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
def test_lsh_modal_dim_is_exact_not_sample_order_dependent(spark):
    """r9 ADVICE item: the modal dimension comes from EXACT groupBy
    frequencies, not an unordered limit(1001) sample — in a corpus
    with >1001 rows of a minority dimension arriving first, a sampled
    probe could crown the wrong dimension depending on partition
    order."""
    from clickhouse_metrics_pipeline_spark.operators.similarity import (
        lsh_ann_pairs,
    )

    # 1200 dim-3 rows FIRST (would fill any 1001-row head sample),
    # then 1500 dim-4 rows: the true mode is dim 4
    rows = [(i, [float(i % 7), 1.0, -1.0]) for i in range(1200)]
    base = [1.0, 0.5, -0.25, 2.0]
    rows += [
        (2000 + i, [v + (0.0 if i in (1, 2) else i) for v in base])
        for i in range(1500)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).coalesce(1)  # single partition: the old sample saw only dim-3
    got = {
        (r.id_a, r.id_b)
        for r in lsh_ann_pairs(df, threshold=0.999).collect()
    }
    # the two identical dim-4 rows pair up; dim-3 rows are the dropped
    # minority
    assert (2001, 2002) in got or (2002, 2001) in got
    assert all(a >= 2000 and b >= 2000 for a, b in got)
