"""Similarity search over embedding columns (ARRAY<FLOAT>).

- ``cosine_topk``: brute-force top-k neighbors for a (small) probe set.
  The probe side broadcasts; the corpus side streams - no shuffle of the
  corpus, one window per probe for ranking. Dot products are ``zip_with``
  + ``aggregate`` HOFs: JVM-side, no Python.
- ``lsh_ann_pairs``: random-hyperplane LSH (sign-random-projection) for
  corpus-scale near-neighbor pairs. Hyperplane components are derived
  deterministically from xxhash64(plane, dim) - reproducible across runs
  with no stored model. Candidates verified exactly.

At 100 TB: brute-force is O(probes x corpus) - fine for probe lookups,
wrong for all-pairs; the LSH path buckets the corpus (shuffle on small
band keys) and verifies only within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cosine_np(a: Column, b: Column) -> Column:
    """Vectorized cosine similarity: Arrow-batched numpy kernel.

    The HOF form (:func:`cosine`) evaluates three ``aggregate`` lambdas
    per pair — interpreted per element, ~4 passes over each vector — and
    dominates brute-force scoring. This kernel does one (n x d) block
    multiply per Arrow batch instead. Equal to the HOF form well beyond
    4 decimals for float32 inputs; callers round to 4 for oracle
    stability either way."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        try:
            A = np.stack(xs.to_numpy()).astype(np.float64)
            B = np.stack(ys.to_numpy()).astype(np.float64)
            num = (A * B).sum(axis=1)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.where(den > 0, num / np.where(den > 0, den, 1.0), np.nan)
            return pd.Series(out).replace(np.nan, None)
        except ValueError:  # ragged dims — per-row fallback
            out = []
            for x, y in zip(xs, ys):
                xv = np.asarray(x, dtype=np.float64)
                yv = np.asarray(y, dtype=np.float64)
                d = np.linalg.norm(xv) * np.linalg.norm(yv)
                out.append(float(xv @ yv) / d if d > 0 else None)
            return pd.Series(out, dtype="object")

    return _cos(a, b)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI DIVIDE_BY_ZERO error) for zero-norm vectors —
    one degenerate embedding must not fail a corpus-scale job."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per probe. Returns
    (probe_id, neighbor_id, cosine_sim, rank); self-matches excluded."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    sim = (
        F.broadcast(p)
        .crossJoin(c)
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine_np(F.col("_pvec"), F.col("_cvec")))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def cosine_topk_fused(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_probes: int = 4096,
) -> DataFrame:
    """Exact brute-force top-k for a BOUNDED probe set, fused form.

    Same output contract as :func:`cosine_topk` with similarities
    rounded to ``round_to`` decimals by the SAME JVM ``F.round``
    (ties broken by neighbor_id), but a scale-correct plan:
    :func:`cosine_topk` ships every corpus vector through Arrow once
    per probe and window-ranks ALL probes x corpus pair scores — a
    corpus-sized shuffle. Here the probe matrix rides the kernel
    closure (one bounded ``collect``, like the k-means centroids), the
    corpus streams through ``mapInPandas`` ONCE with a single
    (batch x d) @ (d x p) block multiply per Arrow batch, and each
    batch emits only its top-k candidates per probe. The final rank
    runs over <= ~(k+ties) x probes x batches candidate rows: the
    shuffle shrinks from O(|corpus| x p) to O(k x p x batches).

    Rounding parity: the kernel emits RAW similarities and prunes by
    raw order with an epsilon margin — every row within
    ``1.5 * 10^-round_to`` of the batch's kth raw sim is kept, which
    provably covers any row the final ROUNDED ordering could promote
    (one rounding moves a value by at most half an ulp of the rounded
    grid, so two comparands can cross only within one grid step). The
    final stage applies ``F.round`` + window rank — bit-identical to
    the crossJoin reference path, with no numpy re-implementation of
    JVM HALF_UP rounding to drift at half boundaries.

    Ids must be integral (emitted as bigint). Zero-norm vectors get a
    NULL similarity and sort last, matching :func:`cosine`'s try_divide
    semantics. An empty probe set returns an empty result.
    """
    probe_rows = probes.select(id_col, vec_col).limit(max_probes + 1).collect()
    if len(probe_rows) > max_probes:
        raise ValueError(
            f"cosine_topk_fused: probe set exceeds max_probes={max_probes}; "
            "use the LSH/IVF paths for probe sets that are not "
            "driver-boundable"
        )
    spark = corpus.sparkSession
    out_schema = "probe_id bigint, neighbor_id bigint, cosine_sim double"
    final_schema = (
        "probe_id bigint, neighbor_id bigint, cosine_sim double, rank int"
    )
    if not probe_rows:
        return spark.createDataFrame([], final_schema)
    pids = np.asarray([int(r[0]) for r in probe_rows], dtype=np.int64)
    P = np.stack(
        [np.asarray(r[1], dtype=np.float64) for r in probe_rows]
    )  # p x d
    pnorm = np.linalg.norm(P, axis=1)
    # zero-norm probes: similarity NULL everywhere (division guarded)
    Pn = P / np.where(pnorm > 0, pnorm, 1.0)[:, None]
    p_ok = pnorm > 0
    eps = 1.5 * 10.0 ** (-round_to)

    def _gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy().astype(np.int64)
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cnorm = np.linalg.norm(C, axis=1)
            Cn = C / np.where(cnorm > 0, cnorm, 1.0)[:, None]
            sims = Cn @ Pn.T  # n x p
            valid = (cnorm > 0)[:, None] & p_ok[None, :]
            # sort key: raw sim desc (NULL ~ -inf last), id asc
            key = np.where(valid, sims, -np.inf)
            key[ids[:, None] == pids[None, :]] = np.nan  # self: drop
            rows = {"probe_id": [], "neighbor_id": [], "cosine_sim": []}
            kk = min(k, n)
            for j in range(len(pids)):
                col = key[:, j]
                idx = np.flatnonzero(~np.isnan(col))
                if idx.size == 0:
                    continue
                order = np.lexsort((ids[idx], -col[idx]))
                kth = col[idx[order[kk - 1]]] if order.size >= kk else -np.inf
                # epsilon window: rows the ROUNDED order could promote
                take = order[: kk] if kth == -np.inf else order[
                    col[idx[order]] >= kth - eps
                ]
                sel = idx[take]
                rows["probe_id"].extend([pids[j]] * len(sel))
                rows["neighbor_id"].extend(ids[sel].tolist())
                rows["cosine_sim"].extend(
                    [float(sims[i, j]) if valid[i, j] else None for i in sel]
                )
            if rows["probe_id"]:
                yield pd.DataFrame(rows)

    cand = corpus.select(id_col, vec_col).mapInPandas(_gen, schema=out_schema)
    cand = cand.withColumn("cosine_sim", F.round("cosine_sim", round_to))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_sim", "rank")
    )


def int8_quantize(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization, pure JVM expressions.

    Returns ``struct(scale double, q array<tinyint>)`` with
    ``scale = max(|x|)/127`` and ``q[i] = round(x[i]/scale)`` — the
    standard storage/transport compression for embedding corpora (4x
    smaller than float32, dequant ``q[i]*scale``). Zero vectors get
    scale 0 and an all-zero code so a degenerate embedding can't fail a
    corpus-scale job. Map-only: no shuffle, no Python — at 100 TB this
    runs at scan speed inside whole-stage codegen."""
    xd = F.transform(vec, lambda x: x.cast("double"))
    absmax = F.array_max(F.transform(xd, F.abs))
    scale = absmax / F.lit(127.0)
    q = F.when(
        absmax > 0,
        F.transform(xd, lambda x: F.round(x / scale).cast("tinyint")),
    ).otherwise(F.transform(xd, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(
        F.when(absmax > 0, scale).otherwise(F.lit(0.0)).alias("scale"),
        q.alias("q"),
    )


def int8_dequant_error(vec: Column, quant: Column) -> Column:
    """struct(max_abs_err double, mse double) of int8 dequantization.

    ``quant`` is :func:`int8_quantize`'s output. The MSE fold is an
    explicit left-to-right ``aggregate`` so an ANSI-SQL oracle can
    reproduce the exact fp summation order (list_reduce)."""
    s = quant["scale"]
    err = F.zip_with(
        vec, quant["q"], lambda x, qq: F.abs(x.cast("double") - qq * s)
    )
    mse = F.aggregate(
        err, F.lit(0.0), lambda acc, e: acc + e * e
    ) / F.size(vec)
    return F.struct(
        F.array_max(err).alias("max_abs_err"), mse.alias("mse")
    )


def _plane_component(plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.concat_ws(":", F.lit(f"plane{plane}"), dim))
    return (F.pmod(h, F.lit(2_000_000)).cast("double") / F.lit(1_000_000.0)) - 1.0


def srp_signature(vec: Column, num_planes: int = 16) -> Column:
    """Sign-random-projection bits packed into a BIGINT, row-local.

    num_planes <= 62 so every bit mask stays a positive long."""
    assert num_planes <= 62

    def _components(p: int):
        # closure factory - a `p=p` default arg would change the lambda's
        # arity and receive transform's index column instead
        return lambda d: _plane_component(p, d)

    sig = F.lit(0).cast("bigint")
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(vec, F.transform(dims, _components(p)), lambda v, w: v.cast("double") * w),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


_LSH_PLANE_CACHE: dict[tuple[int, int], list[list[float]]] = {}


def lsh_plane_matrix(spark, num_planes: int, dim: int) -> list[list[float]]:
    """The xxhash64-derived float hyperplane bank as a driver-side
    constant: ``planes[p][d] = _plane_component(p, d)`` evaluated once
    by a one-row Spark job (there is no driver-side xxhash64, and the
    bank must match what :func:`srp_signature` would compute so the
    two forms stay interchangeable). num_planes x dim doubles — plane
    metadata, not data; the collect is O(KB). One row per (plane, dim)
    coordinate: a single num_planes*dim-term projection would cost
    tens of seconds of DRIVER analysis/codegen time for the one giant
    expression tree — the same per-row-expression trap this function
    exists to avoid. Cached per (num_planes, dim): the bank is a pure
    function of its coordinates, so repeated calls (warm bench runs,
    retried queries) skip the probe job."""
    cached = _LSH_PLANE_CACHE.get((num_planes, dim))
    if cached is not None:
        return cached
    p = (F.col("id") / dim).cast("int")
    d = (F.col("id") % dim).cast("int")
    # token-identical to _plane_component: xxhash64("plane{p}:{d}")
    h = F.xxhash64(
        F.concat_ws(
            ":",
            F.concat(F.lit("plane"), p.cast("string")),
            d.cast("string"),
        )
    )
    comp = (
        F.pmod(h, F.lit(2_000_000)).cast("double") / F.lit(1_000_000.0)
    ) - 1.0
    rows = (
        spark.range(num_planes * dim)
        .select(F.col("id"), comp.alias("c"))
        .collect()
    )
    mat = [[0.0] * dim for _ in range(num_planes)]
    for r in rows:
        mat[r["id"] // dim][r["id"] % dim] = r["c"]
    _LSH_PLANE_CACHE[(num_planes, dim)] = mat
    return mat


def lsh_ann_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 8,
    planes_per_table: int = 8,
) -> DataFrame:
    """All near-neighbor pairs with cosine >= threshold via SRP-LSH.

    Each table hashes with its own plane block; candidates = pairs
    agreeing on all bits of some table; verified with exact cosine.
    Recall for cos=0.95 at 8x8: 1-(1-0.9^8)^8 ~ 0.99+; raise num_tables
    for stricter guarantees.

    Signatures are ONE Arrow matmul per batch against the xxhash64
    plane bank (collected once via :func:`lsh_plane_matrix`), emitting
    the per-table bucket keys directly — the same lesson the int8 SRP
    path (:func:`srp_int8_pairs`) learned: the per-row zip_with/
    aggregate expression form re-derives every plane component with
    xxhash64 per row and runs as interpreted HOFs (~60 plane folds x
    dim hash evals each — measured seconds for 2000 vectors where the
    matmul is milliseconds). Emitting keys per table also lifts the
    62-bit packed-signature cap on num_tables x planes_per_table."""
    from pyspark.sql.pandas.functions import pandas_udf

    # per-table keys are int64 bit-packs: planes_per_table >= 63 would
    # shift past the sign bit and silently collide buckets (the old
    # packed-signature path asserted the equivalent 62-plane cap)
    assert planes_per_table <= 62, "planes_per_table must be <= 62"
    total_planes = num_tables * planes_per_table
    spark = df.sparkSession
    # probe past NULL embeddings (F.size(NULL) is NULL -> the old
    # int(probe[0]) raised TypeError on a NULL first row; r7 ADVICE)
    # and anchor on the MODAL dimension (r8 ADVICE): if the probe row
    # happened to be the ragged outlier, the ragged-drop filter below
    # silently discarded the bulk of valid embeddings. r9 ADVICE item:
    # the old limit(1001) sample had no ordering, so in a genuinely
    # mixed-dimension corpus the winner — and therefore which rows get
    # dropped — depended on partition order. EXACT dimension
    # frequencies instead: one groupBy over the int size column (a
    # map-side-combinable aggregate whose result is one row per
    # distinct dimension — bounded by construction), deterministic on
    # any cluster layout.
    sizes = (
        df.where(F.col(vec_col).isNotNull())
        .groupBy(F.size(vec_col).alias("_dim"))
        .count()
        .collect()
    )
    if not sizes:
        # empty input: keep the old lazy behavior — an empty result
        # with the output schema, no plane bank, no crash
        return df.limit(0).select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cosine_sim"),
        )
    # most-common dimension; deterministic tiebreak to the smallest
    dim = int(
        max(sizes, key=lambda r: (r["count"], -r["_dim"]))["_dim"]
    )
    # ragged dimensions would crash np.vstack inside the signature
    # kernel with an opaque worker error; NULL/mismatched rows cannot
    # participate in a fixed-plane LSH anyway — drop them explicitly
    # (cosine_np's exact path keeps its own ragged fallback)
    df = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    )
    W = np.array(
        lsh_plane_matrix(spark, total_planes, dim), dtype=np.float64
    )
    pow2 = np.arange(planes_per_table, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def _table_keys(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.to_numpy()).astype(np.float64)
        bits = (V @ W.T > 0).astype(np.int64)  # (n, total_planes)
        banded = bits.reshape(len(V), num_tables, planes_per_table)
        keys = (banded << pow2).sum(axis=2)  # bit i = plane t*ppb+i
        return pd.Series(list(keys))

    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    # r11 optimization (guide §8 — decide with small rows, move big
    # rows once): the banded explode and the bucket self-join used to
    # carry the embedding ARRAY — every vector crossed the explode
    # num_tables times, the join shuffled it on both sides, and the
    # candidate dedup ran distinct() over full vector payloads. The
    # explode/join/distinct now operate on (id, table, key) only —
    # 16 bytes a row — and the surviving candidate ids re-attach their
    # vectors with one id-keyed join per side (AQE broadcasts the
    # id->vec relation when it fits; at scale it is one shuffle of
    # each vector instead of num_tables copies plus array-keyed
    # dedup).
    banded = df.select(
        F.col(id_col),
        F.posexplode(_table_keys(F.col(vec_col))).alias("table", "key"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "table", "key")
    b = banded.select(F.col(id_col).alias("id_b"), "table", "key")
    # dedup BEFORE the Arrow verify: a pair colliding in k tables
    # would pay k cosine round-trips through the Python worker, and
    # the Arrow serialization of candidate vectors dominates this
    # operator (A/B-measured 1.5s vs 2.4s at sf0.1 for verify-first) —
    # the opposite call from the int8 path, whose verification is
    # JVM-side integer arithmetic with nothing to ship
    pairs = (
        a.join(b, ["table", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    cand = pairs.join(
        vecs.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
        ),
        "id_b",
    )
    return (
        cand.withColumn("cosine_sim", cosine_np(F.col("_va"), F.col("_vb")))
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance of a vector column to a literal centroid."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec, lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _nearest_cells(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Indexes of the n nearest centroids, nearest first (row-local HOF
    reference form; see :func:`nearest_cells_np` for the hot path)."""
    scored = F.array(
        *[
            F.struct(_sq_dist(vec, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(F.slice(F.array_sort(scored), 1, n), lambda s: s["i"])


def nearest_cells_np(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Indexes of the n nearest centroids, nearest first (Arrow kernel).

    Same ordering as :func:`_nearest_cells` (squared L2; exact-distance
    ties break toward the lower centroid index — stable argsort). The
    k x d centroid matrix rides the UDF closure instead of being inlined
    as k*d literal sub-expressions: at k=16, d=64 the literal form made
    every retrained-quantizer plan a fresh ~1000-node codegen unit,
    re-analyzed and re-compiled per Lloyd iteration."""
    from pyspark.sql.pandas.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def _nc(xs: pd.Series) -> pd.Series:
        try:
            X = np.stack(xs.to_numpy()).astype(np.float64)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :n].astype(np.int32)
            return pd.Series(list(idx))
        except ValueError:  # ragged dims — per-row fallback
            out = []
            for x in xs:
                d2 = ((np.asarray(x, dtype=np.float64)[None, :] - C) ** 2).sum(
                    axis=-1
                )
                out.append(np.argsort(d2, kind="stable")[:n].astype(np.int32))
            return pd.Series(out)

    return _nc(vec)


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 4,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> list[list[float]]:
    """Train k coarse-quantizer centroids with distributed Lloyd's.

    Per iteration: row-local nearest-centroid assignment + per-cell
    partial sums in one Arrow pass, then a groupBy(cell) reduction; only
    k (sum-vector, count) rows ever reach the driver. At 100 TB pass
    ``sample_fraction`` - IVF quantizers are
    trained on samples (a 0.1% sample of 100 TB is ~100 GB, plenty for
    k<=4096) - and reuse the centroid list across jobs. Deterministic:
    init picks the k rows with the smallest xxhash64 of the vector text,
    so the same corpus always trains the same quantizer. Empty cells
    keep their previous centroid."""
    vecs = df.select(F.col(vec_col).alias("v")).where(F.col(vec_col).isNotNull())
    if sample_fraction is not None:
        vecs = vecs.sample(fraction=sample_fraction, seed=seed)
    init_rows = (
        vecs.withColumn(
            "_h",
            F.xxhash64(F.concat_ws(",", F.transform("v", lambda x: x.cast("string")))),
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r.v] for r in init_rows]
    for _ in range(iters):
        # one job per iteration: each Arrow batch computes assignment +
        # per-cell (sum-vector, count) partials in a single numpy pass
        # (same map-side-combine shape the posexplode/groupBy form had,
        # minus its k*dim-literal plans that re-compiled per iteration)
        C = np.asarray(centroids, dtype=np.float64)

        def _partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
                a = d2.argmin(axis=1)
                cells = np.unique(a)
                yield pd.DataFrame(
                    {
                        "cell": cells.astype(np.int32),
                        "s": [X[a == c].sum(axis=0).tolist() for c in cells],
                        "n": [int((a == c).sum()) for c in cells],
                    }
                )

        # distributed reduction: fold the <= num_partitions partials per
        # cell into one (sum-vector, count) row with a groupBy, so only
        # k rows ever reach the driver (at k=4096 and thousands of
        # partitions, collecting raw partials becomes a driver hot
        # spot). Partials are array_sort'ed before the fold so the
        # float-addition order is deterministic regardless of shuffle
        # arrival order — same centroids every run.
        dim = len(centroids[0])
        partials = vecs.mapInPandas(
            _partials, "cell int, s array<double>, n bigint"
        )
        folded = F.aggregate(
            F.array_sort(F.collect_list(F.struct("s", "n"))),
            F.array_repeat(F.lit(0.0), dim),
            lambda acc, x: F.zip_with(acc, x["s"], lambda a, b: a + b),
        )
        rows = (
            partials.groupBy("cell")
            .agg(folded.alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        agg = {r["cell"]: (np.asarray(r["s"], dtype=np.float64), r["n"]) for r in rows}
        centroids = [
            (agg[i][0] / agg[i][1]).tolist() if i in agg else c
            for i, c in enumerate(centroids)
        ]
    return centroids


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid: adds ``_cell``.

    This is the expensive O(corpus x k x dim) half of an IVF index —
    in deployment it is computed ONCE per (corpus, quantizer) and stored
    as an index column next to the vectors (at 100 TB: written to the
    table, partitioned by ``_cell`` so a probe's cells prune to a
    partition scan). Callers serving repeated queries should persist or
    write the result and pass it back via ``ivf_kmeans_topk``'s
    ``corpus`` argument, which skips re-assignment when ``_cell`` is
    already present."""
    return corpus.withColumn(
        "_cell", F.element_at(nearest_cells_np(F.col(vec_col), centroids, 1), 1)
    )


def ivf_kmeans_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    n_probe_cells: int = 4,
    iters: int = 4,
    centroids: list[list[float]] | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """True IVF-flat ANN: k-means coarse quantizer, per-probe search of
    the n_probe_cells nearest cells only.

    The trained variant of :func:`ivf_topk` (which uses untrained SRP
    cells): centroids adapt to the corpus's cluster structure, so the
    same probe budget buys much higher recall. Pass ``centroids`` to
    reuse a trained quantizer across queries, and a ``corpus`` that
    already carries the :func:`ivf_assign` ``_cell`` column to reuse the
    stored index (the 100 TB deployment shape: train once on a sample,
    assign once, serve every query from the assigned table)."""
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, vec_col, num_cells, iters, sample_fraction
        )
    c = corpus if "_cell" in corpus.columns else ivf_assign(corpus, centroids, vec_col)
    probe_cells = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pvec"),
        F.explode(
            nearest_cells_np(F.col(vec_col), centroids, n_probe_cells)
        ).alias("_cell"),
    )
    sim = (
        F.broadcast(probe_cells)
        .join(c, "_cell")
        .where(F.col("probe_id") != F.col(id_col))
        .withColumn("cosine_sim", cosine_np(F.col("_pvec"), F.col(vec_col)))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", F.col(id_col).alias("neighbor_id"), "cosine_sim", "rank")
    )


def _srp_projection(plane: int, vec: Column) -> Column:
    """Raw dot product of ``vec`` with pseudo-random hyperplane ``plane``."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)

    def _components(p: int):
        return lambda d: _plane_component(p, d)

    return F.aggregate(
        F.zip_with(
            vec, F.transform(dims, _components(plane)), lambda v, w: v.cast("double") * w
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    n_probe_cells: int = 4,
) -> DataFrame:
    """IVF-flat style ANN: coarse-quantize the corpus into SRP cells,
    search each probe only in its n_probe_cells likeliest cells.

    Multi-probe cell selection (Lv et al., 2007): a near neighbor's cell
    differs from the probe's on the planes the probe is CLOSEST to, so
    candidate cells are ranked by the summed |projection margin| of their
    flipped planes and the cheapest n_probe_cells are searched. Ranking
    is row-local on the (small, broadcast) probe side; the corpus side
    only computes its own cell. Approximate: recall < 1 by design - the
    scale path when brute force is too expensive and pairwise LSH too
    broad."""
    import math

    bits = max(1, int(math.log2(num_cells)))
    c = corpus.withColumn("_cell", srp_signature(F.col(vec_col), bits))
    projs = F.array(*[_srp_projection(j, F.col(vec_col)) for j in range(bits)])
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pvec"),
        projs.alias("_projs"),
    )
    own_cell = F.lit(0).cast("bigint")
    for j in range(bits):
        own_cell = own_cell + F.when(
            F.element_at("_projs", j + 1) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    # all 2^bits flip masks scored by summed |margin| of flipped planes;
    # mask 0 scores 0.0 so the own cell always ranks first
    scored = F.array(
        *[
            F.struct(
                sum(
                    (
                        F.abs(F.element_at("_projs", j + 1))
                        for j in range(bits)
                        if m & (1 << j)
                    ),
                    start=F.lit(0.0),
                ).alias("score"),
                own_cell.bitwiseXOR(F.lit(m)).alias("cell"),
            )
            for m in range(1 << bits)
        ]
    )
    probe_cells = p.select(
        "probe_id",
        "_pvec",
        F.explode(
            F.transform(
                F.slice(F.array_sort(scored), 1, n_probe_cells),
                lambda s: s["cell"],
            )
        ).alias("_cell"),
    )
    sim = (
        F.broadcast(probe_cells)
        .join(c, "_cell")
        .where(F.col("probe_id") != F.col(id_col))
        .withColumn("cosine_sim", cosine_np(F.col("_pvec"), F.col(vec_col)))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", F.col(id_col).alias("neighbor_id"), "cosine_sim", "rank")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance (ADC) search
# --------------------------------------------------------------------------


def pq_train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Train PQ codebooks: split dim into ``m`` contiguous subspaces and
    k-means each independently, giving ``m`` codebooks of ``ksub``
    centroids (Jegou et al. 2011, "Product Quantization for Nearest
    Neighbor Search"). The subspace problems are independent, so ALL m
    of them advance in ONE Lloyd's pass per iteration (cell key =
    mi * ksub + j) — ``iters`` corpus passes total, not m * iters; at
    100 TB pass ``sample_fraction`` like any quantizer training.

    Deterministic, same recipe as :func:`kmeans_centroids`: init takes
    the ksub rows with the smallest xxhash64 of the full vector text
    (each contributing its subvector to every codebook), and partial
    sums are array_sort-folded so float-addition order is fixed. Empty
    cells keep their previous centroid."""
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    vecs = df.select(F.col(vec_col).alias("v")).where(F.col(vec_col).isNotNull())
    if sample_fraction is not None:
        vecs = vecs.sample(fraction=sample_fraction, seed=42)
    init_rows = (
        vecs.withColumn(
            "_h",
            F.xxhash64(F.concat_ws(",", F.transform("v", lambda x: x.cast("string")))),
        )
        .orderBy("_h")
        .limit(ksub)
        .collect()
    )
    init = np.stack([np.asarray(r.v, dtype=np.float64) for r in init_rows])
    # books[mi] is (ksub, ds); init row j seeds code j of every subspace
    books = [init[:, mi * ds : (mi + 1) * ds].copy() for mi in range(m)]
    for _ in range(iters):
        B = [b.copy() for b in books]

        def _partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                out_c, out_s, out_n = [], [], []
                for mi in range(m):
                    Xs = X[:, mi * ds : (mi + 1) * ds]
                    d2 = ((Xs[:, None, :] - B[mi][None, :, :]) ** 2).sum(axis=-1)
                    a = d2.argmin(axis=1)
                    for j in np.unique(a):
                        out_c.append(mi * ksub + int(j))
                        out_s.append(Xs[a == j].sum(axis=0).tolist())
                        out_n.append(int((a == j).sum()))
                yield pd.DataFrame({"cell": out_c, "s": out_s, "n": out_n})

        folded = F.aggregate(
            F.array_sort(F.collect_list(F.struct("s", "n"))),
            F.array_repeat(F.lit(0.0), ds),
            lambda acc, x: F.zip_with(acc, x["s"], lambda a, b: a + b),
        )
        rows = (
            vecs.mapInPandas(_partials, "cell int, s array<double>, n bigint")
            .groupBy("cell")
            .agg(folded.alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        agg = {r["cell"]: (np.asarray(r["s"]), r["n"]) for r in rows}
        for mi in range(m):
            for j in range(ksub):
                c = mi * ksub + j
                if c in agg:
                    books[mi][j] = agg[c][0] / agg[c][1]
    return [b.tolist() for b in books]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as its per-subspace nearest-centroid code:
    (id_col, codes ARRAY<INT> of length m). One Arrow pass, all m
    subspaces per batch — the O(corpus * ksub * dim) half of a PQ
    index, computed ONCE per (corpus, codebooks) and stored next to the
    ids in deployment (8 bytes/vector at 8x16; the float vectors are
    not needed at serve time)."""
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    ds = B[0].shape[1]

    def _enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for mi in range(m):
                Xs = X[:, mi * ds : (mi + 1) * ds]
                d2 = ((Xs[:, None, :] - B[mi][None, :, :]) ** 2).sum(axis=-1)
                codes[:, mi] = d2.argmin(axis=1)
            yield pd.DataFrame({"_id": pdf["_id"], "codes": list(codes)})

    return (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .mapInPandas(_enc, "_id bigint, codes array<int>")
        .withColumnRenamed("_id", id_col)
    )


def pq_adc_topk(
    codes: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: exact probe subvectors against the
    quantized corpus. Per probe, a lookup table LUT[mi][j] =
    ||probe_mi - codebook[mi][j]||^2 is built ONCE (driver-side numpy —
    probes are the bounded serving-request set, they arrive at the
    driver by definition); each corpus code then scores in m table
    lookups, no float vector ever touched (Jegou et al. 2011, ADC).

    Scale: the LUT array (n_probes * m * ksub doubles) broadcasts in
    the task closure; the corpus-side Arrow pass keeps only the k best
    per probe PER BATCH, so the final shuffle carries
    O(partitions * probes * k) rows, never the corpus. Deterministic:
    fixed m-order LUT summation, ties cut by neighbor id."""
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m, ksub = len(B), len(B[0])
    ds = B[0].shape[1]
    prows = probes.select(
        F.col(id_col).alias("pid"), F.col(vec_col).alias("pv")
    ).collect()
    pids = np.asarray([r.pid for r in prows], dtype=np.int64)
    P = np.stack([np.asarray(r.pv, dtype=np.float64) for r in prows])
    lut = np.empty((len(pids), m, ksub), dtype=np.float64)
    for mi in range(m):
        Ps = P[:, mi * ds : (mi + 1) * ds]
        lut[:, mi, :] = ((Ps[:, None, :] - B[mi][None, :, :]) ** 2).sum(axis=-1)

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # n x m
            ids = pdf["_id"].to_numpy()
            # adist[p, n] = sum_mi lut[p, mi, C[n, mi]] in fixed mi order
            adist = np.zeros((len(pids), len(C)), dtype=np.float64)
            for mi in range(m):
                adist += lut[:, mi, :][:, C[:, mi]]
            out_p, out_i, out_d = [], [], []
            for p in range(len(pids)):
                mask = ids != pids[p]  # exclude self
                cand_i, cand_d = ids[mask], adist[p][mask]
                order = np.lexsort((cand_i, cand_d))[:k]
                out_p.extend([pids[p]] * len(order))
                out_i.extend(cand_i[order])
                out_d.extend(cand_d[order])
            yield pd.DataFrame(
                {"probe_id": out_p, "neighbor_id": out_i, "adist": out_d}
            )

    partial = codes.select(
        F.col(id_col).alias("_id"), "codes"
    ).mapInPandas(_score, "probe_id bigint, neighbor_id bigint, adist double")
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.round("adist", 6).alias("adist"), "rank")
    )


# --------------------------------------------------------------------------
# Integer SRP-LSH semantic near-dup over int8-quantized embeddings
# --------------------------------------------------------------------------

SRP_WEIGHT_RANGE = 1001  # hyperplane components in [-500, 500]


def srp_plane_expr(n_planes: int, dim: int) -> Column:
    """The banked SRP hyperplanes as one nested array expression:
    ``planes[p][d] = portable_hash60('srp:p:d') % 1001 - 500``.

    Derived entirely from md5 of the (plane, dim) coordinates, so any
    engine regenerates the identical integer hyperplane bank — the
    property that makes the whole SRP pipeline value-hash checkable
    against DuckDB, unlike float-Gaussian SRP whose planes live in a
    numpy seed."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: portable_hash60(
                F.concat(
                    F.lit("srp:"),
                    p.cast("string"),
                    F.lit(":"),
                    d.cast("string"),
                )
            )
            % SRP_WEIGHT_RANGE
            - (SRP_WEIGHT_RANGE - 1) // 2,
        ),
    )


def srp_int8_pairs(
    emb: DataFrame,
    n_bands: int = 8,
    rows_per_band: int = 6,
    dim: int = 64,
    tau_num: int = 9,
    tau_den: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded signed-random-projection near-dup pairs over the
    int8-quantized corpus, verified by integer cosine — SemDeDup's
    scalable shape (bucket, then verify within buckets) made
    cross-engine EXACT: quantization is the deterministic
    :func:`int8_quantize`, hyperplanes are md5-derived integers
    (:func:`srp_plane_expr`), the bucket id is sign-bit arithmetic, and
    the cosine >= tau_num/tau_den acceptance is the cross-multiplied
    integer test ``dot > 0 AND (tau_den*dot)^2 >= tau_num^2 * |a|^2 *
    |b|^2`` — no float anywhere after quantization, so a DuckDB twin
    reproduces the full approximate result hash-for-hash (the one
    ANN-family operator here with a value-hash oracle instead of a
    rows-only check; recall-vs-exact is pinned separately in pytest).

    Magnitudes stay in BIGINT: |dot| <= 64*127^2 ~ 1.0e6, so
    (20*dot)^2 ~ 4.3e14 and 81*|a|^2*|b|^2 ~ 8.6e13.

    Scale: signatures are one Arrow matmul per batch (map-only); the
    shuffles are the band-bucket self-join and a 3-int-column pair
    dedup AFTER verification (the filter commutes with distinct, so
    the q arrays never enter the distinct shuffle). Candidate volume
    is ~ n_bands * n^2 / 2^rows_per_band: SIZE THE BAND WIDTH so
    n / 2^rows_per_band stays O(1) — at 100M vectors that means
    >= 24-bit bands, while the 6-bit default is a small-corpus /
    low-threshold demonstration point (the scale probe runs the wide
    configuration; tools/scale_probe.py). ``max_bucket`` applies the
    standard occupancy cap: buckets holding more members are dropped
    from candidate generation (hot buckets are low-information — the
    LSH twin of the n-gram df-cap), hard-bounding per-band work at
    n * max_bucket; the cap is deterministic (a window count over the
    same (band, bucket) partitioning the self-join uses), so a capped
    run still has an exact SQL twin. Banding tradeoff as
    usual: recall rises with similarity (sign-agreement probability
    1 - theta/pi per plane), so high-similarity semantic dups are
    caught with high probability while the exact baseline
    (emb_neardup_pairs) remains the verification oracle."""
    n_planes = n_bands * rows_per_band
    # Fused Arrow signature kernel: quantize + squared norm + all
    # plane dots as ONE numpy matmul per batch, emitting
    # struct<q, n2, bks> in a single pass. The hyperplane bank is the
    # same md5 closed form as srp_plane_expr (spot-pinned in tests),
    # and rounding (sign * floor(|x|+0.5)) is half-away-from-zero like
    # Spark/DuckDB round(), so q — and therefore every downstream dot,
    # bucket bit, and the acceptance test — is computed from one
    # definition; buckets and dots can never disagree. (The
    # expression form — zip_with/aggregate folds per row — measured
    # interpreted-HOF slow: ~16 s for 2000 vectors at sf0.1; the
    # matmul is milliseconds.)
    import hashlib

    from pyspark.sql.pandas.functions import pandas_udf

    W = np.array(
        [
            [
                int(
                    hashlib.md5(f"srp:{p}:{d}".encode()).hexdigest()[:15],
                    16,
                )
                % SRP_WEIGHT_RANGE
                - (SRP_WEIGHT_RANGE - 1) // 2
                for d in range(dim)
            ]
            for p in range(n_planes)
        ],
        dtype=np.float64,
    )
    pow2 = 1 << np.arange(rows_per_band - 1, -1, -1, dtype=np.int64)

    @pandas_udf("struct<q:array<bigint>,n2:bigint,bks:array<bigint>>")
    def _sig(vecs: pd.Series) -> pd.DataFrame:
        V = np.vstack(vecs.to_numpy()).astype(np.float64)
        s = np.abs(V).max(axis=1, keepdims=True) / 127.0
        with np.errstate(invalid="ignore", divide="ignore"):
            x = np.where(s > 0, V / s, 0.0)
        q = np.sign(x) * np.floor(np.abs(x) + 0.5)  # half-away, like round()
        bits = (q @ W.T) >= 0
        bks = (
            bits.reshape(len(V), n_bands, rows_per_band) * pow2
        ).sum(axis=2)
        qi = q.astype(np.int64)
        return pd.DataFrame(
            {
                "q": list(qi),
                "n2": np.einsum("ij,ij->i", qi, qi),
                "bks": list(bks.astype(np.int64)),
            }
        )

    sh = emb.select(
        F.col(id_col).alias("vid"), _sig(F.col(vec_col)).alias("s")
    )
    bkt = sh.select(
        "vid",
        F.col("s.q").alias("q"),
        F.col("s.n2").alias("n2"),
        F.posexplode("s.bks").alias("band", "bucket"),
    )
    if max_bucket is not None:
        # occupancy cap as a window count over the SAME (band, bucket)
        # partitioning the self-join shuffles on: one exchange, reused
        # by both join sides (no separate groupBy + broadcast anti-join
        # pass, no cache of the signature relation — measured ~25%
        # faster end-to-end at sf0.1 than the cache + anti-join form)
        occ = Window.partitionBy("band", "bucket")
        bkt = (
            bkt.withColumn("_n", F.count(F.lit(1)).over(occ))
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a, b = bkt.alias("a"), bkt.alias("b")

    # Arrow pair scorer: one einsum per batch over the collision
    # stream. Per-pair interpreted HOF dots measured ~8 s at sf0.1 on
    # the 6-bit demo banding (~n^2/64 collisions); the batched integer
    # matmul is milliseconds and numerically identical (int8 codes,
    # |dot| <= 1e6 — exact in int64 and in float64 alike).
    @pandas_udf("bigint")
    def _pair_dot(qa: pd.Series, qb: pd.Series) -> pd.Series:
        if len(qa) == 0:
            return pd.Series([], dtype="int64")
        A = np.vstack(qa.to_numpy()).astype(np.int64)
        B = np.vstack(qb.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    # verify BEFORE the pair dedup: the integer test commutes with
    # distinct, runs on columns already in hand at the join output,
    # and leaves only (vec_a, vec_b, dot_q) ints for the distinct
    # shuffle — the q arrays never leave the join stage
    scored = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.col("a.n2").alias("_na"),
            F.col("b.n2").alias("_nb"),
            _pair_dot(F.col("a.q"), F.col("b.q")).alias("dot_q"),
        )
    )
    out = (
        scored.where(
            (F.col("dot_q") > 0)
            & (
                F.lit(tau_den * tau_den) * F.col("dot_q") * F.col("dot_q")
                >= F.lit(tau_num * tau_num) * F.col("_na") * F.col("_nb")
            )
        )
        .select("vec_a", "vec_b", "dot_q")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    from clickhouse_metrics_pipeline_spark.operators.dedup import (
        _materialize_release,
    )

    # nothing is cache()d anymore (the window cap reuses the join's own
    # exchange), but the eager checkpoint still pins the small pair set
    # so downstream consumers (semantic dedup, stored indexes) don't
    # re-run the kernel per branch
    return _materialize_release(out)


# --------------------------------------------------------------------------
# Deterministic-integer IVF (trained k-means coarse quantizer with a
# value-hash oracle)
# --------------------------------------------------------------------------


def _int_dist2(a: Column, b: Column) -> Column:
    """Integer squared L2 between two BIGINT arrays — one zip_with +
    aggregate fold, fully codegen'd."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )


def _trunc_div(num: Column, den: Column) -> Column:
    """Truncating integer division, sign-aware, engine-invariant:
    (n - n % d) / d with dividend-signed % (Spark/Java and DuckDB
    agree), exactly divisible so the double detour is exact."""
    return ((num - num % den) / den).cast("bigint")


def int_kmeans_fit_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic INTEGER Lloyd k-means over the int8-quantized
    corpus: returns (centroids(cid, cvec), assignment(vec_id, q, cid)).

    Everything is engine-invariant integer arithmetic, so a DuckDB twin
    recomputes the identical model — the property the float/rand()
    k-means of ``ivf_kmeans_topk`` cannot offer (its queries are graded
    rows-only; this one hashes):

    - init: the k corpus vectors with the smallest md5-derived
      ``portable_hash60('ivf:' || vec_id)`` (hash-order = a uniform
      deterministic sample; distributed top-k via orderBy+limit, never
      a full sort),
    - assignment: argmin of integer squared L2, ties to the lowest
      centroid id via the single sort key ``dist2 * k + cid`` — an
      Arrow kernel (one int64 distance-matrix pass per batch; the
      centroid matrix rides the closure, the same bounded pattern the
      float k-means uses),
    - update: each Lloyd iteration is ONE job: the kernel emits
      per-batch per-cell (sum-vector, count) integer partials
      (map-side combine), the driver adds them (integer addition —
      combine-order free) and takes the truncating per-dimension mean;
      a cluster that loses every member keeps its previous centroid.
      The first cut ran assignment and update as separate
      shuffle/join/checkpoint chains — ~20 stages for 2 iterations,
      5-7 s at sf0.1 against <2 s for this treeAggregate shape with
      identical integer results.

    Scale: iters+1 map-only corpus passes total; driver traffic is
    (batches x k) partial rows per iteration and the k-row centroid
    matrix — the float-kmeans treeAggregate contract."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )
    from pyspark.sql.pandas.functions import pandas_udf

    qv = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            int8_quantize(F.col(vec_col))["q"], lambda x: x.cast("bigint")
        ).alias("q"),
    )
    seed_rows = (
        qv.select(
            "vec_id",
            "q",
            portable_hash60(
                F.concat(F.lit("ivf:"), F.col("vec_id").cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "vec_id")
        .limit(k)
        .collect()
    )
    C = np.asarray([r.q for r in seed_rows], dtype=np.int64)

    for _ in range(iters):
        Cc = C.copy()

        def _partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
                d2 = ((Q[:, None, :] - Cc[None, :, :]) ** 2).sum(axis=-1)
                skey = d2 * k + np.arange(k, dtype=np.int64)[None, :]
                a = skey.argmin(axis=1)
                cells = np.unique(a)
                yield pd.DataFrame(
                    {
                        "cid": cells.astype(np.int64),
                        "s": [Q[a == c].sum(axis=0).tolist() for c in cells],
                        "n": [int((a == c).sum()) for c in cells],
                    }
                )

        parts = qv.mapInPandas(
            _partials, "cid bigint, s array<bigint>, n bigint"
        ).collect()
        sums = np.zeros_like(C)
        cnts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r.cid] += np.asarray(r.s, dtype=np.int64)
            cnts[r.cid] += r.n
        for c in range(k):
            if cnts[c] > 0:
                s = sums[c]
                # C-style truncating division, matching the SQL twin's
                # (s - s % n) / n on dividend-signed remainders
                C[c] = np.sign(s) * (np.abs(s) // cnts[c])

    spark = emb.sparkSession
    cent = spark.createDataFrame(
        [(i, [int(x) for x in C[i]]) for i in range(k)],
        "cid bigint, cvec array<bigint>",
    )

    Cf = C.copy()

    @pandas_udf("bigint")
    def _assign_final(qs: pd.Series) -> pd.Series:
        Q = np.vstack(qs.to_numpy()).astype(np.int64)
        d2 = ((Q[:, None, :] - Cf[None, :, :]) ** 2).sum(axis=-1)
        skey = d2 * k + np.arange(k, dtype=np.int64)[None, :]
        return pd.Series(skey.min(axis=1) % k)

    # the assignment relation IS the IVF index (vec_id, q, cid); lazy
    # checkpoint so the probe phase's two consumers (probe lookup,
    # candidate join) materialize it once — in production this is the
    # stored-index write
    assigned = qv.select(
        "vec_id", "q", _assign_final(F.col("q")).alias("cid")
    ).localCheckpoint(eager=False)
    return cent, assigned


def ivf_int_topk(
    emb: DataFrame,
    k_clusters: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    topk: int = 5,
    probe_max_id: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with the deterministic integer coarse quantizer: probes
    (vec_id < probe_max_id) search only the ``nprobe`` nearest
    clusters, ranked by integer squared L2, ties to the lower vec_id.
    Returns (probe_id, rank, vec_id, dist2) — O(k) rows per probe.

    Scale: the trained centroid relation is k rows (broadcast); the
    candidate join touches only the probed clusters' members —
    corpus-fraction ~ nprobe/k — and the per-probe top-k is a bounded
    window over that candidate stream. Recall-vs-exact for the float
    IVF family is pinned in pytest; this integer variant trades the
    trained-float codebook for full value-hash oracle coverage.

    This convenience form retrains per call; the catalog memoizes the
    (centroids, assigned) model per corpus and calls
    :func:`ivf_int_probe` — the train-once / probe-per-query
    deployment shape the float IVF family already uses."""
    cent, assigned = int_kmeans_fit_assign(
        emb, k=k_clusters, iters=iters, id_col=id_col, vec_col=vec_col
    )
    return ivf_int_probe(
        cent,
        assigned,
        k_clusters=k_clusters,
        nprobe=nprobe,
        topk=topk,
        probe_max_id=probe_max_id,
    )


def ivf_int_probe(
    cent: DataFrame,
    assigned: DataFrame,
    k_clusters: int = 8,
    nprobe: int = 2,
    topk: int = 5,
    probe_max_id: int = 10,
) -> DataFrame:
    """Probe phase of the integer IVF: search the memoized/stored
    (centroids, assigned) model. See :func:`ivf_int_topk`."""
    probes = assigned.where(F.col("vec_id") < probe_max_id).select(
        F.col("vec_id").alias("probe_id"), F.col("q").alias("pq")
    )
    pc_scored = probes.crossJoin(F.broadcast(cent)).select(
        "probe_id",
        "pq",
        "cid",
        (_int_dist2(F.col("pq"), F.col("cvec")) * F.lit(k_clusters)
         + F.col("cid")).alias("_skey"),
    )
    w_pc = Window.partitionBy("probe_id").orderBy("_skey")
    pc = pc_scored.withColumn("_r", F.row_number().over(w_pc)).where(
        F.col("_r") <= nprobe
    ).select("probe_id", "pq", "cid")
    # pc is O(probes x nprobe) rows — broadcast it so the index
    # relation is never shuffled by cid
    cand = assigned.join(F.broadcast(pc), "cid").where(
        F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        "vec_id",
        _int_dist2(F.col("pq"), F.col("q")).alias("dist2"),
    )
    w_top = Window.partitionBy("probe_id").orderBy("dist2", "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(w_top).cast("bigint"))
        .where(F.col("rank") <= topk)
        .select("probe_id", "rank", "vec_id", "dist2")
    )


# --------------------------------------------------------------------------
# Deterministic-integer product quantization with ADC search
# --------------------------------------------------------------------------


def int_pq_fit_encode(
    emb: DataFrame,
    m_subs: int = 4,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, DataFrame]:
    """Deterministic INTEGER product quantization (Jegou et al. 2011)
    over the int8-quantized corpus: the 64-dim code space splits into
    ``m_subs`` subspaces, each with its own ``k_codes``-centroid
    integer k-means codebook. Returns (codebooks[m, k, dim/m] int64,
    encoded(vec_id, q, codes)).

    Same engine-invariant recipe as :func:`int_kmeans_fit_assign`, run
    for ALL subspaces in one pass per iteration (the subspace id is a
    group key, not a loop): md5-hash-order seeds (the k_codes
    hash-smallest vectors donate their sub-vectors to every subspace's
    initial codebook), argmin on the ``dist2 * k + cid`` sort key,
    truncating-division centroid updates, empty cells keep their
    centroid. Every quantity is integer, so a DuckDB twin rebuilds the
    identical codebooks and codes — the float PQ (``pq_adc_topk``)
    stays rows-only; this one hashes.

    Scale: iters+1 map-only corpus passes; driver traffic is
    (batches x m x k) integer partials per iteration and the m*k*sub
    codebook array."""
    from clickhouse_metrics_pipeline_spark.functions.hashing import (
        portable_hash60,
    )
    from pyspark.sql.pandas.functions import pandas_udf

    qv = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            int8_quantize(F.col(vec_col))["q"], lambda x: x.cast("bigint")
        ).alias("q"),
    )
    seed_rows = (
        qv.select(
            "vec_id",
            "q",
            portable_hash60(
                F.concat(F.lit("pq:"), F.col("vec_id").cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "vec_id")
        .limit(k_codes)
        .collect()
    )
    dim = len(seed_rows[0].q)
    sub = dim // m_subs
    # B[s, j] = sub-vector s of the j-th hash-ranked seed
    B = np.asarray(
        [
            [list(r.q[s * sub : (s + 1) * sub]) for r in seed_rows]
            for s in range(m_subs)
        ],
        dtype=np.int64,
    )  # m x k x sub

    for _ in range(iters):
        Bc = B.copy()

        def _partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
                X = Q.reshape(len(Q), m_subs, sub)
                out_cid, out_s, out_n, out_sub = [], [], [], []
                for s_i in range(m_subs):
                    d2 = (
                        (X[:, s_i, None, :] - Bc[s_i][None, :, :]) ** 2
                    ).sum(axis=-1)
                    skey = d2 * k_codes + np.arange(k_codes, dtype=np.int64)
                    a = skey.argmin(axis=1)
                    for c in np.unique(a):
                        out_sub.append(s_i)
                        out_cid.append(int(c))
                        out_s.append(X[a == c, s_i].sum(axis=0).tolist())
                        out_n.append(int((a == c).sum()))
                yield pd.DataFrame(
                    {"sub": out_sub, "cid": out_cid, "s": out_s, "n": out_n}
                )

        parts = qv.mapInPandas(
            _partials, "sub bigint, cid bigint, s array<bigint>, n bigint"
        ).collect()
        sums = np.zeros_like(B)
        cnts = np.zeros((m_subs, k_codes), dtype=np.int64)
        for r in parts:
            sums[r.sub, r.cid] += np.asarray(r.s, dtype=np.int64)
            cnts[r.sub, r.cid] += r.n
        for s_i in range(m_subs):
            for c in range(k_codes):
                if cnts[s_i, c] > 0:
                    v = sums[s_i, c]
                    B[s_i, c] = np.sign(v) * (np.abs(v) // cnts[s_i, c])

    Bf = B.copy()

    @pandas_udf("array<bigint>")
    def _encode(qs: pd.Series) -> pd.Series:
        Q = np.vstack(qs.to_numpy()).astype(np.int64)
        X = Q.reshape(len(Q), m_subs, sub)
        codes = np.empty((len(Q), m_subs), dtype=np.int64)
        for s_i in range(m_subs):
            d2 = ((X[:, s_i, None, :] - Bf[s_i][None, :, :]) ** 2).sum(
                axis=-1
            )
            skey = d2 * k_codes + np.arange(k_codes, dtype=np.int64)
            codes[:, s_i] = skey.argmin(axis=1)
        return pd.Series(list(codes))

    encoded = qv.select(
        "vec_id", "q", _encode(F.col("q")).alias("codes")
    ).localCheckpoint(eager=False)
    return B, encoded


def pq_int_adc_topk(
    codebooks: np.ndarray,
    encoded: DataFrame,
    topk: int = 5,
    probe_max_id: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the integer PQ codes:
    each probe (vec_id < probe_max_id) builds its integer lookup table
    LUT[sub][code] = dist2(probe sub-vector, codebook centroid) —
    m x k small ints — and every corpus vector scores as the SUM of m
    table lookups on its stored codes. Returns (probe_id, rank,
    vec_id, adc_dist2); ties to the lower vec_id; self excluded.

    Scale: the scan is the point of ADC — one map-only pass over the
    code table (m bigints per vector, 5x smaller than the int8
    vectors) with per-row cost m lookups; the LUTs ride a broadcast
    probe relation; per-probe top-k is a bounded window."""
    m_subs, k_codes, sub = codebooks.shape
    spark = encoded.sparkSession
    probes = encoded.where(F.col("vec_id") < probe_max_id).select(
        F.col("vec_id").alias("probe_id"), F.col("q").alias("pq")
    )
    # LUTs are exact integers; build them driver-side from the k-row
    # probe collect (bounded like the centroid collects)
    rows = probes.collect()
    lut_rows = []
    for r in rows:
        X = np.asarray(r.pq, dtype=np.int64).reshape(m_subs, sub)
        lut = [
            [
                int(((X[s_i] - codebooks[s_i, c]) ** 2).sum())
                for c in range(k_codes)
            ]
            for s_i in range(m_subs)
        ]
        lut_rows.append((int(r.probe_id), lut))
    lut_df = spark.createDataFrame(
        lut_rows, "probe_id bigint, lut array<array<bigint>>"
    )
    scored = encoded.crossJoin(F.broadcast(lut_df)).where(
        F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        "vec_id",
        F.aggregate(
            F.zip_with(
                "codes", "lut", lambda c, row: F.element_at(row, (c + 1).cast("int"))
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("adc_dist2"),
    )
    w = Window.partitionBy("probe_id").orderBy("adc_dist2", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= topk)
        .select("probe_id", "rank", "vec_id", "adc_dist2")
    )
