"""Deterministic KMV (k-minimum-values) distinct-count sketch.

The reference's rollup cascade stores pre-aggregated state per grain
and merges it upward (``scripts/schema.sql:146-373`` — sum/count/
min/max columns re-aggregated 1m→5m→1h); ClickHouse itself ships
mergeable approximate-distinct states (``uniqState``/``uniqMerge``)
for exactly this shape, but the reference schema stops at the exact
aggregates. Spark's built-in ``approx_count_distinct`` is HLL++ and
engine-private: its estimate cannot be reproduced by a DuckDB oracle,
so it can never be hash-checked cross-engine.

This module implements the KMV estimator (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM 2002; the unbiased
``(k-1)/U_(k)`` form from Beyer et al., "On synopses for distinct-value
estimation under multiset operations", SIGMOD 2007) over the
cross-engine ``portable_hash60``:

- the *sketch* of a group is the set of its k smallest distinct 60-bit
  hashes — a value, not a data structure, so it is bit-identical in any
  engine with md5 (twin fragments in ``oracle_fragments``);
- merging partial sketches (union → k smallest) is *lossless* with
  respect to the direct sketch: every one of the global k minima is a
  member of its partial's k minima, so ``merge(partials) == direct``
  exactly — the property that lets a 1m→1h→1d rollup cascade serve
  distinct-count queries from stored state (pinned by
  ``events_kmv_cascade``'s oracle, which computes the DIRECT form);
- the estimate is integer-deterministic: ``|sk|`` exactly when the
  group has fewer than k distinct hashes, else
  ``floor((k-1)·2^60 / h_(k))`` in IEEE double arithmetic that both
  engines evaluate identically.

Scale note: ``kmv_sketch`` alone ships *every* distinct hash of a
group through the shuffle (collect_set has no size bound); that is the
correct exact-k-min shape but not a sketch's bounded-state promise.
``kmv_partial`` is the map-side combine: an Arrow-batched pre-pass
that reduces each input batch to ≤ k hashes per group *before* the
shuffle, after which the reducer's collect_set is bounded by
``batches × k`` per group. Equality with the unbounded path is pinned
in tests/test_sketch.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: size of the portable_hash60 value space; exact as a double.
HASH_SPACE = float(1 << 60)


def kmv_numerator(k: int) -> float:
    """``(k-1)·2^60`` as an exactly-representable double (k ≤ 2^16:
    the product's mantissa is k-1 followed by zero bits)."""
    return float((k - 1) << 60)


def kmv_sketch(hash_col: Column | str, k: int) -> Column:
    """Aggregate: the k smallest distinct hash values of the group, as
    a sorted ``array<bigint>`` — THE canonical KMV state."""
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return F.slice(F.array_sort(F.collect_set(h)), 1, k)


def kmv_merge(sketch_col: Column | str, k: int) -> Column:
    """Aggregate: merge partial sketches (arrays) into the group's
    sketch — union, dedupe, keep k smallest. Associative and lossless
    w.r.t. ``kmv_sketch`` over the raw rows."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))), 1, k
    )


def kmv_estimate(sketch_col: Column | str, k: int) -> Column:
    """Distinct-count estimate from a KMV sketch, as ``bigint``:
    exact ``|sk|`` when the group never filled the sketch, else the
    unbiased ``floor((k-1)·2^60 / h_(k))``. Twin:
    ``oracle_fragments.kmv_estimate_sql``."""
    sk = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return (
        F.when(F.size(sk) < k, F.size(sk).cast("bigint"))
        .otherwise(
            F.floor(
                F.lit(kmv_numerator(k)) / F.element_at(sk, k).cast("double")
            ).cast("bigint")
        )
        .alias("kmv_estimate")
    )


def kmv_sketch_md5(sketch_col: Column | str) -> Column:
    """Order-sensitive md5 over the full sketch (comma-joined decimal
    hashes) — pins every element, not just the kth. Twin:
    ``md5(array_to_string(sk, ','))`` in DuckDB."""
    sk = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.md5(F.array_join(F.transform(sk, lambda x: x.cast("string")), ","))


# --------------------------------------------------------------------------
# Deterministic bottom-k row sample (KMV-style uniform sample)
# --------------------------------------------------------------------------
#
# The same bottom-k-by-hash idea carrying a PAYLOAD: the k rows whose
# portable row-key hash is smallest, as sorted array<struct<h,c>>. A
# deterministic, order-independent, *mergeable* uniform row sample —
# the reservoir a 100 TB scan can actually take (true reservoir
# sampling is sequential; bottom-k-by-hash is embarrassingly parallel
# and re-aggregates minute→hour→day exactly like the KMV sketch, by
# the identical lossless-merge argument over the total (h, c) order).
# Served from rollup state it answers QUANTILE queries, which the
# exact sum/count rollup columns fundamentally cannot. Payloads ride
# as integer cents (tables.value_cents) so every comparison, cut, and
# md5 pin is integer-exact cross-engine. Set semantics: the sample is
# over distinct (h, c); h must derive from a unique row key.


def hash_sample(hash_col: Column | str, cents_col: Column | str, k: int) -> Column:
    """Aggregate: the k (h, c) pairs with lexicographically smallest
    (hash, cents), as a sorted ``array<struct<h:bigint, c:bigint>>`` —
    the canonical bottom-k sample state."""
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    return F.slice(
        F.array_sort(F.collect_set(F.struct(h.alias("h"), c.alias("c")))),
        1,
        k,
    )


def hash_sample_merge(sketch_col: Column | str, k: int) -> Column:
    """Aggregate: merge partial samples — union, dedupe, keep the k
    smallest (h, c). Associative and lossless w.r.t. ``hash_sample``
    over the raw rows (every global bottom-k element is inside its
    partial's bottom-k)."""
    sk = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(sk)))), 1, k
    )


def hash_sample_quantile(sketch_col: Column | str, q_bp: int) -> Column:
    """Type-1 (lower) quantile estimate from a bottom-k sample, as a
    2-decimal double: the cents value at 1-indexed position
    ``ceil(q·n) = (q_bp·n + 9999) div 10000`` of the value-sorted
    sample, over 100. All-integer position arithmetic; the only float
    step is the final cents/100.0, exact for 2-decimal data."""
    sk = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    cs = F.array_sort(F.transform(sk, lambda s: s["c"]))
    n = F.size(cs)
    pos = F.greatest(
        F.lit(1), ((F.lit(q_bp) * n + F.lit(9999)) / F.lit(10000)).cast("int")
    )
    return F.get(cs, pos - F.lit(1)) / F.lit(100.0)


def hash_sample_md5(sketch_col: Column | str) -> Column:
    """Order-sensitive md5 over the full sample (comma-joined ``h:c``
    decimal pairs) — pins every sampled row and its payload. Twin:
    ``hash_sample_md5_sql``."""
    sk = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.md5(
        F.array_join(
            F.transform(
                sk,
                lambda s: F.concat_ws(
                    ":", s["h"].cast("string"), s["c"].cast("string")
                ),
            ),
            ",",
        )
    )


def kmv_partial(
    df: DataFrame, group_cols: list[str], hash_col: str, k: int
) -> DataFrame:
    """Map-side combine for KMV: reduce each Arrow batch to the ≤ k
    smallest distinct ``hash_col`` values per group, with NO shuffle.
    Output schema: ``group_cols + [hash_col]`` (long). Feeding the
    result to ``kmv_sketch`` yields exactly the unbounded sketch —
    any global k-minimum survives every batch's local k-min cut.

    This is the bounded-state path a 100 TB scan needs: the shuffle
    carries ≤ k rows per (group, batch) instead of the group's full
    distinct set. Pure pandas group-nsmallest per batch; stays Arrow-
    batched end to end."""
    cols = list(group_cols) + [hash_col]
    proj = df.select(*cols)
    schema = proj.schema

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dedup = pdf.drop_duplicates(subset=cols)
            yield (
                dedup.sort_values(hash_col)
                .groupby(list(group_cols), sort=False)
                .head(k)[cols]
            )

    return proj.mapInPandas(gen, schema=schema)


def hash_sample_partial(
    df: DataFrame,
    group_cols: list[str],
    hash_col: str,
    cents_col: str,
    k: int,
) -> DataFrame:
    """Map-side combine for the bottom-k sample: reduce each Arrow
    batch to the ≤ k lexicographically-smallest distinct
    ``(hash_col, cents_col)`` rows per group, with NO shuffle. Feeding
    the result to ``hash_sample`` yields exactly the unbounded sample —
    any global bottom-k row survives every batch's local bottom-k cut
    (same argument as ``kmv_partial``, over the total (h, c) order).
    The 100 TB path: the shuffle carries ≤ k rows per (group, batch)
    instead of the group's full row set."""
    cols = list(group_cols) + [hash_col, cents_col]
    proj = df.select(*cols)
    schema = proj.schema

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dedup = pdf.drop_duplicates(subset=cols)
            yield (
                dedup.sort_values([hash_col, cents_col])
                .groupby(list(group_cols), sort=False)
                .head(k)[cols]
            )

    return proj.mapInPandas(gen, schema=schema)
