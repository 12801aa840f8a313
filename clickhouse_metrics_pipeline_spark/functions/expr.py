"""Row-local expression helpers shared by the column-kernel modules.

``row_let`` is the r11-optimization let-binding primitive (guide §1.2
step 2): Spark performs no common-subexpression elimination inside
higher-order-function lambda bodies (HOFs are CodegenFallback, so the
codegen-level subexpression elimination never sees them), which makes a
kernel that mentions an expensive subtree k times re-evaluate it k
times per row. Routing the shared subtrees through a 1-element
``transform`` evaluates each exactly once per row and turns every later
mention into a lambda-variable lookup. Same values, same types, no
plan-shape change (shuffles/aggregates identical).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column
from pyspark.sql import functions as F


def memo_expr(fn):
    """Memoize a kernel's COLUMN EXPRESSION construction (r11
    optimization, guide §1.2 step 2 — but for the driver side).

    Building the big HOF kernels costs thousands of py4j round trips —
    measured 0.3-0.9 s of pure plan construction per bench invocation
    (e.g. hist_percentile_events: fn()=0.907 s before any action).
    Unresolved Column expressions are immutable and attribute-resolved
    per plan, so one instance is safely shared across DataFrames and
    queries; memoizing by the (hashable) argument tuple makes repeat
    constructions free.

    This caches the EXPRESSION TREE only — never data, never results:
    every action still computes from the parquet inputs. Calls with a
    live Column argument (unhashable) fall through uncached. Sessions
    share one JVM per process, so cached JVM expression handles stay
    valid across SparkSession restarts — but NOT across a py4j gateway
    restart (r11 ADVICE): a cached handle into a dead JVM fails with
    an opaque py4j error far from the cause, so the cache key carries
    the gateway identity and a fresh gateway rebuilds its expressions."""
    cache: dict = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        from pyspark import SparkContext

        key = (
            id(SparkContext._gateway),
            args,
            tuple(sorted(kwargs.items())),
        )
        try:
            hash(key)
        except TypeError:
            return fn(*args, **kwargs)
        if key not in cache:
            cache[key] = fn(*args, **kwargs)
        return cache[key]

    wrapper.__wrapped__ = fn
    return wrapper


def packed_ts_order(ts: Column | str, tiebreak: Column | str) -> Column:
    """The (ts, tiebreak-id) total order packed into one DECIMAL(38,0):
    ``unix_micros(ts) * 10^19 + id``.

    Identical ordering to ``struct(ts, id)`` whenever ``0 <= id <
    10^19`` (ids here are non-negative BIGINTs, max 2^63-1 ≈ 9.2e18)
    and ``unix_micros(ts) < 10^19`` (year ~318,000) — both monotone
    embeddings, no overflow inside DECIMAL(38,0) (max ~3e34 << 1e38).

    Why (r11 optimization, guide §2.4): ``max_by(v, struct(ts, id))``
    carries the struct in its aggregation buffer, and struct buffers
    are not UnsafeRow-mutable, so the whole aggregate — including
    cheap min/max/sum siblings — degrades to SortAggregate with a full
    map-side sort of the raw input. A DECIMAL(38,0) buffer is
    fixed-width mutable, keeping the aggregate a HashAggregate with
    map-side combine (measured 0.64 → 0.47 s on the sf0.1 1-minute
    rollup; value equality pinned by exceptAll in both directions).
    """
    t = F.col(ts) if isinstance(ts, str) else ts
    i = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    return F.unix_micros(t.cast("timestamp")).cast("decimal(38,0)") * F.lit(
        "10000000000000000000"
    ).cast("decimal(38,0)") + i.cast("decimal(38,0)")


def row_let(bindings: dict[str, Column], body) -> Column:
    """Evaluate each binding column ONCE per row and hand the values to
    ``body`` as fields of a bound lambda variable.

    ``body`` receives a struct-typed lambda variable whose fields are
    the binding names; reading a field is free relative to re-running
    the bound expression. Bindings are evaluated together and cannot
    reference each other — nest ``row_let`` calls for dependent
    bindings.
    """
    return F.element_at(
        F.transform(
            F.array(F.struct(*[v.alias(k) for k, v in bindings.items()])),
            body,
        ),
        1,
    )
