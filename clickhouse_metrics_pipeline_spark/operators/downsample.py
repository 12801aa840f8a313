"""LTTB (Largest-Triangle-Three-Buckets) series downsampling — the
charting operator that reduces a dense series to n visually-faithful
points (Steinarsson 2013; shipped by ClickHouse as the
``largestTriangleThreeBuckets`` aggregate, which makes it part of the
reference engine's ecosystem surface).

Semantics (index-based bucketing, the canonical form): first and last
points are always kept; the N-2 middle points (ordered by (ts, id))
split into ``n_out - 2`` equal floor-ranges; scanning left to right,
each bucket contributes the point forming the LARGEST triangle with the
previously selected point and the NEXT bucket's centroid (the final
point for the last bucket).

Determinism: the triangle-area comparison is computed EXACTLY — the
centroid's 1/nn division is cleared by scaling the whole area by nn
(argmax-invariant), x rides as epoch microseconds and y as integer
cents, and Python integers are arbitrary-precision, so the selection
cannot flip under float rounding. Ties break toward the earliest point.
The DuckDB oracle replays the identical integer recursion (HUGEINT),
so the driver hash pins the full selection.

Scale shape: one shuffle on the series key, then a per-series
sequential scan (the selection chain is inherently sequential — each
pick depends on the previous). Series length is the rollup-resolution
row count a chart requests (thousands), never raw-corpus scale, and
series are independent, so parallelism is the series count.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lttb_select_indices(
    xs: Sequence[int], ys: Sequence[int], n_out: int
) -> list[int]:
    """Pure-python exact LTTB index selection over integer (x, y).
    Exposed separately so tests can drive the kernel directly."""
    n = len(xs)
    if n <= n_out:
        return list(range(n))
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    m, nb = n - 2, n_out - 2
    members: list[list[int]] = [[] for _ in range(nb)]
    for j in range(1, n - 1):
        members[((j - 1) * nb) // m].append(j)
    sel = [0]
    prev = 0
    for b in range(nb):
        if b + 1 < nb:
            nxt = members[b + 1]
            sxn = sum(xs[j] for j in nxt)
            syn = sum(ys[j] for j in nxt)
            nn = len(nxt)
        else:
            sxn, syn, nn = xs[n - 1], ys[n - 1], 1
        xp, yp = xs[prev], ys[prev]
        best = max(
            members[b],
            key=lambda j: (
                abs(
                    (xp * nn - sxn) * (ys[j] - yp)
                    - (xp - xs[j]) * (syn - nn * yp)
                ),
                -j,
            ),
        )
        sel.append(best)
        prev = best
    sel.append(n - 1)
    return sel


def lttb_downsample(
    df: DataFrame,
    *,
    n_out: int,
    key_cols: tuple[str, ...] = ("event_type",),
    key_ddl: str = "event_type string",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Downsample each series of ``df`` to ``n_out`` points.

    Returns the selected rows: key cols, ``ts``, ``value``, and ``j``
    (the point's 0-based index within its (ts, id)-ordered series)."""
    from clickhouse_metrics_pipeline_spark.tables import value_cents

    out_schema = f"{key_ddl}, {ts_col} timestamp, {value_col} double, j bigint"
    names = list(key_cols)
    proj = df.select(
        *names, ts_col, value_col, id_col, value_cents(value_col).alias("_c")
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        xs = pdf[ts_col].values.astype("datetime64[us]").astype("int64").tolist()
        ys = pdf["_c"].tolist()
        sel = lttb_select_indices(xs, ys, n_out)
        out = pdf.iloc[sel][[*names, ts_col, value_col]].copy()
        out["j"] = sel
        return out

    return proj.groupBy(*names).applyInPandas(fn, schema=out_schema)
