"""Prometheus label-matcher compiler (F8-F10).

The reference compiles ``prompb.LabelMatcher`` lists into a parameterized
ClickHouse WHERE clause (``pkg/promread/handler.go:227-302``). Here the
target is a Catalyst predicate: ``__name__`` matchers hit the ``metric``
column (pushed down to parquet scans / bloom filter), other labels hit
``attributes[key]`` via ``element_at``.

NULL semantics: a label absent from ``attributes`` yields NULL; Prometheus
treats an absent label as "" - so NEQ / NRE on an absent label MATCH
(Prometheus `{foo!="x"}` selects series without `foo`). The reference's
ClickHouse Map returns '' for missing keys, giving the same behavior; we
coalesce to '' to match.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MatchType(Enum):
    EQ = 0
    NEQ = 1
    RE = 2
    NRE = 3


@dataclass(frozen=True)
class LabelMatcher:
    type: MatchType
    name: str
    value: str


def _label_col(name: str) -> Column:
    if name == "__name__":
        return F.col("metric")
    # missing key -> '' (ClickHouse Map default, Prometheus absent-label)
    return F.coalesce(F.element_at(F.col("attributes"), F.lit(name)), F.lit(""))


def compile_matcher(m: LabelMatcher) -> Column:
    c = _label_col(m.name)
    if m.type == MatchType.EQ:
        return c == m.value
    if m.type == MatchType.NEQ:
        return c != m.value
    if m.type == MatchType.RE:
        return c.rlike(m.value)
    if m.type == MatchType.NRE:
        return ~c.rlike(m.value)
    raise ValueError(f"unknown matcher type: {m.type}")


def compile_matchers(
    matchers: list[LabelMatcher],
    workspace_id: str | None = None,
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> Column:
    """Full WHERE clause of buildQuery (handler.go:227-302) as one Column.

    Scalar predicates (workspaceId, metric, timestamp) push down to the
    parquet scan; the timestamp range also prunes date partitions.
    """
    pred = F.lit(True)
    if workspace_id is not None:
        pred = pred & (F.col("workspaceId") == workspace_id)
    if start_ms:
        pred = pred & (F.col("timestamp") >= F.timestamp_millis(F.lit(start_ms)))
    if end_ms:
        pred = pred & (F.col("timestamp") <= F.timestamp_millis(F.lit(end_ms)))
    for m in matchers:
        pred = pred & compile_matcher(m)
    return pred


def apply_matchers(
    df: DataFrame,
    matchers: list[LabelMatcher],
    workspace_id: str | None = None,
    start_ms: int | None = None,
    end_ms: int | None = None,
    limit: int = 100_000,
) -> DataFrame:
    """filter + ORDER BY metric,timestamp + LIMIT (handler.go:296-298)."""
    out = df.filter(compile_matchers(matchers, workspace_id, start_ms, end_ms))
    return out.orderBy("metric", "timestamp").limit(limit)
