"""Series identity: canonical deterministic hash and key.

The reference hashes metricName + workspaceId + each attribute k,v with
xxhash64 (``internal/clickhouse/writer.go:105-116``) - but it iterates a Go
map, whose order is randomized, so multi-attribute series hash
NON-deterministically across restarts. Same flaw in the query-side series
key (``pkg/promread/handler.go:341-347``).

Documented fix: hash a canonical form - sorted attribute entries - so the
hash is a pure function of (metric, workspaceId, attributes). Spark's
``xxhash64`` is the same XXH64 algorithm, JVM-side and shuffle-friendly
(signed 64-bit; the sign is irrelevant for an opaque key).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _canonical_attrs(attributes: Column | str) -> Column:
    attrs = F.col(attributes) if isinstance(attributes, str) else attributes
    entries = F.array_sort(F.map_entries(F.coalesce(attrs, F.map_from_arrays(F.array(), F.array()))))
    return F.array_join(
        F.transform(entries, lambda e: F.concat_ws("=", e["key"], e["value"])), ","
    )


def series_key(metric: Column | str, attributes: Column | str) -> Column:
    """Canonical label-set key: ``metric{k=v,...}`` with sorted keys (K2)."""
    m = F.col(metric) if isinstance(metric, str) else metric
    return F.concat(m, F.lit("{"), _canonical_attrs(attributes), F.lit("}"))


def series_hash(
    metric: Column | str,
    workspace_id: Column | str,
    attributes: Column | str,
) -> Column:
    """Deterministic 64-bit series hash (K1, fixed to canonical order)."""
    m = F.col(metric) if isinstance(metric, str) else metric
    w = F.col(workspace_id) if isinstance(workspace_id, str) else workspace_id
    return F.xxhash64(m, w, _canonical_attrs(attributes))


def series_fingerprint_md5(
    metric: Column | str,
    workspace_id: Column | str,
    attributes: Column | str,
) -> Column:
    """Portable md5 fingerprint of the canonical series identity.

    Same canonical form as ``series_hash`` but md5-hex, reproducible in any
    engine (used by the cross-engine correctness oracle, where xxhash64 is
    Spark-specific).
    """
    m = F.col(metric) if isinstance(metric, str) else metric
    w = F.col(workspace_id) if isinstance(workspace_id, str) else workspace_id
    return F.md5(F.concat_ws("|", m, w, _canonical_attrs(attributes)))


def portable_hash60(col: Column | str) -> Column:
    """60-bit hash from the md5 hex prefix, bit-identical in any engine
    with md5 + hex parse (DuckDB: ``('0x' || substr(md5(x), 1, 15))::
    BIGINT`` — twin fragment: oracle_fragments.portable_hash60_sql).
    The single source for cross-engine-reproducible sharding/sampling
    decisions (stratified sampling, sequence-packing shards, portable
    SimHash token hashes): a hash that must agree across engines and
    retries cannot be xxhash64 (Spark-only) or rand() (run-dependent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
