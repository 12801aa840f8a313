"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        # Strict: an int-valued float does NOT collapse to int — the
        # driver's hasher distinguishes them (DuckDB HUGEINT sums come
        # back as float64 via pandas and must be ::BIGINT-cast in the
        # oracle SQL instead).
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        import datetime

        if isinstance(v, datetime.datetime):
            s = v.isoformat(sep=" ")
        else:
            s = v.isoformat()
        return s.replace("+00:00", "")
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def audit_oracle_types(con, oracle_sql: dict[str, str]) -> list[str]:
    """Reject any oracle whose result schema contains HUGEINT/UHUGEINT.

    DuckDB ``sum(BIGINT)`` widens to HUGEINT, which the DRIVER's pandas
    bridge coerces to float64 (``1234.0`` vs Spark's ``1234``) while
    this gate's native fetchall() returns Python ints and can't see it
    — the exact round-4/5 failure class. Every such column must be
    ``::BIGINT``-cast in the oracle SQL. Returns failure strings."""
    bad = []
    for name, sql in oracle_sql.items():
        try:
            rel = con.sql(sql)
            cols = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, map(str, rel.types))
                if "HUGEINT" in str(t).upper()
            ]
        except Exception as e:
            bad.append(f"{name}: type-audit error: {e}")
            continue
        if cols:
            bad.append(f"{name}: HUGEINT output columns {cols} "
                       f"(add ::BIGINT casts)")
    return bad


def audit_stream_schema(name: str, sdf) -> list[str]:
    """Hash-graded STREAMING rows must not expose float columns.

    The streaming sinks' float-combine columns (value_sum/value_avg,
    order-dependent addition across micro-batches) are deliberately
    excluded from every graded projection — batch rows grade those
    semantics via integer-cents twins. This turns that prose contract
    (r6 verdict item 7) into a gate failure: any catalog query whose
    name marks it as a streaming row ('stream' in the name) and that
    carries an oracle (i.e. is value-hash graded) must project only
    non-float columns. Returns failure strings."""
    from clickhouse_metrics_pipeline_spark.schema import float_columns

    if "stream" not in name:
        return []
    cols = float_columns(sdf.schema)
    if cols:
        return [f"{name}: hash-graded streaming projection has float "
                f"columns {cols} (exclude or cast to integer units)"]
    return []


def main():
    args = [a for a in sys.argv[1:] if a != "--types-only"]
    types_only = "--types-only" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from clickhouse_metrics_pipeline_spark.workloads import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # Type audit first: fails fast, needs no Spark session.
    audited = {k: v for k, v in ORACLE_SQL.items() if not only or k in only}
    type_failures = audit_oracle_types(con, audited)
    for f in type_failures:
        print(f"FAIL  type-audit {f}")
    if types_only:
        print(f"\ntype audit: {len(type_failures)} failures over "
              f"{len(audited)} oracles")
        sys.exit(1 if type_failures else 0)

    from clickhouse_metrics_pipeline_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    failures = [f.split(":")[0] for f in type_failures]
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in ORACLE_SQL:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        stream_problems = audit_stream_schema(name, sdf)
        if stream_problems:
            failures.append(name)
            for p in stream_problems:
                print(f"FAIL  stream-schema {p}")
            continue
        try:
            res = con.execute(ORACLE_SQL[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # show a diff sample
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {"|".join(_norm_cell(r[i]) for i in order_s) for r in srows}
                oset = {"|".join(_norm_cell(r[i]) for i in order_o) for r in orows}
                for line in list(sset - oset)[:3]:
                    print(f"      spark-only: {line}")
                for line in list(oset - sset)[:3]:
                    print(f"      oracle-only: {line}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"PASS  {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
