"""Guard: hash-graded streaming rows expose NO float columns.

The streaming sinks carry float-combine columns (value_sum /
value_avg — order-dependent double addition across micro-batches) and
the graded projections deliberately exclude them; the integer-cents
batch rollup rows grade those semantics instead. Round 6's verdict
(item 7) asked for that prose contract to become a failing test: if
someone adds a double/float column to a hash-graded streaming
projection, this file goes red before the driver's hasher can produce
a wrong-but-plausible float comparison.

Two layers:
  * a schema audit over every catalog query whose name marks it as a
    streaming row AND that has an oracle entry (i.e. is value-hash
    graded), executed for real at sf0.001 (the stream drains, so the
    returned schema is the sink's actual graded projection);
  * a completeness pin — the set of streaming-named catalog rows must
    match this file's expectation, so a NEW streaming row cannot land
    without being picked up by the audit (the name-based rule in
    tools/check_oracle.py::audit_stream_schema is the gate-side twin).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# Every hash-graded streaming row in the catalog. Update BOTH this set
# and the graded projection when adding a streaming row; the
# completeness test below fails if the catalog drifts from this list.
EXPECTED_STREAM_ROWS = {
    "events_rules_stream_1h",
    "events_rollup_stream_1m",
    "events_delta_stream",
    "events_hist_delta_stream",
}


def _catalog():
    from clickhouse_metrics_pipeline_spark.workloads import (
        ORACLE_SQL,
        QUERIES,
    )

    return QUERIES, ORACLE_SQL


def _float_cols(schema) -> list[str]:
    # single definition shared with the gate's audit_stream_schema
    from clickhouse_metrics_pipeline_spark.schema import float_columns

    return float_columns(schema)


def test_streaming_row_set_is_pinned():
    """A new '*stream*' catalog row must be added to this audit."""
    queries, _ = _catalog()
    actual = {n for n in queries if "stream" in n}
    assert actual == EXPECTED_STREAM_ROWS, (
        "streaming catalog rows changed; extend EXPECTED_STREAM_ROWS "
        "and confirm the new row's graded projection is float-free"
    )


def test_all_graded_stream_rows_are_oracle_backed():
    """Hash-graded means oracle-backed: each streaming row must carry
    a DuckDB twin (the driver's weaker rows-only path would let a
    float column slip through ungraded)."""
    _, oracle = _catalog()
    missing = EXPECTED_STREAM_ROWS - set(oracle)
    assert not missing, f"streaming rows without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(EXPECTED_STREAM_ROWS))
def test_graded_stream_projection_has_no_float_columns(spark, name):
    queries, _ = _catalog()
    df = queries[name](spark, SF_DIR)
    bad = _float_cols(df.schema)
    assert not bad, (
        f"{name}: hash-graded streaming projection exposes float "
        f"columns {bad}; exclude them or cast to integer units"
    )


def test_has_float_type_walks_types_not_field_names():
    """The gate must key on DataType nodes, not simpleString()
    substrings: a nested FIELD NAME containing 'double' is integral
    and must pass; a nested float type must still trip (r7 ADVICE)."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        FloatType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    from clickhouse_metrics_pipeline_spark.schema import float_columns

    ok = StructType(
        [
            StructField(
                "a", StructType([StructField("value_double", LongType())])
            ),
            StructField("b", MapType(StringType(), LongType())),
            StructField(
                "c",
                ArrayType(
                    StructType([StructField("float_flag", BooleanType())])
                ),
            ),
        ]
    )
    assert float_columns(ok) == []

    bad = StructType(
        [
            StructField(
                "a", ArrayType(StructType([StructField("x", FloatType())]))
            ),
            StructField("b", MapType(StringType(), DoubleType())),
            StructField("c", LongType()),
        ]
    )
    assert [n.split(":")[0] for n in float_columns(bad)] == ["a", "b"]
