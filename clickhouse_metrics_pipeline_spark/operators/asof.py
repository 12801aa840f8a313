"""As-of (backward) join - a temporal join the reference does not need
(it has no joins at all, SURVEY SS2.5) but any metrics/training-data
engine at scale does: "for each left row, the latest right row at or
before it, per key".

Spark-first strategy: NOT a range-exploded join (O(n*m) blowup) and NOT
a per-key collect - instead the classic union-and-carry trick:

    union(left, right) -> one shuffle on the key
    -> window ordered by (ts, tiebreak)
    -> last(right payload, ignorenulls) carried forward
    -> keep left rows

One exchange, no data duplication, state bounded by the window frame
(running last), skew behavior identical to any keyed window. At 100 TB
this is the plan you want: a single sort per key partition, no
candidate-pair materialization.

Tie semantics are explicit: rows are ordered by (ts, tiebreak, side)
with right rows (side=0) before left rows (side=1) at exact ties, so a
right row at the same (ts, tiebreak) IS visible to the left row. With a
globally-unique tiebreak (event_id) the result is fully deterministic -
the same contract the oracle SQL mirrors with `last_value(x IGNORE
NULLS)` over the identical ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_tiebreak: str = "event_id",
    right_tiebreak: str = "event_id",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: left rows gain `asof_<col>` for each payload
    column of the latest right row with (ts, tiebreak) <= the left row's.

    `payload` columns must exist in `right`; key columns must exist in
    both. Returns all left columns plus the asof_* payload columns.
    """
    keys = list(keys)
    pay = list(payload)
    carry = [c for c in left.columns if c not in keys and c != left_ts]

    # The payload rides in ONE struct, not per-column: every right row's
    # struct is non-null (even when its fields are null), so
    # last(ignorenulls) picks the latest right ROW atomically. Carrying
    # columns independently would stitch the output from different right
    # rows whenever a newer right row holds a NULL in one payload column
    # — breaking the "latest right row" contract and NULL fidelity.
    pay_type = T.StructType([right.schema[c] for c in pay])
    r = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.col(right_tiebreak).alias("_asof_tb"),
        F.lit(0).alias("_asof_side"),
        F.struct(*[F.col(c).alias(c) for c in pay]).alias("_pay"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_left_{c}") for c in carry],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.col(left_tiebreak).alias("_asof_tb"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
        *[F.col(c).alias(f"_left_{c}") for c in carry],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_asof_tb", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*", F.last("_pay", ignorenulls=True).over(w).alias("_asof_pay")
    )
    return carried.where(F.col("_asof_side") == 1).select(
        *keys,
        F.col("_asof_ts").alias(left_ts),
        *[F.col(f"_left_{c}").alias(c) for c in carry],
        *[F.col(f"_asof_pay.{c}").alias(f"asof_{c}") for c in pay],
    )
