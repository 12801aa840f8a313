"""Skew mitigation for shuffle joins.

AQE's skew-join splitting (on by default in ``session.get_spark``)
handles sort-merge skew at runtime by splitting oversized partitions,
but it cannot help when the hot key's rows must still meet one reducer
(stream-stream joins, shuffle-hash paths, AQE disabled, or engines
reading our written layout). Salting is the static fix: spread the big
side's hot keys across ``salt`` sub-keys and replicate the small side
once per sub-key, so the hot key's rows land on ``salt`` reducers
instead of one.

The salt must be DETERMINISTIC per row (a ``rand()`` salt changes on
task retry and silently drops/duplicates rows under speculative
execution) — we hash the big side's whole row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join resistant to hot keys on the big side.

    The big side gets a per-row salt in [0, salt) (deterministic hash of
    the full row); the small side is replicated ``salt`` times; the join
    key becomes (on..., salt). Results are identical to ``big.join(
    small, on, how)`` for 'inner'/'left' joins (each big row still meets
    every matching small row exactly once); the shuffle spreads each hot
    key over ``salt`` reducers at the cost of a ``salt``-times larger
    small side — use for fact-to-medium-dim joins where the dim is too
    big to broadcast but cheap to replicate.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: replicating "
            "the small side would duplicate its unmatched rows under right/"
            "full semantics"
        )
    b = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, [*on, SALT_COL], how).drop(SALT_COL)
