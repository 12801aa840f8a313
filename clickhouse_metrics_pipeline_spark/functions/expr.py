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

from pyspark.sql import Column
from pyspark.sql import functions as F


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
