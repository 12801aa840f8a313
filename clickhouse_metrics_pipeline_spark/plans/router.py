"""Resolution router (Q1) - ``selectTable`` (promread/handler.go:304-321).

Plain control flow, as in the reference: pick the coarsest table that still
covers the query's age and span. The retention ladder is raw 3h / 1m 15d /
5m 63d / 1h 455d.
"""

from __future__ import annotations

import time

_HOUR_MS = 3_600_000
_DAY_MS = 24 * _HOUR_MS


def select_resolution(
    start_ms: int, end_ms: int, now_ms: int | None = None
) -> str:
    """Return the table name to serve a [start_ms, end_ms] query."""
    if start_ms == 0 and end_ms == 0:
        return "metrics_raw"
    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    span = end_ms - start_ms
    age = now_ms - start_ms
    if age < 3 * _HOUR_MS and span < 1 * _HOUR_MS:
        return "metrics_raw"
    if age < 15 * _DAY_MS and span < 1 * _DAY_MS:
        return "metrics_1m"
    if age < 63 * _DAY_MS and span < 7 * _DAY_MS:
        return "metrics_5m"
    return "metrics_1h"
