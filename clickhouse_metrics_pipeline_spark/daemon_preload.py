"""PySpark worker daemon that pre-imports the heavy scientific stack.

PySpark's worker pool is a daemon process that forks one child per
concurrent task; each child that runs a pandas UDF then imports
pandas/numpy/pyarrow ON ITS OWN (~2-3 s each, multiplied by
``local[32]``'s 32 simultaneous first-task forks, and re-paid whenever
the OS evicts the shared-library page cache). Importing them in the
daemon BEFORE the fork lets every child inherit the already-initialized
modules via copy-on-write: per-worker import cost drops to ~0 and the
code pages are shared once machine-wide.

Enabled via ``spark.python.daemon.module`` (see ``session.get_spark``).
Fails open: if the imports are unavailable the daemon still starts and
workers fall back to importing lazily.
"""

from __future__ import annotations

try:  # pragma: no cover - trivial import side effects
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (lazy-loaded by serializers)
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
