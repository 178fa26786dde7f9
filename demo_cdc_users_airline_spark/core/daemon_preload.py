"""Custom pyspark daemon module: preimport heavyweight libraries once.

Spark's PythonWorkerFactory hard-kills idle Python workers after ONE
MINUTE of no Python activity (``IDLE_WORKER_TIMEOUT_NS`` in
``PythonWorkerFactory.scala`` — a constant, not a conf). In a session
that interleaves JVM-only queries with Arrow/pandas stages, every
Python stage that follows a >1 min JVM-only stretch therefore pays a
full worker-pool respawn: fork-per-core from the daemon, then EACH
worker re-imports numpy/pandas/pyarrow (~1 s of pure import time per
worker; measured 11-26 s wall for a 64-worker two-stage mapInPandas
query at local[32] vs ~1 s with a warm pool — the r13/r14 bench's
`multimodal_png_roundtrip` anomaly).

The daemon process itself is never killed, and workers are forked from
it. Importing the heavy modules HERE, before ``manager()`` starts
forking, makes every future worker inherit the already-initialized
modules through fork copy-on-write — a worker respawn drops to the
cost of the fork itself (guide §4.5: heavyweight init once per task →
once per daemon).

Activated by ``spark.python.daemon.module`` (see
``core.session.get_spark``), which requires this module to be
importable by a bare interpreter — ``get_spark`` prepends the repo
root to ``PYTHONPATH`` before the JVM launches. Every import is
individually best-effort: a missing optional library must not take
down worker creation (the daemon would be useless, not degraded).
"""

import importlib

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.parquet",
    # the worker entrypoint itself plus the sql machinery every
    # Arrow-batched kernel unpickles
    "pyspark.worker",
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
):
    try:
        importlib.import_module(_mod)
    except Exception:  # noqa: BLE001 - degrade to a plain daemon
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
