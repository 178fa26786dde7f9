"""Isolated per-query timing at bench-equivalent confs.

Usage: python tools/time_query.py [sf_dir] query [query ...]
Env:   SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TIME_RUNS (default 4:
       1 warmup discarded + median of the last 3 — the committed bench's
       "median of 3 warm runs" discipline from CLAUDE.md).

Prints one line per query: median, all run times, and (with
SPARK_GRAFT_TIME_PLAN=1) writes the formatted plan next to it.
Timing methodology mirrors bench.py exactly: noop sink, clearCache
between runs, get_spark confs (64 MB broadcast threshold).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_cdc_users_airline_spark.catalog import QUERIES  # noqa: E402
from demo_cdc_users_airline_spark.core.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args or []
    if not names:
        print("usage: time_query.py [sf_dir] query [query ...]")
        return
    runs = int(os.environ.get("SPARK_GRAFT_TIME_RUNS", "4"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("time_query", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in names:
        fn = QUERIES[name]
        ts = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        warm = ts[1:] if len(ts) > 1 else ts
        med = statistics.median(warm)
        print(f"{name}: median={med:.3f}s  runs={['%.3f' % t for t in ts]}",
              flush=True)
        if os.environ.get("SPARK_GRAFT_TIME_PLAN") == "1":
            import contextlib
            import io
            out = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "plans", "r14",
                f"{name}_plan.txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(out, "w") as f:
                f.write(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
