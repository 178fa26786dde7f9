"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).
Each query is forced end-to-end with the no-op sink (full computation,
no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_cdc_users_airline_spark.catalog import QUERIES
from demo_cdc_users_airline_spark.core.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest table
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    for r in range(max(1, repeats)):
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            # best-of-N: first pass pays codegen/broadcast warmup; report
            # the steady-state per-query time (standard bench practice)
            timings[name] = min(timings.get(name, dt), dt)
            spark.catalog.clearCache()  # one query's cache must not skew the next

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": max(1, repeats),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
