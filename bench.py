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

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    runs: dict[str, list[float]] = {}
    for r in range(repeats):
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.setdefault(name, []).append(time.perf_counter() - t0)
            spark.catalog.clearCache()  # one query's cache must not skew the next

    # per-query median over N runs: robust to the ±15% run-to-run noise in
    # this container, so round-over-round comparisons are meaningful (the
    # first run's codegen warmup lands in the upper half and drops out)
    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {name: round(median(ts), 3) for name, ts in runs.items()}
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
