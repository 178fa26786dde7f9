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


def fit_line(payload: dict, timings: dict[str, float], budget: int) -> str:
    """One JSON line that ALWAYS fits the driver's stdout-tail window:
    keep the slowest queries while the line is over budget; if even one
    query's payload overflows, fall back to queries={} (ADVICE r4) so a
    metric-bearing line is still emitted."""
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) <= budget:
        return line
    by_cost = sorted(timings, key=timings.get, reverse=True)
    payload = dict(payload)
    payload["queries_full"] = "BENCH_FULL.json"
    while by_cost:
        payload["queries"] = {n: timings[n] for n in sorted(by_cost)}
        payload["queries_omitted"] = len(timings) - len(by_cost)
        line = json.dumps(payload, separators=(",", ":"))
        if len(line) <= budget:
            return line
        by_cost.pop()
    payload["queries"] = {}
    payload["queries_omitted"] = len(timings)
    return json.dumps(payload, separators=(",", ":"))


def calibrate(spark) -> dict[str, float]:
    """Fixed-cost box-state probe (VERDICT r12 #5): a deterministic
    pure-JVM job and a numpy matmul, each the median of 3. The work is
    CONSTANT across rounds, so the ratio of two artifacts' calibration
    cells measures host state (frequency/noisy-neighbor drift — the
    r9/r11/r12 adjudications), letting per-query medians be normalized
    instead of re-litigating box state. Partition count is pinned (not
    cpus-derived) so the JVM cell is comparable across bench configs."""
    import statistics

    def med3(fn) -> float:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 4)

    jvm = med3(lambda: spark.range(0, 1 << 27, 1, 8)
               .selectExpr("sum(id % 9973)").collect())

    import numpy as np
    a = np.random.default_rng(0).standard_normal((2048, 2048))
    npy = med3(lambda: a @ a)
    return {"jvm_sec": jvm, "numpy_sec": npy}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest table
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    cal_pre = calibrate(spark)

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

    cal_post = calibrate(spark)

    timings = {name: round(median(ts), 3) for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": max(1, repeats),
        "sf": sf_val,
        # box-state normalizer: constant work, so artifact-to-artifact
        # ratios of these cells separate host drift from code changes
        "calibration": {"pre": cal_pre, "post": cal_post},
    }
    # Full per-query detail: by default to an UNCOMMITTED run-stamped file
    # (BENCH_FULL.latest.json, gitignored) so a driver/judge bench run never
    # dirties the working tree — the committed BENCH_FULL.json is refreshed
    # only under an explicit SPARK_GRAFT_RECORD=1 (VERDICT r9 'what's
    # wrong' #2). SPARK_GRAFT_BENCH_FULL_PATH still redirects outright
    # (verify_all's sf0.01 smoke).
    here = os.path.dirname(os.path.abspath(__file__))
    record = os.environ.get("SPARK_GRAFT_RECORD", "") == "1"
    full_path = (os.environ.get("SPARK_GRAFT_BENCH_FULL_PATH")
                 or os.path.join(here, "BENCH_FULL.json" if record
                                 else "BENCH_FULL.latest.json"))
    payload["recorded_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    del payload["recorded_utc"]  # the stdout line stays byte-budgeted

    # The driver captures only the LAST ~2000 chars of stdout and parses the
    # final line as JSON (round 3's 68-query line overflowed the window and
    # recorded no metric). Emit a line that always fits: keep the slowest
    # queries, drop the rest, and point at BENCH_FULL.json for the full dict.
    budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BUDGET", "1500"))
    print(fit_line(payload, timings, budget))
    spark.stop()


if __name__ == "__main__":
    main()
