"""Stage-level empirical profile of one catalog query (guide §1.1).

Usage: python tools/profile_query.py [sf_dir] query [query ...]
Env:   SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PROFILE_RUNS
       (default 2: run 1 warms memoized artifacts/codegen, run 2 is
       the profiled warm run — mirrors the bench's median-of-3
       discipline where training cost drops out).

Runs the query with the Spark event log enabled, then parses the log
and prints, for the LAST (warm) run only, every job and its stages
sorted by duration: wall ms, task count, shuffle read/write bytes,
input bytes, and the deepest non-Spark call site. This is the
"where does the time actually go" loop of the optimization guide
without a live UI (spark.ui.enabled is false at bench confs).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_cdc_users_airline_spark.catalog import QUERIES  # noqa: E402
from demo_cdc_users_airline_spark.core.session import (  # noqa: E402
    _RUNTIME_CONFS, configure, scratch_root)


def get_spark_with_eventlog(cpus: int, log_dir: str):
    from pyspark.sql import SparkSession

    os.makedirs(log_dir, exist_ok=True)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.python.daemon.module",
                "demo_cdc_users_airline_spark.core.daemon_preload")
        .config("spark.sql.warehouse.dir",
                os.path.join(scratch_root(), "sqlwarehouse"))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())


def profile(name: str, sf_dir: str, cpus: int, runs: int) -> None:
    log_dir = tempfile.mkdtemp(prefix="sg-eventlog-")
    spark = get_spark_with_eventlog(cpus, log_dir)
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]
    wall = []
    for r in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run {r}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)

    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        cands = [os.path.join(log_dir, f) for f in os.listdir(log_dir)]
        path = max(cands, key=os.path.getmtime)
    def read_log(p: str) -> list[str]:
        if p.endswith(".zstd"):
            import zstandard
            with open(p, "rb") as fh:
                data = zstandard.ZstdDecompressor().stream_reader(fh).read()
            return data.decode("utf-8", "replace").splitlines()
        if p.endswith(".lz4"):
            import lz4.frame
            with lz4.frame.open(p, "rt") as fh:
                return fh.read().splitlines()
        return list(open(p))

    if os.path.isdir(path):  # Spark 4 rolling event log directory
        lines = []
        for f in sorted(os.listdir(path)):
            if f.startswith("events"):
                lines.extend(read_log(os.path.join(path, f)))
    else:
        lines = read_log(path)
    jobs = {}        # jobId -> dict
    stages = {}      # stageId -> dict
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "desc": props.get("spark.job.description", ""),
                "t0": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
            for s in ev.get("Stage Infos", []):
                stages.setdefault(s["Stage ID"], {})["name"] = s["Stage Name"]
                stages[s["Stage ID"]]["ntask"] = s["Number of Tasks"]
                site = ""
                for rd in s.get("RDD Info", []):
                    cs = rd.get("Callsite", "")
                    if cs and "at " in cs:
                        site = cs
                        break
                stages[s["Stage ID"]]["site"] = site
        elif t == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            d = stages.setdefault(si["Stage Id"] if "Stage Id" in si
                                  else si["Stage ID"], {})
            d["name"] = si["Stage Name"]
            d["ntask"] = si["Number of Tasks"]
            d["t0"] = si.get("Submission Time")
            d["t1"] = si.get("Completion Time")
            acc = {a.get("Name"): a.get("Value")
                   for a in si.get("Accumulables", [])}
            d["shr"] = acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0
            d["shr"] += acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0
            d["shw"] = acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0
            d["inp"] = acc.get("internal.metrics.input.bytesRead", 0) or 0
            d["cpu"] = (acc.get("internal.metrics.executorCpuTime", 0) or 0) / 1e6
            d["rt"] = acc.get("internal.metrics.executorRunTime", 0) or 0

    last_run = f"{name} run {runs - 1}"
    sel = [j for j in jobs.values() if j.get("desc") == last_run and "t1" in j]
    print(f"\n=== {name} (cpus={cpus}) wall per run: "
          f"{['%.3f' % w for w in wall]}")
    tot = sum(j["t1"] - j["t0"] for j in sel)
    print(f"warm run: {len(sel)} jobs, {tot} ms in jobs "
          f"(wall {wall[-1]*1000:.0f} ms; gap = driver/planning)")
    for j in sorted(sel, key=lambda j: j["t0"]):
        jms = j["t1"] - j["t0"]
        jstages = [(sid, stages[sid]) for sid in j["stages"]
                   if stages.get(sid, {}).get("t1")]
        print(f"  job {jms:6d} ms  ({len(j['stages'])} stages planned, "
              f"{len(jstages)} ran)")
        for sid, s in sorted(jstages, key=lambda kv: -(kv[1]["t1"] - kv[1]["t0"]))[:6]:
            sms = s["t1"] - s["t0"]
            print(f"    stage {sid:4d} {sms:6d} ms  ntask={s['ntask']:3d} "
                  f"run={s.get('rt', 0):6.0f} cpu={s.get('cpu', 0):7.0f} "
                  f"in={s.get('inp', 0) >> 10}K shr={s.get('shr', 0) >> 10}K "
                  f"shw={s.get('shw', 0) >> 10}K  {s.get('name', '')[:60]}")
    import shutil
    shutil.rmtree(log_dir, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    if not args:
        print("usage: profile_query.py [sf_dir] query [query ...]")
        return
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))
    for name in args:
        profile(name, sf_dir, cpus, runs)


if __name__ == "__main__":
    main()
