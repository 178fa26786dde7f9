"""One-command verification: the full local mirror of everything the
driver checks, in dependency order, failing fast.

1. pytest suite (tests/)
2. oracle parity gate at sf0.01 (tools/oracle_check.py)
3. driver-contract simulation with a VANILLA SparkSession (catches any
   reliance on get_spark confs — the driver uses its own session)
4. bench smoke at sf0.01 (validates the one-line JSON contract)

Usage: python tools/verify_all.py [--fast] [--sweep] [--concurrent]
  --fast       skip pytest
  --sweep      ALSO re-run the oracle gate at hostile parallelism
               (5 cpus / 7 shuffle partitions) to prove every hash is
               partition-independent
  --concurrent run the pytest suite and the oracle gate AT THE SAME
               TIME — exercises the per-PID scratch-root isolation
               (core.session.scratch_root; the r12 judge's flake
               class) on every invocation instead of trusting it
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VANILLA_SIM = """
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
import __spark_entry__ as e
rows = e.entry(spark).collect()
q, o = e.queries(), e.oracle_sql()
assert len(rows) > 0, "entry() returned no rows"
missing = [k for k in o if k not in q]
assert not missing, f"oracle_sql keys without queries: {missing}"
# the driver executes EVERY query with its own vanilla session — any
# reliance on get_spark-only confs must surface here, not in the gate
bad = []
for name, fn in q.items():
    try:
        n = fn(spark, "/root/testdata/sf0.001").count()
    except Exception as ex:
        bad.append(f"{name}: {type(ex).__name__}: {ex}")
assert not bad, "vanilla-session failures:\\n" + "\\n".join(bad)
print(f"entry rows={len(rows)} queries={len(q)} oracles={len(o)} all vanilla-ok")
"""


def run(desc: str, cmd: list[str], env: dict | None = None) -> None:
    print(f"== {desc}: {' '.join(cmd[:4])} ...")
    e = dict(os.environ, **(env or {}))
    r = subprocess.run(cmd, cwd=REPO, env=e)
    if r.returncode != 0:
        print(f"FAILED: {desc}")
        raise SystemExit(r.returncode)


def check_no_placeholder_tokens() -> None:
    """A verification doc must not ship unfilled template claims
    (r12 shipped ROADMAP.md with a literal PLACEHOLDER_TESTS token)."""
    bad = []
    # driver/judge-owned and retrieved docs may legitimately QUOTE a
    # placeholder token (VERDICT r12 names the ROADMAP slip) — only
    # builder-authored docs are in scope. Walk the WHOLE tree: a doc
    # moved into a subdirectory must not escape the guard.
    skip = {"VERDICT.md", "ADVICE.md", "PAPERS.md", "SNIPPETS.md",
            "BASELINE.md", "TESTDATA.md"}
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for fn in files:
            if not fn.endswith(".md") or fn in skip:
                continue
            full = os.path.join(root, fn)
            rel = os.path.relpath(full, REPO)
            with open(full, encoding="utf-8") as f:
                for i, line in enumerate(f, 1):
                    if "PLACEHOLDER" in line:
                        bad.append(f"{rel}:{i}: {line.strip()[:80]}")
    if bad:
        print("FAILED: unfilled PLACEHOLDER tokens in committed docs:")
        print("\n".join(bad))
        raise SystemExit(1)


def check_plans_covers_catalog() -> None:
    """PLANS.md must carry one audit row per catalog query, none of
    them ERROR rows (VERDICT r13 #4: the committed audit lagged the
    final catalog by three queries — this makes the staleness class a
    verification failure instead of a judge finding). The catalog
    import is pure (no SparkSession), so this check is cheap."""
    sys.path.insert(0, REPO)
    from demo_cdc_users_airline_spark.catalog import QUERIES

    plans = os.path.join(REPO, "PLANS.md")
    rows: dict[str, str] = {}
    with open(plans, encoding="utf-8") as f:
        for line in f:
            if line.startswith("| ") and not line.startswith("| query"):
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                if cells and cells[0] and cells[0] != "---":
                    rows[cells[0]] = cells[1] if len(cells) > 1 else ""
    missing = sorted(set(QUERIES) - set(rows))
    errored = sorted(n for n, v in rows.items() if v.startswith("ERROR"))
    retired = sorted(set(rows) - set(QUERIES))
    problems = []
    if missing:
        problems.append(f"catalog queries missing a PLANS.md row: {missing}")
    if errored:
        problems.append(f"PLANS.md ERROR rows: {errored}")
    if retired:
        problems.append(f"PLANS.md rows for retired queries: {retired}")
    if problems:
        print("FAILED: PLANS.md is stale vs the catalog — re-run "
              "tools/explain_audit.py at HEAD:")
        print("\n".join(problems))
        raise SystemExit(1)


def _kill_process_group(p: "subprocess.Popen") -> None:
    """SIGTERM the child's whole process group (JVM included); escalate
    to SIGKILL if it hasn't exited within 10 s."""
    import signal

    try:
        os.killpg(p.pid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError):
        p.terminate()
    try:
        p.wait(timeout=10)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            p.kill()


def run_concurrently(cmds: tuple[list[str], ...] | None = None) -> None:
    """The suite and the gate as two live processes over one repo —
    green ONLY if the per-PID scratch roots actually isolate them.
    Latency-SLO budgets relax 3× under this DELIBERATE full-box
    contention (the property under test is isolation/correctness; the
    15 s SLO stays enforced at 1× by every standalone suite run —
    measured: a deliberately co-scheduled full gate pushed one soak
    batch 15 → 18 s, a contention artifact, not a code regression).
    ``cmds`` overrides the two child commands (the fail-fast unit
    test's injection point)."""
    print("== concurrent: pytest + oracle gate (sf0.01), two processes")
    import time as _time
    env = dict(os.environ, SPARK_GRAFT_LATENCY_BUDGET_RELAX="3")
    # start_new_session: each child leads its own process group, so the
    # fail-fast path can killpg the WHOLE tree — p.terminate() alone
    # leaves the child's Spark JVM orphaned, contending with (and
    # skewing) every subsequent verification/bench step on this box.
    procs = [subprocess.Popen(cmd, cwd=REPO, env=env, start_new_session=True)
             for cmd in cmds or (
        [sys.executable, "-m", "pytest", "tests/", "-q", "-x"],
        [sys.executable, "tools/oracle_check.py"],
    )]
    # fail-fast: on the first nonzero exit, kill the sibling's process
    # group instead of waiting out its full run
    codes: list[int | None] = [None] * len(procs)
    while any(c is None for c in codes):
        for i, p in enumerate(procs):
            if codes[i] is None:
                codes[i] = p.poll()
        if any(c not in (None, 0) for c in codes):
            for i, p in enumerate(procs):
                if codes[i] is None:
                    _kill_process_group(p)
                    codes[i] = p.wait()
            break
        _time.sleep(2)
    if any(codes):
        print(f"FAILED: concurrent verification (exit codes {codes})")
        raise SystemExit(1)


def main() -> int:
    check_no_placeholder_tokens()
    check_plans_covers_catalog()
    if "--concurrent" in sys.argv:
        run_concurrently()
    else:
        fast = "--fast" in sys.argv
        if not fast:
            run("pytest",
                [sys.executable, "-m", "pytest", "tests/", "-q", "-x"])
        run("oracle gate (sf0.01)",
            [sys.executable, "tools/oracle_check.py"])
    if "--sweep" in sys.argv:
        # partition-independence: same gate at hostile parallelism —
        # every hash must be invariant to cpu/shuffle-partition counts
        run("oracle gate @ 5 cpus / 7 shuffle partitions",
            [sys.executable, "tools/oracle_check.py"],
            env={"SPARK_GRAFT_CHECK_CPUS": "5",
                 "SPARK_GRAFT_CHECK_SHUFFLE": "7"})
    run("vanilla driver contract", [sys.executable, "-c", VANILLA_SIM])
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, capture_output=True, text=True,
        env=dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.01",
                 SPARK_GRAFT_CPUS="8", SPARK_GRAFT_BENCH_REPEATS="1",
                 SPARK_GRAFT_BENCH_FULL_PATH="/tmp/bench_smoke_full.json"))
    if out.returncode != 0:
        print("FAILED: bench smoke\n" + out.stderr[-2000:])
        return 1
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)  # must be one valid JSON line
    assert {"metric", "value", "unit", "queries", "sf"} <= set(d), d.keys()
    print(f"== bench smoke: {d['value']}s over {len(d['queries'])} queries")
    print("ALL VERIFICATIONS PASSED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
