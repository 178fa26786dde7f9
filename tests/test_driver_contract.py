"""__spark_entry__ driver-contract invariants (no Spark needed).

The external driver verifies only the FIRST 50 queries() entries and
parses one bench JSON line from a ~2000-char stdout tail (measured in
round 4 — see CLAUDE.md); these tests keep the mitigations honest.
"""

import json
import subprocess
import sys

import __spark_entry__ as entry


def test_priority_names_exist_and_lead():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(entry._DRIVER_PRIORITY) <= set(q), "stale _DRIVER_PRIORITY name"
    first50 = list(q)[:50]
    missing = [n for n in entry._DRIVER_PRIORITY if n not in first50]
    assert not missing, f"priority queries outside the driver window: {missing}"
    assert list(q) == list(o), "queries()/oracle_sql() order must match"


def test_every_query_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o)


def test_bench_fit_line_always_emits_metric():
    """Even when a single query's payload overflows the budget, fit_line
    must emit a parsable metric-bearing line (ADVICE r4 fallback)."""
    sys.path.insert(0, "/root/repo")
    import bench

    timings = {"q" + "x" * 400 + str(i): 1.0 for i in range(3)}
    payload = {"metric": "headline_queries_total_sec", "value": 3.0,
               "unit": "sec", "queries": timings, "runs": 1, "sf": 0.01}
    line = bench.fit_line(payload, timings, budget=300)
    assert len(line) <= 300
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert parsed["value"] == 3.0
    assert parsed["queries"] == {}
    assert parsed["queries_omitted"] == 3
    # normal case: trims to the slowest queries and stays under budget
    timings2 = {f"q{i}": float(i) for i in range(100)}
    payload2 = dict(payload, queries=timings2, value=sum(timings2.values()))
    line2 = bench.fit_line(payload2, timings2, budget=500)
    parsed2 = json.loads(line2)
    assert len(line2) <= 500
    assert "q99" in parsed2["queries"]  # slowest kept
    assert parsed2["queries_omitted"] > 0


def test_bench_line_budget_under_driver_window():
    # the driver tail is ~2000 chars; the printed line must stay inside
    # it with margin for stray log prefixes
    out = subprocess.run(
        [sys.executable, "-c",
         "import bench, os; print(int(os.environ.get("
         "'SPARK_GRAFT_BENCH_LINE_BUDGET', '1500')))"],
        capture_output=True, text=True, cwd="/root/repo")
    assert int(out.stdout.strip()) <= 1800
