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


def test_bench_line_budget_under_driver_window():
    # the driver tail is ~2000 chars; the printed line must stay inside
    # it with margin for stray log prefixes
    out = subprocess.run(
        [sys.executable, "-c",
         "import bench, os; print(int(os.environ.get("
         "'SPARK_GRAFT_BENCH_LINE_BUDGET', '1500')))"],
        capture_output=True, text=True, cwd="/root/repo")
    assert int(out.stdout.strip()) <= 1800
