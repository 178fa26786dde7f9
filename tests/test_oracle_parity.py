"""In-suite mirror of the driver's DuckDB correctness gate (fast subset).

Runs a representative query from each operator family at sf0.001 and
requires EXACT value parity with the oracle SQL (the full 40-query
sweep lives in tools/oracle_check.py; this keeps `pytest tests/` able
to catch parity regressions on its own).
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from tools.oracle_check import compare, duck_connection  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "cdc_latest_state_argmax",      # argMax reconstruct
    "cdc_incremental_snapshot",     # copy-pipe shape
    "events_per_minute_gapfill",    # series gap fill
    "pricing_summary",              # decimal-exact aggregation
    "users_mv_rmt_endpoint",        # users kit through the gate
    "airport_status_board",         # airport kit through the gate
    "dedup_minhash_lsh_pairs",      # minhash LSH
    "similarity_topk_brute",        # cosine top-k
    "text_token_stats",             # text ops
]


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    queries = entry.queries()
    oracles = entry.oracle_sql()
    sdf = queries[name](spark, SF).toPandas()
    ddf = duck.execute(oracles[name]).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, problems
