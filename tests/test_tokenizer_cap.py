"""BPE training-vocabulary cap (VERDICT r7 item 2).

The trainer's one driver collect is hard-bounded: ``_word_freq`` keeps
only the top ``vocab_cap`` words by (count DESC, word ASC) via a
TakeOrdered. At every gate SF the cap is a no-op (31 distinct words vs
a 262k cap) so learned merges and hashes are unchanged; these tests
exercise the BINDING-cap regime with a tiny cap and require the engine
and the DuckDB oracle to agree on the capped vocabulary's merges.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from demo_cdc_users_airline_spark.operators.tokenizer import (  # noqa: E402
    VOCAB_CAP,
    _bpe_oracle_sql,
    _word_freq,
    learn_bpe_merges,
)
from tools.oracle_check import duck_connection  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


def test_word_freq_collect_is_bounded(spark):
    assert _word_freq(spark, SF, vocab_cap=8).count() == 8


def test_word_freq_plans_as_take_ordered(spark):
    plan = _word_freq(spark, SF, vocab_cap=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-task K-row heap, no
    # global sort — the property that makes the collect O(cap)


def test_binding_cap_matches_oracle(spark, duck):
    merges = learn_bpe_merges(spark, SF, n_merges=6, vocab_cap=8)
    got = [(k, a, b, int(c)) for k, a, b, c in merges]
    rows = duck.execute(_bpe_oracle_sql(6, vocab_cap=8)).fetchall()
    want = sorted((int(r[0]), r[1], r[2], int(r[4])) for r in rows)
    assert got == want


def test_default_cap_is_noop_at_gate(spark):
    # 31 distinct words at every gate SF — the production cap must not
    # change the learned merges there (hash-stability of text_bpe_*)
    assert learn_bpe_merges(spark, SF, n_merges=8, vocab_cap=VOCAB_CAP) \
        == learn_bpe_merges(spark, SF, n_merges=8, vocab_cap=10_000)
