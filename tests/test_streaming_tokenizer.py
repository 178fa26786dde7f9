"""StreamingTokenizerIngest — the tokenizer in-loop maintainer
(tokenizer drift monitor + retrain gate; VERDICT r12 #6's optional
in-loop hook).

Covers: census-vs-artifact parity with the gated census helper, the
all-integer gate NOT firing in-distribution, firing on a doctored
drift batch (retrain publishes a v<N> generation whose content equals
a from-scratch retrain on the accumulated corpus), retry idempotence
of the corpus/report sinks, and the retry-across-swap contract
(resolved artifact content unchanged; the report legitimately records
fired = 0 on the second pass).
"""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from demo_cdc_users_airline_spark.operators.tokenizer import (  # noqa: E402
    _TOK_META,
    load_alphabet,
    load_bpe_merges,
    load_tokenizer_stats,
    load_unigram_pieces,
    save_tokenizer,
)
from demo_cdc_users_airline_spark.streaming.tokenizer_ingest import (  # noqa: E402
    StreamingTokenizerIngest,
)

BASE_SENT = "the quick brown fox jumps over the lazy dog " * 3
DRIFT_SENT = "zq9ß3 çx7w1 9z8q7 ßß11 q2ç4 " * 3


def _docs(spark, ids, sentence):
    return spark.createDataFrame([(i, sentence) for i in ids],
                                 "doc_id long, text string")


@pytest.fixture()
def monitor(spark, tmp_path):
    m = StreamingTokenizerIngest(path=str(tmp_path / "tokmon"))
    m.build(spark, _docs(spark, range(30), BASE_SENT))
    return m


def _report(spark, m):
    return {int(r["ingest_batch"]): r.asDict() for r in
            spark.read.parquet(m.report_path).collect()}


def _resolved(spark, m):
    return {
        "merges": load_bpe_merges(spark, m.tok_path),
        "pieces": load_unigram_pieces(spark, m.tok_path),
        "alph": load_alphabet(spark, m.tok_path),
        "stats": load_tokenizer_stats(spark, m.tok_path),
    }


def test_in_distribution_batch_never_fires(spark, monitor):
    m = monitor
    before = _resolved(spark, m)
    m.process_batch(_docs(spark, range(100, 110), BASE_SENT), 0)
    rep = _report(spark, m)[0]
    assert rep["retrain_fired"] == 0
    assert rep["oov_chars"] == 0 and rep["oov_ppm"] == 0
    # same distribution → same compression as the trained baseline
    assert rep["chars_per_token_micro"] == rep["baseline_cpt_micro"]
    assert _resolved(spark, m) == before  # artifact untouched (flat)
    assert not os.path.exists(os.path.join(m.tok_path, _TOK_META))


def test_drift_batch_fires_and_retrain_equals_scratch(spark, monitor,
                                                      tmp_path):
    m = monitor
    m.process_batch(_docs(spark, range(100, 110), BASE_SENT), 0)
    m.process_batch(_docs(spark, range(200, 212), DRIFT_SENT), 1)
    rep = _report(spark, m)[1]
    assert rep["oov_ppm"] > 0
    assert rep["retrain_fired"] == 1
    # a generation was published
    assert os.path.exists(os.path.join(m.tok_path, _TOK_META))
    got = _resolved(spark, m)
    # retrain ≡ retrain-from-scratch on the accumulated corpus
    scratch = str(tmp_path / "scratch_tok")
    save_tokenizer(spark, "", path=scratch,
                   docs=spark.read.parquet(m.corpus_path)
                   .select("doc_id", "text"),
                   with_stats=True)
    want = {
        "merges": load_bpe_merges(spark, scratch),
        "pieces": load_unigram_pieces(spark, scratch),
        "alph": load_alphabet(spark, scratch),
        "stats": load_tokenizer_stats(spark, scratch),
    }
    assert got == want
    # the retrained alphabet covers the drifted chars: a re-census of
    # the SAME batch under the new artifact reports zero OOV
    m.process_batch(_docs(spark, range(200, 212), DRIFT_SENT), 1)
    rep2 = _report(spark, m)[1]
    assert rep2["oov_ppm"] == 0
    assert rep2["retrain_fired"] == 0  # across-swap retry: no re-fire
    assert _resolved(spark, m) == got  # resolved content unchanged


def test_batch_sinks_are_retry_idempotent(spark, monitor):
    m = monitor
    m.process_batch(_docs(spark, range(100, 110), BASE_SENT), 0)
    corpus1 = sorted(str(r) for r in
                     spark.read.parquet(m.corpus_path).collect())
    rep1 = _report(spark, m)
    m.process_batch(_docs(spark, range(100, 110), BASE_SENT), 0)
    corpus2 = sorted(str(r) for r in
                     spark.read.parquet(m.corpus_path).collect())
    assert corpus1 == corpus2
    assert _report(spark, m) == rep1


def test_compression_gate_fires_without_oov(spark, tmp_path):
    """Un-mergeable but in-alphabet text: the OOV signal is silent, the
    compression gate alone must catch it (the two signals are
    independent)."""
    m = StreamingTokenizerIngest(path=str(tmp_path / "tokmon2"),
                                 cpt_drop_tol_ppm=100_000)
    m.build(spark, _docs(spark, range(30), BASE_SENT))
    # words built ONLY from the base alphabet, shuffled so the learned
    # merges never apply
    scrambled = "zqj xwv gkd utr hnb eym ofc pla " * 4
    m.process_batch(_docs(spark, range(100, 112), scrambled), 0)
    rep = _report(spark, m)[0]
    assert rep["oov_ppm"] == 0
    assert rep["retrain_fired"] == 1
    assert (rep["chars_per_token_micro"] * 1_000_000
            < rep["baseline_cpt_micro"] * 900_000)


def test_retrain_cadence_matches_family(spark, tmp_path):
    """retrain_check_every=N follows the sibling maintainers' contract
    (StreamingSq8Ingest/StreamingPqIngest): the gate is EVALUATED every
    Nth batch and the window resets whether or not it fires — a
    breaching batch between checks is NOT gated immediately."""
    m = StreamingTokenizerIngest(path=str(tmp_path / "tokmon3"),
                                 retrain_check_every=2)
    m.build(spark, _docs(spark, range(30), BASE_SENT))
    # batch 0: drifted, but it is check 1 of 2 -> NOT gated
    m.process_batch(_docs(spark, range(100, 106), DRIFT_SENT), 0)
    assert _report(spark, m)[0]["retrain_fired"] == 0
    assert not os.path.exists(os.path.join(m.tok_path, _TOK_META))
    # batch 1: drifted, check 2 of 2 -> gate evaluates and fires
    m.process_batch(_docs(spark, range(200, 206), DRIFT_SENT), 1)
    assert _report(spark, m)[1]["retrain_fired"] == 1
    assert os.path.exists(os.path.join(m.tok_path, _TOK_META))
    # batch 2: in-distribution, check 1 of the NEXT window -> the
    # window advanced past the fire (reset happened at the check)
    m.process_batch(_docs(spark, range(300, 306), BASE_SENT), 2)
    assert _report(spark, m)[2]["retrain_fired"] == 0
