"""Persisted tokenizer artifact (VERDICT r10 #8): the trained BPE merge
table and unigram piece table as on-disk parquet artifacts — train →
save → load round-trips exactly, and encode-from-artifact equals
encode-from-trainer bit-for-bit."""

import os
import shutil

from demo_cdc_users_airline_spark.operators.tokenizer import (
    learn_bpe_merges,
    learn_unigram_vocab,
    load_bpe_merges,
    load_unigram_pieces,
    save_tokenizer,
    text_bpe_encode,
    text_bpe_encode_served,
    text_unigram_encode,
    text_unigram_encode_served,
)

SF = "/root/testdata/sf0.001"


def test_save_load_round_trips_exactly(spark, tmp_path):
    path = save_tokenizer(spark, SF, str(tmp_path / "tok"))
    assert load_bpe_merges(spark, path) == learn_bpe_merges(spark, SF)
    assert load_unigram_pieces(spark, path) == \
        learn_unigram_vocab(spark, SF)


def test_save_is_idempotent_full_rewrite(spark, tmp_path):
    path = save_tokenizer(spark, SF, str(tmp_path / "tok"))
    before = load_bpe_merges(spark, path)
    save_tokenizer(spark, SF, path)  # re-save over the existing artifact
    assert load_bpe_merges(spark, path) == before


def test_served_encode_equals_trainer_encode(spark):
    got = sorted(tuple(r) for r in
                 text_bpe_encode_served(spark, SF).collect())
    want = sorted(tuple(r) for r in text_bpe_encode(spark, SF).collect())
    assert got == want
    got_u = sorted(tuple(r) for r in
                   text_unigram_encode_served(spark, SF).collect())
    want_u = sorted(tuple(r) for r in
                    text_unigram_encode(spark, SF).collect())
    assert got_u == want_u


def test_artifact_loads_without_training_corpus(spark, tmp_path):
    """The artifact is self-contained: loading it must not touch the
    corpus it was trained on (the no-source-scan property every
    persisted index proves)."""
    src = tmp_path / "data"
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "documents.parquet"),
                src / "documents.parquet")
    path = save_tokenizer(spark, str(src), str(tmp_path / "tok"))
    spark.catalog.clearCache()
    shutil.rmtree(src)  # the training corpus is GONE

    merges = load_bpe_merges(spark, path)
    pieces = load_unigram_pieces(spark, path)
    assert merges and pieces
    # binary-safety spot check: every symbol survives the round trip
    # as a real Python string (bound later via lit(), never inlined)
    assert all(isinstance(a, str) and isinstance(b, str)
               for _, a, b, _ in merges)
