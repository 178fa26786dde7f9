"""Repetition-filter semantics on a doctored corpus: the flags must
separate degenerate repetition from normal prose-like text."""

import pytest

from demo_cdc_users_airline_spark.operators.text import text_repetition_stats

DOCS = [
    # 0: pathological loop — one bigram repeated end to end
    (0, "spam ham " * 30),
    # 1: all-distinct tokens — zero duplicate n-grams
    (1, " ".join(f"tok{i}" for i in range(60))),
    # 2: mild natural repetition — a few repeated words, no repeated 3-grams
    (2, "the quick brown fox jumps over the lazy dog while the cat sleeps"),
]


@pytest.fixture(scope="module")
def rep(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("repcorpus")
    df = spark.createDataFrame(
        [(i, t.strip(), "en", "src0", len(t.strip())) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return {r["doc_id"]: r
            for r in text_repetition_stats(spark, str(d)).collect()}


def test_degenerate_loop_is_flagged(rep):
    r = rep[0]
    assert r["is_repetitive"]
    assert r["dup_2gram_frac"] == 1.0          # every bigram occurs ≥ 2×
    assert r["top_token_frac"] == 0.5          # 'spam' is half the tokens
    assert r["top_2gram_frac"] > 0.4           # 'spam ham' dominates


def test_all_distinct_doc_is_clean(rep):
    r = rep[1]
    assert not r["is_repetitive"]
    assert r["dup_2gram_frac"] == 0.0
    assert r["dup_3gram_frac"] == 0.0
    assert r["top_2gram_frac"] == 1.0 / (r["n_tokens"] - 1)


def test_mild_repetition_passes(rep):
    r = rep[2]
    assert not r["is_repetitive"]
    assert r["top_token_frac"] == 3 / 13       # 'the' ×3 of 13 tokens
    assert r["dup_3gram_frac"] == 0.0
    # duplicated token 'the' does NOT leak into bigram duplication
    assert r["dup_2gram_frac"] == 0.0


def test_fractions_bounded(spark):
    rows = text_repetition_stats(spark, "/root/testdata/sf0.01").collect()
    for r in rows:
        for c in ("top_token_frac", "dup_2gram_frac", "top_2gram_frac",
                  "dup_3gram_frac", "top_3gram_frac"):
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])
        # the top n-gram's occurrences are themselves duplicated (or unique)
        if r["top_2gram_frac"] > 1.0 / (r["n_tokens"] - 1):
            assert r["dup_2gram_frac"] >= r["top_2gram_frac"]
