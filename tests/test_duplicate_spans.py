"""Substring-level duplicate-span semantics on a doctored corpus:
cross-document shared spans must be found, measured, and attributed to
the right positions; within-document repetition alone must NOT count."""

import pytest

from demo_cdc_users_airline_spark.operators.dedup import (
    _SPAN_N,
    dedup_duplicate_spans,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
SHARED2 = "kappa lamda mu nu xi omicron"                   # 6 tokens

DOCS = [
    # 0 and 1 share an 8-token span (embedded at different offsets)
    (0, f"intro words here {SHARED} trailing tail"),
    (1, f"{SHARED} completely different ending material"),
    # 2: repeats ITS OWN 5-gram twice but shares nothing across docs
    (2, "solo run one two three four solo run one two three four"),
    # 3: all-unique tokens, no overlap with anything
    (3, " ".join(f"u{i}" for i in range(12))),
    # 4: too short for any 5-gram
    (4, "tiny doc here"),
    # 5 and 6 share TWO disjoint spans (6- and 8-token) separated by
    # per-doc-unique filler: max_dup_run must pick the LONGER run,
    # n_dup_ngrams the sum of both — the run-fold's multi-run case
    (5, f"{SHARED2} fx1 fx2 fx3 fx4 {SHARED} fz1"),
    (6, f"gy0 {SHARED2} gy1 gy2 gy3 gy4 {SHARED} gz1"),
]


@pytest.fixture(scope="module")
def spans(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("spancorpus")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return {r["doc_id"]: r
            for r in dedup_duplicate_spans(spark, str(d)).collect()}


def test_shared_span_found_with_exact_run_length(spans):
    # an 8-token shared span contains 8 - _SPAN_N + 1 = 4 consecutive
    # duplicated 5-grams in BOTH documents
    expect_run = len(SHARED.split()) - _SPAN_N + 1
    for doc in (0, 1):
        r = spans[doc]
        assert r["n_dup_ngrams"] == expect_run
        assert r["max_dup_run"] == expect_run
        assert 0 < r["dup_frac"] < 1


def test_recovered_span_length_formula(spans):
    # max_dup_run r ⇒ a shared span of exactly r + _SPAN_N - 1 tokens
    assert spans[0]["max_dup_run"] + _SPAN_N - 1 == len(SHARED.split())


def test_within_doc_repetition_does_not_count(spans):
    r = spans[2]
    assert r["n_dup_ngrams"] == 0      # df counts DISTINCT documents
    assert r["max_dup_run"] == 0
    assert r["dup_frac"] == 0.0


def test_unique_doc_clean(spans):
    r = spans[3]
    assert r["n_ngrams"] == 12 - _SPAN_N + 1
    assert r["n_dup_ngrams"] == 0


def test_short_doc_has_no_ngrams_and_null_frac(spans):
    r = spans[4]
    assert r["n_ngrams"] == 0
    assert r["max_dup_run"] == 0
    assert r["dup_frac"] is None       # 0/0 → NULL, not a fake 0.0


def test_two_disjoint_runs_longest_wins(spans):
    # 6-token span → 2 dup 5-grams, 8-token span → 4; filler 5-grams
    # straddling the boundaries are per-doc unique, so the runs stay
    # disjoint: n_dup = 2 + 4, max run = the longer (4)
    run_a = len(SHARED2.split()) - _SPAN_N + 1
    run_b = len(SHARED.split()) - _SPAN_N + 1
    for doc in (5, 6):
        r = spans[doc]
        assert r["n_dup_ngrams"] == run_a + run_b
        assert r["max_dup_run"] == max(run_a, run_b)


def test_gate_corpus_profile(spark):
    rows = dedup_duplicate_spans(spark, "/root/testdata/sf0.001").collect()
    # every document is present exactly once
    assert len(rows) == len({r["doc_id"] for r in rows})
    for r in rows:
        assert r["n_dup_ngrams"] <= r["n_ngrams"]
        assert r["max_dup_run"] <= r["n_dup_ngrams"]
        if r["n_ngrams"] > 0:
            assert r["dup_frac"] == r["n_dup_ngrams"] / r["n_ngrams"]
