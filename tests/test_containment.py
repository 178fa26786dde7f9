"""Containment near-dup semantics on a doctored corpus: a short doc
quoted inside a longer one must be flagged at containment ~1.0 even
though symmetric Jaccard stays small; sub-threshold overlap must not."""

import pytest

from demo_cdc_users_airline_spark.operators.dedup import (
    dedup_jaccard_containment,
)

QUOTE = "q1 q2 q3 q4 q5 q6"  # 6 tokens -> 4 three-word shingles

DOCS = [
    (0, QUOTE),
    # 1 embeds the whole quote at its head, then 20 unique tokens:
    # every doc-0 shingle appears in doc 1, but doc 1 has 24 shingles
    (1, QUOTE + " " + " ".join(f"e{i}" for i in range(20))),
    # 2 shares exactly half of doc 0's shingles (q1q2q3, q2q3q4)
    (2, "q1 q2 q3 q4 x1 x2 x3"),
    # 3 overlaps nothing
    (3, " ".join(f"z{i}" for i in range(10))),
]


@pytest.fixture(scope="module")
def pairs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("containcorpus")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return {(r["doc1"], r["doc2"]): r
            for r in dedup_jaccard_containment(spark, str(d)).collect()}


def test_full_quote_flagged_despite_small_jaccard(pairs):
    r = pairs[(0, 1)]
    assert r["c_doc1_in_doc2"] == 1.0          # all 4 shingles contained
    assert r["n_common"] == 4
    assert r["jaccard"] == 4 / 24              # symmetric score stays low
    assert r["contained_doc"] == 0             # the smaller-set side


def test_threshold_boundary_is_inclusive(pairs):
    r = pairs[(0, 2)]
    assert r["c_doc1_in_doc2"] == 0.5          # exactly at _CONTAIN_MIN
    assert r["c_doc2_in_doc1"] == 2 / 5
    assert r["n_common"] == 2
    assert r["contained_doc"] == 0


def test_sub_threshold_overlap_not_reported(pairs):
    # docs 1 and 2 share the same two shingles, but max containment is
    # 2/5 = 0.4 < 0.5 — the pair must be filtered out
    assert (1, 2) not in pairs
    assert all(3 not in p for p in pairs)      # disjoint doc pairs with no one
    assert set(pairs) == {(0, 1), (0, 2)}
