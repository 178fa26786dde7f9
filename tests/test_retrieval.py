"""BM25 retrieval invariants (oracle exactness is covered by the gate;
these check the SEMANTICS are a real BM25)."""

import math

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.retrieval import (
    QUERY_TERMS,
    TOP_K,
    retrieval_bm25_topk,
)
from demo_cdc_users_airline_spark.operators.text import tokens
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_topk_shape_and_order(spark):
    rows = retrieval_bm25_topk(spark, SF).collect()
    assert len(rows) == TOP_K
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # ties broken by doc_id ascending
    for a, b in zip(rows, rows[1:]):
        if a["score_micro"] == b["score_micro"]:
            assert a["doc_id"] < b["doc_id"]
    # micro quantization consistent with the double rendering
    for r in rows:
        assert r["score"] == r["score_micro"] / 1e6


def test_every_hit_contains_a_query_term(spark):
    hits = retrieval_bm25_topk(spark, SF)
    d = load_table(spark, SF, "documents").select(
        "doc_id", tokens("text").alias("toks"))
    joined = hits.join(d, "doc_id").collect()
    assert len(joined) == TOP_K
    for r in joined:
        assert any(t in r["toks"] for t in QUERY_TERMS), r["doc_id"]


def test_matches_independent_python_bm25(spark):
    """Recompute BM25 for the winning docs with plain Python floats —
    the Spark plan must agree to within the 1-micro quantization."""
    docs = [(r["doc_id"], r["text"].strip().lower().split())
            for r in load_table(spark, SF, "documents").collect()]
    n_docs = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n_docs
    df = {t: sum(1 for _, toks in docs if t in toks) for t in QUERY_TERMS}

    def score(toks):
        dl = len(toks)
        s = 0
        for t in QUERY_TERMS:
            tf = toks.count(t)
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += math.floor(1e6 * (idf * (tf * 2.2)
                                   / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))
        return s

    expected = {d: score(t) for d, t in docs}
    for r in retrieval_bm25_topk(spark, SF).collect():
        # floor() can flip by 1 micro when the Python expression tree
        # associates differently — allow that, nothing more
        assert abs(expected[r["doc_id"]] - r["score_micro"]) <= 1, r["doc_id"]
    top = max(expected.values())
    got_top = retrieval_bm25_topk(spark, SF).agg(
        F.max("score_micro")).collect()[0][0]
    assert abs(got_top - top) <= 1
