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


def test_mmr_rerank_invariants(spark):
    """Structural MMR properties on the real corpus: one block of
    MMR_K distinct selections per query, rank 1 = the pure-relevance
    argmax scored at λ·rel, every later score bounded by λ·rel of its
    own pick (the redundancy term only ever subtracts when sims are
    non-negative; with signed cosines it can add, so rank-monotonicity
    is deliberately NOT asserted)."""
    from demo_cdc_users_airline_spark.operators.retrieval import (
        MMR_K,
        retrieval_mmr_rerank,
    )

    rows = retrieval_mmr_rerank(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 8
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["mmr_rank"])
        assert [r["mmr_rank"] for r in rs] == list(range(1, MMR_K + 1))
        assert len({r["neighbor_id"] for r in rs}) == MMR_K
        assert rs[0]["mmr_score"] == 0.7 * rs[0]["relevance"]
        assert rs[0]["relevance"] == max(r["relevance"] for r in rs)


def test_mmr_skips_redundant_hit(spark, tmp_path):
    """The point of MMR: with a near-duplicate of the best hit in the
    pool, pure relevance ranks it second but MMR demotes it. Doctored
    geometry: query q=e0; c1≈c2 both very similar to q; c3 moderately
    similar to q but orthogonal to c1/c2 — MMR must pick c3 second."""
    import pytest

    from demo_cdc_users_airline_spark.operators.retrieval import (
        retrieval_mmr_rerank,
    )

    d = tmp_path / "mmr"
    d.mkdir()
    # geometry: c10 == c11 exactly (sim = 1, full λ-penalty) while c12
    # is almost as relevant but in an orthogonal residual direction:
    # score2(c11) = 0.7·0.95 − 0.3·1 ≈ 0.365 < score2(c12) ≈
    # 0.7·0.93 − 0.3·0.88 ≈ 0.386 — pure relevance would rank c11
    # second, MMR must not
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),          # the query (vec_id < 8)
        (10, [0.95, 0.3122, 0.0, 0.0], 0),     # best hit
        (11, [0.95, 0.3122, 0.0, 0.0], 0),     # its EXACT duplicate
        (12, [0.93, 0.0, 0.3676, 0.0], 0),     # relevant AND diverse
        (13, [0.1, 0.0, 0.0, 0.99], 0),        # filler
    ]
    (spark.createDataFrame(vecs, "vec_id long, embedding array<float>,"
                                 " label int")
     .coalesce(1).write.parquet(str(d / "embeddings.parquet")))
    rows = sorted((r for r in retrieval_mmr_rerank(spark, str(d)).collect()
                   if r["query_id"] == 0), key=lambda r: r["mmr_rank"])
    picked = [r["neighbor_id"] for r in rows]
    assert len(picked) == 4               # pool smaller than MMR_K
    assert picked[0] in (10, 11)          # relevance argmax first
    assert picked[1] == 12, picked        # diversity beats the near-dup
    # the near-dup IS eventually admitted (MMR re-ranks, never drops)
    assert 11 in picked
