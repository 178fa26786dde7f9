"""retrieval_bm25_serve: BM25 served from the persisted prefix-
partitioned inverted index (build once → serve from posting slices)."""

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.retrieval import (
    SERVE_TERMS,
    TOP_K,
    build_bm25_index,
    retrieval_bm25_serve,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    return build_bm25_index(spark, SF,
                            str(tmp_path_factory.mktemp("bm25") / "idx"))


def test_index_df_matches_corpus(spark, index_path):
    # a term's postings are COMPLETE within its partition: df computed
    # from the pruned slice equals the corpus-wide document frequency
    from demo_cdc_users_airline_spark.operators.text import tokens
    from demo_cdc_users_airline_spark.sources.loader import load_table

    t = SERVE_TERMS[0]
    df_index = (spark.read.parquet(index_path + "/postings")
                .filter(F.col("term") == t).count())
    df_corpus = (load_table(spark, SF, "documents")
                 .select(tokens("text").alias("toks"))
                 .filter(F.expr(f"size(filter(toks, w -> w = '{t}')) > 0"))
                 .count())
    assert df_index == df_corpus > 0


def test_serve_plan_prunes_partitions_and_pushes_terms(spark):
    plan = retrieval_bm25_serve(spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [pfx" in plan, plan
    assert "In(term, [" in plan, plan
    # serving never touches the corpus table
    assert "documents.parquet" not in plan


def test_serve_topk_is_ordered_and_bounded(spark):
    rows = retrieval_bm25_serve(spark, SF).collect()
    assert 0 < len(rows) <= TOP_K
    scores = [(r["score_micro"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores, key=lambda s: (-s[0], s[1]))
    assert all(1 <= r["n_terms_matched"] <= len(SERVE_TERMS) for r in rows)
    assert all(abs(r["score"] - r["score_micro"] / 1e6) < 1e-12
               for r in rows)


def test_zero_match_docs_are_lossless_to_drop(spark):
    # a doc with no query term has tf=0 for every term, so each BM25
    # partial is floor(1e6 * 0) = 0 — dropping it cannot change top-k
    # unless the corpus has < TOP_K matching docs (then it pads with
    # ties at 0, which the oracle would also emit; assert we're not in
    # that regime at this SF so the equivalence argument holds)
    assert retrieval_bm25_serve(spark, SF).count() == TOP_K
