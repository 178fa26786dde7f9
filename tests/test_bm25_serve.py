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


def test_empty_batch_partial_is_additive_identity(spark, index_path,
                                                  tmp_path):
    # ADVICE r8: an EMPTY micro-batch (foreachBatch delivers them) must
    # write a (n_docs=0, sum_dl=0) stats partial — a NULL sum_dl would
    # crash the serve-side Python merge — and serving after the append
    # must be bit-identical to serving before it
    import shutil

    from demo_cdc_users_airline_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_serve,
    )

    path = str(tmp_path / "idx_empty")
    shutil.copytree(index_path, path)
    before = [tuple(r) for r in bm25_serve(spark, path).collect()]
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    append_to_bm25_index(spark, path, empty, batch_id=7)
    parts = spark.read.parquet(path + "/stats") \
        .filter(F.col("ingest_batch") == 7).collect()
    assert [(r["n_docs"], r["sum_dl"]) for r in parts] == [(0, 0)]
    after = [tuple(r) for r in bm25_serve(spark, path).collect()]
    assert after == before


def test_serve_empty_index_returns_empty(spark, tmp_path):
    # n_docs == 0 guard: a never-ingested index serves an empty result
    # (typed schema) instead of NaN-scored rows
    from demo_cdc_users_airline_spark.operators.retrieval import (
        _write_bm25_batch,
        bm25_serve,
    )

    path = str(tmp_path / "idx_none")
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    _write_bm25_batch(empty, path, tag=-1, mode="overwrite")
    out = bm25_serve(spark, path)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "n_terms_matched", "score_micro", "score"]
