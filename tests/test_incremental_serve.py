"""The maintained-index SERVE catalog gates: build on the base split,
append the increment, serve from the grown artifact — cross-checked
against the rebuild/full-corpus paths."""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    _SERVE_QBOUND,
    similarity_ivf_incremental_serve,
    similarity_ivf_serve_topk,
)
from demo_cdc_users_airline_spark.operators.retrieval import (
    retrieval_bm25_incremental_serve,
    retrieval_bm25_serve,
)

SF = "/root/testdata/sf0.001"


def test_bm25_incremental_equals_full_rebuild(spark):
    # base split + appended increment = the full corpus, so the
    # maintained-index serve must equal the full-corpus-index serve
    # BIT-IDENTICALLY — the strongest cross-path check available
    inc = retrieval_bm25_incremental_serve(spark, SF).collect()
    full = retrieval_bm25_serve(spark, SF).collect()
    assert inc == full


def test_ivf_incremental_serves_appended_neighbors(spark):
    rows = similarity_ivf_incremental_serve(spark, SF).collect()
    assert rows
    # fresh arrivals can now match yesterday's appended arrivals —
    # the capability the base-only index cannot have
    assert any(r["neighbor_id"] % _DRIFT_MOD == 0 for r in rows)
    for r in rows:
        # queries are today's batch; neighbors are never other queries
        # (the query batch is excluded from the append)
        assert r["query_id"] % _DRIFT_MOD == 0 and \
            r["query_id"] < _SERVE_QBOUND
        assert (r["neighbor_id"] % _DRIFT_MOD != 0
                or r["neighbor_id"] >= _SERVE_QBOUND)
    # and the result genuinely differs from the base-only serve
    base = similarity_ivf_serve_topk(spark, SF).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, base))


def test_ivf_incremental_topk_ordered(spark):
    rows = similarity_ivf_incremental_serve(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["cosine"], r["neighbor_id"]))
    for pairs in by_q.values():
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
