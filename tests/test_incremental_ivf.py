"""similarity_incremental_ivf: incremental vector ingest against the
persisted cell-partitioned IVF index (build → report → APPEND), the
vector twin of dedup_incremental_lsh's persisted-artifact lifecycle."""

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    _quantized_vectors,
    _stale_codebook,
    append_to_ivf_index,
    assign_cells,
    build_ivf_index,
    load_codebook,
    similarity_incremental_ivf,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    return build_ivf_index(spark, SF,
                           str(tmp_path_factory.mktemp("ivf") / "idx"))


def test_saved_codebook_matches_base_fit(spark, index_path):
    # the artifact round-trips the base-trained codebook losslessly
    assert load_codebook(spark, index_path + "/codebook") == \
        _stale_codebook(spark, SF)


def test_report_semantics(spark):
    rows = similarity_incremental_ivf(spark, SF).collect()
    assert [r["cell"] for r in rows] == sorted(r["cell"] for r in rows)
    total_added = sum(r["n_added"] for r in rows)
    n_inc = (_quantized_vectors(spark, SF)
             .filter(F.col("id") % _DRIFT_MOD == 0).count())
    assert total_added == n_inc  # every increment vector lands somewhere
    for r in rows:
        assert r["n_total"] == r["n_base"] + r["n_added"]
        assert r["added_share_ppm"] == (
            r["n_added"] * 1_000_000 // r["n_total"] if r["n_total"] else 0)


def test_report_is_idempotent_and_readonly(spark):
    # the catalog query never mutates the artifact: the per-cell report
    # is identical across invocations (bench runs it 3x)
    a = similarity_incremental_ivf(spark, SF).collect()
    b = similarity_incremental_ivf(spark, SF).collect()
    assert a == b


def test_append_lifecycle(spark, index_path):
    # build → APPEND the increment → reload: per-cell totals equal a
    # full recompute of ALL vectors under the saved codebook
    inc = (_quantized_vectors(spark, SF)
           .filter(F.col("id") % _DRIFT_MOD == 0))
    append_to_ivf_index(spark, index_path, inc)
    got = {r["cell"]: r["n"] for r in
           (spark.read.parquet(index_path + "/cells")
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect())}
    cb = load_codebook(spark, index_path + "/codebook")
    want = {r["cell"]: r["n"] for r in
            (assign_cells(_quantized_vectors(spark, SF), cb)
             .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect())}
    assert got == want


def test_probe_plan_reads_artifact_not_corpus(spark):
    # the report's base-occupancy side must scan the persisted index,
    # not re-run Lloyd over the embeddings
    plan = similarity_incremental_ivf(spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ivf_index" in plan


def test_serve_topk_semantics(spark):
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        _SERVE_QBOUND,
        _SERVE_TOPK,
        similarity_ivf_serve_topk,
    )

    rows = similarity_ivf_serve_topk(spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        # queries are increment arrivals, neighbors come from the BASE
        # index only (the splits are disjoint by construction)
        assert r["query_id"] % _DRIFT_MOD == 0 and \
            r["query_id"] < _SERVE_QBOUND
        assert r["neighbor_id"] % _DRIFT_MOD != 0
        by_q.setdefault(r["query_id"], []).append(
            (r["cosine"], r["neighbor_id"]))
    for pairs in by_q.values():
        assert 1 <= len(pairs) <= _SERVE_TOPK
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_serve_plan_prunes_index_partitions(spark):
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        similarity_ivf_serve_topk,
    )

    plan = similarity_ivf_serve_topk(spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ivf_index" in plan
    assert "PartitionFilters: [cell" in plan, plan
