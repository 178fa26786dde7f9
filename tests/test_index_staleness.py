"""similarity_index_staleness: the saved-vs-fresh codebook rebuild
monitor (VERDICT r7 item 7, pairing with dedup_incremental_lsh)."""

from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    RECALL_K,
    _prefixed_kmeans_ctes,
    _stale_codebook,
    fitted_codebook,
    similarity_index_staleness,
)

SF = "/root/testdata/sf0.001"


def test_staleness_report_semantics(spark):
    row = similarity_index_staleness(spark, SF).collect()[0]
    assert row["n_queries"] == 8 and row["k"] == RECALL_K
    denom = RECALL_K * row["n_queries"]
    assert 0 <= row["hits_stale"] <= denom
    assert 0 <= row["hits_fresh"] <= denom
    assert row["recall_stale_micro"] == row["hits_stale"] * 1_000_000 // denom
    assert row["recall_fresh_micro"] == row["hits_fresh"] * 1_000_000 // denom
    assert row["staleness_gap_micro"] == \
        row["recall_fresh_micro"] - row["recall_stale_micro"]


def test_stale_codebook_differs_from_fresh(spark):
    # the drift increment must actually move the centroids — otherwise
    # the monitor is vacuous on this dataset
    assert _stale_codebook(spark, SF) != fitted_codebook(spark, SF)


def test_prefixed_ctes_do_not_collide():
    fresh = _prefixed_kmeans_ctes("")  # identity: byte-equal to default
    stale = _prefixed_kmeans_ctes("st")
    import re

    fresh_names = set(re.findall(r"(\w+) AS \(", fresh))
    stale_names = set(re.findall(r"(\w+) AS \(", stale))
    assert not fresh_names & stale_names
    assert all(n.startswith("st") for n in stale_names)
