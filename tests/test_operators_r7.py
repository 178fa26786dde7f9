"""Round-7 regression tests: graph local-finish/distributed parity
(the VERDICT r6 plan fix — per-round localCheckpoint + CC-style driver
local finish must be bit-identical to the distributed rounds), the
classifier's O(const) labeled-set bound, and the funnel's division
zero-guard (ADVICE r6).
"""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.classifier import (
    QC_MOD,
    QC_TRAIN_CAP,
)
from demo_cdc_users_airline_spark.operators.graph import (
    _pagerank_local,
    _triangles_local,
    dedup_graph_pagerank,
    dedup_graph_triangles,
)

SF = "/root/testdata/sf0.001"


def test_pagerank_local_vs_distributed_parity(spark):
    """The driver local finish and the checkpointed distributed rounds
    must produce bit-identical ranks on the same graph (the CC parity
    contract, extended to PageRank)."""
    local = {r["doc_id"]: (r["degree"], r["pagerank_micro"], r["pagerank"])
             for r in dedup_graph_pagerank(spark, SF).collect()}
    dist = {r["doc_id"]: (r["degree"], r["pagerank_micro"], r["pagerank"])
            for r in dedup_graph_pagerank(
                spark, SF, local_finish_max_edges=0).collect()}
    assert local, "fixture should produce a non-empty near-dup graph"
    assert local == dist


def test_triangles_local_vs_distributed_parity(spark):
    local = dedup_graph_triangles(spark, SF).collect()[0].asDict()
    dist = dedup_graph_triangles(
        spark, SF, local_finish_max_edges=0).collect()[0].asDict()
    assert local == dist
    assert local["n_edges"] > 0


def test_pagerank_local_finish_plan_is_flat(spark):
    """The default (local-finish) path must not grow a per-round plan:
    no Exchange at all — the result is a driver-built local relation."""
    df = dedup_graph_pagerank(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_triangles_local_replay_on_doctored_graph():
    """Known-answer census: K4 plus a pendant vertex — 4 triangles,
    every wedge formula term checked by hand."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    n_nodes, n_edges, n_wedges, n_tri, cc = _triangles_local(k4)
    assert (n_nodes, n_edges, n_tri) == (5, 7, 4)
    # degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 1
    assert n_wedges == 3 * 3 + 6 + 0
    assert cc == (3 * 4 * 1_000_000) // n_wedges


def test_pagerank_local_replay_star_graph():
    """Hand-checkable star: the hub collects every leaf's full rank
    share, leaves split the hub's. One round from uniform start."""
    edges = [(1, 2), (1, 3), (1, 4)]
    rows = {n: (d, pr) for n, d, pr in _pagerank_local(edges)}
    assert rows[1][0] == 3 and rows[2][0] == 1
    # round-by-round replay for 6 rounds in plain ints
    pr = {n: 1_000_000 for n in (1, 2, 3, 4)}
    deg = {1: 3, 2: 1, 3: 1, 4: 1}
    for _ in range(6):
        nxt = {n: 0 for n in pr}
        for u, vs in {1: [2, 3, 4], 2: [1], 3: [1], 4: [1]}.items():
            c = pr[u] // deg[u]
            for v in vs:
                nxt[v] += c
        pr = {n: 150_000 + (85 * s) // 100 for n, s in nxt.items()}
    for n in pr:
        assert rows[n][1] == pr[n]


def test_classifier_labeled_set_is_bounded():
    """The labeled-subset predicate admits at most 512 docs no matter
    how large the id space grows (the VERDICT r6 driver-killer fix)."""
    huge_corpus = range(0, QC_TRAIN_CAP * 1000, QC_MOD)
    labeled = [i for i in huge_corpus if i < QC_TRAIN_CAP]
    assert len(labeled) == 512
    # and the cap is a no-op at gate SFs (all testdata ids are tiny)
    assert QC_TRAIN_CAP > 5000


def test_funnel_retention_null_guard(spark):
    """A zero denominator must yield NULL (not Inf/NaN) so the Spark
    and DuckDB engines agree on degenerate corpora (ADVICE r6)."""
    row = (spark.createDataFrame([(5, 0, 0)], "n_in long, n_out long, z long")
           .select((F.col("n_out").cast("double")
                    / F.nullif(F.col("z"), F.lit(0)).cast("double"))
                   .alias("retention")).collect()[0])
    assert row["retention"] is None
