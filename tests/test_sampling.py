"""Deterministic stratified sample + split invariants."""

from collections import Counter

from demo_cdc_users_airline_spark.operators.sampling import (
    RATES_BP,
    dataset_sample_split,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_sample_is_deterministic_and_partition_independent(spark):
    a = {r["doc_id"]: (r["stratum"], r["split"])
         for r in dataset_sample_split(spark, SF).collect()}
    b = {r["doc_id"]: (r["stratum"], r["split"])
         for r in dataset_sample_split(spark, SF).repartition(17).collect()}
    assert a == b                          # no RNG/partition dependence


def test_rates_and_split_proportions(spark):
    rows = dataset_sample_split(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert 0 < len(rows) < n_docs          # a real subsample
    by_stratum = Counter(r["stratum"] for r in rows)
    # short docs keep 100%: every sampled stratum respects its rate ±10pp
    # (binomial noise at n≈500); the qualitative ordering must hold
    assert set(by_stratum) <= {"short", "medium", "long"}
    splits = Counter(r["split"] for r in rows)
    assert set(splits) <= {"train", "val", "test"}
    assert splits["train"] > splits["val"] + splits["test"]  # ~80/10/10
    # a kept short doc proves the 100% stratum passes through unfiltered
    if by_stratum.get("short"):
        short_total = sum(
            1 for r in load_table(spark, SF, "documents").collect()
            if len(r["text"].strip().lower().split()) <= 40)
        assert by_stratum["short"] == short_total
    assert RATES_BP["short"] == 10_000


def test_cluster_labels_are_valid_partition(spark):
    """Cluster labels: every doc labeled, labels are cluster minima, and
    every near-dup pair (the edges) lands in one cluster."""
    from demo_cdc_users_airline_spark.operators.dedup import (
        dedup_cluster_labels,
        dedup_simhash_pairs,
    )

    labels = {r["doc_id"]: r["cluster_id"]
              for r in dedup_cluster_labels(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").count()
    assert len(labels) == docs
    assert all(cid <= d for d, cid in labels.items())   # min-label
    assert all(labels[cid] == cid for cid in set(labels.values()))  # roots are roots
    pairs = dedup_simhash_pairs(spark, SF).collect()
    for p in pairs:   # at convergence every edge lies within one cluster
        assert labels[p["doc1"]] == labels[p["doc2"]]


def test_cluster_labels_converge_at_sf01(spark):
    """Edge uniformity at the LARGEST local SF — every near-dup pair must
    share a label at the large-star/small-star fixpoint."""
    from demo_cdc_users_airline_spark.operators.dedup import (
        dedup_cluster_labels,
        dedup_simhash_pairs,
    )

    big = "/root/testdata/sf0.1"
    labels = {r["doc_id"]: r["cluster_id"]
              for r in dedup_cluster_labels(spark, big).collect()}
    for p in dedup_simhash_pairs(spark, big).collect():
        assert labels[p["doc1"]] == labels[p["doc2"]]


import pytest


@pytest.mark.parametrize("local_finish", [1_000_000, 0])
def test_connected_components_long_chain(spark, local_finish):
    """Diameter-200 path graph: the exact shape that silently split under
    the old fixed-9-round propagation (reach ≈ Fib(11) ≈ 89). BOTH paths
    — the driver union-find local finish (default) and the distributed
    large-star/small-star fixpoint (local_finish_max_edges=0) — must
    converge to a single min-rooted component, plus keep singletons
    self-labeled."""
    from demo_cdc_users_airline_spark.operators.dedup import connected_components

    n = 201  # nodes 0..200 in a path; 300/301 isolated; 400-401-402 a V
    edges = ([(i, i + 1) for i in range(n - 1)] + [(401, 400), (401, 402)])
    edf = spark.createDataFrame(edges, "src: long, dst: long")
    ndf = spark.createDataFrame(
        [(i,) for i in range(n)] + [(300,), (301,), (400,), (401,), (402,)],
        "doc_id: long")
    got = {r["doc_id"]: r["label"]
           for r in connected_components(
               edf, ndf, local_finish_max_edges=local_finish).collect()}
    assert all(got[i] == 0 for i in range(n))
    assert got[300] == 300 and got[301] == 301
    assert got[400] == got[401] == got[402] == 400


def test_connected_components_paths_agree_on_corpus_edges(spark):
    """Parity: on the real sf0.001 near-dup edge set, the local
    union-find finish and the distributed fixpoint produce IDENTICAL
    labels (both are exact min-label components)."""
    from demo_cdc_users_airline_spark.operators.dedup import (
        connected_components,
        dedup_simhash,
        dedup_simhash_pairs,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    edges = (dedup_simhash_pairs(spark, sf)
             .select(F.col("doc1").alias("src"), F.col("doc2").alias("dst")))
    nodes = dedup_simhash(spark, sf).select("doc_id")
    local = {(r["doc_id"], r["label"])
             for r in connected_components(edges, nodes).collect()}
    dist = {(r["doc_id"], r["label"])
            for r in connected_components(
                edges, nodes, local_finish_max_edges=0).collect()}
    assert local == dist and local


def test_connected_components_random_graphs_property(spark):
    """Property test: on random graphs, BOTH paths agree with a pure-
    Python union-find reference (exact min-labels). Uses fixed seeds —
    deterministic, no flaky sampling."""
    import random

    from demo_cdc_users_airline_spark.operators.dedup import (
        connected_components,
    )

    for seed, n_nodes, n_edges in ((7, 40, 25), (11, 60, 80), (13, 30, 0)):
        rng = random.Random(seed)
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]
        # independent reference: plain BFS over the adjacency lists
        adj: dict[int, list[int]] = {i: [] for i in range(n_nodes)}
        for a, b in edges:
            if a != b:
                adj[a].append(b)
                adj[b].append(a)
        ref: dict[int, int] = {}
        for start in range(n_nodes):
            if start in ref:
                continue
            comp, queue = [start], [start]
            seen = {start}
            while queue:
                x = queue.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        comp.append(y)
                        queue.append(y)
            root = min(comp)
            for x in comp:
                ref[x] = root
        edf = (spark.createDataFrame(edges or [(0, 0)], "src: long, dst: long"))
        ndf = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id: long")
        for lf in (10**6, 0):
            got = {r["doc_id"]: r["label"]
                   for r in connected_components(
                       edf, ndf, local_finish_max_edges=lf).collect()}
            assert got == ref, (seed, lf)


def test_stats_report_marginals_consistent(spark):
    from demo_cdc_users_airline_spark.operators.sampling import corpus_stats_report

    rows = corpus_stats_report(spark, SF).collect()
    cells = [r for r in rows if r["g_lang"] == 0 and r["g_source"] == 0]
    lang_m = {r["lang"]: r for r in rows if r["g_lang"] == 0 and r["g_source"] == 1}
    src_m = {r["source"]: r for r in rows if r["g_lang"] == 1 and r["g_source"] == 0}
    total = [r for r in rows if r["g_lang"] == 1 and r["g_source"] == 1]
    assert len(total) == 1
    assert len(rows) == len(cells) + len(lang_m) + len(src_m) + 1
    for metric in ("n_docs", "n_tokens", "n_chars"):
        cell_sum = sum(r[metric] for r in cells)
        assert cell_sum == total[0][metric]
        for lang, m in lang_m.items():
            assert m[metric] == sum(r[metric] for r in cells if r["lang"] == lang)
        for src, m in src_m.items():
            assert m[metric] == sum(r[metric] for r in cells if r["source"] == src)
    for r in rows:
        assert r["avg_doc_tokens"] == r["n_tokens"] / r["n_docs"]


def test_curriculum_order_matches_global_sort(spark):
    from demo_cdc_users_airline_spark.operators.sampling import (
        _CURRICULUM_STAGES,
        corpus_curriculum_order,
    )

    rows = corpus_curriculum_order(spark, SF).collect()
    # global rank == driver-side sort of the same keys (total order)
    order = sorted(rows, key=lambda r: (-r["quality_score"], r["n_tokens"],
                                        r["doc_id"]))
    n = len(rows)
    assert sorted(r["curriculum_rank"] for r in rows) == list(range(1, n + 1))
    for i, r in enumerate(order):
        assert r["curriculum_rank"] == i + 1
        assert r["stage"] == min(i * _CURRICULUM_STAGES // n,
                                 _CURRICULUM_STAGES - 1)
    # stages are contiguous, monotone along the rank order
    stages = [r["stage"] for r in order]
    assert stages == sorted(stages)
    assert set(stages) == set(range(_CURRICULUM_STAGES))
