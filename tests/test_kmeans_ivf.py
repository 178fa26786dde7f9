"""k-means IVF codebook invariants (plus the fixed-point determinism
the oracle hash-match depends on)."""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    assign_cells,
    kmeans_fit,
    quantize,
    similarity_kmeans_ivf,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def vectors_of(spark):
    e = load_table(spark, SF, "embeddings")
    return quantize(e.select(F.col("vec_id").alias("id"),
                             F.col("embedding").cast("array<double>").alias("vec")))


def test_fit_is_deterministic_and_error_decreases(spark):
    v = vectors_of(spark).cache()
    c1 = kmeans_fit(v, k=4, iters=1)
    c3 = kmeans_fit(v, k=4, iters=3)
    c3b = kmeans_fit(v, k=4, iters=3)
    assert c3 == c3b                       # bit-identical rerun (integer means)

    def sse(cents):
        return sum(r["q_err"] for r in assign_cells(v, cents).collect())

    # Lloyd monotonicity (floor'd integer means can perturb by at most
    # one micro-unit per dim — allow that slack)
    assert sse(c3) <= sse(c1) * (1 + 1e-6)


def test_assignment_partitioning_invariant(spark):
    v = vectors_of(spark)
    cents = kmeans_fit(v, k=4, iters=2)
    a1 = {r["id"]: r["cell"] for r in assign_cells(v, cents).collect()}
    a2 = {r["id"]: r["cell"]
          for r in assign_cells(v.repartition(16), cents).collect()}
    assert a1 == a2                        # partitioning does not change cells


def test_quantization_is_integer_exact(spark):
    v = vectors_of(spark)
    row = v.first()
    assert all(isinstance(x, int) for x in row["vec"])
    cents = kmeans_fit(v, k=4, iters=1)
    assert all(isinstance(x, int) for _, cv in cents for x in cv)


def test_gate_query_shape(spark):
    out = similarity_kmeans_ivf(spark, SF).collect()
    assert 1 <= len(out) <= 8
    assert sum(r["n_vectors"] for r in out) == vectors_of(spark).count()
    assert all(r["total_sq_err_micro"] >= 0 for r in out)


def test_knn_classify_structure(spark):
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        KNN_HOLDOUT_MOD,
        KNN_K,
        embedding_knn_classify,
    )
    from demo_cdc_users_airline_spark.sources.loader import load_table

    rows = embedding_knn_classify(spark, SF).collect()
    emb = load_table(spark, SF, "embeddings").collect()
    holdout = {r["vec_id"] for r in emb if r["vec_id"] % KNN_HOLDOUT_MOD == 0}
    labels = {r["vec_id"]: r["label"] for r in emb}
    label_set = set(labels.values())
    assert {r["query_id"] for r in rows} == holdout   # every holdout classified
    for r in rows:
        assert 1 <= r["n_votes"] <= KNN_K
        assert r["pred_label"] in label_set
        assert r["true_label"] == labels[r["query_id"]]
        assert r["is_correct"] == int(r["pred_label"] == r["true_label"])
        assert -1.0 <= r["top_cosine"] <= 1.0 + 1e-12


def test_knn_classify_votes_match_bruteforce_in_probed_cells(spark):
    """Replay the probe + vote driver-side from the building blocks."""
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        KNN_HOLDOUT_MOD,
        KNN_K,
        KNN_NPROBE,
        _quantized_vectors,
        assign_cells,
        embedding_knn_classify,
        fitted_codebook,
        probe_cells,
    )
    from demo_cdc_users_airline_spark.sources.loader import load_table
    import pyspark.sql.functions as F

    got = {r["query_id"]: (r["pred_label"], r["n_votes"])
           for r in embedding_knn_classify(spark, SF).collect()}
    centroids = fitted_codebook(spark, SF, k=8, iters=3)
    vq = _quantized_vectors(spark, SF)
    hold = F.col("id") % KNN_HOLDOUT_MOD == 0
    probes = {}
    for r in probe_cells(vq.filter(hold), centroids, KNN_NPROBE).collect():
        probes.setdefault(r["id"], set()).add(r["probe_cell"])
    refs = [(r["id"], r["cell"], r["vec"])
            for r in assign_cells(vq.filter(~hold), centroids).collect()]
    qvecs = {r["id"]: r["vec"] for r in vq.filter(hold).collect()}
    labels = {r["vec_id"]: r["label"]
              for r in load_table(spark, SF, "embeddings").collect()}
    import math

    for qid, cells in probes.items():
        qv = qvecs[qid]
        qn = sum(x * x for x in qv)
        cand = []
        for rid, cell, rv in refs:
            if cell in cells:
                d = sum(x * y for x, y in zip(qv, rv))
                rn = sum(x * x for x in rv)
                cand.append((-(d / math.sqrt(float(qn) * rn)), rid))
        cand.sort()
        top = cand[:KNN_K]
        votes = {}
        for _, rid in top:
            votes[labels[rid]] = votes.get(labels[rid], 0) + 1
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[qid] == (pred[0], pred[1])


def test_ann_recall_consistent_with_search_operators(spark):
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        RECALL_K,
        similarity_ann_recall,
        similarity_topk_ivf_nprobe,
    )
    from demo_cdc_users_airline_spark.operators.similarity import (
        similarity_topk_brute,
    )

    got = {r["query_id"]: r for r in similarity_ann_recall(spark, SF).collect()}
    brute = {}
    for r in similarity_topk_brute(spark, SF).collect():
        brute.setdefault(r["query_id"], []).append(
            (-r["cosine"], r["neighbor_id"]))
    approx = {}
    for r in similarity_topk_ivf_nprobe(spark, SF).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(brute)
    for qid, cand in brute.items():
        cand.sort()
        truth = {nid for _, nid in cand[:RECALL_K]}
        hits = len(truth & approx.get(qid, set()))
        assert got[qid]["n_hits"] == hits
        assert got[qid]["k"] == RECALL_K
        assert got[qid]["recall_at_k"] == hits / RECALL_K
        assert 0.0 <= got[qid]["recall_at_k"] <= 1.0


def test_codebook_roundtrip_preserves_assignments(spark, tmp_path):
    """Persisted codebook == in-session artifact: assignments (and so
    every downstream probe) are identical from a reloaded table."""
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        _quantized_vectors,
        assign_cells,
        fitted_codebook,
        load_codebook,
        save_codebook,
    )

    cb = fitted_codebook(spark, SF, k=8, iters=3)
    path = str(tmp_path / "codebook")
    save_codebook(spark, path, cb)
    cb2 = load_codebook(spark, path)
    assert cb2 == [(int(c), [int(x) for x in v]) for c, v in cb]
    vq = _quantized_vectors(spark, SF)
    a = {r["id"]: r["cell"] for r in assign_cells(vq, cb).collect()}
    b = {r["id"]: r["cell"] for r in assign_cells(vq, cb2).collect()}
    assert a == b


def test_ann_recall_curve_monotone_and_consistent(spark):
    """The nprobe curve: recall is non-decreasing in nprobe (more cells
    probed ⊇ fewer), each point's totals are integer-consistent, and
    the nprobe=2 point equals the aggregate of similarity_ann_recall's
    per-query report."""
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        CURVE_NPROBES,
        RECALL_K,
        similarity_ann_recall,
        similarity_ann_recall_curve,
    )

    rows = {r["nprobe"]: r
            for r in similarity_ann_recall_curve(spark, SF).collect()}
    assert set(rows) == set(CURVE_NPROBES)
    recalls = [rows[n]["recall_at_k"] for n in sorted(rows)]
    assert recalls == sorted(recalls)  # probing more cells never hurts
    for r in rows.values():
        assert r["k"] == RECALL_K
        assert 0 <= r["n_hits"] <= r["k"] * r["n_queries"]
        assert r["recall_at_k"] == r["n_hits"] / (r["k"] * r["n_queries"])
    per_query = similarity_ann_recall(spark, SF).collect()
    assert rows[2]["n_hits"] == sum(r["n_hits"] for r in per_query)
    assert rows[2]["n_queries"] == len(per_query)


def test_topic_keywords_are_cluster_characteristic(spark):
    import math

    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        TOPIC_K, TOPIC_TOP_WORDS, corpus_topic_keywords)

    sf = "/root/testdata/sf0.001"
    rows = corpus_topic_keywords(spark, sf).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert set(by_cluster) <= set(range(TOPIC_K))
    for cid, kws in by_cluster.items():
        assert len(kws) == TOPIC_TOP_WORDS
        assert [r["rnk"] for r in
                sorted(kws, key=lambda r: r["rnk"])] == [1, 2, 3, 4, 5]
        # scores strictly ordered by (score desc, token) within cluster
        ordered = sorted(kws, key=lambda r: (-r["ctfidf_micro"], r["token"]))
        assert [r["rnk"] for r in ordered] == [1, 2, 3, 4, 5]
        for r in kws:
            assert r["tok_count"] >= 1
            assert r["ctfidf_micro"] >= 0

    # replay one cluster's scores from raw counts
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        _topic_vectors, assign_cells, kmeans_fit)
    vectors = _topic_vectors(spark, sf)
    cents = kmeans_fit(vectors, k=TOPIC_K, iters=3)
    cell = {r["id"]: r["cell"]
            for r in assign_cells(vectors, cents).collect()}
    ct, tc, ft, tot = {}, {}, {}, 0
    for d in docs:
        c = cell[d["doc_id"]]
        for w in d["text"].strip().lower().split():
            ct[(c, w)] = ct.get((c, w), 0) + 1
            tc[c] = tc.get(c, 0) + 1
            ft[w] = ft.get(w, 0) + 1
            tot += 1
    for r in rows:
        key = (r["cluster_id"], r["token"])
        assert ct[key] == r["tok_count"]
        want = math.floor(1_000_000.0 * (ct[key] / tc[r["cluster_id"]])
                          * math.log(1.0 + (tot / TOPIC_K)
                                     / ft[r["token"]]))
        assert r["ctfidf_micro"] == want
