"""Product-quantization invariants: codebook shape, code coverage,
and ADC approximation quality vs exact distances."""

import math

from demo_cdc_users_airline_spark.operators.pq import (
    ADC_TOPK,
    K_SUB,
    M_SUB,
    N_QUERIES,
    SUB_DIM,
    fitted_pq_codebook,
    similarity_pq_adc_topk,
    similarity_pq_codes,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_codebook_shape_and_codes_cover_all_vectors(spark):
    cb = fitted_pq_codebook(spark, SF)
    assert all(len(v) == SUB_DIM for _, _, v in cb)
    subs = {s for s, _, _ in cb}
    assert subs == set(range(M_SUB))
    # ≤ K codewords per subspace (cells can empty out, never grow)
    for s in subs:
        cids = [c for cs, c, _ in cb if cs == s]
        assert len(cids) == len(set(cids)) <= K_SUB

    rows = similarity_pq_codes(spark, SF).collect()
    n_vec = load_table(spark, SF, "embeddings").count()
    assert len(rows) == n_vec * M_SUB
    assert all(0 <= r["code"] < K_SUB and r["q_err_micro2"] >= 0 for r in rows)


def test_adc_approximates_exact_l2_ranking(spark):
    """ADC top-k must substantially overlap the exact L2 top-k — the
    recall property PQ exists to provide (codes are lossy, so exact
    equality is not expected)."""
    emb = {r["vec_id"]: r["embedding"]
           for r in load_table(spark, SF, "embeddings").collect()}
    got = similarity_pq_adc_topk(spark, SF).collect()
    assert len(got) == N_QUERIES * ADC_TOPK
    hits = total = 0
    for qid in range(N_QUERIES):
        exact = sorted(
            (math.dist(emb[qid], emb[v]), v) for v in emb if v != qid)
        exact_top = {v for _, v in exact[:ADC_TOPK * 4]}
        adc_top = {r["neighbor_id"] for r in got if r["query_id"] == qid}
        assert len(adc_top) == ADC_TOPK
        hits += len(adc_top & exact_top)
        total += ADC_TOPK
    assert hits / total >= 0.5, f"ADC recall@4k {hits}/{total}"


def test_ivfpq_candidates_respect_probed_cells(spark):
    """IVF×PQ: every reported neighbor must live in one of its query's
    nprobe probed cells, and its ADC distance must equal the full-scan
    ADC distance for the same (query, neighbor) pair — the composition
    changes the candidate SET, never a distance."""
    from pyspark.sql import functions as F

    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        _quantized_vectors,
        assign_cells,
        fitted_codebook,
        probe_cells,
    )
    from demo_cdc_users_airline_spark.operators.pq import (
        IVFPQ_NPROBE,
        similarity_ivfpq_topk,
    )

    got = similarity_ivfpq_topk(spark, SF).collect()
    assert {r["query_id"] for r in got} == set(range(N_QUERIES))
    vq = _quantized_vectors(spark, SF)
    ivf_cb = fitted_codebook(spark, SF, k=8, iters=3)
    cell_of = {r["id"]: r["cell"] for r in assign_cells(vq, ivf_cb).collect()}
    probed = {}
    for r in probe_cells(vq.filter(F.col("id") < N_QUERIES), ivf_cb,
                         nprobe=IVFPQ_NPROBE).collect():
        probed.setdefault(r["id"], set()).add(r["probe_cell"])
    for r in got:
        assert cell_of[r["neighbor_id"]] in probed[r["query_id"]]
    # distances agree with the full ADC scan on shared pairs
    full = {(r["query_id"], r["neighbor_id"]): r["adc_d2"]
            for r in similarity_pq_adc_topk(spark, SF).collect()}
    shared = [r for r in got if (r["query_id"], r["neighbor_id"]) in full]
    assert shared, "no overlap between IVF×PQ and full-scan ADC top-k"
    for r in shared:
        assert r["adc_d2"] == full[(r["query_id"], r["neighbor_id"])]


def test_ivfpq_residual_candidates_and_recall(spark):
    """Residual IVF×PQ: neighbors respect probed cells, and residual
    encoding's quantization error is no worse than plain PQ's on the
    same vectors (the point of encoding x − centroid: codewords spend
    their bits on within-cell variation)."""
    from pyspark.sql import functions as F

    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        _quantized_vectors,
        fitted_codebook,
        probe_cells,
    )
    from demo_cdc_users_airline_spark.operators.pq import (
        IVFPQ_NPROBE,
        _pq_assign,
        _residual_vectors,
        _split_subs,
        _subvectors,
        fitted_pq_codebook,
        fitted_residual_pq_codebook,
        similarity_ivfpq_residual_topk,
    )

    got = similarity_ivfpq_residual_topk(spark, SF).collect()
    assert {r["query_id"] for r in got} == set(range(N_QUERIES))
    assert all(r["adc_d2"] >= 0 for r in got)
    vq = _quantized_vectors(spark, SF)
    ivf_cb = fitted_codebook(spark, SF, k=8, iters=3)
    res = _residual_vectors(vq, ivf_cb)
    cell_of = {r["id"]: r["cell"] for r in res.select("id", "cell").collect()}
    probed = {}
    for r in probe_cells(vq.filter(F.col("id") < N_QUERIES), ivf_cb,
                         nprobe=IVFPQ_NPROBE).collect():
        probed.setdefault(r["id"], set()).add(r["probe_cell"])
    for r in got:
        assert cell_of[r["neighbor_id"]] in probed[r["query_id"]]

    # total quantization error: residual PQ ≤ plain PQ (strictly better
    # in practice; equality would mean the coarse quantizer is useless)
    plain = _pq_assign(_subvectors(spark, SF), fitted_pq_codebook(spark, SF))
    resid = _pq_assign(_split_subs(res, "rvec", ["id"]),
                       fitted_residual_pq_codebook(spark, SF))
    plain_err = plain.agg(F.sum("q_err")).first()[0]
    resid_err = resid.agg(F.sum("q_err")).first()[0]
    assert resid_err <= plain_err
