"""Curation-operator invariants: decontamination, sequence packing,
int8 quantization, and the end-to-end retained verdict."""

from demo_cdc_users_airline_spark.operators.curation import (
    _BENCH_MOD,
    _CONTAM_MIN,
    _PACK_BUDGET,
    corpus_curation_pipeline,
    corpus_decontaminate,
    corpus_pack_chunks,
)
from demo_cdc_users_airline_spark.operators.similarity import (
    embedding_quantize_int8,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_decontaminate_excludes_bench_and_bounds_overlap(spark):
    rows = corpus_decontaminate(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    n_bench = sum(1 for r in load_table(spark, SF, "documents")
                  .select("doc_id").collect() if r[0] % _BENCH_MOD == 0)
    assert len(rows) == n_docs - n_bench
    for r in rows:
        assert r["doc_id"] % _BENCH_MOD != 0
        assert 0 <= r["n_overlap"] <= r["n_shingles"]
        assert r["is_contaminated"] == int(r["n_overlap"] >= _CONTAM_MIN)


def test_bloom_decontaminate_semantics(spark):
    """Bloom gate invariants: no false negatives (every exact overlap is
    a bloom hit), the flag gates on the bloom count, and the filter
    itself is the bounded 8 KB artifact regardless of corpus size."""
    from demo_cdc_users_airline_spark.operators.curation import (
        _BLOOM_M,
        _bloom_words,
        corpus_decontaminate_bloom,
    )

    words = _bloom_words(spark, SF)
    assert len(words) == _BLOOM_M // 64
    assert any(w != 0 for w in words)

    exact = {r["doc_id"]: r for r in corpus_decontaminate(spark, SF).collect()}
    rows = corpus_decontaminate_bloom(spark, SF).collect()
    assert len(rows) == len(exact)
    fp_total = 0
    for r in rows:
        e = exact[r["doc_id"]]
        assert r["n_shingles"] == e["n_shingles"]
        assert r["n_exact_overlap"] == e["n_overlap"]
        assert r["n_bloom_hits"] >= r["n_exact_overlap"]  # no false negatives
        assert r["n_false_pos"] == r["n_bloom_hits"] - r["n_exact_overlap"]
        assert r["is_flagged"] == int(r["n_bloom_hits"] >= _CONTAM_MIN)
        # the bloom flag is a superset of the exact contamination flag
        assert r["is_flagged"] >= e["is_contaminated"]
        fp_total += r["n_false_pos"]
    # m=2^16 at ~5% fill: per-shingle FP rate ≈ (fill)^4 ≈ 1e-5 — the
    # report should show a near-exact filter at this size
    assert fp_total <= max(10, len(rows) // 100)


def test_pack_chunks_layout(spark):
    rows = corpus_pack_chunks(spark, SF).collect()
    assert len(rows) == load_table(spark, SF, "documents").count()
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["pack_offset"] < _PACK_BUDGET
        assert r["spans_boundary"] == int(
            r["pack_offset"] + r["n_tokens"] > _PACK_BUDGET)
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in docs:  # offsets are exactly the running concat position
            assert r["pack_id"] == shard * 1000000 + off // _PACK_BUDGET
            assert r["pack_offset"] == off % _PACK_BUDGET
            off += r["n_tokens"]


def test_quantize_int8_roundtrip_error(spark):
    rows = embedding_quantize_int8(spark, SF).collect()
    emb = {r["vec_id"]: r["embedding"]
           for r in load_table(spark, SF, "embeddings").collect()}
    dim = len(next(iter(emb.values())))
    assert len(rows) == len(emb) * dim
    for r in rows[:2000]:
        assert -127 <= r["q"] <= 127
        x = emb[r["vec_id"]][r["dim_idx"]]
        if r["scale"] > 0:  # dequantized value within half a step
            assert abs(x - r["q"] * r["scale"] / 127) <= r["scale"] / 127


def test_curation_verdict_is_conjunction(spark):
    rows = corpus_curation_pipeline(spark, SF).collect()
    assert rows and any(r["retained"] == 1 for r in rows)
    assert any(r["retained"] == 0 for r in rows)
    for r in rows:
        assert r["retained"] == (r["quality_pass"] & r["exact_canonical"]
                                 & r["neardup_canonical"] & r["uncontaminated"])


def test_source_scorecard_matches_verdict_rollup(spark):
    from demo_cdc_users_airline_spark.operators.curation import (
        corpus_curation_pipeline,
        corpus_source_scorecard,
    )
    from demo_cdc_users_airline_spark.sources.loader import load_table

    verdict = {r["doc_id"]: r for r in corpus_curation_pipeline(spark, SF).collect()}
    docs = {r["doc_id"]: r for r in load_table(spark, SF, "documents").collect()}
    got = {r["source"]: r for r in corpus_source_scorecard(spark, SF).collect()}
    exp = {}
    for doc_id, v in verdict.items():
        d = docs[doc_id]
        s = exp.setdefault(d["source"], dict(
            n_docs=0, n_retained=0, n_quality_fail=0, n_exact_dup=0,
            n_neardup_dup=0, n_contaminated=0, n_chars_total=0,
            n_chars_retained=0))
        s["n_docs"] += 1
        s["n_retained"] += v["retained"]
        s["n_quality_fail"] += 1 - v["quality_pass"]
        s["n_exact_dup"] += 1 - v["exact_canonical"]
        s["n_neardup_dup"] += 1 - v["neardup_canonical"]
        s["n_contaminated"] += 1 - v["uncontaminated"]
        s["n_chars_total"] += d["n_chars"]
        s["n_chars_retained"] += d["n_chars"] if v["retained"] else 0
    assert set(got) == set(exp)
    for src, e in exp.items():
        g = got[src]
        for k, v in e.items():
            assert g[k] == v, (src, k)
        assert g["retained_ppm"] == e["n_retained"] * 1_000_000 // e["n_docs"]


def test_keep_best_policy_per_cluster(spark):
    from demo_cdc_users_airline_spark.operators.curation import (
        dedup_cluster_keep_best,
    )

    rows = dedup_cluster_keep_best(spark, SF).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r["is_kept_best"] == 1]
        assert len(keepers) == 1                     # exactly one survivor
        k = keepers[0]
        assert len(members) == k["n_members"]
        best = max(members,
                   key=lambda r: (r["quality_score"], -r["doc_id"]))
        assert k["doc_id"] == best["doc_id"]         # highest quality wins
        assert all(k["quality_score"] >= r["quality_score"]
                   for r in members)


def test_curation_funnel_is_consistent_with_verdict(spark):
    from demo_cdc_users_airline_spark.operators.curation import (
        corpus_curation_funnel, curation_verdict)

    sf = "/root/testdata/sf0.001"
    v = {r["doc_id"]: r for r in curation_verdict(spark, sf).collect()}
    rows = {r["stage"]: r for r in
            corpus_curation_funnel(spark, sf).collect()}
    assert [rows[s]["stage_name"] for s in (1, 2, 3, 4)] == [
        "quality", "exact_dedup", "neardup_dedup", "decontaminate"]
    n0 = len(v)
    s1 = sum(r["quality_pass"] for r in v.values())
    s2 = sum(r["quality_pass"] * r["exact_canonical"] for r in v.values())
    s3 = sum(r["quality_pass"] * r["exact_canonical"]
             * r["neardup_canonical"] for r in v.values())
    s4 = sum(r["retained"] for r in v.values())
    chain = [(1, n0, s1), (2, s1, s2), (3, s2, s3), (4, s3, s4)]
    for stage, n_in, n_out in chain:
        r = rows[stage]
        assert (r["n_in"], r["n_out"]) == (n_in, n_out)
        assert r["dropped"] == n_in - n_out
        assert r["retention"] == n_out / n_in
    # the funnel is monotone and ends at the pipeline's retained count
    assert n0 >= s1 >= s2 >= s3 >= s4 > 0
