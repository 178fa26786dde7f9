"""Data-selection scoring invariants: unigram-LM logprob and DSIR
importance weights (oracle exactness is covered by the gate)."""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.importance import (
    DSIR_TARGET_LANG,
    score_dsir_importance,
    score_unigram_logprob,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_logprob_covers_corpus_and_is_negative(spark):
    out = score_unigram_logprob(spark, SF)
    n_docs = load_table(spark, SF, "documents").count()
    rows = out.collect()
    assert len(rows) == n_docs
    # log of a probability < 1 — every average must be strictly negative,
    # and bounded below by ln of the smoothed floor probability
    assert all(r["avg_logprob"] < 0 for r in rows)
    assert all(r["logprob_micro_sum"] < 0 for r in rows)
    mean = out.agg(F.avg("avg_logprob")).collect()[0][0]
    assert -20 < mean < 0


def test_logprob_partition_independent(spark):
    """Fixed-point micros make the per-doc sum exact integer arithmetic:
    any repartitioning must reproduce identical values."""
    a = {r["doc_id"]: r["logprob_micro_sum"]
         for r in score_unigram_logprob(spark, SF).collect()}
    b = {r["doc_id"]: r["logprob_micro_sum"]
         for r in score_unigram_logprob(spark, SF).repartition(17).collect()}
    assert a == b


def test_dsir_prefers_target_language(spark):
    """The whole point of importance resampling: documents drawn from
    the target distribution must average a higher weight than the rest."""
    out = score_dsir_importance(spark, SF)
    means = {r["is_t"]: r["m"] for r in
             (out.groupBy((F.col("lang") == DSIR_TARGET_LANG).alias("is_t"))
              .agg(F.avg("importance_weight").alias("m")).collect())}
    assert means[True] > means[False]
    # flag consistency
    bad = out.filter((F.col("prefer_for_target") != (F.col("weight_micro") > 0))
                     ).count()
    assert bad == 0


def test_dsir_weight_scales_with_tokens(spark):
    """Weights are per-token log-ratio sums, so |weight| grows with doc
    length; the per-token NORMALIZED ratio stays bounded."""
    rows = score_dsir_importance(spark, SF).collect()
    assert all(abs(r["importance_weight"]) / r["n_tokens"] < 10 for r in rows)


# ---------------------------------------------------------------------------
# mixture weights
# ---------------------------------------------------------------------------

def test_mixture_shares_are_distributions(spark):
    from demo_cdc_users_airline_spark.operators.importance import (
        corpus_mixture_weights,
    )

    rows = corpus_mixture_weights(spark, SF).collect()
    assert abs(sum(r["natural_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["sampled_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r["repeat_factor"] > 0


def test_mixture_temperature_flattens(spark):
    """tau = 0.5 must upweight low-resource slices and downweight the
    dominant one, with repeat factors monotone DECREASING in mass."""
    from demo_cdc_users_airline_spark.operators.importance import (
        corpus_mixture_weights,
    )

    rows = sorted(corpus_mixture_weights(spark, SF).collect(),
                  key=lambda r: r["n_tokens"])
    factors = [r["repeat_factor"] for r in rows]
    assert factors == sorted(factors, reverse=True)
    assert factors[0] > 1.0        # smallest slice upsampled
    assert factors[-1] < 1.0       # biggest slice downsampled
    # flattening, not inversion: sampled ORDER still follows natural order
    sampled = [r["sampled_share"] for r in rows]
    assert sampled == sorted(sampled)


def test_perplexity_buckets_tercile_structure(spark):
    from demo_cdc_users_airline_spark.operators.importance import (
        corpus_perplexity_buckets,
    )

    rows = corpus_perplexity_buckets(spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    assert len(rows) == len(docs)              # every document bucketed
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r["ppl_bucket"]] += 1
        # integer tercile edges: head = floor(n/3), head+middle = floor(2n/3)
        assert counts["head"] == n // 3
        assert counts["head"] + counts["middle"] == (2 * n) // 3
        # ranks are a permutation of 1..n and ordered by score desc
        rs.sort(key=lambda r: r["lang_rank"])
        assert [r["lang_rank"] for r in rs] == list(range(1, n + 1))
        scores = [(r["avg_logprob"], -r["doc_id"]) for r in rs]
        assert scores == sorted(scores, key=lambda s: (-s[0], s[1]))
        # bucket boundaries respect the rank order
        order = {"head": 0, "middle": 1, "tail": 2}
        buckets = [order[r["ppl_bucket"]] for r in rs]
        assert buckets == sorted(buckets)


def _py_tokens(text):
    import re

    return [w for w in re.split(r"\s+", text.lower().strip()) if w != ""] \
        if text.strip() else [""]


def test_bigram_logprob_python_replay(spark):
    """Exact integer replay of the bigram LM on the gate corpus."""
    import math

    from demo_cdc_users_airline_spark.operators.importance import (
        score_bigram_logprob,
    )

    got = {r["doc_id"]: r for r in score_bigram_logprob(spark, SF).collect()}
    docs = {r["doc_id"]: r["text"]
            for r in load_table(spark, SF, "documents").collect()}
    c2, c1, vocab = {}, {}, set()
    bigrams = {}
    for doc_id, text in docs.items():
        toks = _py_tokens(text)
        vocab.update(toks)
        bg = list(zip(toks, toks[1:]))
        bigrams[doc_id] = bg
        for p in bg:
            c2[p] = c2.get(p, 0) + 1
            c1[p[0]] = c1.get(p[0], 0) + 1
    V = len(vocab)
    for doc_id, bg in bigrams.items():
        r = got[doc_id]
        assert r["n_bigrams"] == len(bg)
        expect = sum(
            math.floor(1_000_000.0 * math.log((c2[p] + 1) / (c1[p[0]] + V)))
            for p in bg)
        assert r["logprob_micro_sum"] == expect
        if len(bg) == 0:
            assert r["avg_logprob"] is None


def test_source_divergence_python_replay(spark):
    """Exact integer replay of the per-source KL over hashed buckets."""
    import hashlib
    import math

    from demo_cdc_users_airline_spark.operators.importance import (
        DSIR_BUCKETS,
        corpus_source_divergence,
    )

    got = {r["source"]: r
           for r in corpus_source_divergence(spark, SF).collect()}
    rows = load_table(spark, SF, "documents").collect()

    def bucket(w):
        return int(hashlib.md5(("dsir_" + w).encode()).hexdigest()[:8],
                   16) % DSIR_BUCKETS

    sb = {}
    for r in rows:
        for w in _py_tokens(r["text"]):
            key = (r["source"], bucket(w))
            sb[key] = sb.get(key, 0) + 1
    gb, st = {}, {}
    for (src, b), c in sb.items():
        gb[b] = gb.get(b, 0) + c
        st[src] = st.get(src, 0) + c
    tc = sum(gb.values())
    assert set(got) == set(st)
    for src, r in got.items():
        assert r["n_tokens"] == st[src]
        expect = 0
        for (s, b), cs in sb.items():
            if s != src:
                continue
            lr = math.floor(1_000_000.0 * (
                math.log((cs + 1) / (st[src] + DSIR_BUCKETS))
                - math.log((gb[b] + 1) / (tc + DSIR_BUCKETS))))
            expect += cs * lr
        assert r["kl_micro_sum"] == expect


def test_bigram_logprob_degenerate_docs(spark, tmp_path_factory):
    """Single-token and whitespace-only docs must yield zero bigrams —
    not phantom pairs or an out-of-bounds index.  Spark's
    sequence(1, 0) is the DESCENDING [1, 0], so an unguarded
    sequence(1, greatest(size-1, 0)) indexes past the array for
    size<=1 docs (crash under ANSI, phantom NULL bigrams otherwise);
    the operator guards it with an explicit size>=2 CASE."""
    from demo_cdc_users_airline_spark.operators.importance import (
        score_bigram_logprob,
    )

    d = tmp_path_factory.mktemp("bigramdegen")
    docs = [
        (0, "solo"),             # single token
        (1, "   "),              # whitespace-only
        (2, "two words"),        # exactly one bigram
        (3, "a b a b"),          # repeated bigrams
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet"))

    got = {r["doc_id"]: r
           for r in score_bigram_logprob(spark, str(d)).collect()}
    assert set(got) == {0, 1, 2, 3}
    for did in (0, 1):
        assert got[did]["n_bigrams"] == 0
        assert got[did]["logprob_micro_sum"] == 0
        assert got[did]["avg_logprob"] is None
    assert got[2]["n_bigrams"] == 1
    assert got[3]["n_bigrams"] == 3
    assert got[2]["avg_logprob"] < 0 and got[3]["avg_logprob"] < 0


def test_clear_session_memos_evicts_and_recomputes(spark):
    """The memo eviction hook: registered per-(session, dataset) frames
    and scalars go away, and a later call rebuilds them."""
    from demo_cdc_users_airline_spark.operators.dedup import (
        _LABELS_MEMO,
        dedup_cluster_labels,
    )
    from demo_cdc_users_airline_spark.sources.loader import (
        clear_session_memos,
        load_table,
    )

    dedup_cluster_labels(spark, SF)
    load_table(spark, SF, "documents")
    assert len(_LABELS_MEMO) >= 1
    n = clear_session_memos(spark)
    assert n >= 2
    assert len(_LABELS_MEMO) == 0
    # rebuild works and re-memoizes
    dedup_cluster_labels(spark, SF)
    assert len(_LABELS_MEMO) == 1
