"""Data-selection scoring for training pipelines: unigram-LM log
probability (a perplexity proxy) and DSIR hashed-n-gram importance
weights (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling").

Both learn their model FROM the corpus in one partial-aggregatable
pass, reduce it to a bounded broadcast artifact (256 hash buckets for
DSIR; corpus scalars for the LM — the per-token count table in the LM
case stays distributed and joins co-partitioned on token), then score
documents with integer-exact arithmetic:

cross-engine exactness — ``ln`` of a ratio of int64 counts is
bit-identical between the JVM and DuckDB (verified empirically), and
every per-token/per-bucket log value is quantized to int64 micros
BEFORE any cross-row sum, so aggregation order can never perturb the
result (the repo's fixed-point rule; double sums are order-sensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import (cached_scalar, load_table, local_frame,
                              parallel_scan)
from .sampling import _salted_hash, _salted_hash_sql
from .text import tokens

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# Shared unigram-LM CTE chain (prefixable — the perplexity-bucket oracle
# extends it), mirrored exactly by _doc_logprob on the Spark side.
_LM_CTES = """t AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
),
tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2),
cnt AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
corp AS (SELECT sum(c) AS total, count(*) AS vocab FROM cnt),
term AS (
  SELECT tf.doc_id, tf.tf,
         CAST(floor(1000000.0 * ln(
           CAST(cnt.c + 1 AS DOUBLE) / CAST(corp.total + corp.vocab AS DOUBLE)
         )) AS BIGINT) AS lp_micro
  FROM tf JOIN cnt USING (w) CROSS JOIN corp
),
lm_agg AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         CAST(sum(tf * lp_micro) AS BIGINT) AS logprob_micro_sum
  FROM term GROUP BY 1
)"""


def _doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, logprob_micro_sum): the add-one-smoothed
    unigram-LM document score — the Spark twin of ``_LM_CTES``."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toks = (d.select("doc_id", F.explode(tokens("text")).alias("w")))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    corp = cnt.agg(F.sum("c").alias("total"),
                   F.count(F.lit(1)).alias("vocab"))
    term = (tf.join(cnt, "w")
            .crossJoin(F.broadcast(corp))
            .select("doc_id", "tf", F.expr(
                "CAST(floor(1000000.0 * ln("
                "CAST(c + 1 AS DOUBLE) / CAST(total + vocab AS DOUBLE)"
                ")) AS BIGINT)").alias("lp_micro")))
    return (term.groupBy("doc_id")
            .agg(F.sum("tf").cast("long").alias("n_tokens"),
                 F.sum(F.col("tf") * F.col("lp_micro")).cast("long")
                  .alias("logprob_micro_sum")))


@q("score_unigram_logprob", f"""
WITH {_LM_CTES}
SELECT doc_id, n_tokens, logprob_micro_sum,
       CAST(logprob_micro_sum AS DOUBLE)
         / (1000000.0 * CAST(n_tokens AS DOUBLE)) AS avg_logprob
FROM lm_agg
""")
def score_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: learn add-one-smoothed token
    probabilities from the corpus itself, then score every document by
    its average token log-probability — the classic perplexity-filter
    proxy (documents far below the corpus average are noise; far above
    are degenerate repetition).

    Scale path: one exploded-token frame feeds BOTH the per-(doc, token)
    tf aggregate and the global count table (cached — at 100 TB it is a
    persisted artifact); the tf⋈counts join is co-partitioned on token
    (both sides arrive from a token-keyed shuffle, so AQE plans it
    without an extra exchange); corpus totals ride a broadcast scalar.
    Per-token log-probs are floored to int64 micros before the per-doc
    sum, so the reduce is exact integer arithmetic at any parallelism.
    """
    agg = _doc_logprob(spark, sf_dir)
    return agg.select(
        "doc_id", "n_tokens", "logprob_micro_sum",
        (F.col("logprob_micro_sum").cast("double")
         / (F.lit(1000000.0) * F.col("n_tokens").cast("double")))
        .alias("avg_logprob"))


@q("corpus_perplexity_buckets", f"""
WITH {_LM_CTES},
scored AS (
  SELECT d.doc_id, d.lang, a.n_tokens, a.logprob_micro_sum,
         CAST(a.logprob_micro_sum AS DOUBLE)
           / (1000000.0 * CAST(a.n_tokens AS DOUBLE)) AS avg_logprob
  FROM documents d JOIN lm_agg a USING (doc_id)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY avg_logprob DESC, doc_id) AS rnk,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM scored
)
SELECT doc_id, lang, n_tokens, logprob_micro_sum, avg_logprob,
       CAST(rnk AS BIGINT) AS lang_rank,
       CASE WHEN rnk * 3 <= n_lang THEN 'head'
            WHEN rnk * 3 <= 2 * n_lang THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM ranked
""")
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank each
    language's documents by LM score (here the corpus-learned unigram
    LM standing in for CCNet's KenLM) and split the slice into
    head / middle / tail terciles — the quality tiers CC-derived
    pre-training corpora are filtered and mixed by.

    Exactness: the score is the exact int64 micro sum divided once (one
    IEEE rounding, identical on both engines); buckets come from integer
    rank-vs-count comparisons (3·rank ≤ n), NOT from float thresholds,
    so tercile edges are engine-stable; (score DESC, doc_id) totally
    orders every language slice. Scale path: the LM chain (one exploded
    token frame, co-partitioned tf⋈counts) reduces the corpus to one
    doc-keyed row before the per-lang window — the window input is
    doc-count-sized, and each language sorts independently (the skewed
    'en' slice is one partition's sort, the known CCNet shape; at 100 TB
    the rank can fall back to a 2-pass range-partitioned rank if a
    single language outgrows an executor sort)."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    agg = _doc_logprob(spark, sf_dir)
    scored = (d.select("doc_id", "lang").join(agg, "doc_id")
              .withColumn("avg_logprob",
                          F.col("logprob_micro_sum").cast("double")
                          / (F.lit(1000000.0)
                             * F.col("n_tokens").cast("double"))))
    wl = Window.partitionBy("lang")
    rnk = F.row_number().over(wl.orderBy(F.col("avg_logprob").desc(),
                                         "doc_id"))
    n_lang = F.count(F.lit(1)).over(wl)
    return (scored
            .withColumn("rnk", rnk).withColumn("n_lang", n_lang)
            .select(
                "doc_id", "lang", "n_tokens", "logprob_micro_sum",
                "avg_logprob",
                F.col("rnk").cast("long").alias("lang_rank"),
                F.when(F.col("rnk") * 3 <= F.col("n_lang"), "head")
                 .when(F.col("rnk") * 3 <= 2 * F.col("n_lang"), "middle")
                 .otherwise("tail").alias("ppl_bucket")))


# DSIR: hashed-unigram importance weights. Feature space = 256 hash
# buckets; target distribution = the English slice of the corpus (stand
# -in for "high-quality target domain"), raw = the whole corpus. A
# document's importance weight is Σ_tokens [ln p_target(bucket) −
# ln p_raw(bucket)] — documents whose feature profile looks more like
# the target than the raw pool get positive weights and win resampling.
DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"


@q("score_dsir_importance", f"""
WITH t AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
),
feat AS (
  SELECT doc_id, lang,
         {_salted_hash_sql("dsir_", "w")} % {DSIR_BUCKETS} AS b
  FROM t
),
btf AS (SELECT doc_id, lang, b, count(*) AS tf FROM feat GROUP BY 1, 2, 3),
raw AS (SELECT b, count(*) AS c FROM feat GROUP BY 1),
tgt AS (SELECT b, count(*) AS c FROM feat WHERE lang = '{DSIR_TARGET_LANG}'
        GROUP BY 1),
tot AS (
  SELECT (SELECT sum(c) FROM raw) AS raw_tot,
         (SELECT coalesce(sum(c), 0) FROM tgt) AS tgt_tot
),
ratio AS (
  SELECT r.b,
         CAST(floor(1000000.0 * (
           ln(CAST(coalesce(g.c, 0) + 1 AS DOUBLE)
              / CAST(t.tgt_tot + {DSIR_BUCKETS} AS DOUBLE))
           - ln(CAST(r.c + 1 AS DOUBLE)
                / CAST(t.raw_tot + {DSIR_BUCKETS} AS DOUBLE))
         )) AS BIGINT) AS lr_micro
  FROM raw r LEFT JOIN tgt g ON g.b = r.b CROSS JOIN tot t
),
agg AS (
  SELECT f.doc_id, f.lang,
         CAST(sum(f.tf) AS BIGINT) AS n_tokens,
         CAST(sum(f.tf * r.lr_micro) AS BIGINT) AS weight_micro
  FROM btf f JOIN ratio r ON r.b = f.b
  GROUP BY 1, 2
)
SELECT doc_id, lang, n_tokens, weight_micro,
       CAST(weight_micro AS DOUBLE) / 1000000.0 AS importance_weight,
       (weight_micro > 0) AS prefer_for_target
FROM agg
""")
def score_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights over hashed unigram features: learn the
    target ('{DSIR_TARGET_LANG}' docs) and raw (all docs) bucket
    distributions, score every document by the summed per-bucket
    log-likelihood ratio. Resampling by these weights shifts the corpus
    mixture toward the target domain (Xie et al. 2023).

    Scale path: ONE exploded pass computes per-doc bucket tfs plus both
    bucket distributions ({DSIR_BUCKETS} rows each — broadcast); the
    scoring join is per-doc-bucket rows against the broadcast ratio
    table, then an integer per-doc reduce. Raw text never shuffles; the
    feature hash is the engine-portable md5 bucket (same salted-hash
    primitive as dataset_sample_split, so features are reproducible
    across engines, partitionings, and cluster sizes).
    """
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    feat = (d.select("doc_id", "lang", F.explode(tokens("text")).alias("w"))
            .select("doc_id", "lang",
                    (_salted_hash("dsir_", F.col("w")) % DSIR_BUCKETS)
                    .alias("b")))
    # ONE corpus pass (r14): btf rides the parallel_scan fan-out
    # (HashPartitioning(doc_id) satisfies the (doc_id, lang, b)
    # clustering — no new exchange); the bucket distributions are a
    # bounded {DSIR_BUCKETS}-row reduction of it, COLLECTED in a
    # sequenced action that also materializes the lazy btf cache for
    # the scoring join. Racing variants both lose: lazy dist-from-feat
    # re-ran the explode+md5 pass per consumer (two ~7.4 s-task-time
    # twins), lazy dist-from-btf recomputed under the concurrent
    # broadcast race (1.2 -> 5.0 s), and an eager count() added a
    # serial barrier + broadcast jobs (wall-regressed in paired runs).
    # The ratio table is rebuilt as a LocalRelation with ln() still
    # computed IN-ENGINE (exactness: Spark ln == DuckDB ln; a Python
    # math.log could differ in the last bit under the micro-floor).
    btf = (feat.groupBy("doc_id", "lang", "b")
           .agg(F.count(F.lit(1)).alias("tf")).cache())
    dist_rows = (btf.groupBy("b")
                 .agg(F.sum("tf").alias("c"),
                      F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG,
                                   F.col("tf")).otherwise(0)).alias("tc"))
                 .collect())
    raw_tot = sum(int(r["c"]) for r in dist_rows)
    tgt_tot = sum(int(r["tc"]) for r in dist_rows)
    dist_lit = local_frame(
        spark,
        [(int(r["b"]), int(r["c"]), int(r["tc"])) for r in dist_rows],
        "b bigint, c bigint, tc bigint")
    ratio = dist_lit.select("b", F.expr(
        f"CAST(floor(1000000.0 * ("
        f"ln(CAST(tc + 1 AS DOUBLE)"
        f" / CAST({tgt_tot} + {DSIR_BUCKETS} AS DOUBLE))"
        f" - ln(CAST(c + 1 AS DOUBLE)"
        f" / CAST({raw_tot} + {DSIR_BUCKETS} AS DOUBLE))"
        f")) AS BIGINT)").alias("lr_micro"))
    agg = (btf.join(F.broadcast(ratio), "b")
           .groupBy("doc_id", "lang")
           .agg(F.sum("tf").cast("long").alias("n_tokens"),
                F.sum(F.col("tf") * F.col("lr_micro")).cast("long")
                 .alias("weight_micro")))
    return agg.select(
        "doc_id", "lang", "n_tokens", "weight_micro",
        (F.col("weight_micro").cast("double") / F.lit(1000000.0))
        .alias("importance_weight"),
        (F.col("weight_micro") > 0).alias("prefer_for_target"))


# Multinomial temperature resampling (the multilingual-corpus mixture
# balancer): sampled share p_tau(l) ∝ p(l)^tau with tau = 0.5 — the
# sqrt flattening used to upweight low-resource slices.
MIXTURE_TAU_SQRT = True  # tau = 0.5 == sqrt; the only engine-portable
# power (IEEE-754 sqrt is correctly rounded on both engines; pow() is
# not guaranteed bit-identical across libm implementations).


@q("corpus_mixture_weights", """
WITH c AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
s AS (
  SELECT lang, n_docs, n_tokens,
         CAST(floor(1000000.0 * sqrt(CAST(n_tokens AS DOUBLE)))
              AS BIGINT) AS s_micro
  FROM c
),
t AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_tot,
         CAST(sum(s_micro) AS BIGINT) AS s_tot
  FROM s
)
SELECT lang, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / tok_tot AS natural_share,
       CAST(s_micro AS DOUBLE) / s_tot AS sampled_share,
       (CAST(s_micro AS DOUBLE) / s_tot)
         / (CAST(n_tokens AS DOUBLE) / tok_tot) AS repeat_factor
FROM s CROSS JOIN t
""")
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting via temperature sampling (tau = 0.5):
    per-language token masses become sampled shares ∝ sqrt(mass),
    flattening the mixture toward low-resource languages — the standard
    multilingual pre-training rebalance (and the static special case of
    DoReMi-style mixture optimization). ``repeat_factor`` > 1 means the
    slice is upsampled (epochs repeat) under the new mixture.

    Scale path: one partial-aggregatable groupBy(lang) pass over the
    corpus (token counting is map work inside the aggregate), then all
    arithmetic happens on an n_langs-row frame with a broadcast 2-scalar
    total — nothing after the first reduce touches corpus-sized data.
    Exactness: sqrt is the one libm-free power (correctly rounded in
    IEEE-754, verified identical), floored to int64 micros before the
    normalizing sum, so shares are ratios of exact integers."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    c = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"))
    s = c.select(
        "lang", "n_docs", "n_tokens",
        F.floor(F.lit(1000000.0)
                * F.sqrt(F.col("n_tokens").cast("double")))
        .cast("long").alias("s_micro"))
    t = s.agg(F.sum("n_tokens").cast("long").alias("tok_tot"),
              F.sum("s_micro").cast("long").alias("s_tot"))
    natural = F.col("n_tokens").cast("double") / F.col("tok_tot")
    sampled = F.col("s_micro").cast("double") / F.col("s_tot")
    return (s.crossJoin(F.broadcast(t))
            .select("lang", "n_docs", "n_tokens",
                    natural.alias("natural_share"),
                    sampled.alias("sampled_share"),
                    (sampled / natural).alias("repeat_factor")))


@q("score_bigram_logprob", """
WITH toksrc AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM toksrc, unnest(range(1, greatest(len(toks), 1))) AS u(i)
),
btf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
vocab AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents)
),
term AS (
  SELECT b.doc_id, b.tf,
         CAST(floor(1000000.0 * ln(
           CAST(c2.c + 1 AS DOUBLE) / CAST(c1.c1 + vocab.v AS DOUBLE)
         )) AS BIGINT) AS lp_micro
  FROM btf b
  JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
  JOIN c1 ON c1.w1 = b.w1
  CROSS JOIN vocab
),
agg AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         CAST(sum(tf * lp_micro) AS BIGINT) AS logprob_micro_sum
  FROM term GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(a.logprob_micro_sum, 0) AS BIGINT)
         AS logprob_micro_sum,
       CASE WHEN a.n_bigrams IS NULL THEN NULL
            ELSE CAST(a.logprob_micro_sum AS DOUBLE)
                 / (1000000.0 * CAST(a.n_bigrams AS DOUBLE)) END
         AS avg_logprob
FROM documents d LEFT JOIN agg a USING (doc_id)
""")
def score_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring: add-one-smoothed conditional
    probabilities p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) learned from the
    corpus, scoring each document by its average bigram
    log-probability — one Markov order above score_unigram_logprob and
    a materially sharper fluency signal (word-salad scores far below
    real prose under a bigram model while fooling a unigram one).

    Scale path: the in-row index transform emits consecutive pairs
    without a self-join (the duplicate-spans pattern); the corpus is
    exploded ONCE into the cached per-doc tf table and BOTH count
    tables re-aggregate from it (c(w1,w2) = Σ_doc tf, c(w1) = Σ_w2 c —
    the PMI marginal trick: one corpus-sized shuffle total, the
    marginals reduce pair-table-sized data); the scoring join is
    co-partitioned on the bigram key and the unigram context join on
    w1; V is a MEMOIZED per-dataset scalar (the frozen-now-anchor
    pattern) bound as a literal — computing it inline was a second
    full corpus tokenize+explode per run, the one corpus-sized cost
    here that isn't the tf build itself. Exactness: per-pair log-probs
    floor to int64 micros before any cross-row sum (the repo's
    fixed-point rule); single-token docs surface with zero bigrams via
    the left join, NULL average on both engines."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toksrc = d.select("doc_id", tokens("text").alias("toks"))
    # explode the INDEX sequence and do the pair lookups in codegen
    # projections — a transform() lambda building a struct per element
    # evaluates interpreted (the repo's measured HOF lesson)
    bg = (toksrc.select("doc_id", "toks", F.explode(F.expr(
        "CASE WHEN size(toks) >= 2 THEN sequence(1, size(toks) - 1)"
        " ELSE array() END")).alias("i"))
        .select("doc_id", F.expr("toks[i - 1]").alias("w1"),
                F.expr("toks[i]").alias("w2")))
    # ONE corpus explode+shuffle builds the tf table; both marginals
    # re-aggregate it (cached so the three consumers share one pass)
    btf = (bg.groupBy("doc_id", "w1", "w2")
           .agg(F.count(F.lit(1)).alias("tf")).cache())
    c2 = btf.groupBy("w1", "w2").agg(F.sum("tf").alias("c"))
    # c1 straight off the cached tf table: sum(tf) grouped by w1 ==
    # the w2-marginal of c2, and deriving it from btf skips re-running
    # c2's (w1, w2) partial/final aggregate + exchange inside the c1
    # broadcast build (r14 plan audit: ops 32-40 re-aggregated the
    # cache through BOTH keys just to marginalize)
    c1 = btf.groupBy("w1").agg(F.sum("tf").alias("c1"))
    v = cached_scalar(
        spark, sf_dir, "bigram_vocab_v",
        lambda: int(d.select(F.explode(tokens("text")).alias("w"))
                    .agg(F.countDistinct("w")).collect()[0][0]))
    term = (btf.join(c2, ["w1", "w2"])
            .join(c1, "w1")
            .select("doc_id", "tf", F.expr(
                f"CAST(floor(1000000.0 * ln("
                f"CAST(c + 1 AS DOUBLE) / CAST(c1 + {int(v)} AS DOUBLE)"
                f")) AS BIGINT)").alias("lp_micro")))
    agg = (term.groupBy("doc_id")
           .agg(F.sum("tf").cast("long").alias("n_bigrams"),
                F.sum(F.col("tf") * F.col("lp_micro")).cast("long")
                 .alias("logprob_micro_sum")))
    return (d.select("doc_id").join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_bigrams", F.lit(0)).cast("long")
                .alias("n_bigrams"),
                F.coalesce("logprob_micro_sum", F.lit(0)).cast("long")
                .alias("logprob_micro_sum"),
                F.when(F.col("n_bigrams").isNull(), F.lit(None).cast("double"))
                 .otherwise(F.col("logprob_micro_sum").cast("double")
                            / (F.lit(1000000.0)
                               * F.col("n_bigrams").cast("double")))
                .alias("avg_logprob")))


@q("corpus_source_divergence", f"""
WITH t AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
),
feat AS (
  SELECT source, {_salted_hash_sql("dsir_", "w")} % {DSIR_BUCKETS} AS b
  FROM t
),
sb AS (SELECT source, b, count(*) AS cs FROM feat GROUP BY 1, 2),
gb AS (SELECT b, sum(cs) AS cc FROM sb GROUP BY 1),
st AS (SELECT source, sum(cs) AS ts FROM sb GROUP BY 1),
gt AS (SELECT sum(cc) AS tc FROM gb),
term AS (
  SELECT s.source, s.cs,
         CAST(floor(1000000.0 * (
           ln(CAST(s.cs + 1 AS DOUBLE) / CAST(st.ts + {DSIR_BUCKETS} AS DOUBLE))
           - ln(CAST(g.cc + 1 AS DOUBLE) / CAST(gt.tc + {DSIR_BUCKETS} AS DOUBLE))
         )) AS BIGINT) AS lr_micro
  FROM sb s JOIN gb g USING (b) JOIN st USING (source) CROSS JOIN gt
)
SELECT source,
       CAST(sum(cs) AS BIGINT) AS n_tokens,
       CAST(sum(cs * lr_micro) AS BIGINT) AS kl_micro_sum,
       CAST(sum(cs * lr_micro) AS DOUBLE)
         / (1000000.0 * CAST(sum(cs) AS DOUBLE)) AS kl_nats
FROM term GROUP BY source
""")
def corpus_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: KL(source ‖ corpus) over the
    256-bucket hashed-unigram feature space — the corpus-mix diagnostic
    that flags which crawl sources deviate from the pool (spam farms,
    wrong-language slices, template sites score high; conforming
    sources near zero). Complements the scorecard's per-source
    retention accounting with a DISTRIBUTIONAL health signal, on the
    same reproducible feature hash as DSIR.

    Construction: the empirical source distribution weights add-one-
    smoothed log-ratios — Σ_b (c_b/T) · [ln p̂_src(b) − ln p̂_corpus(b)];
    zero-count buckets contribute exactly zero. Scale path: ONE
    exploded pass reduces to (source × 256) rows; every later frame is
    sources×256 or smaller, the global distribution derives from the
    per-source one (no second corpus scan), totals ride broadcast
    scalars. Exactness: the DSIR pattern — each bucket's log-ratio is
    the DIFFERENCE of two ratio-lns (each argument a ratio of int64s,
    bit-identical both engines), floored to int64 micros before the
    weighted sum."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    feat = (d.select("source", F.explode(tokens("text")).alias("w"))
            .select("source",
                    (_salted_hash("dsir_", F.col("w")) % DSIR_BUCKETS)
                    .alias("b")))
    # cache the (source × 256)-row distribution table: four consumers
    # (global dist, per-source totals, grand total, scoring) would each
    # re-run the corpus explode+aggregate otherwise — one corpus pass,
    # then everything derives from this bounded artifact
    sb = (feat.groupBy("source", "b").agg(F.count(F.lit(1)).alias("cs"))
          .cache())
    gb = sb.groupBy("b").agg(F.sum("cs").alias("cc"))
    st = sb.groupBy("source").agg(F.sum("cs").alias("ts"))
    gt = gb.agg(F.sum("cc").alias("tc"))
    term = (sb.join(F.broadcast(gb), "b")
            .join(F.broadcast(st), "source")
            .crossJoin(F.broadcast(gt))
            .select("source", "cs", F.expr(
                f"CAST(floor(1000000.0 * ("
                f"ln(CAST(cs + 1 AS DOUBLE) / CAST(ts + {DSIR_BUCKETS} AS DOUBLE))"
                f" - ln(CAST(cc + 1 AS DOUBLE) / CAST(tc + {DSIR_BUCKETS} AS DOUBLE))"
                f")) AS BIGINT)").alias("lr_micro")))
    return (term.groupBy("source")
            .agg(F.sum("cs").cast("long").alias("n_tokens"),
                 F.sum(F.col("cs") * F.col("lr_micro")).cast("long")
                 .alias("kl_micro_sum"))
            .select("source", "n_tokens", "kl_micro_sum",
                    (F.col("kl_micro_sum").cast("double")
                     / (F.lit(1000000.0)
                        * F.col("n_tokens").cast("double")))
                    .alias("kl_nats")))


# ---------------------------------------------------------------------------
# temperature-resampled corpus materialization: APPLY the mixture weights —
# emit each document floor/ceil(repeat_factor) times so the realized token
# mixture matches the tau = 0.5 target (the epoch-expansion step that turns
# DoReMi-style weights into an actual training corpus)
# ---------------------------------------------------------------------------

# repeat_factor in ppm, rendered VERBATIM into both engines so the IEEE
# trees are identical: rf = (s_micro / s_tot) / (m / tok_tot), all four
# inputs exact int64s (identifiers s_micro, s_tot, m, tok_tot in scope).
_RF_PPM_SQL = """
  CAST(floor(1000000.0 *
    (CAST(s_micro AS DOUBLE) / CAST(s_tot AS DOUBLE))
    / (CAST(m AS DOUBLE) / CAST(tok_tot AS DOUBLE))) AS BIGINT)
"""


@q("corpus_temperature_sample", f"""
WITH c AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
              AS BIGINT) AS m
  FROM documents GROUP BY 1
),
s AS (
  SELECT source, m,
         CAST(floor(1000000.0 * sqrt(CAST(m AS DOUBLE))) AS BIGINT) AS s_micro
  FROM c
),
t AS (
  SELECT CAST(sum(m) AS BIGINT) AS tok_tot,
         CAST(sum(s_micro) AS BIGINT) AS s_tot
  FROM s
),
rf AS (
  SELECT source, {_RF_PPM_SQL} AS rf_ppm FROM s CROSS JOIN t
),
docs AS (
  SELECT d.doc_id, d.source,
         CAST(len(string_split_regex(lower(trim(d.text)), '\\s+'))
              AS BIGINT) AS n_tokens,
         r.rf_ppm,
         r.rf_ppm // 1000000
           + CASE WHEN {_salted_hash_sql("temp_", "d.doc_id")} % 1000000
                       < r.rf_ppm % 1000000 THEN 1 ELSE 0 END AS copies
  FROM documents d JOIN rf r USING (source)
)
SELECT doc_id, source, n_tokens, rf_ppm, CAST(u.i AS BIGINT) AS copy
FROM docs, unnest(range(1, copies + 1)) AS u(i)
""")
def corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature-sampled corpus (tau = 0.5 over
    ``source`` token masses): each document is emitted
    floor(rf) + Bernoulli(frac(rf)) times, where rf is its source's
    repeat_factor — over-represented sources downsample (rf < 1 keeps
    a deterministic salted-hash fraction), low-resource sources
    epoch-repeat (rf > 1 duplicates rows with a ``copy`` index). The
    expected realized token share of every source is exactly the
    sqrt-flattened target — this is the operator that turns the
    ``corpus_mixture_weights`` REPORT into a training dataset.

    Scale path: one groupBy(source) pass builds the bounded mixture
    table (sources × 1 rows, broadcast back); the corpus-side work is
    a broadcast join + an in-row sequence explode — no shuffle of
    document rows at all. Output size = Σ rf_s · |s|, the training
    corpus the schedule demands. Exactness: rf is floored to int64 ppm
    from exact-int inputs (one shared IEEE expression both engines);
    the Bernoulli draw is the repo's salted-hash rule; the copy
    explode guards Spark's DESCENDING sequence(1, 0) pitfall with an
    explicit empty-array branch."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    c = d.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).cast("long").alias("m"))
    s = c.select("source", "m",
                 F.floor(F.lit(1000000.0) * F.sqrt(F.col("m").cast("double")))
                 .cast("long").alias("s_micro"))
    t = s.agg(F.sum("m").cast("long").alias("tok_tot"),
              F.sum("s_micro").cast("long").alias("s_tot"))
    rf = (s.crossJoin(F.broadcast(t))
          .select("source", F.expr(_RF_PPM_SQL).alias("rf_ppm")))
    bern = F.when(
        _salted_hash("temp_", F.col("doc_id")) % 1000000
        < F.col("rf_ppm") % 1000000, 1).otherwise(0)
    docs = (d.select("doc_id", "source",
                     F.size(tokens("text")).cast("long").alias("n_tokens"))
            .join(F.broadcast(rf), "source")
            .withColumn("copies",
                        (F.expr("rf_ppm div 1000000") + bern).cast("long")))
    return (docs.withColumn(
                "copy",
                F.explode(F.expr(
                    "CASE WHEN copies >= 1 THEN sequence(CAST(1 AS BIGINT), copies)"
                    " ELSE CAST(array() AS ARRAY<BIGINT>) END")))
            .select("doc_id", "source", "n_tokens", "rf_ppm", "copy"))


# ---------------------------------------------------------------------------
# PMI collocation mining
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5   # ignore rare pairs (PMI is noise-dominated below this)
PMI_TOP_K = 100


@q("corpus_pmi_collocations", f"""
WITH toksrc AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM toksrc, unnest(range(1, greatest(len(toks), 1))) AS u(i)
),
c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
cl AS (SELECT w1, CAST(sum(c) AS BIGINT) AS lc FROM c2 GROUP BY 1),
cr AS (SELECT w2, CAST(sum(c) AS BIGINT) AS rc FROM c2 GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS b FROM c2)
SELECT c2.w1, c2.w2, CAST(c2.c AS BIGINT) AS pair_count,
       cl.lc AS left_count, cr.rc AS right_count,
       CAST(floor(1000000.0 * ln(
         (CAST(c2.c AS DOUBLE) * CAST(tot.b AS DOUBLE))
         / (CAST(cl.lc AS DOUBLE) * CAST(cr.rc AS DOUBLE))
       )) AS BIGINT) AS pmi_micro
FROM c2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN tot
WHERE c2.c >= {PMI_MIN_COUNT}
ORDER BY pmi_micro DESC, w1, w2
LIMIT {PMI_TOP_K}
""")
def corpus_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the top-k
    adjacent word pairs whose co-occurrence most exceeds
    chance — PMI = ln(p(w1,w2) / (p(w1·)·p(·w2))) over bigram-position
    marginals, the classic phrase-discovery statistic (and the signal
    behind word2vec-era phrase merging à la Mikolov et al. 2013).

    Scale path: ONE exploded-bigram aggregation produces the pair
    table; both marginals derive from the (much smaller) pair-count
    table by partial re-aggregation — the corpus shuffles once. The
    scoring joins co-partition on w1 / w2 and the corpus total rides a
    broadcast scalar; the min-count filter prunes the long tail before
    any join. Top-k is a distributed TakeOrdered, never a global sort.
    Exactness: PMI evaluates as ln of int64 counts pushed through
    identical double products (the repo's verified ln convention),
    floored to int64 micros; (pmi, w1, w2) totally orders the output.
    """
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toksrc = d.select("doc_id", tokens("text").alias("toks"))
    bg = (toksrc.select(F.explode(F.expr(
        "transform(CASE WHEN size(toks) >= 2"
        " THEN sequence(1, size(toks) - 1)"
        " ELSE array() END,"
        " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))")).alias("b"))
        .select("b.w1", "b.w2"))
    # cache the pair-count table: BOTH marginals, the corpus total, and
    # the scoring branch read it — without the cache each branch
    # re-runs the corpus-sized explode+aggregate (4 corpus passes)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).cache()
    c2.count()  # materialize once, before the branches fan out
    cl = c2.groupBy("w1").agg(F.sum("c").cast("long").alias("lc"))
    cr = c2.groupBy("w2").agg(F.sum("c").cast("long").alias("rc"))
    tot = c2.agg(F.sum("c").cast("long").alias("b"))
    return (c2.filter(F.col("c") >= PMI_MIN_COUNT)
            .join(cl, "w1").join(cr, "w2")
            .crossJoin(F.broadcast(tot))
            .select("w1", "w2", F.col("c").cast("long").alias("pair_count"),
                    F.col("lc").alias("left_count"),
                    F.col("rc").alias("right_count"),
                    F.expr(
                        "CAST(floor(1000000.0 * ln("
                        "(CAST(c AS DOUBLE) * CAST(b AS DOUBLE))"
                        " / (CAST(lc AS DOUBLE) * CAST(rc AS DOUBLE))"
                        ")) AS BIGINT)").alias("pmi_micro"))
            .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
            .limit(PMI_TOP_K))


@q("corpus_bigram_next_word", """
WITH toksrc AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM toksrc, unnest(range(1, greatest(len(toks), 1))) AS u(i)
),
c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
cl AS (SELECT w1, CAST(sum(c) AS BIGINT) AS lc FROM c2 GROUP BY 1)
SELECT c2.w1, c2.w2 AS next_word, CAST(c2.c AS BIGINT) AS pair_count,
       cl.lc AS left_count,
       CAST(c2.c * 1000000 // cl.lc AS BIGINT) AS prob_micro
FROM c2 JOIN cl USING (w1)
QUALIFY row_number() OVER (PARTITION BY w1
                           ORDER BY c2.c DESC, c2.w2) = 1
""")
def corpus_bigram_next_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The argmax next-word table of the corpus bigram model: for every
    context word, its most likely successor with the (integer-exact)
    conditional probability — the Markov-chain artifact behind
    autocomplete, and the digest a data engineer eyeballs to see what
    a corpus's bigram LM actually learned (score_bigram_logprob scores
    docs with the same counts; this materializes the model's mode).

    Scale path: everything downstream of the one exploded-bigram
    aggregation operates on the (w1, w2) count table — vocab², not
    corpus, sized. The context marginal, the per-context argmax window,
    and the final join all ride the SAME HashPartitioning(w1) exchange
    (the repo's one-shuffle window rule); ties break (count DESC, w2)
    for a total order. prob_micro is int64 floor-division — exact."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toksrc = d.select("doc_id", tokens("text").alias("toks"))
    bg = (toksrc.select(F.explode(F.expr(
        "transform(CASE WHEN size(toks) >= 2"
        " THEN sequence(1, size(toks) - 1)"
        " ELSE array() END,"
        " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))")).alias("b"))
        .select("b.w1", "b.w2"))
    # cache: the marginal and the argmax branch both read the pair
    # table — one corpus pass instead of two (see corpus_pmi_collocations)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).cache()
    c2.count()
    cl = c2.groupBy("w1").agg(F.sum("c").cast("long").alias("lc"))
    w = Window.partitionBy("w1").orderBy(F.col("c").desc(), "w2")
    best = (c2.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
    return (best.join(cl, "w1")
            .select("w1", F.col("w2").alias("next_word"),
                    F.col("c").cast("long").alias("pair_count"),
                    F.col("lc").alias("left_count"),
                    F.expr("CAST(c * 1000000 DIV lc AS BIGINT)")
                    .alias("prob_micro")))


@q("score_bigram_accuracy", """
WITH toksrc AS (
  SELECT doc_id, lang,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
bg AS (
  SELECT lang, toks[i] AS w1, toks[i + 1] AS w2
  FROM toksrc, unnest(range(1, greatest(len(toks), 1))) AS u(i)
),
c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
best AS (
  SELECT w1, w2 AS nw FROM c2
  QUALIFY row_number() OVER (PARTITION BY w1
                             ORDER BY c DESC, w2) = 1
)
SELECT b.lang,
       CAST(count(*) AS BIGINT) AS n_positions,
       CAST(sum(CASE WHEN b.w2 = best.nw THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(sum(CASE WHEN b.w2 = best.nw THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS accuracy_micro
FROM bg b JOIN best ON best.w1 = b.w1
GROUP BY b.lang
""")
def score_bigram_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-word accuracy of the corpus bigram model, per language —
    the intrinsic eval that closes the model loop around
    corpus_bigram_next_word (train: pair counts → serve: argmax table
    → evaluate: how often the mode predicts the actual successor).
    The train/serve/evaluate triple mirrors corpus_quality_classifier;
    a language whose accuracy lags the others has under-represented
    transitions — a mixture-rebalancing signal.

    Scale path: the argmax table comes from the CACHED pair-count
    frame (one corpus pass, shared with the next-word query in
    session); scoring is a broadcast-sized join (|vocab| rows) against
    the exploded bigram stream followed by one combinable aggregate —
    every token position shuffles zero times. Exactness: int64 counts
    and one floor-division per language.
    """
    best = (corpus_bigram_next_word(spark, sf_dir)
            .select("w1", F.col("next_word").alias("nw")))
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toksrc = d.select("lang", tokens("text").alias("toks"))
    bg = (toksrc.select("lang", F.explode(F.expr(
        "transform(CASE WHEN size(toks) >= 2"
        " THEN sequence(1, size(toks) - 1)"
        " ELSE array() END,"
        " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))")).alias("b"))
        .select("lang", "b.w1", "b.w2"))
    hit = F.sum(F.when(F.col("w2") == F.col("nw"), 1).otherwise(0))
    return (bg.join(F.broadcast(best), "w1")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_positions"),
                 hit.cast("long").alias("n_correct"),
                 F.expr("CAST(sum(CASE WHEN w2 = nw THEN 1 ELSE 0 END)"
                        " * 1000000 DIV count(*) AS BIGINT)")
                 .alias("accuracy_micro")))


# ---------------------------------------------------------------------------
# budget-bounded data selection: importance-ranked prefix under a token cap
# ---------------------------------------------------------------------------

BUDGET_DENOM = 5  # select the top-importance prefix holding 1/5 of the
# corpus's tokens — data-anchored (a fixed absolute budget would select
# everything at small SFs and nothing at large ones)


def _budget_selection_oracle_sql() -> str:
    return f"""
WITH agg AS ({ORACLE["score_dsir_importance"]}),
b AS (SELECT sum(n_tokens) // {BUDGET_DENOM} AS budget FROM agg),
r AS (
  SELECT doc_id, lang, n_tokens, weight_micro,
         row_number() OVER (ORDER BY weight_micro DESC, doc_id)
           AS sel_rank,
         sum(n_tokens) OVER (ORDER BY weight_micro DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM agg
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, weight_micro,
       CAST(sel_rank AS BIGINT) AS sel_rank,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM r, b WHERE r.cum_tokens <= b.budget
"""


@q("corpus_budget_selection", _budget_selection_oracle_sql())
def corpus_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-bounded data selection: take documents in DSIR-importance
    order (weight DESC, doc_id tiebreak) until the selected set holds
    1/{BUDGET_DENOM} of the corpus's tokens — the "best data under a
    token budget" materialization step every targeted-pretraining
    recipe ends with (DSIR/DoReMi pick weights; THIS query turns
    weights into a concrete training set).

    The selection needs a GLOBAL importance order plus a GLOBAL prefix
    sum of token counts — the oracle's partition-less
    ``row_number()/sum() OVER (ORDER BY ...)`` single-task straggler.
    The scalable recipe extends corpus_curriculum_order's two-pass
    range-partitioned rank with a prefix-sum leg: (1) repartitionByRange
    + sortWithinPartitions on the full ordering key, pinned by an eager
    localCheckpoint (the boundary-sampling exchange must materialize
    ONCE — a per-action recompute could legally re-place boundary rows);
    (2) ONE bounded collect of per-slice (row count, token sum) supplies
    each slice's global rank base AND token base; in-slice running
    totals come from a PARTITIONED window (per-slice state, no global
    sort anywhere). Rank and cumulative sum are invariant to boundary
    placement because the key is totally ordered. All counts int64;
    the budget is an exact integer floor-division of the corpus total.
    """
    # Pin the scored frame BEFORE the range partitioner (r14, guide
    # §2.4/§5): repartitionByRange first runs a boundary-sampling pass
    # over its child and then the real exchange — un-pinned, the whole
    # DSIR scoring pipeline executed twice (profiled as two ~0.8 s
    # stages reading the same exchange). The checkpoint makes the
    # sampling pass read materialized blocks instead.
    scored = (score_dsir_importance(spark, sf_dir)
              .select("doc_id", "lang", "n_tokens", "weight_micro")
              .localCheckpoint(eager=True))
    order = [F.col("weight_micro").desc(), F.col("doc_id").asc()]
    n_parts = max(spark.sparkContext.defaultParallelism, 4)
    sliced = (scored.repartitionByRange(n_parts, *order)
              .sortWithinPartitions(*order)
              .withColumn("__mid", F.monotonically_increasing_id())
              .withColumn("__pid", F.expr("shiftright(__mid, 33)"))
              .withColumn("__row", F.col("__mid") % F.lit(1 << 33))
              .localCheckpoint(eager=True))
    stats = (sliced.groupBy("__pid")
             .agg(F.count(F.lit(1)).alias("c"),
                  F.sum("n_tokens").alias("t")).collect())
    sizes = {r["__pid"]: (int(r["c"]), int(r["t"])) for r in stats}
    base_rank, base_tok, acc_c, acc_t = {}, {}, 0, 0
    for pid in sorted(sizes):
        base_rank[pid], base_tok[pid] = acc_c, acc_t
        acc_c += sizes[pid][0]
        acc_t += sizes[pid][1]
    budget = acc_t // BUDGET_DENOM
    rank_map = F.create_map(
        *[F.lit(x) for pid in sorted(base_rank)
          for x in (pid, base_rank[pid])])
    tok_map = F.create_map(
        *[F.lit(x) for pid in sorted(base_tok)
          for x in (pid, base_tok[pid])])
    w = (Window.partitionBy("__pid").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (sliced
            .withColumn("sel_rank",
                        (rank_map[F.col("__pid")] + F.col("__row") + 1)
                        .cast("long"))
            .withColumn("cum_tokens",
                        (tok_map[F.col("__pid")]
                         + F.sum("n_tokens").over(w)).cast("long"))
            .filter(F.col("cum_tokens") <= budget)
            .select("doc_id", "lang",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    "weight_micro", "sel_rank", "cum_tokens"))
