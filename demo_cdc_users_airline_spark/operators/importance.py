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

from ..sources.loader import load_table
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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
    feat = (d.select("doc_id", "lang", F.explode(tokens("text")).alias("w"))
            .select("doc_id", "lang",
                    (_salted_hash("dsir_", F.col("w")) % DSIR_BUCKETS)
                    .alias("b")))
    btf = (feat.groupBy("doc_id", "lang", "b")
           .agg(F.count(F.lit(1)).alias("tf")))
    # both distributions in ONE pass over the bucketed frame
    dist = (feat.groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"),
                 F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)
                       .otherwise(0)).alias("tc")))
    tot = dist.agg(F.sum("c").alias("raw_tot"), F.sum("tc").alias("tgt_tot"))
    ratio = (dist.crossJoin(F.broadcast(tot))
             .select("b", F.expr(
                 f"CAST(floor(1000000.0 * ("
                 f"ln(CAST(tc + 1 AS DOUBLE)"
                 f" / CAST(tgt_tot + {DSIR_BUCKETS} AS DOUBLE))"
                 f" - ln(CAST(c + 1 AS DOUBLE)"
                 f" / CAST(raw_tot + {DSIR_BUCKETS} AS DOUBLE))"
                 f")) AS BIGINT)").alias("lr_micro")))
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
    d = load_table(spark, sf_dir, "documents")
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
