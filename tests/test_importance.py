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
