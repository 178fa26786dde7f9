"""Leakage-free split invariants: near-dup neighbors can never straddle
the train/test boundary, and the cluster-keyed hash still produces a
usable 80/10/10 split over the (mostly singleton) corpus."""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.dedup import dedup_simhash_pairs
from demo_cdc_users_airline_spark.operators.sampling import (
    corpus_cluster_split,
)

SF = "/root/testdata/sf0.001"


def test_near_dup_pairs_never_straddle_splits(spark):
    split = corpus_cluster_split(spark, SF).cache()
    pairs = dedup_simhash_pairs(spark, SF)
    s1 = split.select(F.col("doc_id").alias("doc1"),
                      F.col("split").alias("split1"),
                      F.col("cluster_id").alias("c1"))
    s2 = split.select(F.col("doc_id").alias("doc2"),
                      F.col("split").alias("split2"),
                      F.col("cluster_id").alias("c2"))
    j = pairs.join(s1, "doc1").join(s2, "doc2").cache()
    assert j.count() > 0, "fixture corpus must contain near-dup pairs"
    assert j.filter(F.col("split1") != F.col("split2")).count() == 0
    assert j.filter(F.col("c1") != F.col("c2")).count() == 0


def test_split_covers_corpus_with_sane_proportions(spark):
    split = corpus_cluster_split(spark, SF).cache()
    n = split.count()
    assert n == 500  # every document gets a split (no sampling here)
    assert split.select("doc_id").distinct().count() == n
    frac = {r["split"]: r["cnt"] / n
            for r in split.groupBy("split")
            .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert 0.6 <= frac.get("train", 0) <= 0.95
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0


def test_cluster_size_is_a_real_leakage_diagnostic(spark):
    split = corpus_cluster_split(spark, SF).cache()
    # sizes partition the corpus: summing one size per cluster == total
    per_cluster = split.groupBy("cluster_id").agg(
        F.max("cluster_size").alias("mx"), F.min("cluster_size").alias("mn"),
        F.count(F.lit(1)).alias("members"))
    bad = per_cluster.filter((F.col("mx") != F.col("mn"))
                             | (F.col("mx") != F.col("members"))).count()
    assert bad == 0
    # every doc that participates in a near-dup pair reports size > 1
    paired = dedup_simhash_pairs(spark, SF).select(
        F.explode(F.array("doc1", "doc2")).alias("doc_id")).distinct()
    small = (split.join(paired, "doc_id")
             .filter(F.col("cluster_size") < 2).count())
    assert small == 0
