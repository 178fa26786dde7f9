"""SemDeDup invariants: the salted within-cell pair search must agree
with a brute-force recomputation, and the canonical choice is min-id."""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    SEMDEDUP_TAU,
    _quantized_vectors,
    assign_cells,
    fitted_codebook,
    similarity_semdedup,
)
from demo_cdc_users_airline_spark.operators.similarity import qdot
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def _brute_dropped(spark):
    """Untiled reference: dropped = has a lower-id same-cell neighbor
    with quantized cosine ≥ τ. The cosine is the sequential HOF int64
    fold — an independent formulation that must agree EXACTLY with the
    numpy tiled GEMM (integer dots are order-independent)."""
    cents = fitted_codebook(spark, SF, k=8, iters=3)
    w = assign_cells(_quantized_vectors(spark, SF), cents)
    a = w.select(F.col("id").alias("v1"), "cell", F.col("vec").alias("e1"))
    b = w.select(F.col("id").alias("v2"), F.col("cell").alias("c2"),
                 F.col("vec").alias("e2"))
    cos = qdot("e1", "e2") / F.sqrt(qdot("e1", "e1") * qdot("e2", "e2"))
    return {r["v1"] for r in
            (a.join(b, (F.col("c2") == F.col("cell"))
                    & (F.col("v2") < F.col("v1")))
             .filter(cos >= SEMDEDUP_TAU).select("v1").distinct().collect())}


def test_salted_search_matches_brute_force(spark):
    out = {r["vec_id"]: r for r in similarity_semdedup(spark, SF).collect()}
    dropped = {v for v, r in out.items() if not r["is_kept"]}
    assert dropped == _brute_dropped(spark)
    assert len(out) == load_table(spark, SF, "embeddings").count()


def test_min_id_survives_every_cell_group(spark):
    """Within each cell, the smallest vec_id can never be dropped (it has
    no lower-id neighbor), so every cell retains at least one vector."""
    out = similarity_semdedup(spark, SF)
    mins = (out.groupBy("cell").agg(F.min("vec_id").alias("m")))
    joined = (out.join(mins, (out["cell"] == mins["cell"])
                       & (out["vec_id"] == mins["m"])))
    assert joined.filter(~F.col("is_kept")).count() == 0
    kept_cells = out.filter(F.col("is_kept")).select("cell").distinct().count()
    all_cells = out.select("cell").distinct().count()
    assert kept_cells == all_cells
