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
