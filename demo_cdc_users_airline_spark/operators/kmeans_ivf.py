"""Deterministic distributed k-means + IVF index over embeddings.

The real coarse quantizer behind the IVF similarity tier (similarity.py
uses the dataset's ``label`` column as a stand-in cell id; this module
LEARNS the cells). Spark-first Lloyd iterations:

- assignment: candidates × broadcast centroids → argmin distance (a
  map over rows, min_by over a small exploded struct array — no UDF);
- update: groupBy cell → per-dimension mean via posexplode + DECIMAL
  sums (order-independent ⇒ bit-identical centroids under any
  partitioning — k-means on floats is normally nondeterministic on a
  cluster; decimal aggregation removes that);
- fixed iteration count + first-k-vectors init ⇒ fully reproducible.

At 100 TB: each iteration is one shuffle (the per-cell dimension agg);
the codebook (k × dim doubles) broadcasts; the final table is written
partitioned by cell so an IVF probe prunes to 1/k of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def _dist2(vec_col: str, cent_col: str):
    """Squared L2 distance between two double arrays (codegen fold)."""
    return F.expr(
        f"aggregate(zip_with({vec_col}, {cent_col}, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def assign_cells(vectors: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """vectors(id, vec: array<double>) → + cell (argmin centroid).

    Pure per-row map: the centroid codebook is a literal struct array and
    ``array_min`` over (distance, cid) structs is the argmin with a
    deterministic tie-break — NO shuffle, no window; assignment cost is
    one codegen pass however many executors scan the table.
    """
    cent_arr = F.array(*[
        F.struct(F.lit(cid).alias("cid"),
                 F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"))
        for cid, cvec in centroids])
    return vectors.withColumn(
        "__cents", cent_arr).withColumn(
        "cell",
        F.expr(
            "array_min(transform(__cents, c -> struct("
            "aggregate(zip_with(vec, c.cvec, (x, y) -> (x - y) * (x - y)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d2,"
            " c.cid AS cid))).cid"
        )).drop("__cents")


def update_centroids(assigned: DataFrame, k: int, dim: int) -> list[tuple[int, list[float]]]:
    """Per-cell dimension means with DECIMAL sums (order-independent)."""
    dims = assigned.select("cell", F.posexplode("vec").alias("dim", "val"))
    means = (dims.groupBy("cell", "dim")
             .agg((F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
                   / F.count(F.lit(1))).alias("m")))
    rows = means.collect()
    by_cell: dict[int, list[float]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], [0.0] * dim)[r["dim"]] = r["m"]
    return sorted(by_cell.items())


def kmeans_fit(vectors: DataFrame, k: int = 8, iters: int = 3):
    """Deterministic Lloyd: init = first k vectors by id, fixed iters."""
    dim = len(vectors.select("vec").first()[0])
    init = (vectors.orderBy("id").limit(k).collect())
    centroids = [(i, list(r["vec"])) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = assign_cells(vectors, centroids)
        centroids = update_centroids(assigned, k, dim)
    return centroids


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


@q("similarity_kmeans_ivf", None)  # rows-only: iterative algorithm (driver
# records the weaker check per the contract for non-SQL-expressible ops)
def similarity_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-codebook IVF: fit k=8 k-means on the embeddings, assign
    every vector to its cell, report per-cell stats + quantization error.
    Deterministic end-to-end (decimal means, fixed init/iters), verified
    by invariant tests (tests/test_kmeans_ivf.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    vectors = e.select(F.col("vec_id").alias("id"),
                       F.col("embedding").cast("array<double>").alias("vec"))
    centroids = kmeans_fit(vectors, k=8, iters=3)
    assigned = assign_cells(vectors, centroids)
    cent_arr = F.array(*[
        F.struct(F.lit(cid).alias("cid"),
                 F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"))
        for cid, cvec in centroids])
    with_cent = assigned.withColumn(
        "__cent", F.element_at(F.filter(cent_arr,
                                        lambda c: c["cid"] == F.col("cell")), 1))
    err = _dist2("vec", "__cent.cvec")
    return (with_cent.withColumn("q_err", err)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.sum(F.col("q_err").cast("decimal(38,12)")).cast("double")
                  .alias("total_sq_error"))
            .orderBy("cell"))
