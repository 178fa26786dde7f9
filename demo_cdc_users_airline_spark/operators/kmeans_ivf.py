"""Deterministic distributed k-means + IVF index over embeddings.

The real coarse quantizer behind the IVF similarity tier (similarity.py
uses the dataset's ``label`` column as a stand-in cell id; this module
LEARNS the cells). Spark-first Lloyd iterations:

- assignment: candidates × broadcast centroids → argmin distance (a
  map over rows, min over a small (d2, cid) struct array — no UDF);
- update: groupBy cell → per-dimension mean via posexplode;
- fixed iteration count + first-k-vectors init ⇒ fully reproducible.

Cross-engine exactness strategy: FIXED-POINT. Components quantize to
micro-units once up front (``floor(x * 1e6)`` — floor of the same
IEEE double is unambiguous on every engine, unlike round-half or a
double→decimal cast, whose rounding differs between Spark's
shortest-repr cast and DuckDB's exact-binary cast). After that every
step — squared distances, argmin tie-breaks, floor'd centroid means,
error totals — is 64-bit integer arithmetic, so the 3-iteration Lloyd
run unrolls into a DuckDB oracle that hash-matches bit-for-bit.
Quantization at 1e-6 on unit-scale embeddings is far below any
meaningful distance difference; it changes the metric by design, not
by accident, and identically on both engines.

At 100 TB: each iteration is one shuffle (the per-cell dimension agg);
the codebook (k × dim int64) broadcasts; the final table is written
partitioned by cell so an IVF probe prunes to 1/k of the files.
int64 bounds: per-dim diffs ≤ ~2e6 → d2 ≤ 64·4e12 ≈ 2.6e14; the
per-cell error total stays under 2^63 up to ~3e4 vectors/cell × that —
widen total_sq_err to DECIMAL beyond ~10^18 (sf≫1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import cached_scalar, load_table, local_frame, parallel_scan

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}

SCALE = 1_000_000  # micro-unit fixed-point quantization


def quantize(vectors: DataFrame, vec_col: str = "vec") -> DataFrame:
    """array<double> → array<bigint> micro-units (floor — engine-stable)."""
    return vectors.withColumn(
        vec_col,
        F.expr(f"transform({vec_col}, x -> CAST(FLOOR(x * {SCALE}.0D) AS BIGINT))"))


def assign_cells(vectors: DataFrame, centroids: list[tuple[int, list[int]]]) -> DataFrame:
    """vectors(id, vec: array<bigint>) → + cell (argmin centroid) + q_err.

    Pure per-row map: the centroid codebook travels as a broadcast
    single-row DataFrame (a bounded k×dim payload — NOT an unbounded
    table side), which keeps the expression tree tiny; inlining k·dim
    literals instead makes every iteration pay a large codegen/planning
    cost. ``array_min`` over (d2, cid) structs is the argmin with a
    deterministic tie-break — NO shuffle, no window.
    """
    spark = vectors.sparkSession
    cb = local_frame(spark, 
        [([(int(cid), [int(x) for x in cvec]) for cid, cvec in centroids],)],
        "__cents array<struct<cid:int,cvec:array<bigint>>>")
    best = F.expr(
        "array_min(transform(__cents, c -> struct("
        "aggregate(zip_with(vec, c.cvec, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d2,"
        " c.cid AS cid)))")
    return (vectors.crossJoin(F.broadcast(cb))
            .withColumn("__best", best)
            .withColumn("cell", F.col("__best.cid"))
            .withColumn("q_err", F.col("__best.d2"))
            .drop("__cents", "__best"))


def update_centroids(assigned: DataFrame, k: int, dim: int) -> list[tuple[int, list[int]]]:
    """Per-cell dimension means, floor'd back to micro-unit integers.

    The component sum runs through DECIMAL(38,0) — DuckDB's sum(BIGINT)
    is already hugeint (128-bit), so a plain int64 Spark sum would wrap
    silently where the oracle stays exact (~9e12 rows/cell; the
    ADVICE-r7 widening rule). Below 2^53 the double cast is exact, the
    division is correctly rounded identically on every engine, and
    floor removes the final ambiguity.
    """
    dims = assigned.select("cell", F.posexplode("vec").alias("dim", "val"))
    means = (dims.groupBy("cell", "dim")
             .agg(F.floor(F.sum(F.col("val").cast("decimal(38,0)"))
                          .cast("double")
                          / F.count(F.lit(1))).alias("m")))
    rows = means.collect()
    by_cell: dict[int, list[int]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], [0] * dim)[r["dim"]] = r["m"]
    return sorted(by_cell.items())


def kmeans_fit(vectors: DataFrame, k: int = 8, iters: int = 3):
    """Deterministic Lloyd over quantized vectors: init = first k by id."""
    dim = len(vectors.select("vec").first()[0])
    init = (vectors.orderBy("id").limit(k).collect())
    centroids = [(i, [int(x) for x in r["vec"]]) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = assign_cells(vectors, centroids)
        centroids = update_centroids(assigned, k, dim)
    return centroids


def _quantized_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = parallel_scan(spark, load_table(spark, sf_dir, "embeddings"),
                      "vec_id")
    # cache: the Lloyd loop scans these 3×(assign + update) + once per
    # downstream consumer — without it every pass re-reads the parquet
    # and re-quantizes (at 100 TB: persist DISK_ONLY or write the
    # quantized table once and iterate over that)
    return quantize(
        e.select(F.col("vec_id").alias("id"),
                 F.col("embedding").cast("array<double>").alias("vec"))).cache()


def fitted_codebook(spark: SparkSession, sf_dir: str,
                    k: int = 8, iters: int = 3) -> list[tuple[int, list[int]]]:
    """The trained codebook for a dataset, memoized per (session, dir).

    The codebook is a deterministic pure function of the embeddings
    (fixed init/iters, integer arithmetic), i.e. a training ARTIFACT:
    production maintains it as a tiny persisted table that every probe
    reuses — training does not rerun per query. The memo mirrors that
    (same mechanism as the copy-pipe watermark scalar cache)."""
    return cached_scalar(
        spark, sf_dir, f"kmeans_codebook_k{k}_i{iters}",
        lambda: kmeans_fit(_quantized_vectors(spark, sf_dir), k=k, iters=iters))


def save_codebook(spark: SparkSession, path: str,
                  centroids: list[tuple[int, list[int]]]) -> None:
    """Persist a trained codebook as a (cid, cvec) parquet table — the
    actual production artifact lifecycle the fitted_codebook memo
    stands in for: train once, write the k-row table, every later job
    (probes, encoders, other sessions) loads it instead of retraining.
    Quantized int64 components round-trip losslessly."""
    (local_frame(spark, 
        [(int(cid), [int(x) for x in vec]) for cid, vec in centroids],
        "cid int, cvec array<bigint>")
     .coalesce(1).write.mode("overwrite").parquet(path))


def load_codebook(spark: SparkSession,
                  path: str) -> list[tuple[int, list[int]]]:
    """Load a persisted codebook; inverse of save_codebook (cid order
    restored, so assignment tiebreaks are identical to the fresh fit)."""
    rows = spark.read.parquet(path).orderBy("cid").collect()
    return [(int(r["cid"]), [int(x) for x in r["cvec"]]) for r in rows]


def _kmeans_ctes(k: int = 8, iters: int = 3, dims_sql: str | None = None,
                 ids_sql: str = "SELECT vec_id FROM embeddings") -> str:
    """The deterministic Lloyd run unrolled into DuckDB CTEs, ending at
    ``asgfin(vec_id, cell, q_err)``. Mirrors the Spark operator step for
    step in integer micro-units: quantize = floor(x·1e6),
    d2 = Σ(xq−cq)², argmin tie-broken by (d2, cid), centroid
    mean = floor(sum/count) — hash-exact.

    ``dims_sql``/``ids_sql`` parametrize the feature source: the default
    is the quantized embeddings table; corpus_topic_clusters feeds
    hashed token-frequency vectors instead (same Lloyd core).
    """
    d2 = "sum((v.val - c.val) * (v.val - c.val))::BIGINT"
    if dims_sql is None:
        dims_sql = f"""SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings"""
    parts = [f"""dims AS (
  {dims_sql}
),
init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, vec_id
  FROM (SELECT vec_id FROM ({ids_sql}) ORDER BY vec_id LIMIT {k})
),
cent0 AS (SELECT i.cid, d.dim, d.val FROM init i JOIN dims d USING (vec_id))"""]
    for it in range(1, iters + 1):
        parts.append(f"""d{it} AS (
  SELECT v.vec_id, c.cid, {d2} AS d2
  FROM dims v JOIN cent{it - 1} c USING (dim)
  GROUP BY 1, 2
),
asg{it} AS (
  SELECT vec_id, cid AS cell FROM d{it}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
),
cent{it} AS (
  SELECT s.cell AS cid, d.dim,
         CAST(floor(CAST(sum(d.val) AS DOUBLE) / count(*)) AS BIGINT) AS val
  FROM asg{it} s JOIN dims d USING (vec_id)
  GROUP BY 1, 2
)""")
    parts.append(f"""dfin AS (
  SELECT v.vec_id, c.cid, {d2} AS d2
  FROM dims v JOIN cent{iters} c USING (dim)
  GROUP BY 1, 2
),
asgfin AS (
  SELECT vec_id, cid AS cell, d2 AS q_err FROM dfin
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
)""")
    return ",\n".join(parts)


def _kmeans_oracle_sql(k: int = 8, iters: int = 3) -> str:
    return ("WITH " + _kmeans_ctes(k, iters) + """
SELECT cell, count(*) AS n_vectors,
       CAST(sum(q_err) AS DOUBLE) AS total_sq_err_micro
FROM asgfin GROUP BY cell ORDER BY cell""")


# Quantized-cosine oracle fragments (VERDICT r10 #7: the top-k probes
# share the module-wide int64 fixed-point convention — exact
# order-independent integer dots surfaced as doubles, then ONE
# engine-identical IEEE tree ``dot / sqrt(nn_a * nn_b)``). Derived from
# similarity.py's single source of truth (ADVICE r11 #4 — the two
# modules previously held hand-synced near-copies), label-free here
# because the probe oracles never project the cell column.
from .similarity import QCOS_SQL as _QCOS
from .similarity import QUANT_SCALE as _QUANT_SCALE
from .similarity import qnn_sql as _qnn_sql

# this module's Spark-side quantization (SCALE) and the shared oracle
# fragments (QUANT_SCALE) must agree or every probe hash diverges
assert SCALE == _QUANT_SCALE

_QNN_CTES = f"qnn AS ({_qnn_sql(label=False)})"


def _learned_probe_oracle_sql(k: int = 8, iters: int = 3, topk: int = 3) -> str:
    """Learned-IVF probe: the kmeans CTEs assign every vector a cell,
    then each query probes only its own cell with quantized-int64
    cosine top-k (the module convention — see _QNN_CTES)."""
    return ("WITH " + _kmeans_ctes(k, iters) + f""",
{_QNN_CTES},
pairs AS (
  SELECT qa.vec_id AS query_id, qa.cell AS cell,
         ba.vec_id AS neighbor_id, {_QCOS} AS cosine
  FROM asgfin qa
  JOIN asgfin ba ON ba.cell = qa.cell AND ba.vec_id <> qa.vec_id
  JOIN qnn a ON a.vec_id = qa.vec_id
  JOIN qnn b ON b.vec_id = ba.vec_id
  WHERE qa.vec_id < 8
)
SELECT query_id, cell, neighbor_id, cosine FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= {topk}""")


def probe_cells(vectors: DataFrame, centroids: list[tuple[int, list[int]]],
                nprobe: int) -> DataFrame:
    """vectors(id, vec) → (id, probe_cell): each vector's ``nprobe``
    nearest cells by (d2, cid) — the IVF recall/latency dial (nprobe=1
    is plain assignment; higher values probe neighboring cells to catch
    near-boundary vectors). Same broadcast-codebook map as assignment,
    still shuffle-free."""
    spark = vectors.sparkSession
    cb = local_frame(spark, 
        [([(int(cid), [int(x) for x in cvec]) for cid, cvec in centroids],)],
        "__cents array<struct<cid:int,cvec:array<bigint>>>")
    top = F.expr(
        "slice(array_sort(transform(__cents, c -> struct("
        "aggregate(zip_with(vec, c.cvec, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d2,"
        f" c.cid AS cid))), 1, {int(nprobe)})")
    return (vectors.crossJoin(F.broadcast(cb))
            .withColumn("__probe", F.explode(top))
            .select("id", F.col("__probe.cid").alias("probe_cell"), "vec")
            .drop("__cents"))


def _nprobe_oracle_sql(k: int = 8, iters: int = 3, nprobe: int = 2,
                       topk: int = 3) -> str:
    return ("WITH " + _kmeans_ctes(k, iters) + f""",
{_QNN_CTES},
probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell
  FROM dfin WHERE vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) <= {nprobe}
),
pairs AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, {_QCOS} AS cosine
  FROM probe p
  JOIN asgfin c ON c.cell = p.probe_cell AND c.vec_id <> p.query_id
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
)
SELECT query_id, neighbor_id, cosine FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= {topk}""")


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


@q("similarity_kmeans_ivf", _kmeans_oracle_sql(k=8, iters=3))
def similarity_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-codebook IVF: fit k=8 k-means on the embeddings, assign
    every vector to its cell, report per-cell stats + quantization error
    (micro-unit² fixed point). Deterministic end-to-end and hash-exact
    against the unrolled DuckDB oracle; invariant tests in
    tests/test_kmeans_ivf.py.

    Headroom: every Lloyd-objective total (``total_sq_err_micro`` here,
    the topic-cluster twin, the incremental-ingest ``sqe``, the
    streaming drift report, and the centroid-mean component sums) runs
    through DECIMAL(38,0) on the Spark side, matching DuckDB's hugeint
    sums — per-vector q_err stays int64-safe (dim·(1e6)² ≈ 1e14) while
    per-cell totals pass int64 around sf10, so overflow now fails
    loudly on both engines instead of diverging (ROADMAP known-weak #1,
    closed r9)."""
    vectors = _quantized_vectors(spark, sf_dir)
    centroids = fitted_codebook(spark, sf_dir, k=8, iters=3)
    assigned = assign_cells(vectors, centroids)
    return (assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 # DECIMAL(38,0) sum: exact past int64 (per-vector q_err
                 # is int64-safe, the per-cell TOTAL overflows around
                 # sf10 — DuckDB's hugeint sum is already 128-bit); both
                 # engines then cast the same exact integer to double
                 F.sum(F.col("q_err").cast("decimal(38,0)")).cast("double")
                 .alias("total_sq_err_micro"))
            .select(F.col("cell").cast("long").alias("cell"),
                    "n_vectors", "total_sq_err_micro")
            .orderBy("cell"))


@q("similarity_topk_ivf_learned", _learned_probe_oracle_sql(k=8, iters=3, topk=3))
def similarity_topk_ivf_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end learned ANN: fit the k-means codebook, assign every
    vector its learned cell (replacing similarity_topk_ivf's given
    ``label`` stand-in), then probe each query's own cell with
    quantized-int64 cosine top-3 (the module convention, VERDICT r10
    #7 — exact integer dots, one engine-identical IEEE tree) — the
    full IVF index lifecycle (train → assign → probe), hash-exact
    against the unrolled oracle.

    Scale path: assignment is the map-only broadcast-codebook pass; at
    100 TB the assigned table is written partitioned by cell, so a probe
    reads 1/k of the files; the query set broadcasts (bounded). The
    quantized vectors ride the assignment pass — no join back to the
    embeddings table."""
    from pyspark.sql import Window

    from .similarity import qdot

    centroids = fitted_codebook(spark, sf_dir, k=8, iters=3)
    assigned = (assign_cells(_quantized_vectors(spark, sf_dir), centroids)
                .select(F.col("id").alias("vec_id"), "cell", "vec"))
    queries = (assigned.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("cell").alias("q_cell"),
                       F.col("vec").alias("q_vec"))
               .withColumn("q_nn", qdot("q_vec", "q_vec")))
    cand = (assigned.select(F.col("vec_id").alias("neighbor_id"),
                            F.col("cell").alias("c_cell"),
                            F.col("vec").alias("c_vec"))
            .withColumn("c_nn", qdot("c_vec", "c_vec")))
    joined = cand.join(F.broadcast(queries),
                       (F.col("c_cell") == F.col("q_cell"))
                       & (F.col("neighbor_id") != F.col("query_id")))
    cosine = (qdot("q_vec", "c_vec")
              / F.sqrt(F.col("q_nn") * F.col("c_nn")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (joined.select("query_id",
                          F.col("q_cell").cast("long").alias("cell"),
                          "neighbor_id", cosine.alias("cosine"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 3)
            .drop("__rn"))


def _ivf_nprobe_topk(spark: SparkSession, sf_dir: str,
                     nprobe: int, topk: int,
                     centroids: list[tuple[int, list[int]]] | None = None,
                     ) -> DataFrame:
    """Learned-IVF nprobe search, parameterized — the shared engine
    behind similarity_topk_ivf_nprobe, the recall curve, and the
    staleness check (which passes its own — stale — codebook).
    Quantized-int64 cosine (the module convention, VERDICT r10 #7);
    the quantized vectors ride the assignment/probe passes — no join
    back to the embeddings table."""
    from pyspark.sql import Window

    from .similarity import qdot

    if centroids is None:
        centroids = fitted_codebook(spark, sf_dir, k=8, iters=3)
    vq = _quantized_vectors(spark, sf_dir)
    assigned = (assign_cells(vq, centroids)
                .select(F.col("id").alias("vec_id"), "cell", "vec"))
    queries = (probe_cells(vq.filter(F.col("id") < 8), centroids,
                           nprobe=nprobe)
               .select(F.col("id").alias("query_id"), "probe_cell",
                       F.col("vec").alias("q_vec"))
               .withColumn("q_nn", qdot("q_vec", "q_vec")))
    cand = (assigned
            .select(F.col("vec_id").alias("neighbor_id"),
                    F.col("cell").alias("c_cell"),
                    F.col("vec").alias("c_vec"))
            .withColumn("c_nn", qdot("c_vec", "c_vec")))
    joined = cand.join(F.broadcast(queries),
                       (F.col("c_cell") == F.col("probe_cell"))
                       & (F.col("neighbor_id") != F.col("query_id")))
    cosine = (qdot("q_vec", "c_vec")
              / F.sqrt(F.col("q_nn") * F.col("c_nn")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (joined.select("query_id", "neighbor_id", cosine.alias("cosine"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= topk)
            .drop("__rn"))


@q("similarity_topk_ivf_nprobe", _nprobe_oracle_sql(k=8, iters=3, nprobe=2, topk=3))
def similarity_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned IVF with nprobe=2: each query probes its TWO nearest
    cells, recovering near-boundary neighbors that single-cell probing
    misses — the standard IVF recall dial (cost scales as
    nprobe/k of the data; here 2/8 instead of 1/8).

    The probe-cell expansion is the same shuffle-free broadcast-codebook
    map as assignment; candidates join on their (unique) assigned cell,
    so no pair is scored twice."""
    return _ivf_nprobe_topk(spark, sf_dir, nprobe=2, topk=3)


# ANN index-quality evaluation: recall@k of the learned-IVF nprobe
# search against the exact brute-force ground truth, per query — the
# metric every production ANN deployment tracks to tune nlist/nprobe.
RECALL_K = 3


def _ann_recall_oracle_sql(k: int = 8, iters: int = 3, nprobe: int = 2,
                           topk: int = RECALL_K) -> str:
    return ("WITH " + _kmeans_ctes(k, iters) + f""",
{_QNN_CTES},
probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell
  FROM dfin WHERE vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) <= {nprobe}
),
approx AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, {_QCOS} AS cosine
  FROM probe p
  JOIN asgfin c ON c.cell = p.probe_cell AND c.vec_id <> p.query_id
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
  QUALIFY row_number() OVER (PARTITION BY p.query_id
                             ORDER BY cosine DESC, neighbor_id) <= {topk}
),
brute AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_QCOS} AS cosine
  FROM qnn a JOIN qnn b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY a.vec_id
                             ORDER BY cosine DESC, b.vec_id) <= {topk}
),
hits AS (
  SELECT b.query_id, count(*) AS n_hits
  FROM brute b JOIN approx x USING (query_id, neighbor_id)
  GROUP BY 1
)
SELECT q.query_id,
       CAST({topk} AS BIGINT) AS k,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / {topk} AS recall_at_k
FROM (SELECT DISTINCT query_id FROM brute) q
LEFT JOIN hits h USING (query_id)""")


@q("similarity_ann_recall", _ann_recall_oracle_sql())
def similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality report: per probe query, recall@3 of the
    learned-IVF nprobe=2 search against the exact brute-force top-3 —
    the evaluation loop that closes the index lifecycle
    (train → assign → probe → MEASURE), and the number a production
    deployment watches when tuning nlist/nprobe. Composes the two
    catalog search operators verbatim, so both keep their own oracles.

    The comparison is on neighbor-ID SETS (both sides totally ordered
    by (cosine DESC, neighbor_id), quantized-int64 cosines → identical
    sets on both engines); n_hits is an integer, recall divides once.
    Scale path: inherits each side's documented layout — brute scans
    candidates once against the broadcast bounded query set, IVF
    probes nprobe/nlist of the data; the hit join is queries×k rows."""
    from pyspark.sql import Window

    from .similarity import similarity_topk_brute

    wq = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("neighbor_id"))
    brute = (similarity_topk_brute(spark, sf_dir)
             .withColumn("__rn", F.row_number().over(wq))
             .filter(F.col("__rn") <= RECALL_K)
             .select("query_id", "neighbor_id"))
    approx = (similarity_topk_ivf_nprobe(spark, sf_dir)
              .select("query_id", "neighbor_id"))
    hits = (brute.join(approx, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits")))
    qs = brute.select("query_id").distinct()
    return (qs.join(hits, "query_id", "left")
            .select("query_id",
                    F.lit(RECALL_K).cast("long").alias("k"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)).cast("double")
                     / F.lit(float(RECALL_K))).alias("recall_at_k")))


CURVE_NPROBES = (1, 2, 4)


def _ann_recall_curve_oracle_sql(k: int = 8, iters: int = 3,
                                 topk: int = RECALL_K) -> str:
    parts = ["WITH " + _kmeans_ctes(k, iters) + f""",
{_QNN_CTES},
brute AS MATERIALIZED (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_QCOS} AS cosine
  FROM qnn a JOIN qnn b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY a.vec_id
                             ORDER BY cosine DESC, b.vec_id) <= {topk}
),
nq AS (SELECT count(DISTINCT query_id) AS n_queries FROM brute)"""]
    for n in CURVE_NPROBES:
        parts.append(f""",
probe{n} AS (
  SELECT vec_id AS query_id, cid AS probe_cell
  FROM dfin WHERE vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) <= {n}
),
approx{n} AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, {_QCOS} AS cosine
  FROM probe{n} p
  JOIN asgfin c ON c.cell = p.probe_cell AND c.vec_id <> p.query_id
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
  QUALIFY row_number() OVER (PARTITION BY p.query_id
                             ORDER BY cosine DESC, neighbor_id) <= {topk}
),
hits{n} AS (
  SELECT count(*) AS n_hits
  FROM brute t JOIN approx{n} x USING (query_id, neighbor_id)
)""")
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({n} AS BIGINT) AS nprobe, CAST({topk} AS BIGINT) AS k,"
        f" CAST(nq.n_queries AS BIGINT) AS n_queries,"
        f" CAST(h.n_hits AS BIGINT) AS n_hits,"
        f" CAST(h.n_hits AS DOUBLE)"
        f" / CAST({topk} * nq.n_queries AS DOUBLE) AS recall_at_k"
        f" FROM hits{n} h CROSS JOIN nq"
        for n in CURVE_NPROBES)
    return "".join(parts) + "\n" + rows


@q("similarity_ann_recall_curve", _ann_recall_curve_oracle_sql())
def similarity_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe TUNING report: aggregate recall@{RECALL_K} of the
    learned-IVF search at nprobe ∈ {CURVE_NPROBES} against the exact
    brute-force top-k — one row per operating point, so index tuning
    (recall vs fraction-of-data-scanned, nprobe/nlist) is a single
    query instead of N manual runs (VERDICT r5 item 8; the per-query
    breakdown at the production operating point stays in
    similarity_ann_recall).

    Exactness: hit counts are integers; recall divides once by the
    exact k·n_queries product (one IEEE rounding, engine-identical).
    Scale path: ONE brute ground-truth pass (cached, queries × k rows)
    and ONE candidate pass at max(nprobe) with probe cells ranked by
    the probe order — every operating point is a probe_rank prefix of
    the same cached scored-pair frame (queries × probed-cell residents,
    bounded), so the whole curve costs one max-nprobe search, not
    |curve| full searches."""
    from functools import reduce

    from pyspark.sql import Window

    from .similarity import similarity_topk_brute

    wq = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("neighbor_id"))
    brute = (similarity_topk_brute(spark, sf_dir)
             .withColumn("__rn", F.row_number().over(wq))
             .filter(F.col("__rn") <= RECALL_K)
             .select("query_id", "neighbor_id")
             .cache())
    nq = brute.agg(F.countDistinct("query_id").alias("n_queries"))
    # ONE candidate pass at the curve's max nprobe, probe cells RANKED
    # by the same (d2, cid) order probe_cells slices in — the nprobe=n
    # operating point is exactly the probe_rank < n prefix, so every
    # point shares this single scored-pair frame instead of re-running
    # the scan per point (the slice order makes prefixes point-exact).
    # Quantized-int64 cosine (the module convention, VERDICT r10 #7);
    # the quantized vectors ride the probe/assignment passes — no join
    # back to the embeddings table.
    from .similarity import qdot

    centroids = fitted_codebook(spark, sf_dir, k=8, iters=3)
    vq = _quantized_vectors(spark, sf_dir)
    max_np = max(CURVE_NPROBES)
    cb = local_frame(spark, 
        [([(int(cid), [int(x) for x in cvec]) for cid, cvec in centroids],)],
        "__cents array<struct<cid:int,cvec:array<bigint>>>")
    top = F.expr(
        "slice(array_sort(transform(__cents, c -> struct("
        "aggregate(zip_with(vec, c.cvec, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d2,"
        f" c.cid AS cid))), 1, {max_np})")
    queries = (vq.filter(F.col("id") < 8)
               .crossJoin(F.broadcast(cb))
               .select(F.col("id").alias("query_id"),
                       F.col("vec").alias("q_vec"),
                       F.posexplode(top).alias("probe_rank", "__probe"))
               .select("query_id", "probe_rank", "q_vec",
                       F.col("__probe.cid").alias("probe_cell"))
               .withColumn("q_nn", qdot("q_vec", "q_vec")))
    cand = (assign_cells(vq, centroids)
            .select(F.col("id").alias("neighbor_id"),
                    F.col("cell").alias("c_cell"),
                    F.col("vec").alias("c_vec"))
            .withColumn("c_nn", qdot("c_vec", "c_vec")))
    cosine = (qdot("q_vec", "c_vec")
              / F.sqrt(F.col("q_nn") * F.col("c_nn")))
    pairs = (cand.join(F.broadcast(queries),
                       (F.col("c_cell") == F.col("probe_cell"))
                       & (F.col("neighbor_id") != F.col("query_id")))
             .select("query_id", "probe_rank", "neighbor_id",
                     cosine.alias("cosine"))
             .cache())
    points = []
    for n in CURVE_NPROBES:
        approx = (pairs.filter(F.col("probe_rank") < n)
                  .withColumn("__rn", F.row_number().over(wq))
                  .filter(F.col("__rn") <= RECALL_K)
                  .select("query_id", "neighbor_id"))
        points.append(
            brute.join(approx, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(n).cast("long").alias("nprobe"),
                    F.col("n_hits").cast("long").alias("n_hits")))
    curve = reduce(lambda x, y: x.unionByName(y), points)
    return (curve.crossJoin(F.broadcast(nq))
            .select("nprobe",
                    F.lit(RECALL_K).cast("long").alias("k"),
                    F.col("n_queries").cast("long").alias("n_queries"),
                    "n_hits",
                    (F.col("n_hits").cast("double")
                     / (F.lit(RECALL_K) * F.col("n_queries")).cast("double"))
                    .alias("recall_at_k")))


# kNN label propagation over the learned IVF index: classify held-out
# vectors by majority vote of their k nearest LABELED neighbors, with
# the candidate scan restricted to the query's nprobe nearest cells.
KNN_HOLDOUT_MOD = 23   # vec_id % 23 == 0 → the unlabeled holdout
KNN_K = 5
KNN_NPROBE = 2


def nn_of(col: str):
    """Exact int64 self-dot of a quantized vector, carried as double."""
    return F.expr(f"CAST(aggregate(zip_with({col}, {col}, (x, y) -> x * y),"
                  f" CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)")


def _knn_classify_oracle_sql(k: int = 8, iters: int = 3) -> str:
    from .similarity import QUANT_SQL
    return ("WITH " + _kmeans_ctes(k, iters) + f""",
sq AS ({QUANT_SQL}),
sqn AS (
  SELECT vec_id, qv, list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS nn
  FROM sq
),
probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell
  FROM dfin WHERE vec_id % {KNN_HOLDOUT_MOD} = 0
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY d2, cid) <= {KNN_NPROBE}
),
knn AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
           / sqrt(a.nn * b.nn) AS cosine
  FROM probe p
  JOIN asgfin c ON c.cell = p.probe_cell
               AND c.vec_id % {KNN_HOLDOUT_MOD} <> 0
  JOIN sqn a ON a.vec_id = p.query_id
  JOIN sqn b ON b.vec_id = c.vec_id
  QUALIFY row_number() OVER (PARTITION BY p.query_id
                             ORDER BY cosine DESC, neighbor_id) <= {KNN_K}
),
votes AS (
  SELECT n.query_id, e.label, count(*) AS n_votes, max(n.cosine) AS top_cos
  FROM knn n JOIN embeddings e ON e.vec_id = n.neighbor_id
  GROUP BY 1, 2
),
pred AS (
  SELECT query_id, label AS pred_label, n_votes, top_cos FROM votes
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY n_votes DESC, label) = 1
)
SELECT p.query_id, CAST(e.label AS BIGINT) AS true_label,
       CAST(p.pred_label AS BIGINT) AS pred_label,
       CAST(p.n_votes AS BIGINT) AS n_votes,
       p.top_cos AS top_cosine,
       CAST(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END AS BIGINT)
         AS is_correct
FROM pred p JOIN embeddings e ON e.vec_id = p.query_id""")


@q("embedding_knn_classify", _knn_classify_oracle_sql())
def embedding_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label propagation over the learned IVF index: every held-out
    vector (vec_id % 23 == 0, its label masked) is classified by the
    majority label of its 5 nearest labeled neighbors, searched only in
    the query's 2 nearest learned cells — the semi-supervised labeling
    pass of a training-data pipeline (propagate scarce human labels to
    the unlabeled corpus), composed from the serving stack: codebook
    train → probe-cell map → within-cell scan → bounded top-k → vote.

    Scale path: probe expansion and assignment are broadcast-codebook
    maps (zero shuffle); the candidate join touches nprobe/nlist of the
    labeled table per query batch. Production labels in bounded query
    batches (the serving pattern), so the broadcast side is the batch,
    never "the unlabeled corpus"; past broadcast size the per-cell
    GEMM tiling (int_pair_cosines) is the drop-in replacement for the
    scan. Top-k is a per-query window over within-cell candidates; the
    vote reduces k rows per query. Exactness: cosine is the
    quantized-int64 dot (engine-exact, order-independent) with one
    sqrt+divide; all ranks totally ordered — knn set by (cosine DESC,
    neighbor_id), pred by (votes DESC, label)."""
    from pyspark.sql import Window

    labels = (load_table(spark, sf_dir, "embeddings")
              .select("vec_id", F.col("label").cast("long").alias("label")))
    centroids = fitted_codebook(spark, sf_dir, k=8, iters=3)
    vq = _quantized_vectors(spark, sf_dir)
    is_holdout = F.col("id") % KNN_HOLDOUT_MOD == 0
    queries = (probe_cells(vq.filter(is_holdout), centroids,
                           nprobe=KNN_NPROBE)
               .select(F.col("id").alias("query_id"), "probe_cell",
                       F.col("vec").alias("q_vec"))
               .withColumn("q_nn", nn_of("q_vec")))
    refs = (assign_cells(vq.filter(~is_holdout), centroids)
            .select(F.col("id").alias("neighbor_id"),
                    F.col("cell").alias("c_cell"),
                    F.col("vec").alias("c_vec"))
            .withColumn("c_nn", nn_of("c_vec")))
    dot = F.expr("CAST(aggregate(zip_with(q_vec, c_vec, (x, y) -> x * y),"
                 " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)")
    cand = (refs.join(F.broadcast(queries),
                      F.col("c_cell") == F.col("probe_cell"))
            .withColumn("cosine",
                        dot / F.sqrt(F.col("q_nn") * F.col("c_nn"))))
    wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("neighbor_id"))
    knn = (cand.select("query_id", "neighbor_id", "cosine")
           .withColumn("__rn", F.row_number().over(wk))
           .filter(F.col("__rn") <= KNN_K))
    votes = (knn.join(labels.withColumnRenamed("vec_id", "neighbor_id"),
                      "neighbor_id")
             .groupBy("query_id", "label")
             .agg(F.count(F.lit(1)).alias("n_votes"),
                  F.max("cosine").alias("top_cos")))
    wp = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(),
                                                F.col("label"))
    pred = (votes.withColumn("__rn", F.row_number().over(wp))
            .filter(F.col("__rn") == 1))
    return (pred.join(labels.withColumnRenamed("vec_id", "query_id")
                      .withColumnRenamed("label", "true_label"), "query_id")
            .select("query_id", "true_label",
                    F.col("label").alias("pred_label"),
                    F.col("n_votes").cast("long").alias("n_votes"),
                    F.col("top_cos").alias("top_cosine"),
                    F.when(F.col("label") == F.col("true_label"), 1)
                     .otherwise(0).cast("long").alias("is_correct")))


# SemDeDup (Abbas et al. 2023): cluster embeddings with k-means, then
# search for semantic duplicates only WITHIN each cluster — the cluster
# structure turns the O(n²) all-pairs cosine scan into O(Σ n_cell²).
SEMDEDUP_TAU = 0.4


def _semdedup_oracle_sql(k: int = 8, iters: int = 3,
                         tau: float = SEMDEDUP_TAU) -> str:
    from .similarity import QUANT_SQL
    return ("WITH " + _kmeans_ctes(k, iters) + f""",
sq AS ({QUANT_SQL}),
sqn AS (
  SELECT vec_id, qv, list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS nn
  FROM sq
),
dup AS (
  SELECT DISTINCT qa.vec_id
  FROM asgfin qa
  JOIN asgfin ba ON ba.cell = qa.cell AND ba.vec_id < qa.vec_id
  JOIN sqn a ON a.vec_id = qa.vec_id
  JOIN sqn b ON b.vec_id = ba.vec_id
  WHERE list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
          / sqrt(a.nn * b.nn) >= {tau}
)
SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
       (d.vec_id IS NULL) AS is_kept
FROM asgfin s LEFT JOIN dup d ON d.vec_id = s.vec_id""")


@q("similarity_semdedup", _semdedup_oracle_sql())
def similarity_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings (the memoized learned
    codebook), then within each cluster mark every vector that has a
    LOWER-id neighbor with cosine ≥ τ as a semantic duplicate; the
    min-id representative of each near-duplicate group survives
    (deterministic canonical choice — the paper keeps an arbitrary
    member; min-id is the repo-wide convention shared with the simhash
    and jaccard dedups).

    Scale path: assignment is the broadcast-codebook map; the pair
    search runs the shared tiled integer-GEMM stage
    (similarity.int_pair_cosines) over the SAME micro-quantized vectors
    Lloyd already consumes — per-cell block tiling keeps replication
    ∝ Σ n_cell²/target (proportional to the intrinsic pair work;
    k-means cells are the skew case par excellence since k is small)
    and the per-pair arithmetic in vectorized int64 C instead of an
    interpreted fold; the verdict join prunes to (vec_id, flag). At
    100 TB the assigned table is written bucketed by cell so the pair
    stage re-partitions nothing on re-runs.

    r5: the dedup metric is the quantized-int64 cosine (identical in
    the oracle via list_dot_product over the quantized lists); the
    1e-6 quantization perturbs cosines ~1e-6 — invisible at τ=0.4 —
    and identically on both engines.
    """
    from .similarity import int_pair_cosines

    centroids = fitted_codebook(spark, sf_dir, k=8, iters=3)
    assigned = (assign_cells(_quantized_vectors(spark, sf_dir), centroids)
                .select(F.col("id").alias("vec_id"),
                        F.col("cell").cast("long").alias("cell"), "vec")
                .cache())
    assigned.count()  # eager (r14, guide §5): four consumers (the
    # pair stage's cell census + GEMM rows, the dup join, the verdict
    # join) race the lazy cache otherwise — profiled as five stages
    # each re-reading + re-quantizing the embeddings parquet
    pairs = int_pair_cosines(
        assigned.select("vec_id", "cell", F.col("vec").alias("qv")),
        SEMDEDUP_TAU)
    dup = (pairs.select(F.col("vec2").alias("vec_id")).distinct()
           .withColumn("__dup", F.lit(1)))
    return (assigned.drop("vec").join(dup, "vec_id", "left")
            .select("vec_id", "cell",
                    F.col("__dup").isNull().alias("is_kept")))


# -- corpus topic clustering: the SAME Lloyd core over hashed token-
# frequency features instead of embeddings. This is the data-mixing
# stage of a training pipeline (cluster the corpus into topical slices,
# then rebalance the mixture per cluster); it also demonstrates that the
# kmeans operator is feature-source-agnostic.
TOPIC_BUCKETS = 64
TOPIC_K = 8


def _topic_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id=doc_id, vec) — dense hashed-unigram tf vectors, integer-exact
    (raw counts need no micro quantization). One exploded pass + two
    keyed reduces; the dense array is built by map lookup, so bucket
    order never depends on collect_list ordering."""
    from .sampling import _salted_hash
    from .text import tokens as _tokens

    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    feat = (d.select("doc_id", F.explode(_tokens("text")).alias("w"))
            .select("doc_id",
                    (_salted_hash("clust_", F.col("w")) % TOPIC_BUCKETS)
                    .alias("b")))
    btf = feat.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf"))
    return (btf.groupBy("doc_id")
            .agg(F.map_from_arrays(F.collect_list("b"),
                                   F.collect_list("tf")).alias("m"))
            .select(F.col("doc_id").alias("id"),
                    F.expr(
                        f"transform(sequence(0, {TOPIC_BUCKETS - 1}), "
                        f"i -> coalesce(element_at(m, CAST(i AS BIGINT)), "
                        f"CAST(0 AS BIGINT)))").alias("vec"))
            .cache())


def _topic_oracle_sql(k: int = TOPIC_K, iters: int = 3) -> str:
    from .sampling import _salted_hash_sql
    dims_sql = f"""SELECT d.doc_id AS vec_id, r.range AS dim,
         CAST(coalesce(t.tf, 0) AS BIGINT) AS val
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN range({TOPIC_BUCKETS}) r
  LEFT JOIN (
    SELECT doc_id, {_salted_hash_sql("clust_", "w")} % {TOPIC_BUCKETS} AS b,
           count(*) AS tf
    FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
          FROM documents)
    GROUP BY 1, 2
  ) t ON t.doc_id = d.doc_id AND t.b = r.range"""
    ctes = _kmeans_ctes(k, iters, dims_sql=dims_sql,
                        ids_sql="SELECT DISTINCT doc_id AS vec_id FROM documents")
    return ("WITH " + ctes + """,
src AS (
  SELECT a.cell, d.source, count(*) AS c
  FROM asgfin a JOIN documents d ON d.doc_id = a.vec_id
  GROUP BY 1, 2
),
top_src AS (
  SELECT cell, source AS top_source FROM src
  QUALIFY row_number() OVER (PARTITION BY cell ORDER BY c DESC, source) = 1
)
SELECT s.cluster_id, s.n_docs, s.total_sq_err, t.top_source
FROM (SELECT cell AS cluster_id, count(*) AS n_docs,
             CAST(sum(q_err) AS DOUBLE) AS total_sq_err
      FROM asgfin GROUP BY 1) s
JOIN top_src t ON t.cell = s.cluster_id
ORDER BY s.cluster_id""")


@q("corpus_topic_clusters", _topic_oracle_sql())
def corpus_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic clustering of the corpus: k-means over hashed unigram
    tf vectors (TOPIC_BUCKETS=64 hash buckets, k=8), reporting per-
    cluster size, inertia, and the dominant source — the slice table a
    mixture-rebalancing job consumes.

    Scale path: feature extraction is the one exploded pass + keyed
    reduce (hashed features bound the dimensionality, so the dense
    vector is a fixed 64-int payload per doc, NOT vocabulary-sized);
    Lloyd iterations reuse the cached feature frame with a broadcast
    codebook (one shuffle per iteration, same core as the IVF
    codebook); the summary is a tiny per-cell aggregate. The codebook
    is memoized per (session, dataset) like the IVF artifact.
    """
    from pyspark.sql import Window

    vectors = _topic_vectors(spark, sf_dir)
    centroids = cached_scalar(
        spark, sf_dir, f"topic_codebook_k{TOPIC_K}_b{TOPIC_BUCKETS}",
        lambda: kmeans_fit(vectors, k=TOPIC_K, iters=3))
    assigned = assign_cells(vectors, centroids)
    stats = (assigned.groupBy("cell")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.col("q_err").cast("decimal(38,0)")).cast("double")
                  .alias("total_sq_err")))
    d = load_table(spark, sf_dir, "documents")
    srcc = (assigned.select(F.col("id").alias("doc_id"), "cell")
            .join(d.select("doc_id", "source"), "doc_id")
            .groupBy("cell", "source").agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("cell").orderBy(F.col("c").desc(), F.col("source"))
    top = (srcc.withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") == 1)
           .select("cell", F.col("source").alias("top_source")))
    return (stats.join(top, "cell")
            .select(F.col("cell").cast("long").alias("cluster_id"),
                    "n_docs", "total_sq_err", "top_source")
            .orderBy("cluster_id"))


# ---------------------------------------------------------------------------
# c-TF-IDF topic keywords (the BERTopic labeling step): name each topic
# cluster by the tokens most characteristic of it
# ---------------------------------------------------------------------------

TOPIC_TOP_WORDS = 5

# per-(cluster, token) c-TF-IDF in int64 micros, rendered VERBATIM into
# both engines (identifiers c, tot_c, f, tot in scope; K = cluster
# count as a literal so both engines parse the same double):
# score = (c / tot_c) · ln(1 + (tot / K) / f)
_CTFIDF_SQL = (f"CAST(floor(1000000.0 * "
               f"(CAST(c AS DOUBLE) / CAST(tot_c AS DOUBLE))"
               f" * ln(1.0 + (CAST(tot AS DOUBLE) / {TOPIC_K}.0)"
               f" / CAST(f AS DOUBLE))) AS BIGINT)")


def _topic_keywords_oracle_sql() -> str:
    from .sampling import _salted_hash_sql

    dims_sql = f"""SELECT d.doc_id AS vec_id, r.range AS dim,
         CAST(coalesce(t.tf, 0) AS BIGINT) AS val
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN range({TOPIC_BUCKETS}) r
  LEFT JOIN (
    SELECT doc_id, {_salted_hash_sql("clust_", "w")} % {TOPIC_BUCKETS} AS b,
           count(*) AS tf
    FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
          FROM documents)
    GROUP BY 1, 2
  ) t ON t.doc_id = d.doc_id AND t.b = r.range"""
    ctes = _kmeans_ctes(TOPIC_K, 3, dims_sql=dims_sql,
                        ids_sql="SELECT DISTINCT doc_id AS vec_id FROM documents")
    return ("WITH " + ctes + f""",
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
),
ct AS (
  SELECT a.cell, t.w, count(*) AS c
  FROM tok t JOIN asgfin a ON a.vec_id = t.doc_id
  GROUP BY 1, 2
),
tc AS (SELECT cell, sum(c) AS tot_c FROM ct GROUP BY 1),
ft AS (SELECT w, sum(c) AS f FROM ct GROUP BY 1),
g AS (SELECT sum(c) AS tot FROM ct),
scored AS (
  SELECT ct.cell, ct.w, ct.c, {_CTFIDF_SQL} AS ctfidf_micro
  FROM ct JOIN tc USING (cell) JOIN ft USING (w) CROSS JOIN g
)
SELECT CAST(cell AS BIGINT) AS cluster_id, w AS token,
       CAST(c AS BIGINT) AS tok_count, ctfidf_micro,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY cell
                               ORDER BY ctfidf_micro DESC, w) AS rnk
  FROM scored
)
WHERE rnk <= {TOPIC_TOP_WORDS}""")


@q("corpus_topic_keywords", _topic_keywords_oracle_sql())
def corpus_topic_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-TF-IDF keywords per topic cluster (the BERTopic class-based
    TF-IDF): for each of the {TOPIC_K} k-means topic slices, the
    {TOPIC_TOP_WORDS} tokens with the highest
    (tf within cluster) · ln(1 + avg-cluster-mass / corpus-tf) — the
    human-readable topic labels a curation report prints beside the
    cluster sizes.

    Scale path: reuses the memoized topic codebook (assignments cost
    one broadcast-codebook pass over the cached feature frame); the
    keyword table derives from ONE (cluster, token) aggregate of the
    exploded corpus — |clusters|×|vocab| rows max, with the per-cluster
    and per-token marginals broadcast back onto it (k rows and |vocab|
    rows respectively). The final top-k is a bounded per-cluster
    window. Exactness: integer counts everywhere; the score quantizes
    to int64 micros from one shared IEEE expression before ranking,
    ties broken by token."""
    from pyspark.sql import Window

    from .text import tokens as _tokens

    vectors = _topic_vectors(spark, sf_dir)
    centroids = cached_scalar(
        spark, sf_dir, f"topic_codebook_k{TOPIC_K}_b{TOPIC_BUCKETS}",
        lambda: kmeans_fit(vectors, k=TOPIC_K, iters=3))
    assigned = assign_cells(vectors, centroids) \
        .select(F.col("id").alias("doc_id"), "cell")
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    tok = d.select("doc_id", F.explode(_tokens("text")).alias("w"))
    ct = (tok.join(assigned, "doc_id")
          .groupBy("cell", "w").agg(F.count(F.lit(1)).alias("c"))
          .cache())
    tc = ct.groupBy("cell").agg(F.sum("c").alias("tot_c"))
    ft = ct.groupBy("w").agg(F.sum("c").alias("f"))
    g = ct.agg(F.sum("c").alias("tot"))
    scored = (ct.join(F.broadcast(tc), "cell")
              .join(ft, "w")
              .crossJoin(F.broadcast(g))
              .select("cell", "w", "c",
                      F.expr(_CTFIDF_SQL).alias("ctfidf_micro")))
    w_rank = Window.partitionBy("cell").orderBy(
        F.col("ctfidf_micro").desc(), F.col("w"))
    return (scored.withColumn("rnk", F.row_number().over(w_rank))
            .filter(F.col("rnk") <= TOPIC_TOP_WORDS)
            .select(F.col("cell").cast("long").alias("cluster_id"),
                    F.col("w").alias("token"),
                    F.col("c").cast("long").alias("tok_count"),
                    "ctfidf_micro",
                    F.col("rnk").cast("long").alias("rnk")))


# ---------------------------------------------------------------------------
# IVF index health: cell-occupancy balance report
# ---------------------------------------------------------------------------


def _cell_balance_oracle_sql(k: int = 8, iters: int = 3) -> str:
    return ("WITH " + _kmeans_ctes(k, iters) + """,
pc AS (SELECT cell, count(*) AS n FROM asgfin GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(n) AS BIGINT) AS n_vectors,
         CAST(max(n) AS BIGINT) AS max_cell,
         CAST(min(n) AS BIGINT) AS min_cell,
         sum(CAST(n AS HUGEINT) * n) AS sum_sq
  FROM pc
)
SELECT n_cells, n_vectors, max_cell, min_cell,
       CAST(CAST(max_cell AS HUGEINT) * n_cells * 1000000
            // nullif(n_vectors, 0) AS BIGINT) AS imbalance_micro,
       CAST(sum_sq * 1000000
            // nullif(CAST(n_vectors AS HUGEINT) * n_vectors, 0)
            AS BIGINT) AS expected_scan_ppm
FROM s""")


@q("similarity_ivf_cell_balance", _cell_balance_oracle_sql())
def similarity_ivf_cell_balance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """IVF index HEALTH report: cell-occupancy balance of the learned
    coarse quantizer. ``imbalance_micro`` = max-cell / mean-cell size
    (1e6 = perfectly balanced — the straggler factor of an nprobe=1
    scan); ``expected_scan_ppm`` = Σ(nᵢ/N)² — the expected fraction of
    the corpus a query scans when queries distribute like the data
    (the quantity FAISS's imbalance_factor monitors). An operator runs
    this BEFORE shipping a codebook: a hot cell both slows every probe
    that lands in it and concentrates shuffle skew.

    Scale path: assignment is the broadcast-codebook zero-shuffle map;
    the report is one k-row groupBy + a 1-row fold — bounded by k, not
    the corpus. Exactness: int64 counts; the sum-of-squares and both
    ratio numerators/denominators are widened past int64 on BOTH
    engines (ADVICE r7 — int64 would silently wrap past ~3e9 vectors
    on Spark while DuckDB raises, so the engines would diverge instead
    of both failing loudly) — DECIMAL(38,0) + truncating ``DIV`` on
    Spark, HUGEINT + ``//`` on DuckDB. The DuckDB side must NOT widen
    through DECIMAL: DuckDB's ``//`` on DECIMAL operands true-divides
    and the BIGINT cast then ROUNDS, so a quotient with fraction ≥ .5
    would come back one higher than the exact floor both integer paths
    compute (caught by similarity_incremental_ivf in r8).
    """
    cb = fitted_codebook(spark, sf_dir)
    asg = assign_cells(_quantized_vectors(spark, sf_dir), cb)
    pc = asg.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    s = pc.agg(F.count(F.lit(1)).cast("long").alias("n_cells"),
               F.sum("n").cast("long").alias("n_vectors"),
               F.max("n").cast("long").alias("max_cell"),
               F.min("n").cast("long").alias("min_cell"),
               F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
               .cast("decimal(38,0)").alias("sum_sq"))
    return s.select(
        "n_cells", "n_vectors", "max_cell", "min_cell",
        F.expr("CAST(CAST(max_cell AS DECIMAL(38,0)) * n_cells * 1000000"
               " DIV nullif(n_vectors, 0) AS BIGINT)")
        .alias("imbalance_micro"),
        F.expr("CAST(sum_sq * 1000000"
               " DIV nullif(CAST(n_vectors AS DECIMAL(38,0)) * n_vectors, 0)"
               " AS BIGINT)")
        .alias("expected_scan_ppm"))


# ---------------------------------------------------------------------------
# index REBUILD staleness: saved codebook vs fresh codebook on drifted data
# ---------------------------------------------------------------------------

_DRIFT_MOD = 8  # the drift increment: vec_id % 8 == 0 arrived AFTER the
# saved codebook was trained (the same batch split the incremental-LSH
# dedup uses, dedup.py _INC_MOD — one coherent "daily increment" story)


def _stale_codebook(spark: SparkSession, sf_dir: str,
                    k: int = 8, iters: int = 3) -> list[tuple[int, list[int]]]:
    """The SAVED codebook: trained before the drift increment arrived —
    i.e. fit on vec_id % {_DRIFT_MOD} != 0 only (same Lloyd recipe,
    init = first k of the OLD ids). Memoized like every artifact."""
    return cached_scalar(
        spark, sf_dir, f"kmeans_codebook_stale_k{k}_i{iters}",
        lambda: kmeans_fit(
            _quantized_vectors(spark, sf_dir)
            .filter(F.col("id") % _DRIFT_MOD != 0), k=k, iters=iters))


def _prefixed_kmeans_ctes(prefix: str, k: int = 8, iters: int = 3,
                          dims_sql: str | None = None,
                          ids_sql: str = "SELECT vec_id FROM embeddings",
                          ) -> str:
    """``_kmeans_ctes`` with every CTE name (and the d2 distance column)
    prefixed, so TWO Lloyd chains — e.g. a stale fit and a fresh fit —
    can coexist in one WITH clause without name collisions."""
    import re as _re

    sql = _kmeans_ctes(k, iters, dims_sql, ids_sql)
    names = (["dims", "init", "dfin", "asgfin", "d2"]
             + [f"cent{i}" for i in range(iters + 1)]
             + [f"d{i}" for i in range(1, iters + 1)]
             + [f"asg{i}" for i in range(1, iters + 1)])
    for n in sorted(set(names), key=len, reverse=True):
        sql = _re.sub(rf"\b{n}\b", prefix + n, sql)
    return sql


def _staleness_oracle_sql(k: int = 8, iters: int = 3, nprobe: int = 2,
                          topk: int = RECALL_K) -> str:
    cos = _QCOS
    old = f"vec_id % {_DRIFT_MOD} <> 0"
    stale_dims = f"""SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {old}"""
    chains = (_kmeans_ctes(k, iters) + ",\n"
              + _prefixed_kmeans_ctes(
                  "st", k, iters, dims_sql=stale_dims,
                  ids_sql=f"SELECT vec_id FROM embeddings WHERE {old}"))

    def probe_approx(tag: str, dfin: str, d2: str, asgfin: str) -> str:
        return f"""probe_{tag} AS (
  SELECT vec_id AS query_id, cid AS probe_cell
  FROM {dfin} WHERE vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY {d2}, cid)
          <= {nprobe}
),
approx_{tag} AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM probe_{tag} p
  JOIN {asgfin} c ON c.cell = p.probe_cell AND c.vec_id <> p.query_id
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
  QUALIFY row_number() OVER (PARTITION BY p.query_id
                             ORDER BY cosine DESC, neighbor_id) <= {topk}
),
hpq_{tag} AS (
  SELECT b.query_id, count(*) AS n
  FROM brute b JOIN approx_{tag} x USING (query_id, neighbor_id)
  GROUP BY 1
)"""

    # under the STALE codebook, the FULL corpus (old + drifted) is
    # assigned to the saved centroids: one extra assignment CTE over
    # stcent{iters} (the saved codebook), mirroring engine serving
    stale_full_asg = f"""stfull_d AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS dist2
  FROM dims v JOIN stcent{iters} c USING (dim)
  GROUP BY 1, 2
),
stfull_probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell
  FROM stfull_d WHERE vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid)
          <= {nprobe}
),
stfull_asg AS (
  SELECT vec_id, cid AS cell FROM stfull_d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) = 1
)"""
    return f"""WITH {chains},
{_QNN_CTES},
brute AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {cos} AS cosine
  FROM qnn a JOIN qnn b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY a.vec_id
                             ORDER BY cosine DESC, b.vec_id) <= {topk}
),
{stale_full_asg},
approx_stale AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM stfull_probe p
  JOIN stfull_asg c ON c.cell = p.probe_cell AND c.vec_id <> p.query_id
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
  QUALIFY row_number() OVER (PARTITION BY p.query_id
                             ORDER BY cosine DESC, neighbor_id) <= {topk}
),
hpq_stale AS (
  SELECT b.query_id, count(*) AS n
  FROM brute b JOIN approx_stale x USING (query_id, neighbor_id)
  GROUP BY 1
),
{probe_approx("fresh", "dfin", "d2", "asgfin")},
per_q AS (
  SELECT q.query_id, coalesce(f.n, 0) AS nf, coalesce(s.n, 0) AS ns
  FROM (SELECT DISTINCT query_id FROM brute) q
  LEFT JOIN hpq_fresh f USING (query_id)
  LEFT JOIN hpq_stale s USING (query_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST({topk} AS BIGINT) AS k,
       CAST(sum(ns) AS BIGINT) AS hits_stale,
       CAST(sum(nf) AS BIGINT) AS hits_fresh,
       CAST(CAST(sum(ns) AS BIGINT) * 1000000
            // ({topk} * count(*)) AS BIGINT) AS recall_stale_micro,
       CAST(CAST(sum(nf) AS BIGINT) * 1000000
            // ({topk} * count(*)) AS BIGINT) AS recall_fresh_micro,
       CAST(CAST(sum(nf) AS BIGINT) * 1000000 // ({topk} * count(*))
            - CAST(sum(ns) AS BIGINT) * 1000000 // ({topk} * count(*))
            AS BIGINT) AS staleness_gap_micro
FROM per_q"""


@q("similarity_index_staleness", _staleness_oracle_sql())
def similarity_index_staleness(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Index REBUILD staleness check (VERDICT r7 item 7, pairing with
    the persisted-LSH incremental dedup): recall@{RECALL_K} of the
    SAVED codebook — trained before the drift increment
    (vec_id % {_DRIFT_MOD} == 0) arrived — versus a FRESH codebook
    retrained on everything, both serving nprobe=2 IVF search over the
    full drifted corpus against the exact brute-force ground truth.
    ``staleness_gap_micro`` is the rebuild trigger a production vector
    store monitors: when the gap exceeds the SLO, re-fit and re-ship
    the codebook (save_codebook/load_codebook lifecycle).

    Scale path: both searches inherit the IVF layout (broadcast
    codebook assignment, probe-pruned candidate join, bounded query
    set); the comparison itself is queries×k rows. Exactness: hit
    counts are integers, recalls are integer micro floor-divisions,
    the gap subtracts two already-floored micros (never a float);
    every top-k is totally ordered by (cosine DESC, neighbor_id)."""
    from pyspark.sql import Window

    from .similarity import similarity_topk_brute

    wq = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("neighbor_id"))
    brute = (similarity_topk_brute(spark, sf_dir)
             .withColumn("__rn", F.row_number().over(wq))
             .filter(F.col("__rn") <= RECALL_K)
             .select("query_id", "neighbor_id"))
    hpq = {}
    for tag, cb in (("stale", _stale_codebook(spark, sf_dir)),
                    ("fresh", fitted_codebook(spark, sf_dir))):
        approx = (_ivf_nprobe_topk(spark, sf_dir, nprobe=2, topk=RECALL_K,
                                   centroids=cb)
                  .select("query_id", "neighbor_id"))
        hpq[tag] = (brute.join(approx, ["query_id", "neighbor_id"])
                    .groupBy("query_id")
                    .agg(F.count(F.lit(1)).alias(f"n_{tag}")))
    per_q = (brute.select("query_id").distinct()
             .join(hpq["fresh"], "query_id", "left")
             .join(hpq["stale"], "query_id", "left")
             .select("query_id",
                     F.coalesce("n_fresh", F.lit(0)).alias("nf"),
                     F.coalesce("n_stale", F.lit(0)).alias("ns")))
    return (per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(RECALL_K).cast("long").alias("k"),
        F.sum("ns").cast("long").alias("hits_stale"),
        F.sum("nf").cast("long").alias("hits_fresh"))
        .select(
            "n_queries", "k", "hits_stale", "hits_fresh",
            F.expr(f"CAST(hits_stale * 1000000"
                   f" DIV ({RECALL_K} * n_queries) AS BIGINT)")
            .alias("recall_stale_micro"),
            F.expr(f"CAST(hits_fresh * 1000000"
                   f" DIV ({RECALL_K} * n_queries) AS BIGINT)")
            .alias("recall_fresh_micro"),
            F.expr(f"CAST(hits_fresh * 1000000 DIV ({RECALL_K} * n_queries)"
                   f" - hits_stale * 1000000 DIV ({RECALL_K} * n_queries)"
                   f" AS BIGINT)")
            .alias("staleness_gap_micro")))


# ---------------------------------------------------------------------------
# incremental vector INGEST against a persisted cell-partitioned IVF index
# ---------------------------------------------------------------------------


def _ivf_index_path(sf_dir: str) -> str:
    import hashlib
    import os
    from ..core.session import scratch_root
    root = scratch_root()
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(root, "ivf_index", key)


def _live_root(path: str, meta_name: str) -> str:
    """Resolve the LIVE root of a versioned-pointer artifact at
    ``path`` — the layout every rebuildable index family shares
    (IVF here, PQ in pq.py). Two layouts:

    - flat (what a fresh build writes): the artifact tables directly
      under ``path`` — the root is ``path`` itself;
    - versioned (what a rebuild publishes): each generation's tables
      live together under one ``v<N>/`` directory and a tiny
      ``<meta_name>`` pointer names the live one. Publishing a
      rebuild is then ONE atomic ``os.replace`` of the pointer —
      there is no window where a new codebook serves against old
      assignments (the two-rename swap's mixed-artifact crash
      window, VERDICT r9)."""
    import json
    import os
    meta = os.path.join(path, meta_name)
    if os.path.exists(meta):
        with open(meta) as f:
            return os.path.join(path, json.load(f)["live"])
    return path


def publish_generation(path: str, meta_name: str, new_name: str) -> None:
    """Publish a staged ``v<N>/`` generation as live — the ONE atomic
    step of every rebuild swap: fsync'd temp write + ``os.replace`` of
    the pointer file. A crash strictly before the replace leaves the
    old generation live; strictly after, the new one. Never both."""
    import json
    import os
    ptr = os.path.join(path, meta_name)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"live": new_name}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr)


def stale_generation_dirs(path: str, meta_name: str,
                          flat_tables: tuple[str, ...]) -> list[str]:
    """GC census for a versioned-pointer artifact (VERDICT r10 #4):
    every top-level directory the live pointer does NOT reference —
    retired ``v<N>`` generations (a crash between publish and retire
    strands one forever otherwise) and the flat-layout tables shadowed
    by the first versioned publish. Empty while the index is still
    flat: without a pointer, the flat tables ARE the live artifact.
    Reaped (``_retire_dirs``) from rebuild and compaction, so one
    successful maintenance pass after any crash leaves zero debris.

    CONCURRENCY CONTRACT (ADVICE r11 #2): maintenance on one artifact
    is SINGLE-WRITER — this census treats ANY unreferenced ``v<N>`` as
    garbage, so a compaction running concurrently with an in-flight
    rebuild would reap the generation being STAGED. That is safe in
    the shipped topology because every maintenance entry point
    (rebuild_*/compact_*) runs inside the artifact's one streaming
    maintainer's quiesced foreachBatch — batches of one query are
    serialized by Structured Streaming, so a stage dir can never
    coexist with another writer's GC pass. A future SECOND maintainer
    on the same artifact must serialize maintenance externally (or
    teach this census to skip the max-``v<N>``+1 candidate dir) before
    relying on it."""
    import json
    import os
    import re
    meta = os.path.join(path, meta_name)
    if not os.path.exists(meta):
        return []
    with open(meta) as f:
        live = json.load(f)["live"]
    out = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if entry == live or not os.path.isdir(full):
            continue
        if re.fullmatch(r"v\d+", entry) or entry in flat_tables:
            out.append(full)
    return out


_IVF_META = "_ivf_live.json"
_IVF_FLAT_TABLES = ("codebook", "cells")


def _ivf_live_root(path: str) -> str:
    """IVF instance of the versioned-pointer resolver (see _live_root)."""
    return _live_root(path, _IVF_META)


def ivf_codebook_path(path: str) -> str:
    """Live codebook table of the index at ``path`` (layout-aware —
    always read the artifact through this, never compose the subpath
    by hand: a rebuilt index is versioned)."""
    return _ivf_live_root(path) + "/codebook"


def ivf_cells_path(path: str) -> str:
    """Live cells table of the index at ``path`` (layout-aware)."""
    return _ivf_live_root(path) + "/cells"


def build_ivf_index(spark: SparkSession, sf_dir: str,
                    path: str | None = None) -> str:
    """Build and PERSIST the base-corpus IVF index — the other half of
    the save_codebook/load_codebook artifact lifecycle: a vector store
    ships (a) the trained coarse quantizer and (b) the corpus assigned
    to its cells, laid out so that probes and ingest touch slices, not
    the corpus.

    Two parquet tables under ``path``:
      codebook/  the k-row (cid, cvec) coarse quantizer, trained on the
                 BASE split only (vec_id % {_DRIFT_MOD} != 0 — the
                 vectors that existed when the index was built)
      cells/     (vec_id, q_err, vec) PARTITIONED BY (cell,
                 ingest_batch), with the quantized vector INLINE (the
                 standard IVF layout: a search reads only its probed
                 cells' files and has the candidate payload right
                 there — no join back to the corpus); censuses project
                 just the partition columns, so parquet never reads
                 the vector pages for them. The build owns
                 ingest_batch=-1; each streaming append owns its own
                 batch partition so re-runs replace instead of
                 duplicating (the dedup.build_lsh_index layout).
    """
    import os
    import shutil
    path = path or _ivf_index_path(sf_dir)
    # a BUILD is a full rewrite: wipe the whole root first so a stale
    # version pointer / retired generation from a prior rebuild at the
    # same path can never shadow the fresh flat layout (the STATIC
    # partitionOverwriteMode rule, applied at directory level)
    if os.path.exists(path):
        shutil.rmtree(path)
    cb = _stale_codebook(spark, sf_dir)  # = the base-trained codebook
    save_codebook(spark, path + "/codebook", cb)
    base = (_quantized_vectors(spark, sf_dir)
            .filter(F.col("id") % _DRIFT_MOD != 0))
    (assign_cells(base, cb)
     .select(F.col("id").alias("vec_id"), "cell", "q_err", "vec")
     .withColumn("ingest_batch", F.lit(-1))
     .repartition("cell")  # one writer per cell; at production nlist
     # (thousands of cells) this is a balanced exchange, not a fan-in
     # STATIC overwrite: a (re)build must wipe the whole directory even
     # if the session default is dynamic (see build_lsh_index)
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("cell", "ingest_batch")
     .parquet(path + "/cells"))
    return path


def append_to_ivf_index(spark: SparkSession, path: str,
                        vectors: DataFrame,
                        batch_id: int | None = None) -> None:
    """MAINTAIN the persisted index: assign a new batch with the SAVED
    codebook (load_codebook — never retrain on ingest) and append its
    (vec_id, cell, q_err) rows to the cell-partitioned table — the
    daily-job half of the lifecycle (build once → per batch: assign,
    report, APPEND), mirroring dedup.append_to_lsh_index.

    With ``batch_id`` the write is IDEMPOTENT: the batch owns its
    ``ingest_batch=<id>`` partitions and a re-run REPLACES them via
    dynamic partition overwrite (cell assignment is a deterministic
    function of the saved codebook, so a re-run of the same batch
    touches exactly the same (cell, batch) partitions). Without it
    (ad-hoc maintenance), rows land in ingest_batch=-2 as a plain
    append."""
    cb = load_codebook(spark, ivf_codebook_path(path))
    tag = -2 if batch_id is None else int(batch_id)
    mode = "append" if batch_id is None else "overwrite"
    if batch_id is not None:
        # purge the batch's partitions BEFORE the dynamic-overwrite
        # write: dynamic overwrite alone is only idempotent while cell
        # assignment stays deterministic — after a mid-stream rebuild
        # swaps the codebook (auto-rebuild hook, streaming/ivf_ingest),
        # a retried batch would land in DIFFERENT cells and strand its
        # pre-crash rows under the old cells. The purge makes a batch
        # re-run exact under ANY codebook. (Local-FS recipe; the
        # Delta/MERGE table backend's transactional REPLACE WHERE is
        # the cluster equivalent — see sources/tables.py.)
        _purge_batch_partitions(ivf_cells_path(path), tag)
    (assign_cells(vectors, cb)
     .select(F.col("id").alias("vec_id"), "cell", "q_err", "vec")
     .withColumn("ingest_batch", F.lit(tag))
     .repartition("cell")
     .write.mode(mode).option("partitionOverwriteMode", "dynamic")
     .partitionBy("cell", "ingest_batch").parquet(ivf_cells_path(path)))


def _purge_batch_partitions(cells_dir: str, batch_id: int) -> None:
    """Remove every (cell=*, ingest_batch=batch_id) partition directory
    — the filesystem half of an idempotent batch re-run (see
    append_to_ivf_index). Bounded work: one glob over the k cell
    directories, footer-free."""
    import glob
    import os
    import shutil
    for d in glob.glob(os.path.join(
            cells_dir, "cell=*", f"ingest_batch={int(batch_id)}")):
        shutil.rmtree(d, ignore_errors=True)


def _inc_ivf_oracle_sql(k: int = 8, iters: int = 3) -> str:
    base = f"vec_id % {_DRIFT_MOD} <> 0"
    base_dims = f"""SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {base}"""
    chain = _prefixed_kmeans_ctes(
        "b", k, iters, dims_sql=base_dims,
        ids_sql=f"SELECT vec_id FROM embeddings WHERE {base}")
    return f"""WITH {chain},
idims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE vec_id % {_DRIFT_MOD} = 0
),
inc_d AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS dist2
  FROM idims v JOIN bcent{iters} c USING (dim)
  GROUP BY 1, 2
),
inc_asg AS (
  SELECT vec_id, cid AS cell, dist2 AS q_err FROM inc_d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) = 1
),
pb AS (SELECT cell, count(*) AS n_base FROM basgfin GROUP BY 1),
pi AS (SELECT cell, count(*) AS n_added,
              sum(CAST(q_err AS HUGEINT)) AS sqe
       FROM inc_asg GROUP BY 1),
cells AS (SELECT DISTINCT cid AS cell FROM bcent{iters})
SELECT CAST(c.cell AS BIGINT) AS cell,
       CAST(coalesce(b.n_base, 0) AS BIGINT) AS n_base,
       CAST(coalesce(i.n_added, 0) AS BIGINT) AS n_added,
       CAST(coalesce(b.n_base, 0) + coalesce(i.n_added, 0) AS BIGINT)
         AS n_total,
       CAST(coalesce(CAST(coalesce(i.n_added, 0) AS HUGEINT) * 1000000
            // nullif(coalesce(b.n_base, 0) + coalesce(i.n_added, 0), 0), 0)
            AS BIGINT) AS added_share_ppm,
       CAST(coalesce(i.sqe // nullif(i.n_added, 0), 0) AS BIGINT)
         AS avg_q_err_added
FROM cells c
LEFT JOIN pb b USING (cell)
LEFT JOIN pi i USING (cell)
ORDER BY cell"""


@q("similarity_incremental_ivf", _inc_ivf_oracle_sql())
def similarity_incremental_ivf(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Incremental vector INGEST report against the PERSISTED IVF index
    (the vector twin of dedup_incremental_lsh, VERDICT r7 item 7): the
    drift increment (vec_id % {_DRIFT_MOD} == 0 — the batch that
    arrived after the index was built) is assigned cells by the SAVED
    base-trained codebook, loaded from the artifact — never retrained —
    and the report shows, per cell, how the batch would land: base
    occupancy (read from the index artifact, not recomputed), added
    count, post-ingest total, the increment's share, and the mean
    quantization error of the added vectors (the drift signal: rising
    q_err on new data is the same rebuild trigger
    similarity_index_staleness measures from the recall side).

    Scale path: increment assignment is the zero-shuffle broadcast-
    codebook map over ONLY the new batch; base occupancy is a census of
    the index's partition column (k-row result, footer-sized IO); every
    join after the two k-row aggregates carries k rows. The actual
    append is ``append_to_ivf_index`` (exercised in
    tests/test_incremental_ivf.py) — the report itself is idempotent
    and never mutates the artifact.

    Exactness: int64 counts; the share numerator and the q_err sum are
    widened past int64 before the floor-division (the ADVICE-r7 rule —
    int64 totals wrap past ~1e18 on Spark while DuckDB raises):
    DECIMAL(38,0) + truncating ``DIV`` on Spark, HUGEINT + ``//`` on
    DuckDB — NOT DuckDB DECIMAL, whose ``//`` true-divides so the
    BIGINT cast rounds instead of flooring (see the cell-balance
    docstring). The oracle re-derives the artifact from the base split
    (the index is a deterministic function of it), so probing the
    artifact and recomputing agree bit-for-bit."""
    path = cached_scalar(spark, sf_dir, "ivf_index_path",
                         lambda: build_ivf_index(spark, sf_dir))
    cb = load_codebook(spark, ivf_codebook_path(path))
    inc = (_quantized_vectors(spark, sf_dir)
           .filter(F.col("id") % _DRIFT_MOD == 0))
    pi = (assign_cells(inc, cb)
          .groupBy("cell")
          .agg(F.count(F.lit(1)).alias("n_added"),
               F.sum(F.col("q_err").cast("decimal(38,0)")).alias("sqe")))
    pb = (spark.read.parquet(ivf_cells_path(path))
          .groupBy("cell").agg(F.count(F.lit(1)).alias("n_base")))
    cells = local_frame(spark, [(int(cid),) for cid, _ in cb],
                                  "cell int")
    # pb/pi are k-row cell censuses — bounded by the codebook size by
    # construction (never by the corpus), so broadcasting is safe at
    # any scale and keeps the k-row assembly joins shuffle-free
    return (cells.join(F.broadcast(pb), "cell", "left")
            .join(F.broadcast(pi), "cell", "left")
            .select(F.col("cell").cast("long").alias("cell"),
                    F.coalesce("n_base", F.lit(0)).cast("long")
                    .alias("n_base"),
                    F.coalesce("n_added", F.lit(0)).cast("long")
                    .alias("n_added"),
                    F.col("sqe"))
            .withColumn("n_total",
                        (F.col("n_base") + F.col("n_added")).cast("long"))
            .select(
                "cell", "n_base", "n_added", "n_total",
                F.expr("CAST(coalesce(CAST(n_added AS DECIMAL(38,0))"
                       " * 1000000 DIV nullif(n_total, 0), 0) AS BIGINT)")
                .alias("added_share_ppm"),
                F.expr("CAST(coalesce(sqe DIV nullif(n_added, 0), 0)"
                       " AS BIGINT)").alias("avg_q_err_added"))
            .orderBy("cell"))


# ---------------------------------------------------------------------------
# ANN search SERVED from the persisted IVF index (partition-pruned probe)
# ---------------------------------------------------------------------------

_SERVE_NPROBE = 2
_SERVE_TOPK = 3
_SERVE_QBOUND = 64  # query batch: the first increment vectors
# (vec_id % _DRIFT_MOD == 0 AND vec_id < 64 → ≤ 8 queries), i.e. fresh
# arrivals searching the already-indexed base — the online-serving twin
# of similarity_incremental_ivf's ingest report


def _ivf_serve_oracle_sql(k: int = 8, iters: int = 3,
                          nprobe: int = _SERVE_NPROBE,
                          topk: int = _SERVE_TOPK) -> str:
    base = f"vec_id % {_DRIFT_MOD} <> 0"
    base_dims = f"""SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {base}"""
    chain = _prefixed_kmeans_ctes(
        "b", k, iters, dims_sql=base_dims,
        ids_sql=f"SELECT vec_id FROM embeddings WHERE {base}")
    return f"""WITH {chain},
qdims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings
  WHERE vec_id % {_DRIFT_MOD} = 0 AND vec_id < {_SERVE_QBOUND}
),
qd AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS dist2
  FROM qdims v JOIN bcent{iters} c USING (dim)
  GROUP BY 1, 2
),
probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell FROM qd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid)
          <= {nprobe}
),
qn AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {SCALE}.0) AS BIGINT)) AS qv
  FROM embeddings
),
qnn AS (SELECT vec_id, qv,
               list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS nn
        FROM qn),
pairs AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
           / sqrt(a.nn * b.nn) AS cosine
  FROM probe p
  JOIN basgfin c ON c.cell = p.probe_cell
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
)
SELECT query_id, neighbor_id, cosine FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= {topk}"""


@q("similarity_ivf_serve_topk", _ivf_serve_oracle_sql())
def similarity_ivf_serve_topk(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """ANN top-{k} SERVED from the persisted IVF index — the online
    half of the r8 serving family (similarity_incremental_ivf is the
    ingest report, this is the search): a bounded batch of fresh
    arrivals (the first ≤ 8 increment vectors) probes its
    nprobe={_SERVE_NPROBE} nearest cells under the SAVED base-trained
    codebook and reads ONLY those cells' files of the index — the
    candidate vectors are INLINE in the posting rows (the standard IVF
    layout), so the corpus is never joined, scanned, or re-assigned at
    serve time.

    Scale path: the codebook load is k rows; probe-cell selection is
    the zero-shuffle broadcast-codebook map over the query batch; the
    probed-cell set (≤ queries × nprobe ids — a hard-bounded collect)
    pushes into the index read as a PARTITION filter, so serve IO is
    nprobe/nlist of the index; the bounded query frame broadcasts into
    the pruned scan and the per-query top-k window is keyed on
    query_id. Each candidate joins at most once per query — its
    assigned cell is unique.

    Exactness: quantized-int64 cosine (the module convention — exact
    order-independent integer dots surfaced as doubles, then the same
    ``dot / sqrt(nn_a * nn_b)`` IEEE tree on both engines); the oracle
    re-derives the index from the base split, which the artifact is a
    deterministic function of; top-k totally ordered by
    (cosine DESC, neighbor_id)."""
    path = cached_scalar(spark, sf_dir, "ivf_index_path",
                         lambda: build_ivf_index(spark, sf_dir))
    return ivf_serve(spark, sf_dir, path)


def ivf_serve(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Serve the fresh-arrival query batch from the IVF index at
    ``path`` — the explicit-path core of similarity_ivf_serve_topk,
    shared by the base-index catalog query and the maintained-index
    lifecycle gate (similarity_ivf_incremental_serve)."""
    from pyspark.sql import Window

    from .similarity import qdot

    cb = load_codebook(spark, ivf_codebook_path(path))
    qv = (_quantized_vectors(spark, sf_dir)
          .filter((F.col("id") % _DRIFT_MOD == 0)
                  & (F.col("id") < _SERVE_QBOUND)))
    probes = probe_cells(qv, cb, nprobe=_SERVE_NPROBE)
    # hard-bounded collect: ≤ |query batch| × nprobe cell ids
    probed = sorted({r["probe_cell"] for r in
                     probes.select("probe_cell").distinct().collect()})
    idx = (spark.read.parquet(ivf_cells_path(path))
           .filter(F.col("cell").isin(probed))  # partition-pruned
           .select(F.col("vec_id").alias("neighbor_id"), "cell",
                   F.col("vec").alias("c_vec")))
    qb = probes.select(F.col("id").alias("query_id"),
                       F.col("probe_cell").alias("cell"),
                       F.col("vec").alias("q_vec"))
    cosine = (qdot("q_vec", "c_vec")
              / F.sqrt(qdot("q_vec", "q_vec") * qdot("c_vec", "c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (idx.join(F.broadcast(qb), "cell")
            .select("query_id", "neighbor_id", cosine.alias("cosine"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= _SERVE_TOPK)
            .drop("__rn"))


def _fold_batch_partitions(spark: SparkSession, live: str,
                           exclude_batch: int | None = None) -> None:
    """Rename-aside fold of a (cell, ingest_batch)-partitioned table's
    batch partitions into the base (-1) — the compaction core shared
    by the IVF cells table and the PQ codes table (pq.py).
    ``exclude_batch`` keeps the in-flight batch's partitions unfolded
    (the auto-compaction hook's retry contract — see
    dedup.compact_lsh_index)."""
    import os
    import shutil

    from ..sources.tables import folded_batch_tag

    df = (spark.read.parquet(live)
          .withColumn("ingest_batch",
                      folded_batch_tag("ingest_batch", exclude_batch))
          .repartition("cell"))
    tmp, old = live + ".compact.tmp", live + ".compact.old"
    df.write.mode("overwrite").partitionBy("cell", "ingest_batch") \
        .parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)


def compact_ivf_index(spark: SparkSession, path: str,
                      exclude_batch: int | None = None) -> None:
    """Background-merge the cells table to one file set per cell —
    every append_to_ivf_index adds a file per touched cell, so after K
    ingest batches an nprobe search opens K files per probed cell for
    rows that could be one run. ``exclude_batch`` keeps the in-flight
    batch's partitions unfolded (the auto-compaction hook's retry
    contract — see dedup.compact_lsh_index). Same rename-aside safety
    and same no-concurrent-append caveat. Also reaps stranded
    generation debris (the rebuild-crash GC — VERDICT r10 #4)."""
    _fold_batch_partitions(spark, ivf_cells_path(path), exclude_batch)
    _retire_dirs(stale_generation_dirs(path, _IVF_META, _IVF_FLAT_TABLES))


def _ivf_inc_serve_oracle_sql(k: int = 8, iters: int = 3,
                              nprobe: int = _SERVE_NPROBE,
                              topk: int = _SERVE_TOPK) -> str:
    base = f"vec_id % {_DRIFT_MOD} <> 0"
    appended = (f"vec_id % {_DRIFT_MOD} = 0"
                f" AND vec_id >= {_SERVE_QBOUND}")
    base_dims = f"""SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {base}"""
    chain = _prefixed_kmeans_ctes(
        "b", k, iters, dims_sql=base_dims,
        ids_sql=f"SELECT vec_id FROM embeddings WHERE {base}")
    return f"""WITH {chain},
incdims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {appended}
),
incd AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS d2
  FROM incdims v JOIN bcent{iters} c USING (dim)
  GROUP BY 1, 2
),
incasg AS (
  SELECT vec_id, cid AS cell FROM incd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
),
cand AS (
  SELECT vec_id, cell FROM basgfin
  UNION ALL
  SELECT vec_id, cell FROM incasg
),
qdims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings
  WHERE vec_id % {_DRIFT_MOD} = 0 AND vec_id < {_SERVE_QBOUND}
),
qd AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS dist2
  FROM qdims v JOIN bcent{iters} c USING (dim)
  GROUP BY 1, 2
),
probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell FROM qd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid)
          <= {nprobe}
),
qn AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {SCALE}.0) AS BIGINT)) AS qv
  FROM embeddings
),
qnn AS (SELECT vec_id, qv,
               list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS nn
        FROM qn),
pairs AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
           / sqrt(a.nn * b.nn) AS cosine
  FROM probe p
  JOIN cand c ON c.cell = p.probe_cell
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
)
SELECT query_id, neighbor_id, cosine FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= {topk}"""


@q("similarity_ivf_incremental_serve", _ivf_inc_serve_oracle_sql())
def similarity_ivf_incremental_serve(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """ANN top-{k} served from a MAINTAINED IVF index — the lifecycle
    gate for the persisted vector artifact: the index is built over the
    BASE split only, then the already-arrived increment (vec_id %
    {_DRIFT_MOD} == 0 AND vec_id >= {_SERVE_QBOUND} — yesterday's
    batches, excluding today's query batch) is APPENDED through
    ``append_to_ivf_index`` (assigned by the SAVED codebook, its own
    ingest_batch partitions) — never rebuilt or retrained — and the
    fresh query batch searches the grown artifact. The oracle
    recomputes both splits' cell assignments under the base-trained
    centroids, so a green row proves append+serve is BIT-IDENTICAL to
    a from-scratch assignment of the grown corpus: fresh arrivals can
    now match yesterday's arrivals, not just the base (compare
    similarity_ivf_serve_topk, whose neighbors are base-only). This
    certifies the maintenance path streaming/ivf_ingest.py relies on.

    Scale path: identical to similarity_ivf_serve_topk (the serve core
    is shared — bounded probe collect, partition-pruned cells read,
    inline candidate vectors, per-query top-k window); the append
    assigns only the increment. Build + append run once per session
    (memoized) — the artifact lifecycle, not the per-query cost."""
    path = cached_scalar(spark, sf_dir, "ivf_inc_index_path",
                         lambda: _build_inc_ivf_index(spark, sf_dir))
    return ivf_serve(spark, sf_dir, path)


_COMPACT_AFTER_BATCHES = 2  # a cell holding >= this many ingest
# batches' file sets is due for a background merge


def _ivf_compaction_policy_oracle_sql(k: int = 8, iters: int = 3) -> str:
    base = f"vec_id % {_DRIFT_MOD} <> 0"
    appended = (f"vec_id % {_DRIFT_MOD} = 0"
                f" AND vec_id >= {_SERVE_QBOUND}")
    base_dims = f"""SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {base}"""
    chain = _prefixed_kmeans_ctes(
        "b", k, iters, dims_sql=base_dims,
        ids_sql=f"SELECT vec_id FROM embeddings WHERE {base}")
    return f"""WITH {chain},
incdims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {appended}
),
incd AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS d2
  FROM incdims v JOIN bcent{iters} c USING (dim)
  GROUP BY 1, 2
),
incasg AS (
  SELECT vec_id, cid AS cell FROM incd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
),
pb AS (SELECT cell, count(*) AS n FROM basgfin GROUP BY 1),
pi AS (SELECT cell, count(*) AS n FROM incasg GROUP BY 1)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(coalesce(b.n, 0) + coalesce(i.n, 0) AS BIGINT) AS n_rows,
       CAST((CASE WHEN b.n IS NULL THEN 0 ELSE 1 END)
            + (CASE WHEN i.n IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_batches,
       CAST(CASE WHEN (CASE WHEN b.n IS NULL THEN 0 ELSE 1 END)
                    + (CASE WHEN i.n IS NULL THEN 0 ELSE 1 END)
                    >= {_COMPACT_AFTER_BATCHES}
            THEN 1 ELSE 0 END AS BIGINT) AS compact_due
FROM pb b
FULL OUTER JOIN pi i USING (cell)
ORDER BY cell"""


@q("similarity_ivf_compaction_policy", _ivf_compaction_policy_oracle_sql())
def similarity_ivf_compaction_policy(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Compaction SCHEDULER report for the maintained IVF index — the
    vector twin of dedup_lsh_compaction_policy: per cell, how many
    ingest batches' file sets an nprobe search would open (each append
    lays one file set per touched cell) and whether the background
    merge (compact_ivf_index) is due (>= {_COMPACT_AFTER_BATCHES}
    batch partitions). Shares the maintained artifact the incremental-
    serve gate builds (base index + one appended batch), so the report
    certifies the exact layout that serving reads.

    Scale path: a pure PARTITION-COLUMN census — the scan projects
    only (cell, ingest_batch), parquet reads footers, never vector
    rows; one k-row aggregate. Exactness: the oracle re-derives which
    cells each batch touches (base Lloyd chain + saved-codebook
    increment assignment — the artifact is a deterministic function of
    the corpus); int64 counts; total order on cell."""
    path = cached_scalar(spark, sf_dir, "ivf_inc_index_path",
                         lambda: _build_inc_ivf_index(spark, sf_dir))
    return (spark.read.parquet(ivf_cells_path(path))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.countDistinct("ingest_batch").cast("long")
                 .alias("n_batches"))
            .select(F.col("cell").cast("long").alias("cell"),
                    "n_rows", "n_batches",
                    F.when(F.col("n_batches") >= _COMPACT_AFTER_BATCHES,
                           1).otherwise(0).cast("long")
                    .alias("compact_due"))
            .orderBy("cell"))


def _build_inc_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build + one-batch append of the maintained IVF index — shared by
    similarity_ivf_incremental_serve and the compaction-policy census
    (same memo key, so one artifact serves both gates per session)."""
    p = _ivf_index_path(sf_dir) + "_inc"
    build_ivf_index(spark, sf_dir, p)
    inc = (_quantized_vectors(spark, sf_dir)
           .filter((F.col("id") % _DRIFT_MOD == 0)
                   & (F.col("id") >= _SERVE_QBOUND)))
    append_to_ivf_index(spark, p, inc, batch_id=0)
    return p


def rebuild_ivf_index(spark: SparkSession, path: str,
                      k: int = 8, iters: int = 3,
                      keep_provenance: bool = False) -> None:
    """REBUILD the persisted IVF index in place — the action the
    staleness monitor (similarity_index_staleness) triggers when the
    saved codebook's recall gap exceeds the SLO: a FRESH Lloyd fit on
    the full drifted corpus currently in the index, every vector
    re-assigned to the new cells, and both artifact tables swapped
    rename-aside. This completes the artifact's lifecycle state
    machine: build → append → serve → compact → monitor → REBUILD.

    The training set is read back from the index's own cells table —
    the artifact is self-contained (quantized vectors are inline), so a
    rebuild never re-scans or re-quantizes the source corpus, and the
    fit covers exactly what the index serves (base + every appended
    batch). Determinism: Lloyd init is the first k rows by vec_id —
    identical to a from-scratch ``kmeans_fit`` on the same vectors —
    so rebuild ≡ retrain by construction (the property the staleness
    monitor's "fresh" arm measures; proven serve-bit-identical in
    tests/test_index_rebuild.py).

    Atomicity (VERDICT r9 hardening): the new generation's codebook +
    cells are STAGED TOGETHER under one ``v<N>/`` directory, then
    published with a single ``os.replace`` of the ``_ivf_live.json``
    pointer (the bands-dir meta trick from rebuild_lsh_index, applied
    to the two-table artifact). A crash at ANY instant leaves a fully
    consistent index: before the replace, the old generation is live
    and the staged dir is invisible debris (a retry overwrites it);
    after it, the new generation is live and the retired dirs are
    debris (removed best-effort, harmless if a crash strands them —
    the pointer never references them again). There is NO window where
    a new codebook serves against old cell assignments. Same
    maintenance-window caveat as every swap: don't race a concurrent
    append. By default the rewrite folds every ingest_batch partition
    into the new base (-1) — a maintenance-window rebuild retires
    batch provenance exactly like compaction does.
    ``keep_provenance=True`` carries each row's ingest_batch through
    instead: the streaming auto-rebuild hook needs it so a batch
    retried ACROSS the swap (foreachBatch at-least-once) can still
    replace its own partitions idempotently (see
    streaming/ivf_ingest.py and append_to_ivf_index's purge)."""
    import os
    import shutil

    root = _ivf_live_root(path)
    keep = ["ingest_batch"] if keep_provenance else []
    vecs = (spark.read.parquet(root + "/cells")
            .select(F.col("vec_id").alias("id"), "vec", *keep).cache())
    cb = kmeans_fit(vecs, k=k, iters=iters)
    if root == path:  # flat (freshly built) → first versioned gen
        new_name = "v1"
        retired = [os.path.join(path, "codebook"),
                   os.path.join(path, "cells")]
    else:
        new_name = "v%d" % (int(os.path.basename(root)[1:]) + 1)
        retired = [root]
    new_root = os.path.join(path, new_name)
    if os.path.exists(new_root):  # debris of a crashed prior attempt
        shutil.rmtree(new_root)
    save_codebook(spark, new_root + "/codebook", cb)
    provenance = (F.col("ingest_batch").cast("int") if keep_provenance
                  else F.lit(-1))
    (assign_cells(vecs, cb)
     .select(F.col("id").alias("vec_id"), "cell", "q_err", "vec",
             provenance.alias("ingest_batch"))
     .repartition("cell")
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("cell", "ingest_batch").parquet(new_root + "/cells"))
    vecs.unpersist()
    # PUBLISH — the one atomic step
    publish_generation(path, _IVF_META, new_name)
    # retire the displaced generation PLUS any stranded debris of past
    # crashed swaps (the reaper: post-publish, everything the pointer
    # doesn't reference is garbage — VERDICT r10 #4)
    _retire_dirs(sorted(set(retired) | set(
        stale_generation_dirs(path, _IVF_META, _IVF_FLAT_TABLES))))


def _retire_dirs(dirs: list[str]) -> None:
    """Post-publish cleanup of the retired generation — separated out
    so the kill-between-stages test can crash exactly here and prove
    the stranded debris never affects what the pointer serves."""
    import shutil
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _ivf_rebuild_serve_oracle_sql(k: int = 8, iters: int = 3,
                                  nprobe: int = _SERVE_NPROBE,
                                  topk: int = _SERVE_TOPK) -> str:
    grown = (f"NOT (vec_id % {_DRIFT_MOD} = 0"
             f" AND vec_id < {_SERVE_QBOUND})")
    grown_dims = f"""SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings WHERE {grown}"""
    chain = _prefixed_kmeans_ctes(
        "g", k, iters, dims_sql=grown_dims,
        ids_sql=f"SELECT vec_id FROM embeddings WHERE {grown}")
    return f"""WITH {chain},
qdims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0) AS BIGINT) AS val
  FROM embeddings
  WHERE vec_id % {_DRIFT_MOD} = 0 AND vec_id < {_SERVE_QBOUND}
),
qd AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS dist2
  FROM qdims v JOIN gcent{iters} c USING (dim)
  GROUP BY 1, 2
),
probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell FROM qd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid)
          <= {nprobe}
),
qn AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {SCALE}.0) AS BIGINT)) AS qv
  FROM embeddings
),
qnn AS (SELECT vec_id, qv,
               list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS nn
        FROM qn),
pairs AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
           / sqrt(a.nn * b.nn) AS cosine
  FROM probe p
  JOIN gasgfin c ON c.cell = p.probe_cell
  JOIN qnn a ON a.vec_id = p.query_id
  JOIN qnn b ON b.vec_id = c.vec_id
)
SELECT query_id, neighbor_id, cosine FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) <= {topk}"""


@q("similarity_ivf_rebuild_serve", _ivf_rebuild_serve_oracle_sql())
def similarity_ivf_rebuild_serve(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """ANN top-{k} served from a REBUILT IVF index — the lifecycle gate
    for the staleness monitor's action (VERDICT r8 item 3): the index
    is built over the BASE split, grown by appending yesterday's
    increment (vec_id % {_DRIFT_MOD} == 0 AND vec_id >= {_SERVE_QBOUND}
    — the drift similarity_index_staleness detects), then REBUILT
    (``rebuild_ivf_index``: fresh Lloyd on the full drifted corpus read
    back from the artifact itself, rename-aside swap), and the fresh
    query batch searches the swapped artifact. The oracle runs one
    Lloyd chain over the grown corpus and probes its final assignment —
    so a green row proves rebuild ≡ retrain-from-scratch on everything
    the index holds, bit-for-bit: the recall gap the monitor measures
    closes to zero by construction after the rebuild (the "fresh" arm
    of similarity_index_staleness IS this codebook).

    Scale path: the rebuild's Lloyd iterates over the index's inline
    vectors (never re-scans the source corpus) with the broadcast-
    codebook assign + k×dim-row update of every other fit; the swap is
    two directory renames; serving is the shared partition-pruned
    ``ivf_serve`` core. Build + append + rebuild run once per session
    (memoized) — the maintenance-window lifecycle, not per-query cost."""
    def make() -> str:
        p = _ivf_index_path(sf_dir) + "_rb"
        build_ivf_index(spark, sf_dir, p)
        inc = (_quantized_vectors(spark, sf_dir)
               .filter((F.col("id") % _DRIFT_MOD == 0)
                       & (F.col("id") >= _SERVE_QBOUND)))
        append_to_ivf_index(spark, p, inc, batch_id=0)
        rebuild_ivf_index(spark, p)
        return p

    path = cached_scalar(spark, sf_dir, "ivf_rebuilt_index_path", make)
    return ivf_serve(spark, sf_dir, path)
