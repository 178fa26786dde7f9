"""IVF×SQ8 — the scalar-quantization compression tier as a MAINTAINED
artifact (the FAISS ``IVF,SQ8`` index, its most-deployed configuration:
coarse cells prune the scan, 8-bit per-dimension codes compress the
residents 8× vs float64 / 4× vs float32, search reconstructs on the
fly). Completes the compression ladder next to the PQ family (pq.py):
SQ8 keeps one code PER DIMENSION (higher fidelity, milder compression,
no codebook Lloyd loop — the trained state is just per-dimension
[min, max] ranges), PQ keeps one code per SUBSPACE.

The trained state here — the coarse quantizer and the per-dimension
ranges — follows the repo's "everything trained is a maintained
artifact" rule (VERDICT r10/r11 arc):

  path/
    coarse/   (cid, cvec)           — saved coarse quantizer
    ranges/   (dim, mn, mx)         — saved SQ8 ranges, the "codebook"
    codes/    (vec_id, codes array<int>, n_clip, vec)
              PARTITIONED BY (cell, ingest_batch)
    _sq8_live.json                  — version pointer after a rebuild

``n_clip`` (how many of the row's components were clamped into the
saved ranges at encode time) is written INLINE by the same expression
that produces the codes — the drift signal of this family: data
drifting outside the trained ranges saturates at the 0/255 rails and
silently degrades recall, which is exactly when FAISS retrains an SQ
index. similarity_sq8_clip_report certifies the census;
StreamingSq8Ingest acts on it in-loop (rebuild_sq8_index on an
all-integer ppm breach). The inline ``vec`` column exists for exactly
one reason: rebuilds refit ranges + coarse from the artifact's OWN
vectors, never the source corpus (the pq.py recipe) — serves
column-prune it away (plan-proven in tests/test_sq8_index.py).

Cross-engine exactness: components micro-quantized to int64 first,
then train (min/max), encode (clamp + one floor division over
non-negative operands) and decode (the inverse) are single integer
expressions shared verbatim between the Spark plan and the DuckDB
oracle; distances stay integer end-to-end, so every gate hash-matches
bit-for-bit.

Reference: the airline demo has no ANN tier (managed ClickHouse); this
family extends the brief's similarity-search scope. FAISS
ScalarQuantizer QT_8bit semantics; same serve/maintenance envelope as
the reference's 15 s CDC loop (modules/utils.py:48-49), budgeted in
tests/test_index_ingest_latency.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import cached_scalar, local_frame
from .kmeans_ivf import (
    SCALE,
    _DRIFT_MOD,
    _SERVE_QBOUND,
    _fold_batch_partitions,
    _live_root,
    _prefixed_kmeans_ctes,
    _purge_batch_partitions,
    _quantized_vectors,
    _retire_dirs,
    _stale_codebook,
    assign_cells,
    kmeans_fit,
    load_codebook,
    probe_cells,
    publish_generation,
    save_codebook,
    stale_generation_dirs,
)
from .similarity import SQ8_LEVELS

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


_KM_ITERS = 3   # coarse quantizer Lloyd iterations (the family default)
SQ8_NPROBE = 2  # coarse cells probed per query (the IVFPQ serve dial)
SQ8_TOPK = 5    # serve depth, same as the PQ ADC serve

_SQ8_META = "_sq8_live.json"
_SQ8_FLAT_TABLES = ("coarse", "ranges", "codes")


def _sq8_index_path(sf_dir: str) -> str:
    import hashlib
    import os
    from ..core.session import scratch_root
    root = scratch_root()
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(root, "sq8_index", key)


def sq8_coarse_path(path: str) -> str:
    """Live coarse codebook (layout-aware — the r10 resolver rule)."""
    return _live_root(path, _SQ8_META) + "/coarse"


def sq8_ranges_path(path: str) -> str:
    """Live per-dimension ranges table (layout-aware)."""
    return _live_root(path, _SQ8_META) + "/ranges"


def sq8_codes_path(path: str) -> str:
    """Live code table (layout-aware)."""
    return _live_root(path, _SQ8_META) + "/codes"


# ---------------------------------------------------------------------------
# training (the "codebook" of this family is just per-dim [min, max])
# ---------------------------------------------------------------------------

Ranges = list[tuple[int, int, int]]  # (dim, mn, mx) micro-unit ints


def sq8_fit(vq: DataFrame) -> Ranges:
    """Train the SQ8 ranges: per-dimension min/max over quantized
    vectors (id, vec) — ONE map-side-combinable aggregate to dim rows,
    collected driver-side (the J5 bounded pattern; this is the entire
    training loop, the reason SQ8 is the cheap rung of the ladder)."""
    rows = (vq.select(F.posexplode("vec").alias("dim", "val"))
            .groupBy("dim")
            .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
            .orderBy("dim").collect())
    return [(int(r["dim"]), int(r["mn"]), int(r["mx"])) for r in rows]


def save_ranges(spark: SparkSession, path: str, ranges: Ranges) -> None:
    """Persist the trained ranges as a (dim, mn, mx) parquet table —
    int64 micro-units round-trip losslessly."""
    (local_frame(spark, [(int(d), int(mn), int(mx))
                            for d, mn, mx in ranges],
                           "dim int, mn bigint, mx bigint")
     .coalesce(1).write.mode("overwrite").parquet(path))


def load_ranges(spark: SparkSession, path: str) -> Ranges:
    """Inverse of save_ranges (dim order restored, so encode is
    identical to a fresh fit)."""
    rows = spark.read.parquet(path).orderBy("dim").collect()
    return [(int(r["dim"]), int(r["mn"]), int(r["mx"])) for r in rows]


# ---------------------------------------------------------------------------
# encode / decode — ONE integer spelling per engine, clamped (appends
# may carry values outside the SAVED ranges; in-range values are
# untouched, so the base encode is the same expression)
# ---------------------------------------------------------------------------


def _rng_col(ranges: Ranges):
    """The ranges as a bound array<struct<mn,mx>> literal column (bind
    in a prior projection — the CLAUDE.md lambda rule)."""
    mn = F.array(*[F.lit(int(m)) for _, m, _ in ranges])
    mx = F.array(*[F.lit(int(m)) for _, _, m in ranges])
    return F.arrays_zip(mn.alias("mn"), mx.alias("mx"))


_CODE_LAMBDA = (f"(v, r) -> CAST((least(r.mx, greatest(r.mn, v)) - r.mn)"
                f" * {SQ8_LEVELS} DIV greatest(1L, r.mx - r.mn) AS INT)")
_RECON_LAMBDA = (f"(c, r) -> r.mn + CAST(c AS BIGINT) * (r.mx - r.mn)"
                 f" DIV {SQ8_LEVELS}")


def _sq8_encode_rows(vecs: DataFrame, coarse, ranges: Ranges,
                     extra: tuple[str, ...] = ()) -> DataFrame:
    """(id, vec[, extra]) → (vec_id, cell, codes, n_clip, vec[, extra]):
    coarse argmin assignment (broadcast codebook, shuffle-free) + the
    clamped 8-bit encode + the inline clip count, all in one map."""
    asg = assign_cells(vecs, coarse)
    bound = asg.withColumn("__rng", _rng_col(ranges))
    codes = F.expr(f"zip_with(vec, __rng, {_CODE_LAMBDA})")
    n_clip = F.expr(
        "aggregate(zip_with(vec, __rng,"
        " (v, r) -> CASE WHEN v < r.mn OR v > r.mx THEN 1 ELSE 0 END),"
        " 0, (acc, x) -> acc + x)")
    return bound.select(F.col("id").alias("vec_id"), "cell",
                        codes.alias("codes"),
                        n_clip.cast("int").alias("n_clip"),
                        "vec", *extra)


# ---------------------------------------------------------------------------
# lifecycle: build → append → serve → compact → rebuild
# ---------------------------------------------------------------------------


def build_sq8_index(spark: SparkSession, sf_dir: str,
                    path: str | None = None) -> str:
    """Build and PERSIST the IVF×SQ8 index over the BASE split: the
    coarse quantizer (the family-shared base-split fit — same concept
    as the IVF/PQ artifacts but its OWN saved copy) and the trained
    ranges persist next to the (cell, ingest_batch)-partitioned code
    table. A BUILD is a full rewrite (STATIC-overwrite rule)."""
    import os
    import shutil
    path = path or _sq8_index_path(sf_dir)
    if os.path.exists(path):
        shutil.rmtree(path)
    coarse = _stale_codebook(spark, sf_dir)
    base = (_quantized_vectors(spark, sf_dir)
            .filter(F.col("id") % _DRIFT_MOD != 0))
    ranges = sq8_fit(base)
    save_codebook(spark, path + "/coarse", coarse)
    save_ranges(spark, path + "/ranges", ranges)
    (_sq8_encode_rows(base, coarse, ranges)
     .withColumn("ingest_batch", F.lit(-1))
     .repartition("cell")
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("cell", "ingest_batch")
     .parquet(path + "/codes"))
    return path


def append_to_sq8_index(spark: SparkSession, path: str,
                        vectors: DataFrame,
                        batch_id: int | None = None) -> None:
    """MAINTAIN the index: assign + encode a new batch under the SAVED
    coarse quantizer and ranges (never retrained on ingest; values
    outside the saved ranges clamp to the rails and count into
    ``n_clip`` — the drift signal). Idempotent by batch id via the
    purge-first contract, exact even across a rebuild's range swap
    (the append_to_pq_index recipe). ``batch_id=None`` appends under
    the shared -2 tag with the SAME purge-first contract — a re-run
    replaces the whole -2 partition rather than accumulating duplicate
    vec_ids (distinct un-tagged batches must pass real batch ids;
    production maintainers always do)."""
    coarse = load_codebook(spark, sq8_coarse_path(path))
    ranges = load_ranges(spark, sq8_ranges_path(path))
    tag = -2 if batch_id is None else int(batch_id)
    _purge_batch_partitions(sq8_codes_path(path), tag)
    (_sq8_encode_rows(vectors, coarse, ranges)
     .withColumn("ingest_batch", F.lit(tag))
     .repartition("cell")
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("cell", "ingest_batch")
     .parquet(sq8_codes_path(path)))


def sq8_serve(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Asymmetric top-k from the persisted artifact: the fresh query
    batch probes its nprobe={SQ8_NPROBE} nearest coarse cells under the
    SAVED quantizer (bounded probe collect — the J5 pattern), the codes
    read is PARTITION-PRUNED to the probed cells and projects
    (vec_id, cell, codes) — column pruning never touches the inline
    vectors — and each candidate reconstructs in-row from the broadcast
    ranges for an exact-query-vs-reconstruction integer distance. The
    only exchange is the per-query top-k."""
    coarse = load_codebook(spark, sq8_coarse_path(path))
    ranges = load_ranges(spark, sq8_ranges_path(path))
    qv = (_quantized_vectors(spark, sf_dir)
          .filter((F.col("id") % _DRIFT_MOD == 0)
                  & (F.col("id") < _SERVE_QBOUND)))
    probe_rows = (probe_cells(qv, coarse, nprobe=SQ8_NPROBE)
                  .select("id", "probe_cell").collect())
    probed = sorted({int(r["probe_cell"]) for r in probe_rows})
    qvecs = {int(r["id"]): [int(x) for x in r["vec"]]
             for r in qv.select("id", "vec").collect()}
    probe_df = local_frame(spark, 
        [(qid, pc, qvecs[qid]) for qid, pc in
         sorted((int(r["id"]), int(r["probe_cell"])) for r in probe_rows)],
        "query_id: long, probe_cell: int, qvec: array<bigint>")
    idx = (spark.read.parquet(sq8_codes_path(path))
           .filter(F.col("cell").isin(probed))  # partition-pruned
           .select(F.col("vec_id").alias("neighbor_id"), "cell", "codes")
           .withColumn("__rng", _rng_col(ranges))
           .withColumn("rv", F.expr(f"zip_with(codes, __rng,"
                                    f" {_RECON_LAMBDA})")))
    d2 = F.expr("aggregate(zip_with(qvec, rv, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    pairs = (idx.join(F.broadcast(probe_df),
                      (F.col("cell") == F.col("probe_cell"))
                      & (F.col("neighbor_id") != F.col("query_id")))
             .select("query_id", "neighbor_id", d2.alias("sq_d2")))
    w = Window.partitionBy("query_id").orderBy("sq_d2", "neighbor_id")
    return (pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= SQ8_TOPK).drop("__rn")
            .select("query_id", "neighbor_id",
                    F.col("sq_d2").cast("long").alias("sq_d2")))


def compact_sq8_index(spark: SparkSession, path: str,
                      exclude_batch: int | None = None) -> None:
    """Background-merge the code table to one file set per cell (the
    shared (cell, ingest_batch) fold core) + reap stranded generation
    debris — the SQ8 twin of compact_pq_index. Same single-writer
    maintenance contract (see stale_generation_dirs)."""
    _fold_batch_partitions(spark, sq8_codes_path(path), exclude_batch)
    _retire_dirs(stale_generation_dirs(path, _SQ8_META, _SQ8_FLAT_TABLES))


def rebuild_sq8_index(spark: SparkSession, path: str,
                      k: int = 8, iters: int = _KM_ITERS,
                      keep_provenance: bool = False) -> None:
    """REBUILD in place: fresh coarse Lloyd + fresh range fit on the
    full corpus currently in the index — read back from the code
    table's own INLINE vectors, never the source corpus — every vector
    re-assigned and re-encoded (post-rebuild ``n_clip`` is 0 by
    construction: the new ranges cover everything they were fit on),
    staged under ``v<N>/`` and published with ONE atomic pointer
    replace (the rebuild_pq_index recipe; rebuild ≡ retrain
    bit-for-bit because min/max and the first-ids Lloyd init are
    order-insensitive). Stranded debris of crashed prior swaps is
    reaped post-publish."""
    import os
    import shutil

    root = _live_root(path, _SQ8_META)
    keep = ("ingest_batch",) if keep_provenance else ()
    vecs = (spark.read.parquet(sq8_codes_path(path))
            .select(F.col("vec_id").alias("id"), "vec", *keep).cache())
    coarse = kmeans_fit(vecs.select("id", "vec"), k=k, iters=iters)
    ranges = sq8_fit(vecs)
    new_name = ("v1" if root == path
                else "v%d" % (int(os.path.basename(root)[1:]) + 1))
    new_root = os.path.join(path, new_name)
    if os.path.exists(new_root):  # debris of a crashed prior attempt
        shutil.rmtree(new_root)
    save_codebook(spark, new_root + "/coarse", coarse)
    save_ranges(spark, new_root + "/ranges", ranges)
    provenance = (F.col("ingest_batch").cast("int") if keep_provenance
                  else F.lit(-1))
    (_sq8_encode_rows(vecs, coarse, ranges, extra=keep)
     .withColumn("ingest_batch", provenance)
     .repartition("cell")
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("cell", "ingest_batch")
     .parquet(new_root + "/codes"))
    vecs.unpersist()
    publish_generation(path, _SQ8_META, new_name)
    _retire_dirs(stale_generation_dirs(path, _SQ8_META, _SQ8_FLAT_TABLES))


def _build_inc_sq8_index(spark: SparkSession, sf_dir: str) -> str:
    """Build + one-batch append — shared by the serve gate and the
    clip census (one artifact per session serves both)."""
    p = _sq8_index_path(sf_dir) + "_inc"
    build_sq8_index(spark, sf_dir, p)
    inc = (_quantized_vectors(spark, sf_dir)
           .filter((F.col("id") % _DRIFT_MOD == 0)
                   & (F.col("id") >= _SERVE_QBOUND)))
    append_to_sq8_index(spark, p, inc, batch_id=0)
    return p


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_DIM_STREAM = (f"SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,\n"
               f"         CAST(floor(unnest(embedding::DOUBLE[]) * {SCALE}.0)"
               f" AS BIGINT) AS val\n  FROM embeddings WHERE ")

_BASE = f"vec_id % {_DRIFT_MOD} <> 0"
_INC = f"vec_id % {_DRIFT_MOD} = 0 AND vec_id >= {_SERVE_QBOUND}"
_QPRED = f"vec_id % {_DRIFT_MOD} = 0 AND vec_id < {_SERVE_QBOUND}"

# the fused encode+decode in DuckDB spelling — ONE floor-division chain
# over non-negative operands (clamp first), `//` == Spark's DIV there.
# In-range values make the clamp a no-op, so base rows and increment
# rows share this one expression (exactly like the Spark encode).
_RECON_SQL = (f"r.mn + ((least(r.mx, greatest(r.mn, d.val)) - r.mn)"
              f" * {SQ8_LEVELS} // greatest(1, r.mx - r.mn))"
              f" * (r.mx - r.mn) // {SQ8_LEVELS}")


def _sq8_chain(corpus_pred: str, fit_pred: str, init_pred: str) -> str:
    """The serve CTE chain: coarse Lloyd over ``fit_pred`` rows (init =
    first k ids of ``init_pred``), ranges over ``fit_pred`` dims,
    assignment of every ``corpus_pred`` row under that quantizer,
    reconstruction under those ranges, the query batch's nprobe probe,
    and the probed-cell asymmetric distances — ending at
    ``pairs(query_id, neighbor_id, sq_d2)``."""
    fit_dims = _DIM_STREAM.replace(" - 1 AS dim", " AS dim") + fit_pred
    kchain = _prefixed_kmeans_ctes(
        "b", 8, _KM_ITERS, dims_sql=fit_dims,
        ids_sql=f"SELECT vec_id FROM embeddings WHERE {init_pred}")
    return f"""{kchain},
rng AS (
  SELECT dim - 1 AS dim, min(val) AS mn, max(val) AS mx
  FROM bdims GROUP BY 1
),
alldims AS (
  {_DIM_STREAM}{corpus_pred}
),
alld AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS d2
  FROM alldims v JOIN bcent{_KM_ITERS} c ON c.dim = v.dim + 1
  GROUP BY 1, 2
),
allasg AS (
  SELECT vec_id, cid AS cell FROM alld
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
),
rdims AS (
  SELECT d.vec_id, d.dim, {_RECON_SQL} AS rv
  FROM alldims d JOIN rng r USING (dim)
),
qdims AS (
  {_DIM_STREAM}{_QPRED}
),
qd AS (
  SELECT v.vec_id, c.cid,
         sum((v.val - c.val) * (v.val - c.val))::BIGINT AS dist2
  FROM qdims v JOIN bcent{_KM_ITERS} c ON c.dim = v.dim + 1
  GROUP BY 1, 2
),
probe AS (
  SELECT vec_id AS query_id, cid AS probe_cell FROM qd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid)
          <= {SQ8_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p
  JOIN allasg a ON a.cell = p.probe_cell AND a.vec_id <> p.query_id
),
pairs AS (
  SELECT c.query_id, c.neighbor_id,
         sum((q.val - n.rv) * (q.val - n.rv))::BIGINT AS sq_d2
  FROM cand c
  JOIN qdims q ON q.vec_id = c.query_id
  JOIN rdims n ON n.vec_id = c.neighbor_id AND n.dim = q.dim
  GROUP BY 1, 2
)"""


def _sq8_serve_oracle_sql() -> str:
    """build(base) → append(increment under the SAVED base ranges,
    clamped) → serve: the grown corpus is base ∪ increment, the
    quantizer and ranges are base-trained."""
    return f"""WITH {_sq8_chain(f"({_BASE}) OR ({_INC})", _BASE, _BASE)}
SELECT query_id, neighbor_id, sq_d2
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY sq_d2, neighbor_id) <= {SQ8_TOPK}"""


def _sq8_rebuild_serve_oracle_sql() -> str:
    """rebuild ≡ retrain, certified ON THE SERVING PATH: after build →
    append → rebuild, the artifact must serve exactly what ONE
    grown-corpus fit serves (coarse Lloyd init = first k ids of the
    grown corpus; ranges over the grown corpus; no clamping survives a
    rebuild by construction)."""
    grown = f"({_BASE}) OR ({_INC})"
    return f"""WITH {_sq8_chain(grown, grown, grown)}
SELECT query_id, neighbor_id, sq_d2
FROM pairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY sq_d2, neighbor_id) <= {SQ8_TOPK}"""


def _sq8_clip_oracle_sql() -> str:
    """Per-ingest-batch clip census from first principles: ranges from
    the base split, every row's clipped-component count recomputed,
    aggregated to (ingest_batch, n_vecs, clipped_components, clip_ppm)
    — ppm over DECIMAL/HUGEINT-widened sums (component counts at 100 TB
    overflow an int64 product)."""
    return f"""WITH bdims0 AS (
  {_DIM_STREAM}{_BASE}
),
rng AS (
  SELECT dim, min(val) AS mn, max(val) AS mx FROM bdims0 GROUP BY 1
),
alldims AS (
  SELECT *, -1 AS ingest_batch FROM ({_DIM_STREAM}{_BASE})
  UNION ALL
  SELECT *, 0 AS ingest_batch FROM ({_DIM_STREAM}{_INC})
),
percomp AS (
  SELECT d.vec_id, d.ingest_batch,
         CASE WHEN d.val < r.mn OR d.val > r.mx THEN 1 ELSE 0 END AS clip
  FROM alldims d JOIN rng r USING (dim)
),
stats AS (
  -- n_vecs = component rows // dim == CODE ROWS, the same row-count
  -- census the engine runs (duplicate-vec_id mode-append artifacts
  -- count every copy on both sides — never a silent divergence)
  SELECT ingest_batch,
         count(*) // (SELECT count(*) FROM rng) AS n_vecs,
         sum(CAST(clip AS HUGEINT)) AS s_clip,
         count(*) AS n_comp
  FROM percomp GROUP BY 1
)
SELECT CAST(ingest_batch AS BIGINT) AS ingest_batch,
       CAST(n_vecs AS BIGINT) AS n_vecs,
       CAST(s_clip AS BIGINT) AS clipped_components,
       CAST(s_clip * 1000000 // n_comp AS BIGINT) AS clip_ppm
FROM stats
ORDER BY ingest_batch"""


# ---------------------------------------------------------------------------
# catalog gates
# ---------------------------------------------------------------------------


@q("similarity_sq8_serve_topk", _sq8_serve_oracle_sql())
def similarity_sq8_serve_topk(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Serve from the MAINTAINED IVF×SQ8 artifact after build(base) +
    append(increment under the saved ranges): the lifecycle gate of
    the sixth artifact family. The oracle recomputes the base-trained
    quantizer + ranges and the clamped increment encode from first
    principles, so a green row certifies the persisted coarse/ranges/
    codes round-trip AND the clamped append semantics bit-for-bit.

    Scale path: see sq8_serve — bounded probe collects, partition
    pruning to probed cells, (vec_id, cell, codes) projection (inline
    vectors never read), in-row reconstruct, ONE top-k exchange."""
    path = cached_scalar(spark, sf_dir, "sq8_inc_index_path",
                         lambda: _build_inc_sq8_index(spark, sf_dir))
    return sq8_serve(spark, sf_dir, path)


@q("similarity_sq8_rebuild_serve", _sq8_rebuild_serve_oracle_sql())
def similarity_sq8_rebuild_serve(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """build → append → REBUILD → serve ≡ ONE grown-corpus retrain on
    the serving path (the family's rebuild ≡ retrain certificate):
    fresh coarse + fresh ranges fit on the artifact's own inline
    vectors, every row re-encoded — the clamp saturation the append
    introduced is gone by construction, which is precisely why the
    clip monitor's action is a rebuild."""
    def make() -> str:
        p = _sq8_index_path(sf_dir) + "_rb"
        build_sq8_index(spark, sf_dir, p)
        inc = (_quantized_vectors(spark, sf_dir)
               .filter((F.col("id") % _DRIFT_MOD == 0)
                       & (F.col("id") >= _SERVE_QBOUND)))
        append_to_sq8_index(spark, p, inc, batch_id=0)
        rebuild_sq8_index(spark, p)
        return p

    path = cached_scalar(spark, sf_dir, "sq8_rebuilt_index_path", make)
    return sq8_serve(spark, sf_dir, path)


@q("similarity_sq8_clip_report", _sq8_clip_oracle_sql())
def similarity_sq8_clip_report(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """CLIP census from the maintained artifact — this family's drift
    signal (the PQ family watches reconstruction error; SQ8's failure
    mode is range saturation: drifted components clamp to the 0/255
    rails and the index silently loses resolution — the condition
    FAISS retrains an SQ index for). Per ingest batch: vectors, total
    clipped components (``n_clip`` inline in the code table, written
    by the same expression that produced the codes), and the integer
    clip rate in ppm. The action the report gates is
    ``rebuild_sq8_index`` (auto-fired in-loop by StreamingSq8Ingest).

    Scale path: a pure ARTIFACT census — the codes read projects
    (ingest_batch, n_clip): footers + one small int column; the ppm
    ratio multiplies inside DECIMAL(38,0)/HUGEINT (a 100 TB component
    count × 1e6 overflows int64) and floor-divides — never a float
    fraction."""
    path = cached_scalar(spark, sf_dir, "sq8_inc_index_path",
                         lambda: _build_inc_sq8_index(spark, sf_dir))
    dim = len(load_ranges(spark, sq8_ranges_path(path)))
    codes = spark.read.parquet(sq8_codes_path(path))
    # n_vecs counts CODE ROWS on BOTH engines (ADVICE r12: the old
    # Spark count(*) / oracle count(DISTINCT vec_id) pair agreed only
    # under the purge-first append discipline — which, since r14,
    # EVERY append path honors: the batch_id=None tag purges its -2
    # partition before writing, so duplicate vec_ids can no longer
    # accumulate). Rows == distinct vectors by construction — and the
    # census
    # stays a map-side-combinable k-row aggregate (a countDistinct
    # would shuffle the full-width (batch, vec_id) projection — the
    # exact scale cost this footer-only census exists to avoid).
    return (codes.groupBy("ingest_batch")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum(F.col("n_clip").cast("decimal(38,0)"))
                 .alias("s_clip"))
            .select(F.col("ingest_batch").cast("long")
                    .alias("ingest_batch"),
                    F.col("n_vecs").cast("long").alias("n_vecs"),
                    F.col("s_clip").cast("long")
                    .alias("clipped_components"),
                    F.expr(f"CAST(s_clip * 1000000"
                           f" DIV (CAST(n_vecs AS DECIMAL(38,0))"
                           f" * {dim}) AS BIGINT)").alias("clip_ppm"))
            .orderBy("ingest_batch"))


def _sq8_recall_oracle_sql() -> str:
    """The serve chain beside the EXACT top-k over the same grown
    corpus: per query, how many of the exact top-{SQ8_TOPK} the
    compressed serve recovered — integer hit counts, one double
    division (the similarity_ann_recall convention)."""
    return f"""WITH {_sq8_chain(f"({_BASE}) OR ({_INC})", _BASE, _BASE)},
s8tk AS (
  SELECT query_id, neighbor_id FROM pairs
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY sq_d2, neighbor_id) <= {SQ8_TOPK}
),
exd AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum((q.val - c.val) * (q.val - c.val))::BIGINT AS d2
  FROM qdims q JOIN alldims c ON c.dim = q.dim
  GROUP BY 1, 2
),
extk AS (
  SELECT query_id, neighbor_id FROM exd
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY d2, neighbor_id) <= {SQ8_TOPK}
),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM extk e JOIN s8tk s USING (query_id, neighbor_id)
  GROUP BY 1
),
qs AS (SELECT DISTINCT vec_id AS query_id FROM qdims)
SELECT q.query_id,
       CAST({SQ8_TOPK} AS BIGINT) AS k,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE)
         / CAST({SQ8_TOPK} AS DOUBLE) AS recall_at_k
FROM qs q LEFT JOIN hits h USING (query_id)
ORDER BY query_id"""


@q("similarity_sq8_recall", _sq8_recall_oracle_sql())
def similarity_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{SQ8_TOPK} of the maintained IVF×SQ8 serve against the
    EXACT top-k over the same grown corpus — the quality leg that
    closes this family's lifecycle (train → encode → serve → MEASURE;
    the PQ/IVF families carry the same monitor via
    similarity_ann_recall / similarity_index_staleness). The number a
    deployment watches when choosing its compression rung: SQ8's
    per-dimension codes trade less recall than PQ's subspace codes at
    4× less compression.

    Comparison on neighbor-ID SETS (both sides totally ordered by
    (distance, neighbor_id); both distances exact integers) — n_hits
    is an integer, recall divides once in IEEE double, identical on
    both engines.

    Scale path: the serve side inherits sq8_serve's pruned layout; the
    exact side scans the corpus ONCE against the broadcast bounded
    query batch (the ground-truth pass a recall evaluation owns by
    definition); the hit join is queries × k rows."""
    path = cached_scalar(spark, sf_dir, "sq8_inc_index_path",
                         lambda: _build_inc_sq8_index(spark, sf_dir))
    served = sq8_serve(spark, sf_dir, path).select("query_id",
                                                   "neighbor_id")
    vq = _quantized_vectors(spark, sf_dir)
    queries = local_frame(spark, 
        sorted((int(r["id"]), [int(x) for x in r["vec"]]) for r in
               vq.filter((F.col("id") % _DRIFT_MOD == 0)
                         & (F.col("id") < _SERVE_QBOUND))
               .select("id", "vec").collect()),
        "query_id: long, qvec: array<bigint>")
    corpus = vq.filter((F.col("id") % _DRIFT_MOD != 0)
                       | (F.col("id") >= _SERVE_QBOUND))
    d2 = F.expr("aggregate(zip_with(qvec, vec, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = (corpus.crossJoin(F.broadcast(queries))
             .select("query_id", F.col("id").alias("neighbor_id"),
                     d2.alias("d2"))
             .withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") <= SQ8_TOPK)
             .select("query_id", "neighbor_id"))
    hits = (exact.join(F.broadcast(served), ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits")))
    qs = queries.select("query_id")
    return (qs.join(F.broadcast(hits), "query_id", "left")
            .select("query_id",
                    F.lit(SQ8_TOPK).cast("long").alias("k"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)).cast("double")
                     / F.lit(float(SQ8_TOPK))).alias("recall_at_k"))
            .orderBy("query_id"))


# ---------------------------------------------------------------------------
# residual SQ8 — the FAISS-default IVF,SQ8 encoding (VERDICT r12 #7's
# sanctioned breadth: SQ8 over x − centroid, the pq.py residual recipe,
# integer-exact end to end)
# ---------------------------------------------------------------------------

# fused clamp → encode → decode of one residual component in one integer
# expression (operands non-negative after the clamp, so DuckDB `//` ==
# Spark DIV); the clamp is a no-op when ranges were fit on the same data
# but keeps the expression identical to the artifact family's append path
_RESID_FUSE = (f"(v, r) -> r.mn + ((least(r.mx, greatest(r.mn, v)) - r.mn)"
               f" * {SQ8_LEVELS} DIV greatest(1L, r.mx - r.mn))"
               f" * (r.mx - r.mn) DIV {SQ8_LEVELS}")


def _sq8_residual_oracle_sql() -> str:
    """Full-corpus coarse Lloyd chain → per-vector residual dims →
    residual ranges → centroid + fused-recon reconstruction → nprobe
    probe over the chain's own distance table → probed-cell asymmetric
    distances → top-k."""
    it = _KM_ITERS
    fuse = (f"r.mn + ((least(r.mx, greatest(r.mn, t.val)) - r.mn)"
            f" * {SQ8_LEVELS} // greatest(1, r.mx - r.mn))"
            f" * (r.mx - r.mn) // {SQ8_LEVELS}")
    return f"""WITH {_prefixed_kmeans_ctes("r8", 8, it)},
resid AS (
  SELECT d.vec_id, d.dim, a.cell, d.val - c.val AS val
  FROM r8dims d
  JOIN r8asgfin a USING (vec_id)
  JOIN r8cent{it} c ON c.cid = a.cell AND c.dim = d.dim
),
rrng AS (
  SELECT dim, min(val) AS mn, max(val) AS mx FROM resid GROUP BY 1
),
rrec AS (
  SELECT t.vec_id, t.dim, c.val + ({fuse}) AS rv
  FROM resid t
  JOIN rrng r USING (dim)
  JOIN r8cent{it} c ON c.cid = t.cell AND c.dim = t.dim
),
rprobe AS (
  SELECT vec_id AS query_id, cid AS probe_cell
  FROM r8dfin WHERE vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY r8d2, cid)
          <= {SQ8_NPROBE}
),
rcand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM rprobe p
  JOIN r8asgfin a ON a.cell = p.probe_cell AND a.vec_id <> p.query_id
),
rpairs AS (
  SELECT c.query_id, c.neighbor_id,
         sum((q.val - n.rv) * (q.val - n.rv))::BIGINT AS sq_d2
  FROM rcand c
  JOIN r8dims q ON q.vec_id = c.query_id
  JOIN rrec n ON n.vec_id = c.neighbor_id AND n.dim = q.dim
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, sq_d2
FROM rpairs
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY sq_d2, neighbor_id) <= {SQ8_TOPK}
ORDER BY query_id, sq_d2, neighbor_id"""


@q("similarity_sq8_residual_topk", _sq8_residual_oracle_sql())
def similarity_sq8_residual_topk(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Residual IVF×SQ8 — FAISS's default SQ-inside-IVF encoding: the
    8-bit codes quantize x − centroid(cell(x)) instead of x, so the
    256 levels of every dimension cover only WITHIN-cell variation
    (the coarse quantizer already removed the between-cell spread —
    residual ranges are tighter than raw ranges by construction, the
    same fidelity argument as similarity_ivfpq_residual_topk's).
    Reconstruction = centroid + decoded residual; nprobe={SQ8_NPROBE}
    learned cells per query; asymmetric exact-query distances;
    top-{SQ8_TOPK} per query on a (sq_d2, neighbor_id) total order.

    The fixed-point discipline carries through unchanged: residuals
    are int64 SUBTRACTIONS of already-quantized values, ranges are
    min/max over them, and the fused clamp→encode→decode is one
    integer floor-division expression shared with the oracle — every
    distance is an exact int64 on both engines.

    Scale path: the codebook is the memoized trained artifact; the
    residual map + reconstruction is one broadcast-codebook zip pass
    (map-only); the probe set is the bounded query batch; candidates
    are cell-restricted (never all-pairs); the only exchanges are the
    per-query top-k window and the presentation sort — at 100 TB this
    serves from a (cell, ingest_batch)-partitioned residual-code table
    exactly like the raw-SQ8 artifact family (build/append/serve
    lifecycle identical; the residual encode simply subtracts the
    SAVED centroid before the same clamp expression)."""
    from .kmeans_ivf import fitted_codebook
    from .pq import _residual_vectors

    vq = _quantized_vectors(spark, sf_dir)
    cb = fitted_codebook(spark, sf_dir, k=8, iters=_KM_ITERS)
    rv = _residual_vectors(vq, cb)  # (id, cell, rvec) — one map
    ranges = sq8_fit(rv.select(F.col("rvec").alias("vec")))
    cbdf = local_frame(vq.sparkSession, 
        [(int(cid), [int(x) for x in v]) for cid, v in cb],
        "cell: int, cvec: array<bigint>")
    bound = (rv.join(F.broadcast(cbdf), "cell")
             .withColumn("__rng", _rng_col(ranges))
             .withColumn("__rres",
                         F.expr(f"zip_with(rvec, __rng, {_RESID_FUSE})"))
             .select(F.col("id").alias("neighbor_id"), "cell",
                     F.expr("zip_with(cvec, __rres, (a, b) -> a + b)")
                     .alias("rv")))
    # bounded probe table with the exact query vectors embedded (the
    # ivfpq residual pattern: N_QUERIES × nprobe rows, broadcast)
    qvecs = {int(r["id"]): [int(x) for x in r["vec"]]
             for r in vq.filter(F.col("id") < 8).collect()}
    probe_rows = probe_cells(vq.filter(F.col("id") < 8), cb,
                             nprobe=SQ8_NPROBE).collect()
    probe_df = local_frame(spark, 
        sorted((int(r["id"]), int(r["probe_cell"]), qvecs[int(r["id"])])
               for r in probe_rows),
        "query_id: long, probe_cell: int, qv: array<bigint>")
    d2 = F.expr("aggregate(zip_with(qv, rv, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    pairs = (bound.join(F.broadcast(probe_df),
                        (F.col("cell") == F.col("probe_cell"))
                        & (F.col("neighbor_id") != F.col("query_id")))
             .select("query_id", "neighbor_id", d2.alias("sq_d2")))
    w = Window.partitionBy("query_id").orderBy("sq_d2", "neighbor_id")
    return (pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= SQ8_TOPK).drop("__rn")
            .select("query_id", "neighbor_id",
                    F.col("sq_d2").cast("long").alias("sq_d2"))
            .orderBy("query_id", "sq_d2", "neighbor_id"))
