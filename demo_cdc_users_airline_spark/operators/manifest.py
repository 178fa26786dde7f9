"""INCREMENTALLY-MAINTAINED training-dataset manifest (VERDICT r13 #2
— the capstone's missing lifecycle leg): where write_training_dataset
is a FULL recomposition, this artifact family gives the manifest the
same build → per-batch append → rebuild lifecycle every other
maintained index here has, so at 100 TB an arriving CDC batch costs
O(batch), not a corpus re-pack.

Reference parity: incremental maintenance of a destination from a
stream is the reference's entire point (users_mv.pipe:19-20 — the MV
folds each Kafka block into the destination; users_batch_copy.pipe:68-70
— the scheduled copy appends only NEW rows since the last watermark);
here the "destination" is the training-dataset manifest.

Design — the frozen-state append contract (the append_to_sq8_index /
append_to_pq_index philosophy, applied to curation):

  BUILD (on the base split, doc_id % {_INC_MOD} != 0) freezes
  every curation parameter next to the base manifest rows:
    clu/        the near-dup cluster artifact over the base split
                (build_cluster_index layout — its lsh/ subtree IS the
                admission probe index; its labels ARE the base split
                assignment)
    rows/       manifest rows PARTITIONED BY (split, shard,
                ingest_batch); the build writes ingest_batch = -1
    rf/         the FROZEN per-source repeat factors (computed over
                the base train split — the mixture weights batches
                append under; a rebuild refits them)
    fp/         base content fingerprints (exact-dedup probe set)
    bench/      benchmark shingle hashes of the base split's bench
                slice (decontamination probe set)
    merges.json the FROZEN BPE merge table (token budgets of appended
                batches never retrain the tokenizer)

  PER BATCH, the maintainer re-curates ONLY the streams the batch
  touches: quality (in-row), exact-dedup vs the frozen fingerprints +
  keep-first within the batch, near-dup admission via the frozen LSH
  probe (an admitted doc is novel ⇒ its own singleton cluster ⇒ split
  = salted hash of its own id — the cluster-leak rule degenerates to
  a hash because near-dups of base docs never enter), decontamination
  vs the frozen bench set, token budgets under the frozen merges,
  copies under the FROZEN rf (sources unseen at build time fall back
  to rf_ppm = 1000000). Packing is BATCH-LOCAL per (split, shard):
  offsets restart at 0 in the batch's own pack namespace — the
  append-at-tail layout; pack identity is (split, shard,
  ingest_batch, pack_id) and a loader reads a stream in
  (ingest_batch, pack_id, pack_offset) order. Writes are
  purge-first + dynamic by the batch's own ingest_batch partitions —
  a foreachBatch retry replaces exactly its own rows.

  Documented deviations from a full re-curation (ALL repaired by
  rebuild, and CENSUSED by corpus_manifest_rebuild_diff): rf drift
  (frozen mixture weights), within-batch near-dup pairs (both novel
  vs base ⇒ both admitted), cross-batch exact/near dups (batches are
  curated against the BASE state only, never each other — the pure-
  function property that makes retries idempotent), and base docs
  whose global canonical/keeper would differ once later arrivals are
  considered.

  REBUILD = write_training_dataset-style global recomposition under
  this family's (MinHash-LSH) edge rule — corpus_manifest_rebuild_diff
  is its cost census: per split, how many (doc, copy) rows are
  stable / moved / added / dropped between the incremental state and
  a from-scratch re-curation — exactly the re-shuffle a maintenance
  window would pay.

Scale path: batch curation is probe-bounded (the LSH read is
partition-pruned to the batch's band prefixes; fingerprints and bench
hashes join as bounded probe tables; merges/rf are broadcast
literals); packing windows run per (split, shard) WITHIN the batch —
no global state is read or rewritten. The build pays the base CC
fixpoint once, like build_cluster_index does.

Label note: this family's near-dup graph uses the maintained cluster
artifact's MinHash-LSH verified edges (dedup.py:1910-1917), not the
simhash graph the session-memoized capstone uses — the two
training-dataset deliverables are separate operators with separate
oracles; each is exact under its own documented edge rule.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import cached_scalar, load_table, parallel_scan
from ..sources.loader import register_memo as _register_memo
from . import curation as _cu
from . import dedup as _dd
from . import importance as _imp
from . import sampling as _sa
from . import text as _tx
from . import tokenizer as _tok
from .training_dataset import _TDS_SALT

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


_INC_MOD = _dd._INC_MOD          # base = doc_id % 8 != 0 (repo standard)
_BENCH_MOD = _cu._BENCH_MOD      # doc_id % 97 == 0 is the eval slice
_GATE_BATCH_ID = 0               # the gate's single increment batch


def _manifest_inc_path(sf_dir: str) -> str:
    import hashlib

    from ..core.session import scratch_root
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(scratch_root(), "manifest_inc", key)


def manifest_rows_path(path: str) -> str:
    return path + "/rows"


def manifest_rf_path(path: str) -> str:
    return path + "/rf"


# ---------------------------------------------------------------------------
# shared composition pieces (Spark side)
# ---------------------------------------------------------------------------


def _split_col(key) -> F.Column:
    """The 8/1/1 leakage-free split rule (corpus_cluster_split's salt,
    keyed on whatever carries the leak unit — a cluster label, or the
    doc id itself for a singleton)."""
    h = _sa._salted_hash("gsplit_", key) % 10
    return (F.when(h < 8, "train").when(h == 8, "val")
            .otherwise(F.lit("test")))


def _rf_table(pool: DataFrame) -> DataFrame:
    """(source, rf_ppm) — tau = 0.5 temperature repeat factors over the
    pool's TRAIN split token masses (the capstone's tds_rf stage)."""
    c = (pool.filter(F.col("split") == "train").groupBy("source")
         .agg(F.sum("n_tokens").cast("long").alias("m")))
    s = c.select("source", "m",
                 F.floor(F.lit(1000000.0)
                         * F.sqrt(F.col("m").cast("double")))
                 .cast("long").alias("s_micro"))
    t = s.agg(F.sum("m").cast("long").alias("tok_tot"),
              F.sum("s_micro").cast("long").alias("s_tot"))
    return (s.crossJoin(F.broadcast(t))
            .select("source", F.expr(_imp._RF_PPM_SQL).alias("rf_ppm")))


def _expand_and_pack(pool: DataFrame, rf: DataFrame,
                     ingest_batch: int | None) -> DataFrame:
    """pool (doc_id, source, split, n_tokens) × rf (source, rf_ppm) →
    packed manifest rows — the capstone's resample + concat-and-chunk
    stages, shared by the base build, the per-batch append (where the
    windows see only BATCH rows: the batch-local pack namespace) and
    the rebuild composition. Sources absent from ``rf`` fall back to
    rf_ppm = 1000000 (one copy, no resample)."""
    trn = (pool.filter(F.col("split") == "train")
           .join(F.broadcast(rf), "source", "left")
           .withColumn("rf_ppm", F.coalesce("rf_ppm", F.lit(1000000))
                       .cast("long")))
    bern = F.when(
        _sa._salted_hash(_TDS_SALT, F.col("doc_id")) % 1000000
        < F.col("rf_ppm") % 1000000, 1).otherwise(0)
    train_rows = (trn.withColumn("copies",
                                 (F.expr("rf_ppm div 1000000") + bern)
                                 .cast("long"))
                  .withColumn("copy", F.explode(F.expr(
                      "CASE WHEN copies >= 1 THEN"
                      " sequence(CAST(1 AS BIGINT), copies)"
                      " ELSE CAST(array() AS ARRAY<BIGINT>) END")))
                  .select("doc_id", "source", "split", "n_tokens",
                          "rf_ppm", "copy"))
    eval_rows = (pool.filter(F.col("split") != "train")
                 .select("doc_id", "source", "split", "n_tokens",
                         F.lit(1000000).cast("long").alias("rf_ppm"),
                         F.lit(1).cast("long").alias("copy")))
    stream = train_rows.unionByName(eval_rows) \
        .withColumn("shard", F.col("doc_id") % _cu._N_SHARDS)
    w = (Window.partitionBy("split", "shard").orderBy("doc_id", "copy")
         .rowsBetween(Window.unboundedPreceding, -1))
    start_off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = (stream.withColumn("start_off", start_off)
           .select(
               "split", "source", "doc_id",
               F.col("copy").cast("long").alias("copy"),
               F.col("n_tokens").cast("long").alias("n_tokens"),
               F.col("rf_ppm").cast("long").alias("rf_ppm"),
               F.col("shard").cast("long").alias("shard"),
               (F.col("shard") * 1000000
                + F.expr(f"start_off div {_cu._PACK_BUDGET}"))
               .cast("long").alias("pack_id"),
               (F.col("start_off") % _cu._PACK_BUDGET).cast("long")
               .alias("pack_offset"),
               F.when(F.col("start_off") % _cu._PACK_BUDGET
                      + F.col("n_tokens") > _cu._PACK_BUDGET, 1)
               .otherwise(0).cast("long").alias("spans_boundary")))
    if ingest_batch is not None:
        out = out.withColumn("ingest_batch",
                             F.lit(int(ingest_batch)).cast("long"))
    return out


def _ntok_with_merges(docs: DataFrame, merges) -> DataFrame:
    """(doc_id, n_tokens) of ANY (doc_id, text) frame under a FROZEN
    merge table — the batch-side twin of text_bpe_encode_served's
    corpus sweep (same word explode + bound-literal replace chain,
    tokenizer._bpe_token_count_col)."""
    words = (docs.select("doc_id", F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"))
             .filter(F.length("w") > 0))
    agg = (words.select("doc_id",
                        _tok._bpe_token_count_col(merges).alias("nt"))
           .groupBy("doc_id").agg(F.sum("nt").alias("n_tokens")))
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .select("doc_id", F.coalesce("n_tokens", F.lit(0))
                    .cast("long").alias("n_tokens")))


# ---------------------------------------------------------------------------
# lifecycle: build → per-batch update → read
# ---------------------------------------------------------------------------


def build_manifest_index(spark: SparkSession, sf_dir: str,
                         path: str | None = None) -> str:
    """Build and PERSIST the incremental manifest artifact over the
    BASE split: the frozen curation state (cluster/LSH artifact,
    fingerprints, bench hashes, rf, merges) + the base manifest rows
    under ingest_batch = -1. A build is a FULL rewrite (the STATIC-
    overwrite rule for partitioned artifacts)."""
    path = path or _manifest_inc_path(sf_dir)
    if os.path.exists(path):
        shutil.rmtree(path)
    clu = _dd.build_cluster_index(spark, sf_dir, path + "/clu",
                                  pfx_width=1)
    docs = load_table(spark, sf_dir, "documents")
    is_base = F.col("doc_id") % _INC_MOD != 0
    # frozen probe sets — bounded side tables every later batch
    # curates against (never the corpus text)
    hh = _dd._hashed_shingles(spark, sf_dir)
    (hh.filter(is_base & (F.col("doc_id") % _BENCH_MOD == 0))
     .select("hsh").distinct()
     .write.mode("overwrite").parquet(path + "/bench"))
    fp_all = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
    (fp_all.filter(is_base)
     .write.mode("overwrite").parquet(path + "/fp"))
    merges = _tok.load_bpe_merges(
        spark, _tok._saved_tokenizer_path(spark, sf_dir))
    with open(path + "/merges.json", "w") as f:
        json.dump(merges, f)
    # the base pool: quality + base exact keeper + base-graph
    # canonical + decontam-vs-frozen-bench, split keyed on the BASE
    # cluster label, token budgets from the frozen merges
    base_docs = docs.filter(is_base)
    quality = (_tx.with_quality_score(
                   parallel_scan(spark, base_docs, "doc_id"))
               .filter(F.col("quality_score") >= _cu._QUALITY_MIN)
               .select("doc_id"))
    wfp = Window.partitionBy("fp")
    keepers = (fp_all.filter(is_base)
               .withColumn("keep", F.min("doc_id").over(wfp))
               .filter(F.col("doc_id") == F.col("keep"))
               .select("doc_id"))
    labels = _dd.cluster_labels_of(spark, clu)  # base-split CC labels
    canon = labels.filter(F.col("doc_id") == F.col("cluster_id"))
    bench = (spark.read.parquet(path + "/bench")
             .withColumn("hit", F.lit(1)))
    overlap = (hh.filter(is_base)
               .join(F.broadcast(bench), "hsh")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_overlap")))
    clean = (base_docs.select("doc_id")
             .join(overlap, "doc_id", "left")
             .filter(F.coalesce("n_overlap", F.lit(0))
                     < _cu._CONTAM_MIN)
             .select("doc_id"))
    ntok = _ntok_with_merges(base_docs.select("doc_id", "text"), merges)
    pool = (base_docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
            .select("doc_id", "source")
            .join(quality, "doc_id").join(keepers, "doc_id")
            .join(canon.select("doc_id", "cluster_id"), "doc_id")
            .join(clean, "doc_id").join(ntok, "doc_id")
            .withColumn("split", _split_col(F.col("cluster_id")))
            .select("doc_id", "source", "split", "n_tokens"))
    pool = pool.localCheckpoint(eager=True)  # consumed by rf AND pack
    rf = _rf_table(pool)
    rf.write.mode("overwrite").parquet(manifest_rf_path(path))
    rf_back = spark.read.parquet(manifest_rf_path(path))
    (_expand_and_pack(pool, rf_back, ingest_batch=-1)
     .repartition("split", "shard")
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("split", "shard", "ingest_batch")
     .parquet(manifest_rows_path(path)))
    return path


def _purge_manifest_batch(rows_dir: str, batch_id: int) -> None:
    """Remove every (split=*, shard=*, ingest_batch=batch_id) partition
    — the filesystem half of an idempotent batch re-run (a retry that
    admits FEWER (split, shard) streams than the failed attempt must
    not leave the attempt's extra partitions behind; dynamic overwrite
    alone only replaces partitions present in the new data)."""
    for d in glob.glob(os.path.join(
            rows_dir, "split=*", "shard=*",
            f"ingest_batch={int(batch_id)}")):
        shutil.rmtree(d, ignore_errors=True)


def update_manifest_index(spark: SparkSession, path: str,
                          docs: DataFrame, batch_id: int) -> None:
    """MAINTAIN the manifest: curate an arriving (doc_id, text[,
    source]) batch against the FROZEN base state and append its packed
    rows under the batch's own (split, shard, ingest_batch)
    partitions — purge-first, so a foreachBatch retry replaces exactly
    its own rows (see module docstring for the frozen-state
    semantics)."""
    if "source" not in docs.columns:
        docs = docs.withColumn("source", F.lit("stream"))
    cands = (docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
             .select("doc_id", "text", "source")
             .localCheckpoint(eager=True))
    quality = (_tx.with_quality_score(cands)
               .filter(F.col("quality_score") >= _cu._QUALITY_MIN)
               .select("doc_id"))
    fp = cands.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
    base_fp = (spark.read.parquet(path + "/fp")
               .select("fp").distinct().withColumn("in_base", F.lit(1)))
    wfp = Window.partitionBy("fp")
    fresh = (fp.join(base_fp, "fp", "left")
             .filter(F.col("in_base").isNull())
             .withColumn("keep", F.min("doc_id").over(wfp))
             .filter(F.col("doc_id") == F.col("keep"))
             .select("doc_id"))
    admitted = (_dd.probe_lsh_index(spark, cands.select("doc_id", "text"),
                                    path + "/clu/lsh")
                .filter(F.col("admitted") == 1).select("doc_id"))
    bench = (spark.read.parquet(path + "/bench")
             .withColumn("hit", F.lit(1)))
    overlap = (_dd._hashed_shingles_of(cands.select("doc_id", "text"))
               .join(F.broadcast(bench), "hsh")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_overlap")))
    clean = (cands.select("doc_id")
             .join(overlap, "doc_id", "left")
             .filter(F.coalesce("n_overlap", F.lit(0))
                     < _cu._CONTAM_MIN)
             .select("doc_id"))
    with open(path + "/merges.json") as f:
        merges = [tuple(m) for m in json.load(f)]
    ntok = _ntok_with_merges(cands.select("doc_id", "text"), merges)
    # admitted ⇒ novel vs base ⇒ singleton cluster ⇒ split keys on the
    # doc's own id (the cluster-split rule for a 1-doc cluster)
    pool = (cands.select("doc_id", "source")
            .join(quality, "doc_id").join(fresh, "doc_id")
            .join(admitted, "doc_id").join(clean, "doc_id")
            .join(ntok, "doc_id")
            .withColumn("split", _split_col(F.col("doc_id")))
            .select("doc_id", "source", "split", "n_tokens"))
    rf = spark.read.parquet(manifest_rf_path(path))
    rows = _expand_and_pack(pool, rf, ingest_batch=int(batch_id))
    _purge_manifest_batch(manifest_rows_path(path), int(batch_id))
    (rows.repartition("split", "shard")
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("split", "shard", "ingest_batch")
     .parquet(manifest_rows_path(path)))


_MANIFEST_INC_COLS = ("split", "source", "doc_id", "copy", "n_tokens",
                      "rf_ppm", "shard", "pack_id", "pack_offset",
                      "spans_boundary", "ingest_batch")


def read_manifest_rows(spark: SparkSession, path: str) -> DataFrame:
    """Loader-facing read of the maintained manifest: canonical column
    order/types (partition-type inference returns int32 dirs; the
    contract is int64), every (split, shard) stream pruned to its own
    directories, ordered within a stream by (ingest_batch, pack_id,
    pack_offset) — base packs first, then each batch's tail packs."""
    df = spark.read.parquet(manifest_rows_path(path))
    return df.select(*[F.col(c).cast("long").alias(c)
                       if c not in ("split", "source") else F.col(c)
                       for c in _MANIFEST_INC_COLS])


# ---------------------------------------------------------------------------
# the oracle — base + batch (+ global rebuild) re-derived from first
# principles in one statement
# ---------------------------------------------------------------------------


def _split_case_sql(key: str) -> str:
    h = _sa._salted_hash_sql("gsplit_", key)
    return (f"CASE WHEN {h} % 10 < 8 THEN 'train' "
            f"WHEN {h} % 10 = 8 THEN 'val' ELSE 'test' END")


def _pack_rows_sql(pool_cte: str, rf_cte: str, batch_lit: int) -> str:
    """The resample + pack stages over a pool CTE (doc_id, source,
    split, n_tokens) joined to a (source, rf_ppm) CTE with the
    1000000-ppm fallback — the SQL twin of _expand_and_pack."""
    bern = _sa._salted_hash_sql(_TDS_SALT, "p0.doc_id")
    return f"""
  SELECT split, source, doc_id,
         CAST(copy AS BIGINT) AS copy,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(rf_ppm AS BIGINT) AS rf_ppm,
         CAST(shard AS BIGINT) AS shard,
         CAST(shard * 1000000 + start_off // {_cu._PACK_BUDGET} AS BIGINT)
           AS pack_id,
         CAST(start_off % {_cu._PACK_BUDGET} AS BIGINT) AS pack_offset,
         CAST(CASE WHEN start_off % {_cu._PACK_BUDGET} + n_tokens
                        > {_cu._PACK_BUDGET}
                   THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary,
         CAST({batch_lit} AS BIGINT) AS ingest_batch
  FROM (
    SELECT doc_id, source, split, n_tokens, rf_ppm, copy,
           doc_id % {_cu._N_SHARDS} AS shard,
           coalesce(sum(n_tokens) OVER (
             PARTITION BY split, doc_id % {_cu._N_SHARDS}
             ORDER BY doc_id, copy
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS start_off
    FROM (
      SELECT p.doc_id, p.source, p.split, p.n_tokens, p.rf_ppm,
             CAST(u.i AS BIGINT) AS copy
      FROM (
        SELECT p0.*, coalesce(r0.rf_ppm, 1000000) AS rf_ppm,
               coalesce(r0.rf_ppm, 1000000) // 1000000
                 + CASE WHEN {bern} % 1000000
                             < coalesce(r0.rf_ppm, 1000000) % 1000000
                        THEN 1 ELSE 0 END AS copies
        FROM {pool_cte} p0 LEFT JOIN {rf_cte} r0 USING (source)
        WHERE p0.split = 'train'
      ) p, unnest(range(1, p.copies + 1)) AS u(i)
      UNION ALL
      SELECT doc_id, source, split, n_tokens,
             CAST(1000000 AS BIGINT) AS rf_ppm, CAST(1 AS BIGINT) AS copy
      FROM {pool_cte} WHERE split <> 'train'
    )
  )"""


def _rf_ctes_sql(prefix: str, pool_cte: str) -> str:
    """tau = 0.5 repeat-factor chain over a pool CTE's train split."""
    return f"""{prefix}c AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS m
  FROM {pool_cte} WHERE split = 'train' GROUP BY 1
),
{prefix}s AS (
  SELECT source, m,
         CAST(floor(1000000.0 * sqrt(CAST(m AS DOUBLE))) AS BIGINT)
           AS s_micro
  FROM {prefix}c
),
{prefix}t AS (
  SELECT CAST(sum(m) AS BIGINT) AS tok_tot,
         CAST(sum(s_micro) AS BIGINT) AS s_tot
  FROM {prefix}s
),
{prefix}rf AS (
  SELECT source, {_imp._RF_PPM_SQL} AS rf_ppm
  FROM {prefix}s CROSS JOIN {prefix}t
)"""


def _manifest_oracle_ctes(with_global: bool = False) -> str:
    """The shared WITH body: the encode chain (token budgets), the
    near-dup graphs (base + full reachability and the batch's
    base-edge flags, nested so the recursive CTEs stay local), the
    quality/fingerprint/bench probe relations, and the base + batch
    (+ global, for the rebuild diff) pools, rf chains and packed
    rows."""
    chain, ntok_cte, _ = _tok._encode_oracle_parts(agg_name="mi_ntok")
    base = f"doc_id % {_INC_MOD} <> 0"
    nonbench = f"doc_id % {_BENCH_MOD} <> 0"
    out = f"""{chain}{ntok_cte},
mi_labs AS MATERIALIZED (
  WITH RECURSIVE {_dd._cluster_cc_ctes()}
  SELECT d.doc_id,
         CAST(f.lab AS BIGINT) AS full_lab,
         CAST(b.lab AS BIGINT) AS base_lab,
         CAST(CASE WHEN EXISTS (
                SELECT 1 FROM edges e
                WHERE (e.src = d.doc_id AND e.dst % {_INC_MOD} <> 0)
                   OR (e.dst = d.doc_id AND e.src % {_INC_MOD} <> 0))
              THEN 1 ELSE 0 END AS BIGINT) AS has_base_edge
  FROM documents d
  JOIN fullab f ON f.doc_id = d.doc_id
  LEFT JOIN baselab b ON b.doc_id = d.doc_id
),
mi_q AS MATERIALIZED ({_tx.ORACLE["text_quality_score"]}),
mi_fp AS MATERIALIZED (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
),
mi_hh AS MATERIALIZED (
  SELECT doc_id, {_dd._HASH_SQL} AS hsh FROM ({_dd._SHINGLE_SQL})
),
mi_bench_base AS (
  SELECT DISTINCT hsh FROM mi_hh
  WHERE doc_id % {_BENCH_MOD} = 0 AND {base}
),
mi_ov_base AS MATERIALIZED (
  SELECT h.doc_id, count(*) AS n_overlap
  FROM mi_hh h JOIN mi_bench_base b USING (hsh) GROUP BY 1
),
mi_bex AS (
  SELECT doc_id,
         CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp)
              THEN 1 ELSE 0 END AS is_dup
  FROM mi_fp WHERE {base}
),
mi_base_pool AS MATERIALIZED (
  SELECT d.doc_id, d.source,
         {_split_case_sql("l.base_lab")} AS split,
         CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens
  FROM documents d
  JOIN mi_labs l ON l.doc_id = d.doc_id
  JOIN mi_q qq ON qq.doc_id = d.doc_id
  JOIN mi_bex e ON e.doc_id = d.doc_id
  LEFT JOIN mi_ntok t ON t.doc_id = d.doc_id
  LEFT JOIN mi_ov_base ob ON ob.doc_id = d.doc_id
  WHERE d.{base} AND d.{nonbench}
    AND qq.quality_score >= {_cu._QUALITY_MIN}
    AND e.is_dup = 0
    AND d.doc_id = l.base_lab
    AND coalesce(ob.n_overlap, 0) < {_cu._CONTAM_MIN}
),
{_rf_ctes_sql("mi_base_", "mi_base_pool")},
mi_base_rows AS MATERIALIZED ({_pack_rows_sql("mi_base_pool",
                                              "mi_base_rf", -1)}),
mi_basefp AS (SELECT DISTINCT fp FROM mi_fp WHERE {base}),
mi_batch_ex AS (
  SELECT f.doc_id, f.fp,
         CASE WHEN f.doc_id <> min(f.doc_id) OVER (PARTITION BY f.fp)
              THEN 1 ELSE 0 END AS batch_dup
  FROM mi_fp f
  JOIN documents d ON d.doc_id = f.doc_id
  WHERE d.doc_id % {_INC_MOD} = 0 AND d.{nonbench}
),
mi_batch_pool AS MATERIALIZED (
  SELECT d.doc_id, d.source,
         {_split_case_sql("d.doc_id")} AS split,
         CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens
  FROM documents d
  JOIN mi_labs l ON l.doc_id = d.doc_id
  JOIN mi_q qq ON qq.doc_id = d.doc_id
  JOIN mi_batch_ex e ON e.doc_id = d.doc_id
  LEFT JOIN mi_ntok t ON t.doc_id = d.doc_id
  LEFT JOIN mi_ov_base ob ON ob.doc_id = d.doc_id
  WHERE d.doc_id % {_INC_MOD} = 0 AND d.{nonbench}
    AND qq.quality_score >= {_cu._QUALITY_MIN}
    AND e.batch_dup = 0
    AND NOT EXISTS (SELECT 1 FROM mi_basefp b WHERE b.fp = e.fp)
    AND l.has_base_edge = 0
    AND coalesce(ob.n_overlap, 0) < {_cu._CONTAM_MIN}
),
mi_batch_rows AS MATERIALIZED ({_pack_rows_sql("mi_batch_pool",
                                               "mi_base_rf",
                                               _GATE_BATCH_ID)})"""
    if not with_global:
        return out
    return out + f""",
mi_bench_full AS (
  SELECT DISTINCT hsh FROM mi_hh WHERE doc_id % {_BENCH_MOD} = 0
),
mi_ov_full AS MATERIALIZED (
  SELECT h.doc_id, count(*) AS n_overlap
  FROM mi_hh h JOIN mi_bench_full b USING (hsh) GROUP BY 1
),
mi_gex AS (
  SELECT doc_id,
         CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp)
              THEN 1 ELSE 0 END AS is_dup
  FROM mi_fp
),
mi_g_pool AS MATERIALIZED (
  SELECT d.doc_id, d.source,
         {_split_case_sql("l.full_lab")} AS split,
         CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens
  FROM documents d
  JOIN mi_labs l ON l.doc_id = d.doc_id
  JOIN mi_q qq ON qq.doc_id = d.doc_id
  JOIN mi_gex e ON e.doc_id = d.doc_id
  LEFT JOIN mi_ntok t ON t.doc_id = d.doc_id
  LEFT JOIN mi_ov_full ov ON ov.doc_id = d.doc_id
  WHERE d.{nonbench}
    AND qq.quality_score >= {_cu._QUALITY_MIN}
    AND e.is_dup = 0
    AND d.doc_id = l.full_lab
    AND coalesce(ov.n_overlap, 0) < {_cu._CONTAM_MIN}
),
{_rf_ctes_sql("mi_g_", "mi_g_pool")},
mi_g_rows AS MATERIALIZED ({_pack_rows_sql("mi_g_pool", "mi_g_rf", -1)})"""


def _manifest_inc_oracle_sql() -> str:
    return f"""{_manifest_oracle_ctes()}
SELECT split, source, doc_id, copy, n_tokens, rf_ppm, shard, pack_id,
       pack_offset, spans_boundary, ingest_batch
FROM (SELECT * FROM mi_base_rows UNION ALL SELECT * FROM mi_batch_rows)
ORDER BY split, shard, ingest_batch, pack_id, pack_offset, doc_id, copy"""


def _manifest_rf_oracle_sql() -> str:
    return f"""{_manifest_oracle_ctes()}
SELECT source, CAST(rf_ppm AS BIGINT) AS rf_ppm
FROM mi_base_rf ORDER BY source"""


def _manifest_diff_oracle_sql() -> str:
    return f"""{_manifest_oracle_ctes(with_global=True)},
mi_inc_all AS (
  SELECT * FROM mi_base_rows UNION ALL SELECT * FROM mi_batch_rows
),
mi_diff AS (
  SELECT coalesce(g.split, i.split) AS split,
         CASE WHEN i.doc_id IS NULL THEN 'added'
              WHEN g.doc_id IS NULL THEN 'dropped'
              WHEN g.split = i.split AND g.shard = i.shard
                   AND g.pack_id = i.pack_id
                   AND g.pack_offset = i.pack_offset THEN 'stable'
              ELSE 'moved' END AS status
  FROM mi_g_rows g
  FULL OUTER JOIN mi_inc_all i
    ON g.doc_id = i.doc_id AND g.copy = i.copy
)
SELECT split,
       CAST(sum(CASE WHEN status <> 'dropped' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rebuild,
       CAST(sum(CASE WHEN status <> 'added' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_incremental,
       CAST(sum(CASE WHEN status = 'stable' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stable,
       CAST(sum(CASE WHEN status = 'moved' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_added,
       CAST(sum(CASE WHEN status = 'dropped' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped
FROM mi_diff GROUP BY split ORDER BY split"""


# ---------------------------------------------------------------------------
# gated queries
# ---------------------------------------------------------------------------


def _build_gate_artifact(spark: SparkSession, sf_dir: str) -> str:
    """Build on the base split + fold the standard increment (doc_id %
    {_INC_MOD} == 0) in as batch {_GATE_BATCH_ID} — the one-batch
    lifecycle every incremental gate here uses."""
    p = build_manifest_index(spark, sf_dir)
    inc = (load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") % _INC_MOD == 0)
           .select("doc_id", "text", "source"))
    update_manifest_index(spark, p, inc, batch_id=_GATE_BATCH_ID)
    return p


def _gate_artifact_path(spark: SparkSession, sf_dir: str) -> str:
    return cached_scalar(spark, sf_dir, "manifest_inc_path",
                         lambda: _build_gate_artifact(spark, sf_dir))


@q("corpus_manifest_incremental", _manifest_inc_oracle_sql())
def corpus_manifest_incremental(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The incrementally-maintained manifest SERVED from the artifact:
    base build (doc_id % {_INC_MOD} != 0) + one appended batch (the
    % {_INC_MOD} == 0 increment), read back. The oracle re-derives
    BOTH the base composition (base-graph labels, base rf) and the
    batch's frozen-state curation (admission edges vs base, frozen
    bench/fingerprints/rf/merges, batch-local packing) from first
    principles — a green row proves the maintained artifact equals
    recomputing the incremental semantics from scratch, bit for bit.

    Scale path: the served read is a pruned parquet scan of rows/;
    the batch fold that produced it was probe-bounded (see module
    docstring) — nothing here re-reads base text."""
    return (read_manifest_rows(spark, _gate_artifact_path(spark, sf_dir))
            .orderBy("split", "shard", "ingest_batch", "pack_id",
                     "pack_offset", "doc_id", "copy"))


@q("corpus_manifest_frozen_rf", _manifest_rf_oracle_sql())
def corpus_manifest_frozen_rf(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The FROZEN mixture-weight table served from the artifact — the
    (source, rf_ppm) repeat factors every appended batch resamples
    under until a rebuild refits them (FAISS's saved-ranges contract
    applied to temperature sampling). Oracle: the tau = 0.5 chain over
    the base train split."""
    p = _gate_artifact_path(spark, sf_dir)
    return (spark.read.parquet(manifest_rf_path(p))
            .select("source", F.col("rf_ppm").cast("long")
                    .alias("rf_ppm"))
            .orderBy("source"))


_G_ROWS_MEMO: dict = _register_memo({})


def _global_rebuild_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The from-scratch GLOBAL re-curation under this family's edge
    rule (full-graph labels from the maintained cluster artifact,
    global exact keepers, full bench set, fresh rf) — the rebuild the
    diff report prices. Memoized per (session, dataset): the diff
    consumes it beside the incremental read."""
    from ..sources.loader import _session_key
    key = (_session_key(spark), os.path.abspath(sf_dir))
    if key in _G_ROWS_MEMO:
        return _G_ROWS_MEMO[key]
    docs = load_table(spark, sf_dir, "documents")
    quality = (_tx.with_quality_score(
                   parallel_scan(spark, docs, "doc_id"))
               .filter(F.col("quality_score") >= _cu._QUALITY_MIN)
               .select("doc_id"))
    fp = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
    wfp = Window.partitionBy("fp")
    keepers = (fp.withColumn("keep", F.min("doc_id").over(wfp))
               .filter(F.col("doc_id") == F.col("keep"))
               .select("doc_id"))
    labels = (_dd.dedup_incremental_clusters(spark, sf_dir)
              .select("doc_id", "cluster_id"))
    canon = labels.filter(F.col("doc_id") == F.col("cluster_id"))
    hh = _dd._hashed_shingles(spark, sf_dir)
    bench = (hh.filter(F.col("doc_id") % _BENCH_MOD == 0)
             .select("hsh").distinct().withColumn("hit", F.lit(1)))
    overlap = (hh.join(F.broadcast(bench), "hsh")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_overlap")))
    clean = (docs.select("doc_id")
             .join(overlap, "doc_id", "left")
             .filter(F.coalesce("n_overlap", F.lit(0))
                     < _cu._CONTAM_MIN)
             .select("doc_id"))
    merges = _tok.load_bpe_merges(
        spark, _tok._saved_tokenizer_path(spark, sf_dir))
    ntok = _ntok_with_merges(docs.select("doc_id", "text"), merges)
    pool = (docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
            .select("doc_id", "source")
            .join(quality, "doc_id").join(keepers, "doc_id")
            .join(canon.select("doc_id", "cluster_id"), "doc_id")
            .join(clean, "doc_id").join(ntok, "doc_id")
            .withColumn("split", _split_col(F.col("cluster_id")))
            .select("doc_id", "source", "split", "n_tokens")
            .localCheckpoint(eager=True))
    out = (_expand_and_pack(pool, _rf_table(pool), ingest_batch=-1)
           .localCheckpoint(eager=True))
    _G_ROWS_MEMO[key] = out
    return out


@q("corpus_manifest_rebuild_diff", _manifest_diff_oracle_sql())
def corpus_manifest_rebuild_diff(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The REBUILD cost census (VERDICT r13 #2's manifest-diff report):
    per split, how many (doc, copy) rows of the incremental state a
    from-scratch global re-curation keeps in place (stable), re-packs
    (moved), adds (rows only a global view admits — rf drift restoring
    lost epoch copies, canonical flips), or drops (rows incremental
    admission let in that global curation rejects — e.g. within-batch
    near-dup survivors). This is the re-shuffle a maintenance window
    pays, measured BEFORE paying it — the signal that schedules
    rebuilds, exactly as clip_ppm schedules SQ8 retrains.

    Scale path: one (doc_id, copy) full-outer join between the
    artifact read and the rebuild composition + a k-row aggregate;
    both sides are narrow int64 projections."""
    inc = read_manifest_rows(spark, _gate_artifact_path(spark, sf_dir))
    reb = _global_rebuild_rows(spark, sf_dir)
    g = reb.select(F.col("doc_id").alias("g_doc"),
                   F.col("copy").alias("g_copy"),
                   F.col("split").alias("g_split"),
                   F.col("shard").alias("g_shard"),
                   F.col("pack_id").alias("g_pack"),
                   F.col("pack_offset").alias("g_off"))
    i = inc.select(F.col("doc_id").alias("i_doc"),
                   F.col("copy").alias("i_copy"),
                   F.col("split").alias("i_split"),
                   F.col("shard").alias("i_shard"),
                   F.col("pack_id").alias("i_pack"),
                   F.col("pack_offset").alias("i_off"))
    j = g.join(i, (F.col("g_doc") == F.col("i_doc"))
               & (F.col("g_copy") == F.col("i_copy")), "full")
    status = (F.when(F.col("i_doc").isNull(), "added")
              .when(F.col("g_doc").isNull(), "dropped")
              .when((F.col("g_split") == F.col("i_split"))
                    & (F.col("g_shard") == F.col("i_shard"))
                    & (F.col("g_pack") == F.col("i_pack"))
                    & (F.col("g_off") == F.col("i_off")), "stable")
              .otherwise(F.lit("moved")))
    return (j.select(F.coalesce("g_split", "i_split").alias("split"),
                     status.alias("status"))
            .groupBy("split")
            .agg(F.sum(F.when(F.col("status") != "dropped", 1)
                       .otherwise(0)).cast("long").alias("n_rebuild"),
                 F.sum(F.when(F.col("status") != "added", 1)
                       .otherwise(0)).cast("long")
                 .alias("n_incremental"),
                 F.sum(F.when(F.col("status") == "stable", 1)
                       .otherwise(0)).cast("long").alias("n_stable"),
                 F.sum(F.when(F.col("status") == "moved", 1)
                       .otherwise(0)).cast("long").alias("n_moved"),
                 F.sum(F.when(F.col("status") == "added", 1)
                       .otherwise(0)).cast("long").alias("n_added"),
                 F.sum(F.when(F.col("status") == "dropped", 1)
                       .otherwise(0)).cast("long").alias("n_dropped"))
            .orderBy("split"))
