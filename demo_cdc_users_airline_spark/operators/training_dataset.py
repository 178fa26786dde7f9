"""The end-to-end training-dataset build — ONE gated composition of
the already-green pipeline stages into the deliverable an LLM-data
pipeline exists to produce (VERDICT r12 #1, the capstone):

  curation verdict        (curation.curation_verdict — keep docs that
                           pass quality + exact-dedup + near-dup
                           canonical + decontamination)
  → cluster-aware split   (sampling.corpus_cluster_split — near-dup
                           clusters never straddle train/val/test)
  → artifact-served encode (tokenizer.text_bpe_encode_served — BPE
                           token budgets under the PERSISTED tokenizer,
                           never retrained in the build)
  → temperature resample  (importance's tau = 0.5 epoch expansion,
                           TRAIN split only — eval splits are never
                           epoch-repeated)
  → sequence packing      (curation.corpus_pack_chunks's concat-and-
                           chunk layout over the resampled stream)

Output: one row per (doc, epoch-copy) with its (split, source) tags,
its BPE token budget, and its packed position — (shard, pack_id,
pack_offset, spans_boundary). This is the manifest a trainer's data
loader consumes: which sequence file (pack) each document copy lands
in, where, and under which split.

Reference parity: the reference's product test is exactly this shape —
an end-to-end source-to-destination convergence check over the whole
pipeline (demo_users.py:239-264); here the "destination" is the
training manifest and the oracle re-derives every stage from first
principles, so one green row certifies the composition, not just the
parts.

Scale path: every stage keeps its own documented layout (memoized
verdict/label artifacts, bounded rf table broadcast back, the
per-(split, shard) packing windows — never a global sort); the
composition itself adds only doc_id equi-joins of (doc_id, small)
frames and one explode bounded by the epoch factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import load_table
from . import curation as _cu
from . import importance as _imp
from . import sampling as _sa
from . import tokenizer as _tok

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


_TDS_SALT = "tds_"  # Bernoulli salt for the epoch-fraction draw —
# deliberately distinct from corpus_temperature_sample's "temp_" so the
# two materializations draw independent coins


def _training_dataset_oracle_sql() -> str:
    """Every stage re-derived from the corpus: the BPE encode chain
    (training + per-doc token counts), the curation verdict, the
    cluster-split labels, the train-split temperature table, the epoch
    explode, and the packing windows — one SQL statement, so the gate
    hash certifies the full chain end to end."""
    # the encode rollup is normally named `agg`; the nested
    # decontamination SQL (inside tds_verdict) defines its own `agg`,
    # and DuckDB's binder mis-resolves the shadowed name when the outer
    # twin is MATERIALIZED — so this composition asks the structured
    # oracle builder for a non-shadowing name (ADVICE r13 #3: no more
    # pattern-slicing/replacing rendered SQL)
    chain, ntok_cte, _ = _tok._encode_oracle_parts(agg_name="tds_ntok")
    enc_body = chain + ntok_cte
    return f"""{enc_body},
tds_verdict AS ({_cu._curation_oracle_sql()}),
tds_labels AS ({_sa._dd._cluster_oracle_sql()}),
tds_split AS (
  SELECT doc_id,
         CASE WHEN {_sa._salted_hash_sql("gsplit_", "cluster_id")} % 10 < 8
              THEN 'train'
              WHEN {_sa._salted_hash_sql("gsplit_", "cluster_id")} % 10 = 8
              THEN 'val' ELSE 'test' END AS split
  FROM tds_labels
),
tds_pool AS (
  SELECT d.doc_id, d.source, s.split,
         CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens
  FROM documents d
  JOIN tds_verdict v ON v.doc_id = d.doc_id AND v.retained = 1
  JOIN tds_split s ON s.doc_id = d.doc_id
  LEFT JOIN tds_ntok a ON a.doc_id = d.doc_id
),
tds_c AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS m
  FROM tds_pool WHERE split = 'train' GROUP BY 1
),
tds_s AS (
  SELECT source, m,
         CAST(floor(1000000.0 * sqrt(CAST(m AS DOUBLE))) AS BIGINT)
           AS s_micro
  FROM tds_c
),
tds_t AS (
  SELECT CAST(sum(m) AS BIGINT) AS tok_tot,
         CAST(sum(s_micro) AS BIGINT) AS s_tot
  FROM tds_s
),
tds_rf AS (
  SELECT source, {_imp._RF_PPM_SQL} AS rf_ppm
  FROM tds_s CROSS JOIN tds_t
),
tds_stream AS (
  SELECT p.doc_id, p.source, p.split, p.n_tokens, p.rf_ppm,
         CAST(u.i AS BIGINT) AS copy
  FROM (
    SELECT p0.*, r0.rf_ppm,
           r0.rf_ppm // 1000000
             + CASE WHEN {_sa._salted_hash_sql(_TDS_SALT, "p0.doc_id")}
                         % 1000000 < r0.rf_ppm % 1000000
                    THEN 1 ELSE 0 END AS copies
    FROM tds_pool p0 JOIN tds_rf r0 USING (source)
    WHERE p0.split = 'train'
  ) p, unnest(range(1, p.copies + 1)) AS u(i)
  UNION ALL
  SELECT doc_id, source, split, n_tokens,
         CAST(1000000 AS BIGINT) AS rf_ppm, CAST(1 AS BIGINT) AS copy
  FROM tds_pool WHERE split <> 'train'
),
tds_pack AS (
  SELECT doc_id, source, split, n_tokens, rf_ppm, copy,
         doc_id % {_cu._N_SHARDS} AS shard,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY split, doc_id % {_cu._N_SHARDS}
           ORDER BY doc_id, copy
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM tds_stream
)
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
                 THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
FROM tds_pack"""


@q("corpus_training_dataset", _training_dataset_oracle_sql())
def corpus_training_dataset(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """The training-dataset MANIFEST: every epoch-copy of every
    retained document with its leakage-free split, source, BPE token
    budget (served from the persisted tokenizer artifact), and packed
    position — the single deliverable the whole LLM-data pipeline
    composes into (see module docstring for the five chained stages).

    Semantics pinned here:
    - only ``retained = 1`` docs (the curation verdict) enter;
    - the split keys on the near-dup CLUSTER (corpus_cluster_split's
      rule, same salt — a near-duplicate can never leak across
      splits);
    - temperature resampling (tau = 0.5 over train-split source token
      masses) applies to the TRAIN split only; val/test rows carry
      rf_ppm = 1000000 and exactly one copy — evaluation sets are
      never epoch-expanded;
    - packing lays (doc_id, copy) streams end-to-end per (split,
      shard) and cuts {_PACK} -token sequences — pack_id is unique
      within a split.

    Scale path: the heavy stages are the memoized/persisted artifacts
    they were gated as (verdict cache, cluster labels, tokenizer
    artifact); this query adds three doc_id equi-joins of narrow
    frames, ONE bounded (sources × 1) rf broadcast, an explode capped
    by the epoch factor, and the per-(split, shard) packing windows —
    {_SH} independent streams, no global sort, no partition-less
    window anywhere."""
    verdict = (_cu.curation_verdict(spark, sf_dir)
               .filter(F.col("retained") == 1).select("doc_id"))
    split = (_sa.corpus_cluster_split(spark, sf_dir)
             .select("doc_id", "split"))
    enc = (_tok.text_bpe_encode_served(spark, sf_dir)
           .select("doc_id", "n_tokens"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pool = (d.join(verdict, "doc_id")
            .join(split, "doc_id")
            .join(enc, "doc_id"))

    trn = pool.filter(F.col("split") == "train")
    c = trn.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("m"))
    s = c.select("source", "m",
                 F.floor(F.lit(1000000.0)
                         * F.sqrt(F.col("m").cast("double")))
                 .cast("long").alias("s_micro"))
    t = s.agg(F.sum("m").cast("long").alias("tok_tot"),
              F.sum("s_micro").cast("long").alias("s_tot"))
    rf = (s.crossJoin(F.broadcast(t))
          .select("source", F.expr(_imp._RF_PPM_SQL).alias("rf_ppm")))

    # ONE pass over pool instead of a train/eval UNION (r14): eval
    # rows ride the SAME copies formula under rf_ppm = 1000000 —
    # div = 1 and the Bernoulli draw compares hash % 1e6 < 0, so
    # copies is exactly 1 and copy = 1, the literal the eval branch
    # used to emit. The left broadcast join attaches train rf to all
    # rows; the when() overrides it outside the train split.
    bern = F.when(
        _sa._salted_hash(_TDS_SALT, F.col("doc_id")) % 1000000
        < F.col("rf_ppm") % 1000000, 1).otherwise(0)
    stream = (pool.join(F.broadcast(rf), "source", "left")
              .withColumn("rf_ppm",
                          F.when(F.col("split") == "train",
                                 F.col("rf_ppm"))
                          .otherwise(F.lit(1000000)).cast("long"))
              .withColumn("copies",
                          (F.expr("rf_ppm div 1000000") + bern)
                          .cast("long"))
              .withColumn("copy", F.explode(F.expr(
                  "CASE WHEN copies >= 1 THEN"
                  " sequence(CAST(1 AS BIGINT), copies)"
                  " ELSE CAST(array() AS ARRAY<BIGINT>) END")))
              .select("doc_id", "source", "split", "n_tokens",
                      "rf_ppm", "copy")
              .withColumn("shard", F.col("doc_id") % _cu._N_SHARDS))

    w = (Window.partitionBy("split", "shard").orderBy("doc_id", "copy")
         .rowsBetween(Window.unboundedPreceding, -1))
    start_off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (stream.withColumn("start_off", start_off)
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


# docstring format args (kept out of the function body so the docstring
# renders the real constants)
corpus_training_dataset.__doc__ = corpus_training_dataset.__doc__.replace(
    "{_PACK}", str(_cu._PACK_BUDGET)).replace("{_SH}", str(_cu._N_SHARDS))


# ---------------------------------------------------------------------------
# the PERSISTED manifest — the deliverable as an artifact (the repo's
# "everything served is a maintained artifact" rule applied to the
# capstone: a trainer's data loader reads THIS, not a live query)
# ---------------------------------------------------------------------------


def _manifest_path(sf_dir: str) -> str:
    import hashlib
    import os

    from ..core.session import scratch_root
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(scratch_root(), "training_manifest", key)


def write_training_dataset(spark: SparkSession, sf_dir: str,
                           path: str | None = None) -> str:
    """MATERIALIZE the manifest, partitioned by (split, shard) — the
    layout a data loader consumes (one shard's packs read
    sequentially, shards in parallel, splits never co-mingled). A
    build is a FULL rewrite under STATIC partitionOverwriteMode (the
    CLAUDE.md partitioned-artifact rule: dynamic overwrite would leave
    old-layout partitions behind after an upstream re-curation changes
    which (split, shard) pairs exist); re-running a build is
    idempotent — the manifest is a pure function of the corpus and
    the persisted tokenizer artifact."""
    path = path or _manifest_path(sf_dir)
    (corpus_training_dataset(spark, sf_dir)
     .repartition("split", "shard")
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("split", "shard")
     .parquet(path))
    return path


def _built_manifest_path(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.loader import cached_scalar
    return cached_scalar(spark, sf_dir, "training_manifest_path",
                         lambda: write_training_dataset(spark, sf_dir))


_MANIFEST_COLS = ("split", "source", "doc_id", "copy", "n_tokens",
                  "rf_ppm", "shard", "pack_id", "pack_offset",
                  "spans_boundary")


def read_training_dataset(spark: SparkSession, path: str) -> DataFrame:
    """The loader-facing read: canonical column order/types restored
    (partition-column type inference turns shard into int; the
    contract is int64 everywhere)."""
    df = spark.read.parquet(path)
    return df.select(*[F.col(c).cast("long").alias(c)
                       if c not in ("split", "source") else F.col(c)
                       for c in _MANIFEST_COLS])


@q("corpus_training_manifest", _training_dataset_oracle_sql())
def corpus_training_manifest(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The manifest SERVED from the persisted artifact — the lifecycle
    gate of write_training_dataset (the text_bpe_encode_served pattern
    applied to the capstone): the composition is materialized once
    (build) and every consumer reads the parquet back; the oracle
    re-derives the full five-stage chain from the corpus, so a green
    row proves write → read ≡ compose bit-for-bit (int64/string
    round-trip through the (split, shard) partition layout included).

    Scale path: consumers never re-run the composition — the read is
    a partition-pruned parquet scan; a data loader asking for one
    (split, shard) stream touches exactly one directory
    (plan-proven in tests/test_training_manifest.py)."""
    return read_training_dataset(
        spark, _built_manifest_path(spark, sf_dir))


@q("corpus_pack_manifest", f"""
WITH m AS ({_training_dataset_oracle_sql()})
SELECT split, CAST(shard AS BIGINT) AS shard,
       CAST(pack_id AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       CAST(sum(spans_boundary) AS BIGINT) AS n_spanning
FROM m GROUP BY 1, 2, 3""")
def corpus_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-level rollup of the PERSISTED manifest: per (split, shard,
    pack_id), how many documents START in the pack, their summed token
    budget, and how many spill over the boundary — the shard/pack
    census a training scheduler sizes epochs with (and the row count a
    loader sanity-checks after every rebuild).

    Scale path: one map-side-combinable aggregate over the artifact
    read; grouping keys are a prefix of the partition layout, so at
    production scale the scan feeds combiners partition-locally."""
    return (corpus_training_manifest(spark, sf_dir)
            .groupBy("split", "shard", "pack_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("pack_tokens"),
                 F.sum("spans_boundary").cast("long")
                 .alias("n_spanning")))
