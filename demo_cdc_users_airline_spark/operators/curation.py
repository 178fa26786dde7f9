"""Corpus-curation operators: the stages between raw documents and a
training set that the dedup/text/similarity families feed.

- **benchmark decontamination**: flag training documents sharing ≥ N
  distinct 3-word shingles with a held-out eval set (the 13-gram
  overlap filter of GPT-3/Llama reports, at demo shingle width). The
  eval set is tiny next to the corpus, so its shingle-hash set is
  broadcast — the corpus side is one map + one broadcast probe + one
  groupBy on doc_id; the shuffle moves 8-byte hashes, never text.
- **sequence packing** (concat-and-chunk): documents are concatenated
  per shard in doc_id order and split at a fixed token budget — the
  layout LLM pretraining actually uses. Sharding makes it distributed:
  each shard packs independently (PARTITION BY shard window), so the
  only shuffle is the shard exchange and each task sorts one shard.
  Global greedy bin-packing is inherently sequential; the sharded
  concat form is the scalable equivalent (each shard emits its own
  pack-id space).
- **end-to-end curation verdict**: per-document retained/dropped with
  the reason flags, composing quality scoring (text.py), exact dedup
  (dedup.py), near-dup clustering (dedup_cluster_labels) and
  decontamination. On a cluster this is three joins on doc_id over
  column-pruned single-column frames — the fingerprint/cluster/flag
  columns, never text or embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import load_table, local_frame, parallel_scan
from . import dedup as _dd
from . import text as _tx

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

# the held-out "benchmark" slice: doc_id ≡ 0 (mod 97) — ~1% of docs,
# standing in for an external eval suite table
_BENCH_MOD = 97
# a training doc sharing ≥ this many distinct shingle hashes with the
# benchmark set is contaminated
_CONTAM_MIN = 5

_DECON_SQL = f"""
WITH sh AS ({_dd._SHINGLE_SQL}),
hh AS (SELECT doc_id, {_dd._HASH_SQL} AS hsh FROM sh),
bench AS (SELECT DISTINCT hsh FROM hh WHERE doc_id % {_BENCH_MOD} = 0),
marked AS (
  SELECT h.doc_id, CASE WHEN b.hsh IS NULL THEN 0 ELSE 1 END AS hit
  FROM hh h LEFT JOIN bench b USING (hsh)
  WHERE h.doc_id % {_BENCH_MOD} <> 0
),
agg AS (
  SELECT doc_id, count(*) AS n_shingles, sum(hit) AS n_overlap
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(a.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(CASE WHEN coalesce(a.n_overlap, 0) >= {_CONTAM_MIN}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id % {_BENCH_MOD} <> 0
"""


@q("corpus_decontaminate", _DECON_SQL)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct shingle hashes appear anywhere in the benchmark slice, and
    a contamination flag at ≥ _CONTAM_MIN shared shingles.

    Scale path: the benchmark shingle-hash set is bounded by the eval
    suite size (thousands of docs), so it broadcasts; the corpus pays
    one shingle map + broadcast probe + one groupBy(doc_id) — 8-byte
    hashes on the wire. Docs with < 3 tokens shingle to nothing and
    surface with zero counts via the left join (oracle-identical)."""
    hh = _dd._hashed_shingles(spark, sf_dir)  # shared cached scan
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = (hh.filter(is_bench).select("hsh").distinct()
             .withColumn("hit", F.lit(1)))
    agg = (hh.filter(~is_bench)
           .join(F.broadcast(bench), "hsh", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.sum(F.coalesce("hit", F.lit(0))).alias("n_overlap")))
    return (load_table(spark, sf_dir, "documents")
            .filter(~is_bench)
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
                F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
                F.when(F.coalesce("n_overlap", F.lit(0)) >= _CONTAM_MIN, 1)
                 .otherwise(0).cast("long").alias("is_contaminated")))


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the broadcast-bloom production gate)
# ---------------------------------------------------------------------------

# m = 2^16 bits (8 KB) suffices for the demo benchmark's ~10^3 distinct
# shingles at ~5% fill; production sizes m ∝ benchmark shingle count
# (2^30 bits = 128 MB covers 10^8 eval shingles at 10% fill — still
# broadcastable where the exact hash SET would be many GB).
_BLOOM_M = 1 << 16
_BLOOM_K = 3


def _bloom_h_sql(hsh: str = "hsh") -> str:
    """ONE fresh 60-bit md5 per shingle whose disjoint 16-bit slices
    supply all k probe positions (Spark SQL). A fresh hash is required
    — ``hsh`` itself has only 31 bits of entropy (Mersenne-reduced) —
    and it must not be an affine family a_j·h+b_j mod 2^16, which is
    NOT independent (h1 ≡ h2 mod m fires all k probes at once,
    collapsing the filter to one modular hash; measured 0.4% FP vs the
    ~1e-6 slice construction). k=3 16-bit slices use 48 of the 60 bits;
    FP ≈ fill³ stays ~1e-6 at the demo fill."""
    return (f"CAST(conv(substring(md5(concat('bp_',"
            f" CAST({hsh} AS STRING))), 1, 15), 16, 10) AS BIGINT)")


def _bloom_h_duck(hsh: str) -> str:
    return (f"(('0x' || substr(md5('bp_' ||"
            f" CAST({hsh} AS VARCHAR)), 1, 15))::BIGINT)")


def _bloom_pos(j: int, h: str) -> str:
    """Probe j's bit position from the bound slice-hash column — plain
    integer ops, identical text in both engines."""
    return f"(({h} >> {16 * j}) & {_BLOOM_M - 1})"


def _bloom_words(spark: SparkSession, sf_dir: str) -> list[int]:
    """The benchmark shingle Bloom filter as 1024 signed int64 words —
    a bounded artifact (8 KB regardless of corpus size), memoized like
    the kmeans/PQ codebooks; positions come from the cached
    hashed-shingle frame."""
    def build():
        hh = _dd._hashed_shingles(spark, sf_dir)
        pos_cols = [F.expr(_bloom_pos(j, "__bh")) for j in range(_BLOOM_K)]
        rows = (hh.filter(F.col("doc_id") % _BENCH_MOD == 0)
                .withColumn("__bh", F.expr(_bloom_h_sql()))
                .select(F.explode(F.array(*pos_cols)).alias("pos"))
                .distinct().collect())
        words = [0] * (_BLOOM_M // 64)
        for r in rows:
            p = int(r["pos"])
            words[p // 64] |= 1 << (p % 64)
        # two's-complement into signed int64 for the BIGINT array literal
        return [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    from ..sources.loader import cached_scalar
    return cached_scalar(spark, sf_dir, f"bloom_m{_BLOOM_M}_k{_BLOOM_K}", build)


def _bloom_oracle_sql() -> str:
    pos_list = ", ".join(_bloom_pos(j, "bh") for j in range(_BLOOM_K))
    return f"""
WITH sh AS ({_dd._SHINGLE_SQL}),
hh AS (SELECT doc_id, shingle, {_dd._HASH_SQL} AS hsh FROM sh),
hhb AS (SELECT doc_id, shingle, hsh, {_bloom_h_duck("hsh")} AS bh FROM hh),
bench_pos AS (
  SELECT DISTINCT unnest([{pos_list}]) AS pos
  FROM hhb WHERE doc_id % {_BENCH_MOD} = 0
),
bench_set AS (SELECT DISTINCT hsh FROM hhb WHERE doc_id % {_BENCH_MOD} = 0),
train AS (SELECT doc_id, shingle, hsh, bh FROM hhb
          WHERE doc_id % {_BENCH_MOD} <> 0),
bloom_hits AS (
  SELECT t.doc_id, t.shingle
  FROM train t
  CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j) p
  JOIN bench_pos bp
    ON bp.pos = ((t.bh >> (16 * p.j)) & {_BLOOM_M - 1})
  GROUP BY t.doc_id, t.shingle
  HAVING count(*) = {_BLOOM_K}
),
agg AS (
  SELECT t.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN bh.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_bloom,
         sum(CASE WHEN bs.hsh IS NOT NULL THEN 1 ELSE 0 END) AS n_exact
  FROM train t
  LEFT JOIN bloom_hits bh ON bh.doc_id = t.doc_id AND bh.shingle = t.shingle
  LEFT JOIN bench_set bs ON bs.hsh = t.hsh
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(a.n_bloom, 0) AS BIGINT) AS n_bloom_hits,
       CAST(coalesce(a.n_exact, 0) AS BIGINT) AS n_exact_overlap,
       CAST(coalesce(a.n_bloom, 0) - coalesce(a.n_exact, 0) AS BIGINT)
         AS n_false_pos,
       CAST(CASE WHEN coalesce(a.n_bloom, 0) >= {_CONTAM_MIN}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_flagged
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id % {_BENCH_MOD} <> 0
"""


@q("corpus_decontaminate_bloom", _bloom_oracle_sql())
def corpus_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: the production-scale variant of
    corpus_decontaminate. The benchmark shingle set compresses into an
    m-bit Bloom bitmask (a bounded broadcast artifact — 8 KB here,
    ~100 MB for a 10^8-shingle eval suite, where the exact hash set
    would be many GB); every corpus shingle is probed IN-ROW against
    the broadcast words with k positional hashes, so the train side
    pays ZERO joins — one shingle map + one groupBy(doc_id). The exact
    overlap (broadcast-set join, corpus_decontaminate's layout) rides
    along to quantify the filter's false-positive cost per document —
    Bloom has no false negatives, so n_bloom_hits ≥ n_exact_overlap and
    the flag is a superset gate.

    Integer-exact end-to-end; the oracle evaluates the identical probe
    arithmetic relationally (position-set join + all-k HAVING)."""
    hh = _dd._hashed_shingles(spark, sf_dir)
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    words = _bloom_words(spark, sf_dir)
    wdf = local_frame(spark, [(words,)], "__bloom array<bigint>")
    bit = " AND ".join(
        f"((__bloom[CAST({_bloom_pos(j, '__bh')} DIV 64 AS INT)]"
        f" >> CAST({_bloom_pos(j, '__bh')} % 64 AS INT)) & 1) = 1"
        for j in range(_BLOOM_K))
    bench = (hh.filter(is_bench).select("hsh").distinct()
             .withColumn("__exact", F.lit(1)))
    agg = (hh.filter(~is_bench)
           .withColumn("__bh", F.expr(_bloom_h_sql()))
           .crossJoin(F.broadcast(wdf))
           .withColumn("__bloom_hit", F.expr(f"CASE WHEN {bit} THEN 1 ELSE 0 END"))
           .join(F.broadcast(bench), "hsh", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.sum("__bloom_hit").alias("n_bloom"),
                F.sum(F.coalesce("__exact", F.lit(0))).alias("n_exact")))
    return (load_table(spark, sf_dir, "documents")
            .filter(~is_bench)
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
                F.coalesce("n_bloom", F.lit(0)).cast("long").alias("n_bloom_hits"),
                F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact_overlap"),
                (F.coalesce("n_bloom", F.lit(0)) - F.coalesce("n_exact", F.lit(0)))
                .cast("long").alias("n_false_pos"),
                F.when(F.coalesce("n_bloom", F.lit(0)) >= _CONTAM_MIN, 1)
                 .otherwise(0).cast("long").alias("is_flagged")))


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048   # tokens per training sequence
_N_SHARDS = 64        # independent packing streams; scale with the cluster


@q("corpus_pack_chunks", rf"""
WITH toks AS (
  SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
         len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM toks
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(shard * 1000000 + start_off // {_PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(start_off % {_PACK_BUDGET} AS BIGINT) AS pack_offset,
       CAST(CASE WHEN start_off % {_PACK_BUDGET} + n_tokens > {_PACK_BUDGET}
                 THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
FROM w
""")
def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per shard, documents are laid
    end-to-end in doc_id order and cut into _PACK_BUDGET-token training
    sequences; each doc reports the pack where it starts, its offset in
    that pack, and whether it spans a pack boundary.

    Scale path: ONE shuffle (hash on shard), then a per-shard window —
    each of the _N_SHARDS streams packs independently, which is how
    distributed pretraining tokenizers actually shard the corpus. A
    single global ORDER BY would serialize on one task; the shard
    count is the parallelism dial."""
    toks = (parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                          "doc_id")
            .select("doc_id",
                    (F.col("doc_id") % _N_SHARDS).alias("shard"),
                    F.size(_tx.tokens("text")).alias("n_tokens")))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (toks.withColumn("start_off", off)
            .select(
                "doc_id",
                F.col("shard").cast("long").alias("shard"),
                F.col("n_tokens").cast("long").alias("n_tokens"),
                (F.col("shard") * 1000000
                 + F.expr(f"start_off div {_PACK_BUDGET}"))
                .cast("long").alias("pack_id"),
                (F.col("start_off") % _PACK_BUDGET).cast("long").alias("pack_offset"),
                F.when(F.col("start_off") % _PACK_BUDGET + F.col("n_tokens")
                       > _PACK_BUDGET, 1)
                 .otherwise(0).cast("long").alias("spans_boundary")))


# ---------------------------------------------------------------------------
# retrieval chunking (sliding window with overlap)
# ---------------------------------------------------------------------------

_CH_SIZE = 32     # tokens per retrieval chunk
_CH_STRIDE = 24   # window stride → _CH_SIZE - _CH_STRIDE tokens of overlap


@q("corpus_chunk_overlap", rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, len(toks), {_CH_STRIDE})) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST(start_tok // {_CH_STRIDE} AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least({_CH_SIZE}, n - start_tok) AS BIGINT) AS chunk_tokens,
       array_to_string(list_slice(toks, start_tok + 1,
                                  least(start_tok + {_CH_SIZE}, n)),
                       ' ') AS chunk_text
FROM c
""")
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window retrieval chunking: each document is cut into
    {_CH_SIZE}-token chunks every {_CH_STRIDE} tokens, so consecutive
    chunks share {_CH_SIZE - _CH_STRIDE} tokens of overlap — the
    standard RAG indexing transform (overlap keeps answers that
    straddle a cut retrievable; contrast corpus_pack_chunks, which
    packs for TRAINING with no overlap and cross-doc concat).

    Scale path: pure per-row explode — the token array binds in a
    prior projection (one split per doc, not per chunk), chunk starts
    come from sequence()+posexplode, and the slice/join runs in-row.
    Zero shuffles; output is ~n_tokens/{_CH_STRIDE} rows per doc,
    written straight to the chunk index. Chunk ids are deterministic
    (start // stride), so re-runs upsert cleanly."""
    t = (parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                       "doc_id")
         .select("doc_id", _tx.tokens("text").alias("toks"))
         .withColumn("n", F.size("toks")))
    c = t.select(
        "doc_id", "toks", "n",
        F.posexplode(F.sequence(F.lit(0), F.col("n") - 1,
                                F.lit(_CH_STRIDE)))
        .alias("chunk_id", "start_tok"))
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(_CH_SIZE), F.col("n") - F.col("start_tok"))
        .cast("long").alias("chunk_tokens"),
        F.array_join(F.slice(F.col("toks"), F.col("start_tok") + 1,
                             F.lit(_CH_SIZE)), " ").alias("chunk_text"))


# ---------------------------------------------------------------------------
# end-to-end curation verdict
# ---------------------------------------------------------------------------

# quality_score takes values {0, 1/3, 2/3, 1}; 0.6 cleanly separates
# "at least 2 of 3 filters pass" with identical doubles in both engines
_QUALITY_MIN = 0.6


def _curation_oracle_sql() -> str:
    return f"""
WITH quality AS ({_tx.ORACLE["text_quality_score"]}),
exact AS ({_dd.ORACLE["dedup_exact"]}),
clusters AS ({_dd._cluster_oracle_sql()}),
decon AS ({_DECON_SQL})
SELECT dc.doc_id,
       CAST(CASE WHEN qu.quality_score >= {_QUALITY_MIN} THEN 1 ELSE 0 END
            AS BIGINT) AS quality_pass,
       CAST(1 - ex.is_dup AS BIGINT) AS exact_canonical,
       CAST(cl.is_canonical AS BIGINT) AS neardup_canonical,
       CAST(1 - dc.is_contaminated AS BIGINT) AS uncontaminated,
       CAST(CASE WHEN qu.quality_score >= {_QUALITY_MIN}
                  AND ex.is_dup = 0 AND cl.is_canonical = 1
                  AND dc.is_contaminated = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS retained
FROM decon dc
JOIN quality qu USING (doc_id)
JOIN exact ex USING (doc_id)
JOIN clusters cl USING (doc_id)
"""


def curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document verdict frame, rebuilt (cheaply) per call and
    cached: the pipeline query returns it, the source scorecard
    aggregates it. The expensive trained state — the CC fixpoint —
    stays memoized inside dedup_cluster_labels (checkpoint-backed), so
    one fixpoint run per session still serves every consumer.

    r14: the frame itself is NO LONGER memoized. A memoized DataFrame
    returns a STALE plan whose internal ``.cache()`` registrations die
    at the next ``clearCache()`` and are never re-asserted, so every
    later evaluation recomputed the shared tokenize/shingle subtrees
    once PER CONSUMER (measured 1.6 s first evaluation vs 4.2-7.1 s
    for post-clearCache evaluations of the identical result). Calling
    the builders fresh re-registers the shared caches each time, which
    restores intra-query subtree sharing — plan construction is
    milliseconds."""
    quality = _tx.text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    exact = _dd.dedup_exact(spark, sf_dir).select("doc_id", "is_dup")
    clusters = _dd.dedup_cluster_labels(spark, sf_dir).select("doc_id", "is_canonical")
    decon = corpus_decontaminate(spark, sf_dir).select("doc_id", "is_contaminated")
    j = (decon.join(quality, "doc_id")
         .join(exact, "doc_id")
         .join(clusters, "doc_id"))
    quality_pass = F.col("quality_score") >= _QUALITY_MIN
    retained = (quality_pass & (F.col("is_dup") == 0)
                & (F.col("is_canonical") == 1) & (F.col("is_contaminated") == 0))
    out = j.select(
        "doc_id",
        F.when(quality_pass, 1).otherwise(0).cast("long").alias("quality_pass"),
        (1 - F.col("is_dup")).cast("long").alias("exact_canonical"),
        F.col("is_canonical").cast("long").alias("neardup_canonical"),
        (1 - F.col("is_contaminated")).cast("long").alias("uncontaminated"),
        F.when(retained, 1).otherwise(0).cast("long").alias("retained")).cache()
    return out


@q("corpus_curation_pipeline", _curation_oracle_sql())
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline end-to-end: per training document (the
    benchmark slice excluded), pass/fail flags from quality scoring,
    exact dedup (fingerprint keeper), near-dup clustering (cluster
    canonical) and decontamination — and the final retained verdict a
    training-data pipeline acts on. Composes the underlying operators
    verbatim, so each stage keeps its own oracle-exact semantics.

    Scale path: every input frame is (doc_id, one small column) after
    column pruning — the joins shuffle 16-byte rows, and the heavy
    lifting happened inside the composed operators with their own
    documented layouts."""
    return curation_verdict(spark, sf_dir)


@q("corpus_source_scorecard", f"""
WITH verdict AS ({_curation_oracle_sql()})
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(v.retained) AS BIGINT) AS n_retained,
       CAST(sum(1 - v.quality_pass) AS BIGINT) AS n_quality_fail,
       CAST(sum(1 - v.exact_canonical) AS BIGINT) AS n_exact_dup,
       CAST(sum(1 - v.neardup_canonical) AS BIGINT) AS n_neardup_dup,
       CAST(sum(1 - v.uncontaminated) AS BIGINT) AS n_contaminated,
       CAST(sum(v.retained) * 1000000 // count(*) AS BIGINT) AS retained_ppm,
       CAST(sum(d.n_chars) AS BIGINT) AS n_chars_total,
       CAST(sum(CASE WHEN v.retained = 1 THEN d.n_chars ELSE 0 END)
            AS BIGINT) AS n_chars_retained
FROM verdict v JOIN documents d USING (doc_id)
GROUP BY d.source
""")
def corpus_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE curation scorecard: how many of each crawl source's
    training documents (benchmark slice excluded) fail quality, are
    exact / near duplicates, are contaminated, and survive — plus the
    char mass before/after. This is the report a data-pipeline operator
    actually reads to decide which sources to keep, re-crawl, or
    re-filter (the per-source accounting FineWeb/DCLM-style curation
    publishes with every release).

    Composes the SAME memoized verdict frame the pipeline query
    returns (one CC fixpoint + one quality/dedup/decon pass per
    session — production reads the persisted verdict table), joins the
    doc-keyed source/chars columns, and reduces to a source-count-sized
    frame in one combinable aggregate. retained_ppm is an exact integer
    ratio (×1e6, floor-div), engine-identical."""
    v = curation_verdict(spark, sf_dir)
    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", "source", "n_chars"))
    agg = (v.join(d, "doc_id")
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("retained").cast("long").alias("n_retained"),
                F.sum(1 - F.col("quality_pass")).cast("long")
                 .alias("n_quality_fail"),
                F.sum(1 - F.col("exact_canonical")).cast("long")
                 .alias("n_exact_dup"),
                F.sum(1 - F.col("neardup_canonical")).cast("long")
                 .alias("n_neardup_dup"),
                F.sum(1 - F.col("uncontaminated")).cast("long")
                 .alias("n_contaminated"),
                F.sum("n_chars").cast("long").alias("n_chars_total"),
                F.sum(F.when(F.col("retained") == 1, F.col("n_chars"))
                      .otherwise(0)).cast("long").alias("n_chars_retained")))
    return agg.select(
        "source", "n_docs", "n_retained", "n_quality_fail", "n_exact_dup",
        "n_neardup_dup", "n_contaminated",
        F.expr("CAST(n_retained * 1000000 DIV n_docs AS BIGINT)")
        .alias("retained_ppm"),
        "n_chars_total", "n_chars_retained")


@q("dedup_cluster_keep_best", f"""
WITH labels AS ({_dd._cluster_oracle_sql()}),
quality AS ({_tx.ORACLE["text_quality_score"]}),
ranked AS (
  SELECT l.doc_id, l.cluster_id, q.quality_score,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY q.quality_score DESC, l.doc_id) AS rn,
         count(*) OVER (PARTITION BY l.cluster_id) AS n_members
  FROM labels l JOIN quality q USING (doc_id)
)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id, quality_score,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_kept_best
FROM ranked
""")
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST near-dup canonicalization: within each near-dup
    cluster, survive the member with the highest quality score (min
    doc_id breaks exact ties) — the production alternative to
    min-id canonical (dedup_cluster_labels): when near-duplicates
    differ (truncation, boilerplate variants), a pipeline keeps the
    best copy, not an arbitrary one (the FineWeb/RefinedWeb policy).

    Composes the memoized cluster-label frame (one CC fixpoint per
    session) with the map-only quality scores; the policy itself is a
    doc_id-keyed join + one cluster-keyed window over doc-count-sized
    rows. Determinism: quality_score is a ratio of exact integers
    (identical doubles both engines), and (score DESC, doc_id) totally
    orders every cluster."""
    labels = _dd.dedup_cluster_labels(spark, sf_dir) \
        .select("doc_id", "cluster_id")
    quality = _tx.text_quality_score(spark, sf_dir) \
        .select("doc_id", "quality_score")
    j = labels.join(quality, "doc_id")
    wc = Window.partitionBy("cluster_id")
    rn = F.row_number().over(
        wc.orderBy(F.col("quality_score").desc(), "doc_id"))
    return (j.withColumn("rn", rn)
            .withColumn("n_members", F.count(F.lit(1)).over(wc))
            .select("doc_id",
                    F.col("cluster_id").cast("long").alias("cluster_id"),
                    "quality_score",
                    F.col("n_members").cast("long").alias("n_members"),
                    F.when(F.col("rn") == 1, 1).otherwise(0).cast("long")
                    .alias("is_kept_best")))


# ---------------------------------------------------------------------------
# eval-side n-gram coverage (the reverse direction of decontamination)
# ---------------------------------------------------------------------------

@q("corpus_ngram_overlap", f"""
WITH sh AS ({_dd._SHINGLE_SQL}),
hh AS (SELECT doc_id, {_dd._HASH_SQL} AS hsh FROM sh),
bench AS (SELECT doc_id, hsh FROM hh WHERE doc_id % {_BENCH_MOD} = 0),
hits AS (
  SELECT DISTINCT b.doc_id, b.hsh
  FROM hh t JOIN bench b ON b.hsh = t.hsh
  WHERE t.doc_id % {_BENCH_MOD} <> 0
),
nb AS (SELECT doc_id, count(*) AS n_shingles FROM bench GROUP BY 1),
nh AS (SELECT doc_id, count(*) AS n_found FROM hits GROUP BY 1)
SELECT nb.doc_id, CAST(nb.n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(nh.n_found, 0) AS BIGINT) AS n_in_train,
       CAST(coalesce(nh.n_found, 0) * 1000000 // nb.n_shingles AS BIGINT)
         AS coverage_micro
FROM nb LEFT JOIN nh USING (doc_id)
""")
def corpus_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per BENCHMARK document: how much of its distinct shingle set
    leaks from the training corpus (the eval-suite-side coverage report
    an honest decontamination run publishes — corpus_decontaminate is
    the train-side flag, this is the eval-side fraction).

    Scale path: the benchmark shingle set is bounded and broadcast;
    the train side is a pure scan probed through the broadcast (rows
    surviving the join are benchmark-sized), so NOTHING corpus-sized
    shuffles — the distinct + counts run on matched pairs only."""
    hh = _dd._hashed_shingles(spark, sf_dir)  # shared cached scan
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench = hh.filter(is_bench)
    hits = (hh.filter(~is_bench).select("hsh")
            .join(F.broadcast(bench), "hsh")
            .select("doc_id", "hsh").distinct())
    nb = bench.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    nh = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_found"))
    return (nb.join(nh, "doc_id", "left")
            .select("doc_id",
                    F.col("n_shingles").cast("long").alias("n_shingles"),
                    F.coalesce("n_found", F.lit(0)).cast("long")
                    .alias("n_in_train"),
                    F.expr("CAST(coalesce(n_found, 0) * 1000000"
                           " DIV n_shingles AS BIGINT)")
                    .alias("coverage_micro")))


# ---------------------------------------------------------------------------
# curation funnel: the stage-by-stage survival report — what each filter
# costs, in corpus docs (the first chart in every dataset paper)
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("quality", "exact_dedup", "neardup_dedup", "decontaminate")


@q("corpus_curation_funnel", f"""
WITH verdict AS ({_curation_oracle_sql()}),
agg AS (
  SELECT count(*) AS n0,
         sum(quality_pass) AS s1,
         sum(quality_pass * exact_canonical) AS s2,
         sum(quality_pass * exact_canonical * neardup_canonical) AS s3,
         sum(retained) AS s4
  FROM verdict
)
SELECT CAST(1 AS BIGINT) AS stage, 'quality' AS stage_name,
       CAST(n0 AS BIGINT) AS n_in, CAST(s1 AS BIGINT) AS n_out,
       CAST(n0 - s1 AS BIGINT) AS dropped,
       CAST(s1 AS DOUBLE) / CAST(nullif(n0, 0) AS DOUBLE) AS retention
FROM agg
UNION ALL
SELECT CAST(2 AS BIGINT), 'exact_dedup', CAST(s1 AS BIGINT),
       CAST(s2 AS BIGINT), CAST(s1 - s2 AS BIGINT),
       CAST(s2 AS DOUBLE) / CAST(nullif(s1, 0) AS DOUBLE)
FROM agg
UNION ALL
SELECT CAST(3 AS BIGINT), 'neardup_dedup', CAST(s2 AS BIGINT),
       CAST(s3 AS BIGINT), CAST(s2 - s3 AS BIGINT),
       CAST(s3 AS DOUBLE) / CAST(nullif(s2, 0) AS DOUBLE)
FROM agg
UNION ALL
SELECT CAST(4 AS BIGINT), 'decontaminate', CAST(s3 AS BIGINT),
       CAST(s4 AS BIGINT), CAST(s3 - s4 AS BIGINT),
       CAST(s4 AS DOUBLE) / CAST(nullif(s3, 0) AS DOUBLE)
FROM agg
""")
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL: docs surviving after each filter applied in
    pipeline order (quality → exact dedup → near-dup canonical →
    decontamination), with per-stage drop counts and retention rates —
    the cut-by-cut accounting the scorecard's per-source view doesn't
    give.

    Composes the memoized per-document verdict frame (one CC fixpoint
    per session, shared with the pipeline/scorecard queries); the
    funnel itself is ONE combinable aggregate over (doc_id, 5 flags)
    rows unpivoted into 4 stage rows — nothing touches corpus-sized
    data after the verdict exists. Counts are exact integers; each
    retention is a single IEEE division of two exact int64s."""
    v = curation_verdict(spark, sf_dir)
    agg = v.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("quality_pass").alias("s1"),
        F.sum(F.col("quality_pass") * F.col("exact_canonical")).alias("s2"),
        F.sum(F.col("quality_pass") * F.col("exact_canonical")
              * F.col("neardup_canonical")).alias("s3"),
        F.sum("retained").alias("s4"))
    stack = ("stack(4, "
             "1L, 'quality', n0, s1, "
             "2L, 'exact_dedup', s1, s2, "
             "3L, 'neardup_dedup', s2, s3, "
             "4L, 'decontaminate', s3, s4"
             ") AS (stage, stage_name, n_in, n_out)")
    return (agg.select(F.expr(stack))
            .select("stage", "stage_name",
                    F.col("n_in").cast("long").alias("n_in"),
                    F.col("n_out").cast("long").alias("n_out"),
                    (F.col("n_in") - F.col("n_out")).cast("long")
                    .alias("dropped"),
                    # nullif guard: an emptied stage must yield NULL on
                    # BOTH engines (DuckDB's IEEE division would give
                    # Inf/NaN while non-ANSI Spark gives NULL — ADVICE r6)
                    (F.col("n_out").cast("double")
                     / F.nullif(F.col("n_in"), F.lit(0)).cast("double"))
                    .alias("retention")))
