"""Deterministic sampling / splitting for training-data pipelines.

Two standard pipeline stages, both expressed as pure per-row maps
(ZERO shuffle — at 100 TB these are one codegen pass over the corpus,
embarrassingly parallel across executors):

- **stratified sampling**: per-stratum keep rates applied via a salted
  content hash (`md5('sample_' || doc_id)`), so the decision is a pure
  function of the row — reproducible across runs, engines, partitions,
  and cluster sizes (no RNG state, unlike ``df.sample``, whose output
  depends on partitioning).
- **train/val/test split**: an INDEPENDENT salt (``split_``) hashes
  every document into 80/10/10 — independence from the sampling hash
  means subsampling never skews split proportions.

The strata here are document-length buckets (short/medium/long token
counts) with higher keep-rates for rarer short documents — the shape
of a real mixture-rebalancing job; swap the stratum expression for
language/quality/source as needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import load_table, parallel_scan
from .text import _STOPWORDS, tokens

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# per-stratum keep rates in basis points (integer compare — exact)
RATES_BP = {"short": 10_000, "medium": 5_000, "long": 2_500}
SHORT_MAX, MEDIUM_MAX = 40, 55  # token-count bucket edges


def _salted_hash(salt: str, key: Column) -> Column:
    """Uniform 32-bit integer from md5(salt || key) — identical in any
    engine, partition-independent (the reproducibility property
    ``df.sample`` lacks)."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))),
                               1, 8), 16, 10).cast("bigint"))


def _salted_hash_sql(salt: str, key: str) -> str:
    return f"('0x' || substr(md5('{salt}' || {key}), 1, 8))::BIGINT"


@q("corpus_vocabulary", """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
),
freq AS (
  SELECT token, count(*) AS n_occurrences FROM toks GROUP BY token
),
tot AS (SELECT sum(n_occurrences) AS total FROM freq)
SELECT token, n_occurrences,
       CAST(n_occurrences AS DOUBLE) / (SELECT total FROM tot) AS frequency
FROM freq
QUALIFY row_number() OVER (ORDER BY n_occurrences DESC, token) <= 100
""")
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 whitespace tokens with counts and
    relative frequency — the tokenizer-training precursor (BPE seeding
    starts from exactly this table).

    Scale path: token counting is the canonical partial-aggregatable
    groupBy (map-side combine shrinks the shuffle to |vocab| per
    partition); the top-k is orderBy().limit(100), which Catalyst
    compiles to TakeOrderedAndProject — a per-partition bounded heap
    merged on the driver — NOT a global window, so no task ever holds
    the whole vocabulary (at 100 TB the distinct-token vocab is
    billions of rows; a partition-less row_number window would move
    all of it to one straggler task). The (count DESC, token) order is
    total, so the top-100 set is deterministic and oracle-identical;
    the grand total folds in as a broadcast scalar. Integer counts +
    one double division — engine-exact.
    """
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toks = d.select(F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                      r"\s+")).alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = freq.agg(F.sum("n_occurrences")).collect()[0][0]
    return (freq.orderBy(F.col("n_occurrences").desc(), F.col("token"))
            .limit(100)
            .select("token", "n_occurrences",
                    (F.col("n_occurrences").cast("double")
                     / F.lit(float(total))).alias("frequency")))


@q("corpus_token_spectrum", """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
),
freq AS (
  SELECT token, count(*) AS tok_count FROM toks GROUP BY token
),
spec AS (
  SELECT tok_count AS freq, count(*) AS n_types,
         tok_count * count(*) AS token_mass
  FROM freq GROUP BY tok_count
),
tot AS (SELECT CAST(sum(token_mass) AS BIGINT) AS total FROM spec)
SELECT freq, CAST(n_types AS BIGINT) AS n_types,
       CAST(token_mass AS BIGINT) AS token_mass,
       CAST(token_mass AS DOUBLE) / (SELECT total FROM tot) AS mass_share
FROM spec
""")
def corpus_token_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency spectrum (count-of-counts): for each occurrence
    count f, how many distinct token types occur exactly f times and
    what share of the total token mass they carry. The freq=1 row is
    the hapax-legomenon count — the classic Zipf/Heaps corpus
    diagnostic an LM-data curator reads before choosing vocabulary
    size and rare-token cutoffs (Good-Turing smoothing consumes this
    exact table).

    Scale path: two chained partial-aggregatable groupBys — token
    counts (map-side combine shrinks the shuffle to |vocab| per
    partition), then the spectrum over |vocab| rows collapses to
    |distinct counts| (≈ hundreds) rows. The grand total folds in as a
    broadcast scalar, not a partition-less window. Integer counts +
    one double division — engine-exact."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toks = d.select(F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                      r"\s+")).alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tok_count"))
    spec = (freq.groupBy(F.col("tok_count").alias("freq"))
            .agg(F.count(F.lit(1)).alias("n_types"))
            .select("freq", "n_types",
                    (F.col("freq") * F.col("n_types")).alias("token_mass")))
    total = spec.agg(F.sum("token_mass")).collect()[0][0]
    return spec.select(
        "freq", "n_types", "token_mass",
        (F.col("token_mass").cast("double")
         / F.lit(float(total))).alias("mass_share"))


@q("dataset_sample_split", f"""
WITH toks AS (
  SELECT doc_id, len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
),
strat AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens <= {SHORT_MAX} THEN 'short'
              WHEN n_tokens <= {MEDIUM_MAX} THEN 'medium'
              ELSE 'long' END AS stratum
  FROM toks
),
hashed AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, stratum,
         {_salted_hash_sql("sample_", "doc_id")} % 10000 AS u,
         {_salted_hash_sql("split_", "doc_id")} % 10 AS v
  FROM strat
)
SELECT doc_id, n_tokens, stratum,
       CASE WHEN v < 8 THEN 'train' WHEN v = 8 THEN 'val' ELSE 'test' END AS split
FROM hashed
WHERE u < CASE stratum WHEN 'short' THEN {RATES_BP['short']}
                       WHEN 'medium' THEN {RATES_BP['medium']}
                       ELSE {RATES_BP['long']} END
""")
def dataset_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample + 80/10/10 split over the documents corpus.

    Map-only: bucket by token count, keep each row iff its salted hash
    falls under the stratum's basis-point rate, and assign the split
    from an independent salted hash. Integer compares end to end —
    hash-exact vs the oracle, and bit-stable under any repartitioning.
    """
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    stratum = (F.when(n_tokens <= SHORT_MAX, "short")
               .when(n_tokens <= MEDIUM_MAX, "medium")
               .otherwise("long"))
    u = _salted_hash("sample_", F.col("doc_id")) % 10_000
    v = _salted_hash("split_", F.col("doc_id")) % 10
    rate = (F.when(F.col("stratum") == "short", RATES_BP["short"])
            .when(F.col("stratum") == "medium", RATES_BP["medium"])
            .otherwise(RATES_BP["long"]))
    split = (F.when(F.col("__v") < 8, "train")
             .when(F.col("__v") == 8, "val")
             .otherwise("test"))
    return (d.select("doc_id",
                     n_tokens.cast("long").alias("n_tokens"),
                     stratum.alias("stratum"),
                     u.alias("__u"), v.alias("__v"))
            .filter(F.col("__u") < rate)
            .select("doc_id", "n_tokens", "stratum", split.alias("split")))


# ---------------------------------------------------------------------------
# quality-weighted subsampling (DCLM/FineWeb-style quality curriculum)
# ---------------------------------------------------------------------------

# keep-rate in basis points by the number of quality checks passed
# (0..3): 10% of junk, up to 100% of 3-check docs — integer compare
# against the same salted hash as dataset_sample_split
_QKEEP_BASE_BP = 1000
_QKEEP_STEP_BP = 3000


@q("corpus_sample_by_quality", f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, len(toks) AS n_tokens,
         len(list_filter(toks, w -> w IN {tuple(_STOPWORDS)})) AS n_stop,
         len(list_distinct(toks)) AS n_distinct
  FROM t
),
graded AS (
  SELECT doc_id, n_tokens,
         (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
          + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.5
                 THEN 1 ELSE 0 END
          + CASE WHEN CAST(n_distinct AS DOUBLE) / n_tokens > 0.3
                 THEN 1 ELSE 0 END) AS q_passed
  FROM s
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(q_passed AS BIGINT) AS q_passed,
       CAST({_QKEEP_BASE_BP} + {_QKEEP_STEP_BP} * q_passed AS BIGINT)
         AS keep_rate_bp
FROM graded
WHERE {_salted_hash_sql("qsample_", "doc_id")} % 10000
      < {_QKEEP_BASE_BP} + {_QKEEP_STEP_BP} * q_passed
""")
def corpus_sample_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted subsampling: each document's keep probability
    rises with the number of Gopher-style quality checks it passes
    (10% of 0-check junk … 100% of 3-check docs) — the quality
    curriculum stage of a data-mixing pipeline (DCLM/FineWeb keep-rate
    reweighting), on the same deterministic salted-hash machinery as
    dataset_sample_split.

    Map-only, zero shuffle, partition-independent: the keep decision is
    an integer compare between a per-doc salted hash and an integer
    rate derived from integer check counts."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    toks = tokens("text")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    s = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
        .alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("n_distinct"))
    q_passed = (
        F.when(F.col("n_tokens").between(20, 1000), 1).otherwise(0)
        + F.when((F.col("n_stop").cast("double") / F.col("n_tokens"))
                 .between(0.01, 0.5), 1).otherwise(0)
        + F.when(F.col("n_distinct").cast("double") / F.col("n_tokens") > 0.3,
                 1).otherwise(0))
    rate = F.lit(_QKEEP_BASE_BP) + F.lit(_QKEEP_STEP_BP) * F.col("q_passed")
    return (s.withColumn("q_passed", q_passed)
            .filter(_salted_hash("qsample_", F.col("doc_id")) % 10000 < rate)
            .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("q_passed").cast("long").alias("q_passed"),
                    rate.cast("long").alias("keep_rate_bp")))


# ---------------------------------------------------------------------------
# leakage-free (cluster-aware) train/val/test split
# ---------------------------------------------------------------------------

from . import dedup as _dd  # noqa: E402  (cluster labels feed the split key)


@q("corpus_cluster_split", f"""
WITH labels AS ({_dd._cluster_oracle_sql()}),
sizes AS (SELECT cluster_id, count(*) AS cluster_size
          FROM labels GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CASE WHEN {_salted_hash_sql("gsplit_", "l.cluster_id")} % 10 < 8
            THEN 'train'
            WHEN {_salted_hash_sql("gsplit_", "l.cluster_id")} % 10 = 8
            THEN 'val' ELSE 'test' END AS split
FROM labels l JOIN sizes s USING (cluster_id)
""")
def corpus_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: the salted split hash keys on
    the near-dup CLUSTER label, not the document id, so every member of
    a near-duplicate cluster lands in the SAME split — a doc-keyed
    split (dataset_sample_split) can put two near-identical documents
    on opposite sides of the train/test boundary, and that leakage
    inflates eval scores (the group-aware split every serious
    pretraining/eval pipeline uses). ``cluster_size`` rides along as
    the leakage diagnostic (size > 1 ⇒ the cluster-keyed hash actually
    mattered for those rows).

    Scale path: labels is the memoized cluster table (ONE CC fixpoint
    per session — the persisted artifact in production); the split
    decision is a map over it, and cluster_size is a count over the
    cluster-keyed window — one 16-byte-row exchange. Integer hash
    compares end to end: partition-independent, engine-exact."""
    labels = _dd.dedup_cluster_labels(spark, sf_dir) \
        .select("doc_id", "cluster_id")
    v = _salted_hash("gsplit_", F.col("cluster_id")) % 10
    split = (F.when(v < 8, "train").when(v == 8, "val").otherwise("test"))
    w = Window.partitionBy("cluster_id")
    return labels.select(
        "doc_id", "cluster_id",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        split.alias("split"))


@q("corpus_stats_report", r"""
WITH base AS (
  SELECT lang, source,
         len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
         n_chars
  FROM documents
)
SELECT lang, source,
       CAST(grouping(lang) AS BIGINT) AS g_lang,
       CAST(grouping(source) AS BIGINT) AS g_source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_doc_tokens
FROM base
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
""")
def corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics in ONE pass: document / token / char
    masses at every reporting granularity a corpus datasheet needs —
    per (lang, source) cell, per-lang and per-source marginals, and the
    grand total — via GROUP BY GROUPING SETS (the general form
    completing the ROLLUP family member, orders_rollup_summary).
    grouping() indicator columns disambiguate marginal rows from
    natural NULLs, keeping the cross-engine hash exact.

    Scale path: GROUPING SETS compiles to a single Expand (×4 here) +
    one partially-aggregatable hash aggregate — one shuffle whose
    input is groups×levels partial rows, not one job per report level;
    token counting stays inside the aggregate's map side.
    avg_doc_tokens divides two exact int64s once."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    base = d.select("lang", "source",
                    F.size(tokens("text")).cast("long").alias("n_toks"),
                    "n_chars")
    return (base.groupingSets([["lang", "source"], ["lang"], ["source"], []],
                              "lang", "source")
            .agg(F.grouping("lang").cast("long").alias("g_lang"),
                 F.grouping("source").cast("long").alias("g_source"),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_toks").cast("long").alias("n_tokens"),
                 F.sum("n_chars").cast("long").alias("n_chars"))
            .select("lang", "source", "g_lang", "g_source", "n_docs",
                    "n_tokens", "n_chars",
                    (F.col("n_tokens").cast("double") / F.col("n_docs"))
                    .alias("avg_doc_tokens")))


_CURRICULUM_STAGES = 4


def _curriculum_oracle_sql() -> str:
    from .text import ORACLE as _TX_ORACLE

    return f"""
WITH q AS ({_TX_ORACLE["text_quality_score"]}),
ranked AS (
  SELECT doc_id, quality_score, n_tokens,
         row_number() OVER (ORDER BY quality_score DESC, n_tokens, doc_id)
           AS curriculum_rank,
         count(*) OVER () AS n
  FROM q
)
SELECT doc_id, quality_score, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(curriculum_rank AS BIGINT) AS curriculum_rank,
       CAST(least((curriculum_rank - 1) * {_CURRICULUM_STAGES} // n,
                  {_CURRICULUM_STAGES - 1}) AS BIGINT) AS stage
FROM ranked
"""


@q("corpus_curriculum_order", _curriculum_oracle_sql())
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: a GLOBAL training sequence over the corpus —
    cleanest-and-shortest documents first (quality DESC, length ASC,
    doc_id) — plus the integer training stage each document lands in.

    The point is HOW the global rank is computed. The oracle's
    partition-less ``row_number() OVER (ORDER BY ...)`` would move the
    whole corpus through ONE task — the straggler the repo's plan
    invariants reject. The scalable recipe is the two-pass
    range-partitioned rank promised in corpus_perplexity_buckets'
    docstring: (1) ``repartitionByRange`` + ``sortWithinPartitions``
    on the full ordering key — each partition holds a contiguous,
    internally-sorted slice; (2) ``monotonically_increasing_id``
    (partition_id·2³³ + row-in-partition, assigned in sorted task
    order — no window at all) yields in-partition offsets, and a
    #partitions-row count aggregate (collected — bounded by the
    partition count, not the data) supplies each slice's global base.
    Global rank = base[pid] + local + 1. The rank is invariant to
    WHERE the range sampler happens to place boundaries: moving a row
    between adjacent slices changes (pid, local) but never
    base + local, because the key is totally ordered. Stage edges are
    integer arithmetic on exact ranks."""
    from .text import with_quality_score

    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    scored = (with_quality_score(d)
              .select("doc_id", "quality_score",
                      F.col("n_tokens").cast("long").alias("n_tokens")))
    order = [F.col("quality_score").desc(), F.col("n_tokens").asc(),
             F.col("doc_id").asc()]
    n_parts = max(spark.sparkContext.defaultParallelism, 4)
    # localCheckpoint PINS one materialization of the range exchange:
    # the size collect (action 1) and the final read (action 2) must
    # see the SAME partition contents, and repartitionByRange samples
    # its boundaries — recomputing it per action could legally place
    # boundary-adjacent rows differently between the two actions,
    # de-syncing base offsets from pids. Truncating the lineage makes a
    # silent recompute impossible (a lost block fails loudly instead).
    sliced = (scored.repartitionByRange(n_parts, *order)
              .sortWithinPartitions(*order)
              .withColumn("__mid", F.monotonically_increasing_id())
              .withColumn("__pid", F.expr("shiftright(__mid, 33)"))
              .withColumn("__row", F.col("__mid") % F.lit(1 << 33))
              .localCheckpoint(eager=True))
    # pass 2: per-slice sizes -> global base offsets (bounded by the
    # partition count; the one driver round-trip of the recipe)
    sizes = {r["__pid"]: r["c"] for r in
             sliced.groupBy("__pid").agg(F.count(F.lit(1)).alias("c"))
             .collect()}
    base, acc = {}, 0
    for pid in sorted(sizes):
        base[pid] = acc
        acc += sizes[pid]
    n_total = acc
    base_map = F.create_map(
        *[F.lit(x) for pid in sorted(base) for x in (pid, base[pid])])
    rank = (base_map[F.col("__pid")] + F.col("__row") + 1).cast("long")
    return (sliced
            .withColumn("curriculum_rank", rank)
            .select("doc_id", "quality_score", "n_tokens", "curriculum_rank",
                    F.expr(f"CAST(least((curriculum_rank - 1)"
                           f" * {_CURRICULUM_STAGES} DIV {n_total},"
                           f" {_CURRICULUM_STAGES - 1}) AS BIGINT)")
                    .alias("stage")))


RESERVOIR_K = 5  # sample size per stratum


@q("events_reservoir_sample", f"""
WITH h AS (
  SELECT event_type, event_id, user_id, ts, value,
         {_salted_hash_sql("resv_", "event_id")} AS hsh
  FROM events
)
SELECT event_type,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY hsh, event_id) AS BIGINT)
         AS sample_rank,
       event_id, user_id, ts, value
FROM h
QUALIFY row_number() OVER (PARTITION BY event_type
                           ORDER BY hsh, event_id) <= {RESERVOIR_K}
""")
def events_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A uniform k-per-stratum sample of the events stream (k = 5 per
    event type) — the "show me a few real rows of each kind" query
    behind data previews, labeling batches, and debug fixtures. Rows
    win by smallest salted hash, which is the distributed-reservoir
    trick: hash order IS a uniform random order, but unlike
    ``df.sample`` it is partition-independent, reproducible, and
    per-stratum exact-k.

    Scale path: one hash shuffle on the stratum key, then a bounded
    per-key window (top-k heap state, never the full stream — the
    LIMIT-n-BY-key plan). At 100 TB the same expression drives a
    partial-aggregatable min-k: each map task keeps its local k
    smallest hashes, so the exchange carries k rows per (task,
    stratum). Exactness: md5-derived hashes are engine-identical and
    (hsh, event_id) totally orders every stratum.
    """
    e = load_table(spark, sf_dir, "events")
    h = e.select("event_type", "event_id", "user_id", "ts", "value",
                 _salted_hash("resv_", F.col("event_id")).alias("hsh"))
    w = Window.partitionBy("event_type").orderBy("hsh", "event_id")
    return (h.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= RESERVOIR_K)
            .select("event_type",
                    F.col("sample_rank").cast("long").alias("sample_rank"),
                    "event_id", "user_id", "ts", "value"))
