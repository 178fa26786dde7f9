"""Deduplication operators for training-data pipelines.

Five dedup families, each designed as a shuffle-conscious Spark
dataflow (the 100 TB path is noted per operator):

- exact:        md5 fingerprint → groupBy (one shuffle on the hash)
- n-gram Jaccard: shingle explode → inverted-index self-join → pair agg
- MinHash+LSH:  signature (map) → band buckets (one shuffle) → candidate
                pairs → Jaccard verification of candidates only
- SimHash:      per-token bit votes → 32-bit signature (map + one agg)
- embedding cosine near-dup: see similarity.py (bucketed)

All hashing is md5-derived (identical across engines); permutation
constants are fixed literals so the DuckDB oracle computes the same
signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loader import cached_scalar, load_table, local_frame, parallel_scan
from ..sources.tables import folded_batch_tag

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
# shared shingling (3-word shingles over whitespace tokens)
# ---------------------------------------------------------------------------

_SHINGLE_SQL = r"""
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(toks)-1, 1)),
           i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents)
"""


def _tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text, toks) — the ONE tokenization pass every
    text-derived stage builds on, cached so the CacheManager serves
    shingling, simhash votes, and fingerprinting from a single scan +
    split when they compose (the curation pipeline runs three of them
    over the same corpus). At 100 TB this is 'write the tokenized
    column once, derive everything from it' — the standard staged-
    corpus layout."""
    # project the split ABOVE the fan-out (r14): below it, the regex
    # ran for the whole corpus inside the ONE scan task and the
    # exchange shipped text + the redundant toks array (3.0 MB vs
    # 2.1 MB); above, the exchange moves (doc_id, text) and the
    # tokenize runs at full parallelism.
    return (parallel_scan(
                spark,
                load_table(spark, sf_dir, "documents")
                .select("doc_id", "text"),
                "doc_id")
            .select("doc_id", "text",
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+")
                    .alias("toks"))
            .cache())


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — distinct 3-word shingles per document.

    Tokenize in a separate projection so the shingle lambda slices a
    bound array column: inlining split() inside the lambda re-runs the
    regex once per shingle position (O(tokens²) per document).

    Documents with fewer than 3 tokens produce NO shingles (matching the
    oracle's empty range — a truncated 2-token shingle would diverge)."""
    toks = _tokenized(spark, sf_dir).select("doc_id", "toks")
    sh = F.when(
        F.size("toks") >= 3,
        F.array_distinct(F.expr(
            "transform(sequence(1, size(toks) - 2),"
            " i -> concat_ws(' ', slice(toks, i, 3)))"))
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("doc_id", F.explode(sh).alias("shingle"))


# 60-bit shingle hash reduced mod a Mersenne prime (fits int64 products)
_P = 2147483647
_HASH_SQL = "(('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647)"


def _hash_col() -> F.Column:
    return (F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("bigint") % _P)


def _hashed_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hsh) — the cached 60-bit hashed-shingle frame shared by
    the Jaccard inverted index, decontamination, and the eval-coverage
    report (each consumes it 2-3× inside one query, and a session
    running several of them pays the explode+md5 once). At 100 TB this
    is the persisted hashed-shingle table every stage reads instead of
    re-deriving — 16-byte rows, text never leaves the tokenize stage."""
    return (_shingles(spark, sf_dir)
            .select("doc_id", _hash_col().alias("hsh")).cache())


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@q("dedup_exact", """
WITH fp AS (
  SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
)
SELECT doc_id, fingerprint,
       min(doc_id) OVER (PARTITION BY fingerprint) AS keeper_id,
       CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fingerprint)
            THEN 1 ELSE 0 END AS is_dup
FROM fp
""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a content fingerprint, keep min doc_id.

    Scale path: one shuffle on the 128-bit hash; at 100 TB hash first,
    never shuffle the text itself (the fingerprint is computed map-side
    and the shuffle moves 16-byte keys)."""
    d = _tokenized(spark, sf_dir)  # shares the cached corpus scan
    fp = d.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id", "fingerprint",
        F.min("doc_id").over(w).alias("keeper_id"),
        F.when(F.col("doc_id") != F.min("doc_id").over(w), 1).otherwise(0).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (inverted-index self-join)
# ---------------------------------------------------------------------------

# boilerplate guard: shingles appearing in more than _DF_CAP documents are
# dropped from the index AND from the set sizes (Jaccard over the filtered
# shingle space). At the gate SFs no shingle exceeds the cap (max df 25 at
# sf0.1), so results equal the uncapped form; at 100× a hot template
# shingle would otherwise contribute df² pair-rows — the quadratic
# straggler this cap removes.
_DF_CAP = 50


def _capped_sizes_and_pairs(spark: SparkSession,
                            sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The (sizes, pairs) frames both Jaccard reports join: df-capped
    posting lists built with ONE shuffle on the 8-byte hash, per-doc
    kept-shingle counts, and map-side common-shingle pair counts.

    posting lists: |docs| = the oracle's window count over (hsh), so
    the size filter is the QUALIFY twin. Pair generation stays
    map-side over the bounded (≤ _DF_CAP) lists — no self-join probe.
    The strict doc1 < doc2 filter keeps it pair-for-pair identical to
    the oracle's self-join even if a same-doc hash collision
    duplicated an entry in a posting list.

    Both frames are eagerly materialized (r14, guide §2.4): the final
    report joins ``sizes`` on BOTH pair sides, and Spark's exchange
    reuse does not fire across the cached-posts InMemoryRelation —
    un-materialized, each join side re-ran the full posts-explode +
    partial-agg pass (profiled 0.84 s + 1.01 s of dedup_ngram_jaccard's
    3.40 s warm run, and 1.06 s + 1.09 s of dedup_jaccard_containment's
    3.32 s). One extra ~0.1 s count job buys the second pass back."""
    hh = _hashed_shingles(spark, sf_dir)  # shared cached scan
    posts = (hh.groupBy("hsh")
             .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
             .filter(F.size("docs") <= _DF_CAP)
             .cache())
    posts.count()  # materialize eagerly: sizes + pairs share it —
    # concurrent lazy-cache population would recompute the explode per use
    sizes = (posts.select(F.explode("docs").alias("doc_id"))
             .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
             .cache())
    sizes.count()  # one sizes pass serves both join sides
    pairs = (posts.select(F.explode(F.expr(
        "flatten(transform(docs, (x, i) ->"
        " transform(slice(docs, i + 2, size(docs)), y -> struct(x AS doc1, y AS doc2))))"
    )).alias("p"))
        .filter(F.col("p.doc1") < F.col("p.doc2"))
        .groupBy(F.col("p.doc1").alias("doc1"), F.col("p.doc2").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("n_common")))
    return sizes, pairs


@q("dedup_ngram_jaccard", f"""
WITH sh AS ({_SHINGLE_SQL}),
hh AS (SELECT doc_id, {_HASH_SQL} AS hsh FROM sh),
kept AS (
  SELECT doc_id, hsh FROM hh
  QUALIFY count(*) OVER (PARTITION BY hsh) <= {_DF_CAP}
),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_common
  FROM kept a JOIN kept b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc1, p.doc2,
       CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc1
JOIN sizes sb ON sb.doc_id = p.doc2
WHERE CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) >= 0.2
""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs via inverted index: shingles reduce
    to 60-bit hashes (the shuffle moves 8-byte keys, never shingle text),
    a window count drops boilerplate shingles with df > _DF_CAP, the
    self-join on the hash counts common shingles, Jaccard comes from
    per-doc filtered set sizes.

    Scale path: the df cap bounds every posting list, so the self-join
    blowup is ≤ Σ min(df, cap)² — linear in corpus size instead of
    quadratic in the hottest shingle. The cap is applied ON the posting
    lists themselves (one groupBy(hsh) builds them; lists longer than
    the cap drop), so the exploded (doc, hsh) stream is shuffled exactly
    ONCE and only the compacted per-shingle lists are cached — r2's
    row-level window + row-level cache held the full exploded stream in
    memory and paid a second same-key pass, which showed up as the 64×
    probe's only dip. Same-doc hash collisions are not re-deduped (both
    engines hash with the same md5, so any collision is mirrored
    exactly).
    """
    sizes, pairs = _capped_sizes_and_pairs(spark, sf_dir)
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (pairs.join(sa, F.col("doc1") == F.col("sa.doc_id"))
            .join(sb, F.col("doc2") == F.col("sb.doc_id"))
            .select("doc1", "doc2", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= 0.2))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# 16 fixed permutations (a*x + b) mod P, 4 bands × 4 rows. Literals are
# deterministic (Knuth multiplicative steps) and embedded in the oracle.
_PERMS = [((2654435761 * (i + 1) + 0x9E3779B9) % _P or 1,
           (40503 * (i + 7) + 2 ** 16 + 1) % _P) for i in range(16)]
_N_BANDS, _BAND_ROWS = 4, 4


def _minhash_select_sql() -> str:
    mins = ",\n         ".join(
        f"min(({a} * {_HASH_SQL} + {b}) % {_P}) AS h{i}"
        for i, (a, b) in enumerate(_PERMS))
    return mins


def _band_key_sql(b: int) -> str:
    cols = ", ".join(f"h{b * _BAND_ROWS + r}" for r in range(_BAND_ROWS))
    return f"md5(concat_ws(',', {cols}))"


@q("dedup_minhash_signatures", f"""
WITH sh AS ({_SHINGLE_SQL})
SELECT doc_id,
         {_minhash_select_sql()}
FROM sh GROUP BY doc_id
""")
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: 16 permutation-min aggregates per document.

    Explode + codegen'd hash columns + partial-aggregatable mins: the
    shuffle moves ~one 16×8-byte row per document per map partition
    (map-side combine collapses each doc's shingles before the wire).
    An all-in-row HOF fold looks cheaper (zero shuffle) but measures 3×
    SLOWER: Spark evaluates lambda bodies interpreted, outside
    whole-stage codegen, so per-element md5/conv work belongs in
    exploded codegen columns, not lambdas (kept as a measured lesson —
    the opposite trade held for similarity_lsh_buckets, where the HOF
    form deleted a 64×-row explode and two shuffles).

    Signature is 16×8 bytes regardless of document size: everything
    downstream operates on signatures, never text — the stage that
    makes 100 TB dedup tractable."""
    return _signatures_from(_hashed_shingles(spark, sf_dir))


def _band_frame(sig: DataFrame, extra: list[str] | tuple = ()) -> DataFrame:
    """(doc_id, band_id, band_key[, *extra]) — the LSH band table of a
    signature frame (md5 of each band's {_BAND_ROWS} signature
    components). ``extra`` carries named columns through (e.g. the
    provenance-preserving rebuild keeps ingest_batch)."""
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band_id"),
                 F.md5(F.concat_ws(",", *[F.col(f"h{b * _BAND_ROWS + r}").cast("string")
                                          for r in range(_BAND_ROWS)])).alias("band_key"))
        for b in range(_N_BANDS)])
    return (sig.select("doc_id", *extra, F.explode(band_structs).alias("bd"))
            .select("doc_id", F.col("bd.band_id").alias("band_id"),
                    F.col("bd.band_key").alias("band_key"), *extra))


def _minhash_band_candidates(sig: DataFrame) -> DataFrame:
    """(doc1 < doc2) pairs colliding on ≥1 LSH band of the signature
    frame — the shared candidate generator for the verify and the
    estimator-quality queries (16-byte band keys on the wire)."""
    bands = _band_frame(sig)
    a = bands.alias("a")
    b = bands.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
            .distinct())


def _signatures_from(hh: DataFrame) -> DataFrame:
    # input is the (doc_id, hsh) hashed-shingle frame (the shared cached
    # scan) — the 16 permutation-mins run over the precomputed hash
    # column (inlining _hash_col per aggregate would recompute the md5
    # 16× per row: no CSE across aggregate expressions)
    hashed = hh.select("doc_id", F.col("hsh").alias("x"))
    aggs = [F.min((F.lit(a) * F.col("x") + F.lit(b)) % _P).alias(f"h{i}")
            for i, (a, b) in enumerate(_PERMS)]
    return hashed.groupBy("doc_id").agg(*aggs)


@q("dedup_minhash_lsh_pairs", f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (
  SELECT doc_id,
         {_minhash_select_sql()}
  FROM sh GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band_id, {_band_key_sql(b)} AS band_key FROM sig"
      for b in range(_N_BANDS))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
hh AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) AS hsh FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM hh GROUP BY doc_id),
verified AS (
  SELECT c.doc1, c.doc2, count(*) AS n_common
  FROM cand c
  JOIN hh s1 ON s1.doc_id = c.doc1
  JOIN hh s2 ON s2.doc_id = c.doc2 AND s1.hsh = s2.hsh
  GROUP BY 1, 2
)
SELECT v.doc1, v.doc2,
       CAST(v.n_common AS DOUBLE) / (sa.n + sb.n - v.n_common) AS jaccard
FROM verified v
JOIN sizes sa ON sa.doc_id = v.doc1
JOIN sizes sb ON sb.doc_id = v.doc2
WHERE CAST(v.n_common AS DOUBLE) / (sa.n + sb.n - v.n_common) >= 0.2
""")
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: band the signatures (4 bands × 4
    rows), bucket-join to get candidate pairs, then verify candidates
    with exact Jaccard.

    Scale path: the band bucket-join shuffles 16-byte keys only, and the
    exact-Jaccard verification touches candidate pairs (tiny fraction),
    not all O(n²) pairs — this is the canonical web-scale dedup layout."""
    hh = _hashed_shingles(spark, sf_dir)
    hh.count()  # eager materialization (see dedup_ngram_jaccard)
    # cache + EAGER count (r14, guide §5): the band self-join consumes
    # sig on BOTH sides and AQE runs their broadcast-exchange jobs
    # concurrently — against a lazily-cached sig each job recomputed
    # the full shingle→minhash pipeline (profiled as 4 parquet-reading
    # broadcast stages of ~1.4 s each in dedup_minhash_estimate).
    sig = _signatures_from(hh).cache()
    sig.count()
    cand = _minhash_band_candidates(sig)
    sizes = hh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = hh.alias("s1")
    s2 = hh.alias("s2")
    verified = (cand.join(s1, F.col("doc1") == F.col("s1.doc_id"))
                .join(s2, (F.col("doc2") == F.col("s2.doc_id"))
                      & (F.col("s1.hsh") == F.col("s2.hsh")))
                .groupBy("doc1", "doc2")
                .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (verified.join(sa, F.col("doc1") == F.col("sa.doc_id"))
            .join(sb, F.col("doc2") == F.col("sb.doc_id"))
            .select("doc1", "doc2", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= 0.2))


_N_PERMS = len(_PERMS)


@q("dedup_minhash_estimate", f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (
  SELECT doc_id,
         {_minhash_select_sql()}
  FROM sh GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band_id, {_band_key_sql(b)} AS band_key FROM sig"
      for b in range(_N_BANDS))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc1, c.doc2,
         ({" + ".join(f"CASE WHEN g1.h{i} = g2.h{i} THEN 1 ELSE 0 END"
                      for i in range(16))}) AS n_match
  FROM cand c
  JOIN sig g1 ON g1.doc_id = c.doc1
  JOIN sig g2 ON g2.doc_id = c.doc2
),
hh AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647) AS hsh FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM hh GROUP BY doc_id),
tru AS (
  SELECT c.doc1, c.doc2, count(*) AS n_common
  FROM cand c
  JOIN hh s1 ON s1.doc_id = c.doc1
  JOIN hh s2 ON s2.doc_id = c.doc2 AND s1.hsh = s2.hsh
  GROUP BY 1, 2
)
SELECT e.doc1, e.doc2,
       CAST(e.n_match * 1000000 // {_N_PERMS} AS BIGINT) AS est_jaccard_micro,
       CAST(coalesce(t.n_common, 0) * 1000000
            // (sa.n + sb.n - coalesce(t.n_common, 0)) AS BIGINT)
         AS true_jaccard_micro,
       CAST(abs(e.n_match * 1000000 // {_N_PERMS}
                - coalesce(t.n_common, 0) * 1000000
                  // (sa.n + sb.n - coalesce(t.n_common, 0))) AS BIGINT)
         AS abs_err_micro
FROM est e
LEFT JOIN tru t ON t.doc1 = e.doc1 AND t.doc2 = e.doc2
JOIN sizes sa ON sa.doc_id = e.doc1
JOIN sizes sb ON sb.doc_id = e.doc2
""")
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality report for the MinHash sketch: per LSH
    candidate pair, the signature-based Jaccard ESTIMATE (matching
    permutation-mins / {_N_PERMS}) next to the exact shingle-set
    Jaccard and their absolute error — the evaluation harness that
    justifies (or re-tunes) the sketch width before a 100 TB run.

    Scale path: the estimate touches only the 16-int signatures of
    candidate pairs (a map over the bucket-join output); the exact side
    reuses the same verify joins as dedup_minhash_lsh_pairs. Both
    Jaccards are exact integer micro-divisions — hash-exact across
    engines."""
    hh = _hashed_shingles(spark, sf_dir)
    hh.count()
    sig = _signatures_from(hh).cache()
    sig.count()  # eager: 4 concurrent broadcast consumers (bands a/b,
    # g1, g2) otherwise race the lazy cache and recompute sig each
    cand = _minhash_band_candidates(sig)
    g1 = sig.alias("g1")
    g2 = sig.alias("g2")
    n_match = sum(
        F.when(F.col(f"g1.h{i}") == F.col(f"g2.h{i}"), 1).otherwise(0)
        for i in range(_N_PERMS))
    est = (cand.join(g1, F.col("doc1") == F.col("g1.doc_id"))
           .join(g2, F.col("doc2") == F.col("g2.doc_id"))
           .select("doc1", "doc2", n_match.alias("n_match")))
    sizes = hh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = hh.alias("s1")
    s2 = hh.alias("s2")
    tru = (cand.join(s1, F.col("doc1") == F.col("s1.doc_id"))
           .join(s2, (F.col("doc2") == F.col("s2.doc_id"))
                 & (F.col("s1.hsh") == F.col("s2.hsh")))
           .groupBy("doc1", "doc2")
           .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("__d1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("__d2"), F.col("n").alias("nb"))
    est_m = F.expr(f"n_match * 1000000 DIV {_N_PERMS}")
    return (est.join(tru, ["doc1", "doc2"], "left")
            .join(sa, F.col("doc1") == F.col("__d1"))
            .join(sb, F.col("doc2") == F.col("__d2"))
            .withColumn("__true",
                        F.expr("coalesce(n_common, 0) * 1000000"
                               " DIV (na + nb - coalesce(n_common, 0))"))
            .select("doc1", "doc2",
                    est_m.cast("long").alias("est_jaccard_micro"),
                    F.col("__true").cast("long").alias("true_jaccard_micro"),
                    F.abs(est_m - F.col("__true")).cast("long")
                    .alias("abs_err_micro")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# 60-bit signature: the canonical web-dedup config is 64-bit fingerprints
# with hamming ≤ 3 (Manku et al., WWW'07); 60 bits (15 hex nibbles) keeps
# the per-token hash inside SIGNED int64 range on every engine while
# preserving the banding math. The 32-bit original collided 8-bit band
# keys so hard on this corpus that candidates approached all-pairs
# (measured 2.5 M candidates / 83 k "near-dup" pairs at sf0.1; at 60 bits:
# 272 k candidates, 512 pairs — banding selective again, pairs strict).
_SH_TOTAL_BITS, _SH_HEX = 60, 15
_SH_BANDS, _SH_BITS, _SH_MAX_HAMMING = 4, 15, 3
_SH_MASK = (1 << _SH_BITS) - 1

_SIMHASH_CTES = rf"""toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, {_SH_HEX}))::BIGINT AS th FROM toks
),
votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (th >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM th CROSS JOIN (SELECT unnest(range({_SH_TOTAL_BITS})) AS bit)
  GROUP BY doc_id, bit
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)"""


@q("dedup_simhash", f"""
WITH {_SIMHASH_CTES}
SELECT doc_id, simhash FROM sig
""")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 60-bit locality-sensitive signature from per-token hash
    bit votes (the Manku-style web-dedup fingerprint). Near-dups then
    cluster by small Hamming distance on the signature (bucket on
    bit-slices at scale, same LSH layout as MinHash).

    Dataflow: a single per-row higher-order-function fold — token hashes
    accumulate a 60-counter vote array (``aggregate`` + ``zip_with``),
    then the sign pattern packs into the signature. ZERO shuffle: the
    whole operator is map-side, so at 100 TB it scales as one pass over
    the documents (the naive explode×60-bits formulation shuffles 60×
    the token count and measures 2× slower at sf0.1 despite codegen;
    the oracle uses it — integer votes are exact, so both forms agree
    bit-for-bit)."""
    d = _tokenized(spark, sf_dir)  # bound toks array from the shared scan
    return d.select("doc_id",
                    F.expr(token_hash_expr("toks")).alias("__th")) \
            .select("doc_id",
                    F.expr(simhash_from_hashes_expr("__th")).alias("simhash"))


def token_hash_expr(toks_col: str) -> str:
    """Per-token {_SH_HEX}-nibble md5 hashes over a BOUND token-array
    column (bind the split() in a prior projection — inlining it would
    re-tokenize per lambda element)."""
    return (f"transform({toks_col}, t -> CAST(conv(substring(md5(t), 1,"
            f" {_SH_HEX}), 16, 10) AS BIGINT))")


def simhash_from_hashes_expr(th_col: str) -> str:
    """The 60-bit simhash over a BOUND token-hash array column.

    Transposed fold (r5): per BIT, an integer popcount over the hash
    array decides the sign — vote_b = 2·set_b − n > 0 ⟺ 2·set_b > n,
    exact integer equivalence with the per-token vote accumulation.
    The previous per-token form allocated two 60-element arrays per
    token inside the interpreted lambda (zip_with + sequence); this
    form does the same n·60 integer ops with NO array churn and
    measures ~2× faster. ``{th_col}`` must be a bound column: an
    inlined transform would re-hash every token once per bit."""
    return f"""
          aggregate(sequence(0, {_SH_TOTAL_BITS - 1}),
            CAST(0 AS BIGINT),
            (acc, b) -> acc + CASE WHEN
                2 * aggregate({th_col}, CAST(0 AS BIGINT),
                              (a, t) -> a + ((t >> b) & 1)) > size({th_col})
              THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))
              ELSE CAST(0 AS BIGINT) END)
        """


def band_key_structs() -> F.Column:
    """The 4×15-bit LSH band (band, band_key) structs of a ``simhash``
    column — pigeonhole-complete for hamming ≤ {_SH_MAX_HAMMING}."""
    return F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.expr(f"(simhash >> ({_SH_BITS} * {b})) & {_SH_MASK}").alias("band_key"))
        for b in range(_SH_BANDS)])


# 60-bit simhash → 4 bands of 15 bits; pigeonhole: hamming ≤ 3 flips at
# most 3 bands, so near-dup pairs ALWAYS collide on ≥1 intact band —
# band-bucketing is exhaustive for the threshold, never all-pairs.


@q("dedup_simhash_pairs", f"""
WITH {_SIMHASH_CTES},
bands AS (
  SELECT doc_id, b.band, (simhash >> ({_SH_BITS} * b.band)) & {_SH_MASK} AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range({_SH_BANDS})) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2,
       CAST(bit_count(xor(s1.simhash, s2.simhash)) AS BIGINT) AS hamming
FROM cand c
JOIN sig s1 ON s1.doc_id = c.doc1
JOIN sig s2 ON s2.doc_id = c.doc2
WHERE bit_count(xor(s1.simhash, s2.simhash)) <= {_SH_MAX_HAMMING}
""")
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band-bucketed candidates verified by
    exact Hamming distance — completing the SimHash family the same way
    dedup_minhash_lsh_pairs completes MinHash.

    Scale path: the signature is the zero-shuffle dedup_simhash map;
    banding shuffles 8-byte (band, key) rows; the verify joins touch
    candidates only (pigeonhole-complete for hamming ≤ 3) and compare
    single int64s — no shingles, no text, no all-pairs anywhere.
    """
    sig = dedup_simhash(spark, sf_dir).cache()
    sig.count()  # shared by bands + two verify joins
    bands = (sig.select("doc_id", F.explode(band_key_structs()).alias("bd"))
             .select("doc_id", "bd.band", "bd.band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
            .distinct())
    s1 = sig.select(F.col("doc_id").alias("doc1"), F.col("simhash").alias("sh1"))
    s2 = sig.select(F.col("doc_id").alias("doc2"), F.col("simhash").alias("sh2"))
    hamming = F.bit_count(F.expr("sh1 ^ sh2")).cast("long")
    # cache the verified EDGE TABLE: cluster labels, the curation
    # pipeline, and any standalone pairs consumer build this same
    # analyzed plan in one session, so the CacheManager serves all of
    # them from one banding+verify run (pairs are 24-byte rows — a tiny
    # fraction of the corpus; at 100 TB this is the persisted edge
    # table every downstream dedup stage reads instead of re-deriving)
    return (cand.join(s1, "doc1").join(s2, "doc2")
            .select("doc1", "doc2", hamming.alias("hamming"))
            .filter(F.col("hamming") <= _SH_MAX_HAMMING)
            .cache())


# ---------------------------------------------------------------------------
# near-dup clustering (pairs -> cluster labels -> canonical docs)
# ---------------------------------------------------------------------------

_CC_MAX_ROUNDS = 30  # safety cap only: large-star/small-star converges in
# O(log² n) full rounds for ANY component diameter (Kiveris et al.,
# "Connected Components in MapReduce and Beyond", SoCC'14) — ~5 rounds on
# this corpus, ≤ ~20 for trillion-node graphs. Hitting the cap raises
# rather than returning silently-split clusters (the failure mode of the
# fixed-round label-propagation this replaced: reach grew ~Fibonacci per
# round, so a component of diameter > Fib(rounds+2) ≈ 89 got split labels
# that BOTH engines agreed on — consistent but wrong at web scale).


_LOCAL_FINISH_EDGES = 1_000_000  # ≈ 16 MB of (u,v) int64 pairs via Arrow:
# below this the whole edge set is driver-trivial and distributed rounds
# are pure fixed cost (stage scheduling + checkpoint serialization per
# round on a few-hundred-row frontier). Every production CC pipeline
# finishes small frontiers locally; the distributed loop below remains
# the general path and the two are parity-tested on the same graphs.


def connected_components(edges: DataFrame, nodes: DataFrame,
                         local_finish_max_edges: int = _LOCAL_FINISH_EDGES,
                         ) -> DataFrame:
    """Min-label connected components via alternating large-star /
    small-star (the standard MapReduce CC algorithm; Kiveris et al.,
    SoCC'14). ``edges`` is (src, dst) undirected pairs, ``nodes`` the
    (doc_id) label universe (singletons included). Returns
    (doc_id, label) with label = min doc_id of the component — the true
    fixpoint, independent of round budgets or component diameter.

    Per full round, with every edge oriented (big, small):
      large-star: every neighbor v > u re-links to m(u) = min(Γ(u) ∪ {u})
      small-star: every neighbor v < u (and u itself) links to min(Γ(u))
    Both are one partitioned-window min + a projection; the round ends
    with one distinct. Converged when the edge set is unchanged — at the
    fixpoint components are stars rooted at their minimum node.

    Scale path: the iterating state is the EDGE list (near-dup pairs —
    a tiny fraction of the corpus), never a per-document frame; each
    round shuffles 16-byte edge rows on one key. localCheckpoint
    truncates lineage so the per-round plan stays constant-size, and the
    convergence probe is a count + left_anti on the checkpointed sets.

    r5 layout:
    - **local finish** (the default entry): one bounded Arrow collect
      probes whether the deduped edge set fits
      ``local_finish_max_edges``; if so, union-find with path
      compression computes the same min-labels driver-side in
      milliseconds — on a sub-driver-size frontier, distributed rounds
      are pure fixed cost (stage scheduling + checkpoint serialization;
      shuffle VOLUME was never the cost). The collect is explicitly
      bounded (limit n+1), never corpus-scaled: near-dup EDGES, not
      documents, and only under the threshold.
    - **distributed rounds** (the general path, parity-tested): each
      star's explicit repartition("u") serves BOTH duplicate-edge
      removal and the window (hash-partitioning on u already co-locates
      every (u, v) group, so dropDuplicates adds no second exchange);
      the round-end distinct is gone — emits carry duplicates into the
      next star's exchange, which absorbs them for free; the lazy
      checkpoint is materialized by the convergence-stats job, so each
      round is ONE job. The probe runs on the checkpointed large-star
      output: ls is a deterministic set-function of the round's edge
      set and the rest of the round derives from ls, so two equal probe
      sets imply the edge fixpoint — at which point ls IS the canonical
      star set and the label join reads it directly.
    """
    spark = edges.sparkSession
    # raw (possibly duplicate-carrying) edge set: the dedup rides the
    # first star's exchange, so no standalone distinct up front
    E = (edges.select(F.greatest("src", "dst").alias("u"),
                      F.least("src", "dst").alias("v"))
         .filter(F.col("u") != F.col("v")))

    if local_finish_max_edges:
        pdf = (E.dropDuplicates(["u", "v"])
               .limit(local_finish_max_edges + 1).toPandas())
        if len(pdf) <= local_finish_max_edges:
            labels = _local_union_find(pdf)
            lab_df = (local_frame(spark, labels, "doc_id long, label long")
                      if labels else
                      local_frame(spark, [], "doc_id long, label long"))
            return (nodes.join(F.broadcast(lab_df), "doc_id", "left")
                    .select("doc_id",
                            F.coalesce("label", "doc_id").alias("label")))
        # over the bound: fall through to the distributed fixpoint

    def _stats(df):
        # ONE job: edge count + order-independent content hash. The sum
        # goes through DECIMAL so ANSI mode can't overflow-throw.
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return int(r["n"]), r["h"]

    w = Window.partitionBy("u")
    prev = None  # (checkpointed ls set, count, hash)
    for _ in range(_CC_MAX_ROUNDS):
        # large-star over the symmetrized neighborhood: every neighbor
        # v > u re-links to mn(u) = min(Γ(u) ∪ {u})
        sym = E.unionByName(E.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
        symd = sym.repartition("u").dropDuplicates(["u", "v"])
        ls = (symd.withColumn("mn", F.least(F.min("v").over(w), F.col("u")))
              .filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("mn").alias("v")))
        lsd = (ls.repartition("u").dropDuplicates(["u", "v"])
               .localCheckpoint(eager=False))
        n, h = _stats(lsd)  # materializes the checkpoint
        if n == 0:
            break  # edgeless graph: trivially at the fixpoint
        # (count, hash-sum) equality is the cheap signal; the anti-join
        # is the EXACT confirmation and runs only when the signal fires
        # (at most twice per call: a false positive would re-loop)
        if (prev is not None and n == prev[1] and h == prev[2]
                and lsd.join(prev[0], ["u", "v"], "left_anti").isEmpty()):
            break
        # small-star over the (big, small)-oriented output: min neighbor
        # becomes the hub; emit (leaf, hub) for the other leaves +
        # (u, hub); duplicates left for the next star's exchange
        ss = lsd.withColumn("mn", F.min("v").over(w))
        leaves = (ss.filter(F.col("v") != F.col("mn"))
                  .select(F.col("v").alias("u"), F.col("mn").alias("v")))
        E = leaves.unionByName(ss.select("u", F.col("mn").alias("v")))
        prev = (lsd, n, h)
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {_CC_MAX_ROUNDS} rounds")
    return (nodes.join(lsd.select(F.col("u").alias("doc_id"),
                                  F.col("v").alias("label")),
                       "doc_id", "left")
            .select("doc_id", F.coalesce("label", "doc_id").alias("label")))


def _local_union_find(pdf) -> list[tuple[int, int]]:
    """Union-find with path compression over a pandas (u, v) edge frame;
    returns (node, min-id-of-component) for every node that appears in
    an edge (singletons are handled by the caller's left join). Exact
    integer min-labels — identical to the distributed fixpoint."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            # union by min keeps every root the component minimum, so
            # find() doubles as the label lookup
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return [(x, find(x)) for x in parent] + [
        (r, r) for r in {find(x) for x in parent}]


def _cluster_oracle_sql() -> str:
    """True min-label connected components over the simhash near-dup
    edges: a recursive reachability CTE (UNION dedups, so it terminates),
    then min over each node's reachable set. Matches the Spark side's
    large-star/small-star fixpoint for ANY component diameter — neither
    side depends on a round budget."""
    return f"""WITH RECURSIVE {_SIMHASH_CTES},
bands AS (
  SELECT doc_id, b.band, (simhash >> ({_SH_BITS} * b.band)) & {_SH_MASK} AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range({_SH_BANDS})) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM cand c
  JOIN sig s1 ON s1.doc_id = c.doc1 JOIN sig s2 ON s2.doc_id = c.doc2
  WHERE bit_count(xor(s1.simhash, s2.simhash)) <= {_SH_MAX_HAMMING}
),
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
reach AS (
  SELECT doc_id, doc_id AS r FROM sig
  UNION
  SELECT w.doc_id, s.dst AS r
  FROM reach w JOIN sym s ON s.src = w.r
)
SELECT doc_id, min(r) AS cluster_id,
       CASE WHEN doc_id = min(r) THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY doc_id"""


from ..sources.loader import register_memo as _register_memo

_LABELS_MEMO: dict = _register_memo({})


@q("dedup_cluster_labels", _cluster_oracle_sql())
def dedup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final dedup stage: near-dup PAIRS (simhash banded Hamming)
    become CLUSTERS via alternating large-star/small-star connected
    components; each cluster keeps its min-doc_id member as canonical
    (is_canonical = 1 marks the rows a training pipeline retains).

    The CC core (``connected_components``) converges to the true
    min-label fixpoint in O(log² n) rounds for any component diameter —
    no round budget to outgrow — and iterates over the EDGE list only
    (near-dup pairs, a tiny fraction of the corpus), so the per-round
    shuffles move 16-byte pair rows, never a per-document frame.
    Singleton documents join in once at the end (label = themselves).
    Exact integer mins ⇒ engine-identical to the oracle's recursive
    reachability CTE.

    The label frame is memoized per (session, dataset) and cached: the
    CC fixpoint runs eagerly at build time, so every downstream
    consumer (curation verdict, keep-best policy) reuses ONE run — the
    in-session stand-in for the persisted cluster-label table a
    production dedup pipeline writes once and reads everywhere."""
    import os as _os

    from ..sources.loader import _session_key

    key = (_session_key(spark), _os.path.abspath(sf_dir))
    if key in _LABELS_MEMO:
        return _LABELS_MEMO[key]
    edges = (dedup_simhash_pairs(spark, sf_dir)
             .select(F.col("doc1").alias("src"), F.col("doc2").alias("dst")))
    # label universe = sig, as in the oracle; dedup_simhash builds the
    # same analyzed plan dedup_simhash_pairs just cached, so the
    # CacheManager serves it from memory rather than recomputing
    nodes = dedup_simhash(spark, sf_dir).select("doc_id")
    labels = connected_components(edges, nodes)
    out = labels.select(
        "doc_id", F.col("label").alias("cluster_id"),
        F.when(F.col("doc_id") == F.col("label"), 1).otherwise(0)
        .cast("long").alias("is_canonical")).cache()
    _LABELS_MEMO[key] = out
    return out


# ---------------------------------------------------------------------------
# Jaccard CONTAINMENT (asymmetric near-dup: subset / quote detection)
# ---------------------------------------------------------------------------

_CONTAIN_MIN = 0.5  # report pairs where either side is ≥ half-contained


@q("dedup_jaccard_containment", f"""
WITH sh AS ({_SHINGLE_SQL}),
hh AS (SELECT doc_id, {_HASH_SQL} AS hsh FROM sh),
kept AS (
  SELECT doc_id, hsh FROM hh
  QUALIFY count(*) OVER (PARTITION BY hsh) <= {_DF_CAP}
),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_common
  FROM kept a JOIN kept b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc1, p.doc2, CAST(p.n_common AS BIGINT) AS n_common,
       CAST(p.n_common AS DOUBLE) / sa.n AS c_doc1_in_doc2,
       CAST(p.n_common AS DOUBLE) / sb.n AS c_doc2_in_doc1,
       CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) AS jaccard,
       CASE WHEN sa.n <= sb.n THEN p.doc1 ELSE p.doc2 END AS contained_doc
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc1
JOIN sizes sb ON sb.doc_id = p.doc2
WHERE greatest(CAST(p.n_common AS DOUBLE) / sa.n,
               CAST(p.n_common AS DOUBLE) / sb.n) >= {_CONTAIN_MIN}
""")
def dedup_jaccard_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: C(A in B) = |A∩B| / |A| over the
    df-capped hashed-shingle space — the Broder containment coefficient.
    Symmetric Jaccard misses a short document quoted inside a much
    longer one (|A∩B|/|A∪B| stays small when |B| ≫ |A|); containment
    flags it at ~1.0. ``contained_doc`` names the smaller-set side —
    the one a quote-dedup pass would drop or trim (integer set-size
    comparison, no float tie hazard).

    Scale path: identical to dedup_ngram_jaccard — the same ONE
    posting-list shuffle (bounded by the df cap, so pair fan-out is
    ≤ Σ min(df, cap)², linear in corpus size), the same 8-byte hash
    keys; the two containments and the Jaccard all derive from the one
    (pairs ⋈ sizes ⋈ sizes) plan. Sharing _hashed_shingles means a
    session running both symmetric and asymmetric reports pays the
    shingle scan once."""
    sizes, pairs = _capped_sizes_and_pairs(spark, sf_dir)
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    c1 = F.col("n_common").cast("double") / F.col("sa.n")
    c2 = F.col("n_common").cast("double") / F.col("sb.n")
    jac = (F.col("n_common").cast("double")
           / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")))
    return (pairs.join(sa, F.col("doc1") == F.col("sa.doc_id"))
            .join(sb, F.col("doc2") == F.col("sb.doc_id"))
            .select("doc1", "doc2",
                    F.col("n_common").cast("long").alias("n_common"),
                    c1.alias("c_doc1_in_doc2"),
                    c2.alias("c_doc2_in_doc1"),
                    jac.alias("jaccard"),
                    F.when(F.col("sa.n") <= F.col("sb.n"), F.col("doc1"))
                    .otherwise(F.col("doc2")).alias("contained_doc"))
            .filter(F.greatest(c1, c2) >= _CONTAIN_MIN))


# ---------------------------------------------------------------------------
# substring-level duplicate spans (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — the exact-substring
# family, expressed over bounded n-gram keys instead of a suffix array)
# ---------------------------------------------------------------------------

_SPAN_N = 5  # 5-token grams: long enough to not fire on common phrases


@q("dedup_duplicate_spans", f"""
WITH toksrc AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
ng AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         ('0x' || substr(md5(array_to_string(toks[i:i+{_SPAN_N - 1}], ' ')),
          1, 15))::BIGINT AS h
  FROM toksrc, unnest(range(1, greatest(len(toks) - {_SPAN_N - 2}, 1)))
       AS u(i)
),
df AS (SELECT h, count(DISTINCT doc_id) AS df FROM ng GROUP BY 1),
flagged AS (
  SELECT n.doc_id, n.pos, (d.df >= 2) AS is_dup
  FROM ng n JOIN df d USING (h)
),
runs AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM flagged WHERE is_dup
),
runlen AS (SELECT doc_id, count(*) AS rl FROM runs GROUP BY doc_id, grp),
per AS (
  SELECT doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup
  FROM flagged GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_ngrams,
       CAST(coalesce(m.max_run, 0) AS BIGINT) AS max_dup_run,
       CAST(coalesce(p.n_dup, 0) AS DOUBLE)
         / nullif(coalesce(p.n_ngrams, 0), 0) AS dup_frac
FROM documents d
LEFT JOIN per p USING (doc_id)
LEFT JOIN (SELECT doc_id, max(rl) AS max_run FROM runlen GROUP BY 1) m
  USING (doc_id)
""")
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication profile: for every document, how many
    of its {_SPAN_N}-token grams also appear in ANOTHER document, and
    the longest consecutive run of such cross-duplicated grams — the
    bounded-n-gram re-expression of Lee et al.'s exact-substring dedup
    (a max_dup_run of r means an exactly-shared span of r+{_SPAN_N}-1
    tokens; a downstream pass can then cut or drop those spans).

    Scale path: grams reduce to 60-bit hashes map-side, so the df
    aggregate and the df-probe join both shuffle 8-byte keys (never
    text); df uses a partial-aggregatable distinct-count, so a hot
    boilerplate gram costs one combine tree, not a straggler posting
    list; the run-length pass is a per-document window over positions
    (unique within a doc → totally ordered). Three keyed shuffles total
    (hash df, df probe, per-doc window+rollup), each carrying fixed
    ~24-byte rows.
    """
    toks = _tokenized(spark, sf_dir).select("doc_id", "toks")
    grams = F.when(
        F.size("toks") >= _SPAN_N,
        F.expr(f"transform(sequence(1, size(toks) - {_SPAN_N - 1}),"
               f" i -> struct(CAST(i AS BIGINT) AS pos,"
               f" CAST(conv(substring(md5(concat_ws(' ',"
               f" slice(toks, i, {_SPAN_N}))), 1, 15), 16, 10) AS BIGINT)"
               f" AS h))")
    ).otherwise(F.array().cast("array<struct<pos:bigint,h:bigint>>"))
    ng = (toks.select("doc_id", F.explode(grams).alias("g"))
          .select("doc_id", "g.pos", "g.h"))
    # cross-doc test in ONE gram-hash exchange: a gram appears in ≥ 2
    # distinct docs ⟺ min(doc) ≠ max(doc) over its instances — the
    # window computes both under a single partitioning, replacing the
    # r4 layout's countDistinct aggregate + df-probe join (two h-keyed
    # shuffles and a distinct expansion) with one
    wh = Window.partitionBy("h")
    flagged = ng.select(
        "doc_id", "pos",
        (F.min("doc_id").over(wh) != F.max("doc_id").over(wh)).alias("is_dup"))
    # ONE doc-keyed aggregate computes counts AND the longest run (r14,
    # guide §2.1): the previous layout cached flagged and consumed it in
    # two separate doc_id passes (a row_number window+rollup for runs, a
    # groupBy for counts — two exchanges, 13.7 s combined task time at
    # sf0.1). max_run = longest run of consecutive integers among a
    # doc's dup positions (positions are unique per doc), so a sorted
    # per-doc position array folds to it integer-exactly — same value
    # as the oracle's pos - row_number() grouping, one exchange total.
    per = (flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup"),
        F.sort_array(F.collect_list(
            F.when(F.col("is_dup"), F.col("pos")))).alias("__dps"))
        .withColumn("max_run", F.expr(
            "aggregate(__dps,"
            " named_struct('prev', CAST(-2 AS BIGINT),"
            "              'run', CAST(0 AS BIGINT),"
            "              'best', CAST(0 AS BIGINT)),"
            " (a, p) -> named_struct("
            "   'prev', p,"
            "   'run', IF(p = a.prev + 1, a.run + 1, CAST(1 AS BIGINT)),"
            "   'best', greatest(a.best,"
            "     IF(p = a.prev + 1, a.run + 1, CAST(1 AS BIGINT)))),"
            " a -> a.best)")))
    docs = _tokenized(spark, sf_dir).select("doc_id")
    return (docs.join(per, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
                F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_ngrams"),
                F.coalesce("max_run", F.lit(0)).cast("long").alias("max_dup_run"),
                (F.coalesce("n_dup", F.lit(0)).cast("double")
                 / F.nullif(F.coalesce("n_ngrams", F.lit(0)), F.lit(0)))
                .alias("dup_frac")))


# ---------------------------------------------------------------------------
# edit-distance verification of near-dup candidates
# ---------------------------------------------------------------------------


@q("dedup_edit_distance", f"""
WITH {_SIMHASH_CTES},
bands AS (
  SELECT doc_id, b.band, (simhash >> ({_SH_BITS} * b.band)) & {_SH_MASK} AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range({_SH_BANDS})) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT c.doc1, c.doc2
  FROM cand c
  JOIN sig s1 ON s1.doc_id = c.doc1
  JOIN sig s2 ON s2.doc_id = c.doc2
  WHERE bit_count(xor(s1.simhash, s2.simhash)) <= {_SH_MAX_HAMMING}
),
m AS (
  SELECT p.doc1, p.doc2,
         CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS edit_dist,
         CAST(greatest(length(d1.text), length(d2.text)) AS BIGINT) AS max_len
  FROM pairs p
  JOIN documents d1 ON d1.doc_id = p.doc1
  JOIN documents d2 ON d2.doc_id = p.doc2
)
SELECT doc1, doc2, edit_dist, max_len,
       CAST(floor(1000000.0 * (1.0 - CAST(edit_dist AS DOUBLE)
            / CAST(nullif(max_len, 0) AS DOUBLE))) AS BIGINT) AS sim_micro
FROM m
""")
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level edit-distance verification of the SimHash
    near-dup candidates: each banded-and-Hamming-verified pair gets an
    exact Levenshtein distance plus a normalized similarity
    ``sim_micro = floor(1e6 * (1 - dist / max_len))`` — the
    strictest (and most expensive) of the near-dup signals, so it runs
    LAST in the funnel, on the bounded candidate edge table only.

    Scale path: Levenshtein is O(len1*len2) per pair — unrunnable
    all-pairs, fine on the band-bucketed edge set (the cached
    dedup_simhash_pairs frame; candidate count ∝ true near-dups, a
    tiny fraction of the corpus). Text travels only for pair members:
    the bounded ID-ONLY pair frame broadcasts into each documents scan
    (never a text-bearing frame — an explicit broadcast hint bypasses
    the size threshold, so broadcasting joined text could OOM the
    driver at scale; ADVICE r6), and the two pair-bounded halves join
    on the pair key — the corpus is never shuffled. Exactness: both
    engines implement the
    classic character-level Levenshtein DP (verified identical), and
    the similarity quantizes an int64 ratio through one double divide
    in identical operation order.
    """
    pairs = dedup_simhash_pairs(spark, sf_dir).select("doc1", "doc2")
    d = load_table(spark, sf_dir, "documents")
    d1 = d.select(F.col("doc_id").alias("doc1"), F.col("text").alias("t1"))
    d2 = d.select(F.col("doc_id").alias("doc2"), F.col("text").alias("t2"))
    h1 = d1.join(F.broadcast(pairs), "doc1")  # (doc1, doc2, t1): pair-bounded
    h2 = d2.join(F.broadcast(pairs), "doc2")  # (doc2, doc1, t2): pair-bounded
    # fan the Levenshtein stage out to the session's parallelism (r14,
    # guide §2.5): the verified pair frame is KB-sized, so AQE's
    # byte-based coalescing collapses it to one partition — but the
    # stage's cost is CPU (O(len²) per pair), not bytes; profiled as a
    # single-task 0.7 s tail. The exchange itself moves only the
    # bounded pair texts; partition count tracks cluster cores.
    m = (h1.join(h2, ["doc1", "doc2"])
         .repartition(spark.sparkContext.defaultParallelism,
                      "doc1", "doc2")
         .select("doc1", "doc2",
                 F.expr("CAST(levenshtein(t1, t2) AS BIGINT)")
                 .alias("edit_dist"),
                 F.expr("CAST(greatest(length(t1), length(t2)) AS BIGINT)")
                 .alias("max_len")))
    return m.select(
        "doc1", "doc2", "edit_dist", "max_len",
        F.expr("CAST(floor(1000000.0 * (1.0 - CAST(edit_dist AS DOUBLE)"
               " / CAST(nullif(max_len, 0) AS DOUBLE))) AS BIGINT)")
        .alias("sim_micro"))


# ---------------------------------------------------------------------------
# n-gram novelty: first-occurrence attribution in ingestion order
# ---------------------------------------------------------------------------


@q("corpus_ngram_novelty", f"""
WITH sh AS ({_SHINGLE_SQL}),
hh AS (SELECT doc_id, {_HASH_SQL} AS hsh FROM sh),
fst AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY hsh) AS first_doc
  FROM hh
),
per AS (
  SELECT doc_id, count(*) AS n_shingles,
         sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM fst GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(coalesce(p.n_novel, 0) * 1000000 // nullif(p.n_shingles, 0)
            AS BIGINT) AS novelty_micro
FROM documents d LEFT JOIN per p USING (doc_id)
""")
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct shingles whose global first occurrence (min doc_id over
    the corpus — ingestion order) is this document. The marginal-new-
    information curve a curator reads before appending another crawl
    dump: a dump whose docs trend toward novelty_micro ≈ 0 adds bytes,
    not information (the observation behind dedup-then-train and the
    diminishing-returns scaling of repeated data).

    Scale path: rides the cached 16-byte hashed-shingle frame shared
    with the Jaccard index / decontamination; first-occurrence is ONE
    min-over-hash-partition window (the dedup_exact keeper pattern),
    then a per-doc combinable aggregate — text never shuffles. Docs
    with < 3 tokens have no shingles: 0 counts, NULL novelty on both
    engines (nullif guard).
    """
    hh = _hashed_shingles(spark, sf_dir)  # shared cached scan
    w = Window.partitionBy("hsh")
    per = (hh.withColumn("first_doc", F.min("doc_id").over(w))
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                      .otherwise(0)).alias("n_novel")))
    docs = _tokenized(spark, sf_dir).select("doc_id")
    return (docs.join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_shingles", F.lit(0)).cast("long")
                    .alias("n_shingles"),
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                    .alias("n_novel"),
                    F.expr("CAST(coalesce(n_novel, 0) * 1000000"
                           " DIV nullif(n_shingles, 0) AS BIGINT)")
                    .alias("novelty_micro")))


# ---------------------------------------------------------------------------
# prefix-containment dedup: truncation/retry duplicates
# ---------------------------------------------------------------------------

_PFX_TOKENS = 8   # bucket key: the first 8 normalized tokens
_PFX_DF_CAP = 50  # boilerplate guard: openings shared by more docs are
# dropped (same role as the jaccard _DF_CAP — a viral opening line would
# otherwise contribute df² candidate pairs)


@q("dedup_prefix_containment", f"""
WITH t AS (
  SELECT doc_id, lower(trim(text)) AS txt,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
h AS (
  SELECT doc_id, md5(array_to_string(toks[1:{_PFX_TOKENS}], ' ')) AS head
  FROM t WHERE len(toks) >= {_PFX_TOKENS}
),
kept AS (
  SELECT doc_id, head FROM h
  QUALIFY count(*) OVER (PARTITION BY head) <= {_PFX_DF_CAP}
),
cand AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2
  FROM kept a JOIN kept b ON a.head = b.head AND a.doc_id < b.doc_id
),
m AS (
  SELECT c.doc1, c.doc2, t1.txt AS x1, t2.txt AS x2
  FROM cand c
  JOIN t t1 ON t1.doc_id = c.doc1
  JOIN t t2 ON t2.doc_id = c.doc2
)
SELECT doc1, doc2,
       CAST(length(x1) AS BIGINT) AS len1,
       CAST(length(x2) AS BIGINT) AS len2,
       CAST(CASE WHEN length(x1) <= length(x2)
                 THEN starts_with(x2, x1)
                 ELSE starts_with(x1, x2) END AS BIGINT) AS is_prefix
FROM m
""")
def dedup_prefix_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-containment dedup: pairs where one document is an EXACT
    prefix of the other — the truncation/retry duplicate class
    (connection-dropped crawls, length-capped re-scrapes, streamed
    generations cut at different token limits) that shingle-Jaccard
    underweights (a 10%-length prefix shares ≤ 10% of shingles) and
    exact-hash dedup misses entirely.

    Scale path: candidates come from an ID-ONLY bucket join on the
    md5 of the first {_PFX_TOKENS} normalized tokens (a true prefix
    pair MUST share the full opening — the bucket key is
    pigeonhole-complete for docs ≥ {_PFX_TOKENS} tokens), with the
    df-cap killing viral-opening buckets; the verify joins text via
    the broadcast bounded pair frame (the dedup_edit_distance shape —
    the corpus never shuffles its text). Exactness: pure string
    operations; the shorter side is the tested prefix, equal lengths
    degrade to exact equality."""
    t = (_tokenized(spark, sf_dir)
         .select("doc_id", F.lower(F.trim(F.col("text"))).alias("txt"),
                 "toks"))
    h = (t.filter(F.size("toks") >= _PFX_TOKENS)
         .select("doc_id",
                 F.md5(F.concat_ws(" ", F.slice("toks", 1, _PFX_TOKENS)))
                 .alias("head")))
    posts = (h.groupBy("head")
             .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
             .filter(F.size("docs") <= _PFX_DF_CAP))
    # cached: both broadcast consumers read ONE materialization of the
    # bounded id-pair frame (the static tree still prints the head agg
    # per consumer — see the plan-invariant budget note)
    cand = (posts.select(F.explode(F.expr(
        "flatten(transform(docs, (d1, i) ->"
        " transform(slice(docs, i + 2, size(docs)), d2 ->"
        " struct(d1 AS doc1, d2 AS doc2))))")).alias("p"))
        .select("p.doc1", "p.doc2").cache())
    t1 = t.select(F.col("doc_id").alias("doc1"), F.col("txt").alias("x1"))
    t2 = t.select(F.col("doc_id").alias("doc2"), F.col("txt").alias("x2"))
    m = (t1.join(F.broadcast(cand), "doc1")
         .join(t2.join(F.broadcast(cand), "doc2").select("doc1", "doc2", "x2"),
               ["doc1", "doc2"]))
    return m.select(
        "doc1", "doc2",
        F.length("x1").cast("long").alias("len1"),
        F.length("x2").cast("long").alias("len2"),
        F.expr("CAST(CASE WHEN length(x1) <= length(x2)"
               " THEN startswith(x2, x1)"
               " ELSE startswith(x1, x2) END AS BIGINT)").alias("is_prefix"))


# ---------------------------------------------------------------------------
# incremental dedup against a PERSISTED MinHash-LSH index
# ---------------------------------------------------------------------------

_INC_MOD = 8        # the "daily batch": doc_id % 8 == 0 is the increment,
# the other 7/8 of the corpus is the already-indexed base
_INC_MIN_MATCH = 8  # duplicate threshold: >= 8/16 matching signature
# components (estimated Jaccard >= 0.5 — the signature-level estimator,
# so verification never touches corpus shingles at probe time)


def _lsh_index_path(sf_dir: str) -> str:
    import hashlib
    import os
    from ..core.session import scratch_root
    root = scratch_root()
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(root, "lsh_index", key)


_PFX_DOCS_PER_WIDTH = 1_000_000  # corpus size at which one more hex
# char of prefix (16× more band slices) pays for its footer overhead


def _pfx_width_for(n_docs: int) -> int:
    """Band-key prefix width (hex chars) for a corpus of ``n_docs``:
    16 slices under 1M docs, 256 under 16M, 4096 under 256M, … — wide
    enough that a production probe prunes hard, narrow enough that a
    gate-sized index isn't all parquet-footer opens (VERDICT r8: at
    sf0.1, 1 s of the 2.7 s probe was opening 256 slices for a
    17.5 K-row read)."""
    width, cap = 1, _PFX_DOCS_PER_WIDTH
    while n_docs >= cap and width < 8:
        width, cap = width + 1, cap * 16
    return width


def _write_lsh_meta(bands_dir: str, pfx_width: int) -> None:
    # the meta lives INSIDE the bands directory (underscore-prefixed —
    # invisible to parquet file discovery, like _SUCCESS), so a
    # rebuild's rename-aside swap changes the width and the layout it
    # describes ATOMICALLY: there is no window where probes would slice
    # band keys with one width against the other width's partitions
    # (silent pruning misses, the worst failure mode)
    import json
    import os
    os.makedirs(bands_dir, exist_ok=True)
    with open(os.path.join(bands_dir, "_lsh_meta.json"), "w") as f:
        json.dump({"pfx_width": int(pfx_width)}, f)


def lsh_pfx_width(path: str) -> int:
    """The index's band-partition prefix width, read from the artifact
    (probes/appends must slice band keys exactly as the build did).
    Falls back to the pre-r9 top-level meta.json location, then to the
    fixed width of 2 that predates the parameter."""
    import json
    import os
    for meta in (os.path.join(path, "bands", "_lsh_meta.json"),
                 os.path.join(path, "meta.json")):
        if os.path.exists(meta):
            with open(meta) as f:
                return int(json.load(f)["pfx_width"])
    return 2


def _hashed_shingles_of(docs: DataFrame) -> DataFrame:
    """(doc_id, hsh) from an explicit (doc_id, text) frame — the same
    tokenize→3-shingle→hash chain as ``_hashed_shingles`` but scoped to
    the given documents (the incremental probe must NOT ride the
    whole-corpus cached frame: its plan would scan base text)."""
    toks = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"))
    sh = F.when(
        F.size("toks") >= 3,
        F.array_distinct(F.expr(
            "transform(sequence(1, size(toks) - 2),"
            " i -> concat_ws(' ', slice(toks, i, 3)))"))
    ).otherwise(F.array().cast("array<string>"))
    return (toks.select("doc_id", F.explode(sh).alias("shingle"))
            .select("doc_id", _hash_col().alias("hsh")))


def build_lsh_index(spark: SparkSession, sf_dir: str,
                    path: str | None = None,
                    pfx_width: int | None = None) -> str:
    """Build and PERSIST the corpus MinHash-LSH index — the artifact an
    incremental-ingest pipeline maintains so each daily batch probes a
    saved table instead of re-clustering the corpus (the
    save_codebook/load_codebook lifecycle, kmeans_ivf.py:150, applied
    to dedup).

    Two parquet tables under ``path``:
      sig/    (doc_id, h0..h15) PARTITIONED BY ingest_batch —
              16-component MinHash signatures of every BASE document
              (144-byte rows; corpus text is touched here ONCE, at
              build time, never at probe time). The build writes
              ingest_batch=-1; each streaming append owns its own
              batch partition (see append_to_lsh_index), which makes
              batch re-runs idempotent and lets a probe EXCLUDE its
              own failed attempt's rows.
      bands/  (doc_id, band_id, band_key) PARTITIONED BY (pfx,
              ingest_batch) — pfx is the band key's first ``pfx_width``
              hex chars (16^width values): the probe pushes its
              increment's prefixes as a PARTITION filter, so a small
              batch reads only the matching slices of the index, not
              the whole band table: corpus-side IO scales with the
              increment, which is the whole point of the operator.
      bands/_lsh_meta.json  the prefix width. It is an ARTIFACT
              parameter, chosen at build time from the corpus row
              count (_pfx_width_for:
              16 slices under 1M docs, 256 under 16M, …) and read back
              by every probe/append — a gate-sized index must not pay
              256 parquet-footer opens for a 17 K-row probe read, and
              a production index must prune hard (VERDICT r8 item 4).
    """
    path = path or _lsh_index_path(sf_dir)
    base = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % _INC_MOD != 0)
            .select("doc_id", "text"))
    sig = (_signatures_from(_hashed_shingles_of(
        parallel_scan(spark, base, "doc_id")))
        .withColumn("ingest_batch", F.lit(-1)))
    # STATIC overwrite: a (re)build must wipe the whole directory —
    # under a session-level dynamic partitionOverwriteMode a rebuild
    # over an old-layout index would leave stale partitions behind
    # (the CLAUDE.md r8 failure mode; _write_bm25_batch sets it too)
    (sig.write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("ingest_batch").parquet(path + "/sig"))
    sig_back = spark.read.parquet(path + "/sig").drop("ingest_batch")
    if pfx_width is None:
        # footer-only count of the just-written signature table — one
        # row per shingled base doc, so it IS the corpus size
        pfx_width = _pfx_width_for(sig_back.count())
    bands = _band_frame(sig_back)
    (bands.withColumn("pfx", F.substring("band_key", 1, int(pfx_width)))
     .withColumn("ingest_batch", F.lit(-1))
     .repartition("pfx")
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("pfx", "ingest_batch").parquet(path + "/bands"))
    _write_lsh_meta(path + "/bands", pfx_width)
    return path


def _inc_lsh_oracle_sql() -> str:
    mins = _minhash_select_sql()
    cb = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {_band_key_sql(b)} AS band_key"
        f" FROM csig" for b in range(_N_BANDS))
    ib = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {_band_key_sql(b)} AS band_key"
        f" FROM isig" for b in range(_N_BANDS))
    match_sum = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(_N_PERMS))
    return f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
csig AS (SELECT * FROM sig WHERE doc_id % {_INC_MOD} <> 0),
isig AS (SELECT * FROM sig WHERE doc_id % {_INC_MOD} = 0),
cb AS ({cb}),
ib AS ({ib}),
cand AS (
  SELECT DISTINCT i.doc_id AS new_id, c.doc_id AS corpus_id
  FROM ib i JOIN cb c ON i.band_id = c.band_id AND i.band_key = c.band_key
),
m AS (
  SELECT cand.new_id, cand.corpus_id, ({match_sum}) AS n_match
  FROM cand
  JOIN isig a ON a.doc_id = cand.new_id
  JOIN csig b ON b.doc_id = cand.corpus_id
),
best AS (
  SELECT new_id, corpus_id, n_match FROM m
  WHERE n_match >= {_INC_MIN_MATCH}
  QUALIFY row_number() OVER (PARTITION BY new_id
                             ORDER BY n_match DESC, corpus_id) = 1
)
SELECT d.doc_id,
       CAST(b.corpus_id AS BIGINT) AS dup_of,
       CAST(coalesce(b.n_match, 0) AS BIGINT) AS n_match_sig,
       CAST(coalesce(b.n_match, 0) * 1000000 // {_N_PERMS} AS BIGINT)
         AS est_jaccard_micro,
       CAST(CASE WHEN b.corpus_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS admitted
FROM (SELECT doc_id FROM documents WHERE doc_id % {_INC_MOD} = 0) d
LEFT JOIN best b ON b.new_id = d.doc_id"""


@q("dedup_incremental_lsh", _inc_lsh_oracle_sql())
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup admission against the persisted MinHash-LSH
    index (VERDICT r7 item 3): a new batch of documents (doc_id %
    {_INC_MOD} == 0, the "daily increment") probes the SAVED band table
    of the already-indexed base corpus — no re-shingling, no
    re-clustering, no corpus text in the probe plan. Per increment
    document: its best duplicate in the base (``dup_of``, signature-
    estimated Jaccard in micros, best = (n_match DESC, corpus_id ASC))
    or ``admitted = 1`` when no base document matches ≥
    {_INC_MIN_MATCH}/{_N_PERMS} signature components — the batch twin
    of the streaming near-dup admission (streaming/neardup.py).

    Scale path: only INCREMENT text is scanned and shingled (one
    explode + groupBy over the batch); the increment's band-key prefix
    set — a hard-bounded collect over the 16^width hex-prefix domain,
    width being an artifact parameter chosen at build time from the
    corpus size (bands/_lsh_meta.json; _pfx_width_for) — pushes into the index
    read as a PARTITION filter, so corpus-side IO is the matching
    index slices, not the corpus: work scales with the increment.
    Verification compares 16-component
    signatures (the persisted artifact) — corpus shingles/text are
    never touched at probe time. The index itself is built ONCE
    (memoized per session; in production a daily job maintains it
    incrementally by appending each admitted batch's bands).

    Exactness: the oracle recomputes base signatures from the corpus —
    the persisted index is a deterministic function of the base text,
    so probing the artifact and recomputing agree bit-for-bit; int64
    match counts and micro floor-divisions; the best-match window is
    totally ordered.

    Cost profile at gate SF: r8 stage timings (sf0.1 idle, fixed
    width=2) showed ~1 s of the 2.7 s probe was OPENING 256 pfx
    slices' files for a 17.5 K-row bands read — fixed small-file
    overhead, not data volume. r9 made the width an artifact parameter
    (gate corpora < 1M docs build 16 slices; production corpora build
    256+ and pruning bites) — the footer count now tracks the corpus
    size the artifact was built for."""
    path = cached_scalar(spark, sf_dir, "lsh_index_path",
                         lambda: build_lsh_index(spark, sf_dir))
    inc_docs = (load_table(spark, sf_dir, "documents")
                .filter(F.col("doc_id") % _INC_MOD == 0)
                .select("doc_id", "text"))
    return probe_lsh_index(spark, inc_docs, path)


def append_to_lsh_index(spark: SparkSession, path: str,
                        docs: DataFrame,
                        batch_id: int | None = None) -> None:
    """MAINTAIN the persisted index: append an admitted batch's
    signatures and (prefix-partitioned) bands — the daily-job half of
    the lifecycle (build once → per batch: probe, admit, APPEND), so
    the index tracks the corpus without ever re-shingling it.

    With ``batch_id`` the write is IDEMPOTENT: the batch owns its
    ``ingest_batch=<id>`` partition and a re-run REPLACES it via
    dynamic partition overwrite instead of appending duplicates — the
    same exactly-once recipe as AppendTable.append_idempotent, which
    is what the streaming ingest pipeline (streaming/lsh_ingest.py)
    relies on under foreachBatch's at-least-once retries. Without it
    (ad-hoc maintenance), rows land in ingest_batch=-2 as a plain
    append."""
    sig = _signatures_from(_hashed_shingles_of(docs))
    bands = (_band_frame(sig)
             .withColumn("pfx", F.substring("band_key", 1,
                                            lsh_pfx_width(path))))
    tag = -2 if batch_id is None else int(batch_id)
    mode = "append" if batch_id is None else "overwrite"
    (sig.withColumn("ingest_batch", F.lit(tag))
     .write.mode(mode).option("partitionOverwriteMode", "dynamic")
     .partitionBy("ingest_batch").parquet(path + "/sig"))
    (bands.withColumn("ingest_batch", F.lit(tag))
     .repartition("pfx")
     .write.mode(mode).option("partitionOverwriteMode", "dynamic")
     .partitionBy("pfx", "ingest_batch").parquet(path + "/bands"))


def _sig_match_count(cand: DataFrame, left_sig: DataFrame,
                     right_sig: DataFrame, left_key: str,
                     right_key: str) -> DataFrame:
    """(left_key, right_key, n_match): the per-pair count of agreeing
    signature components — THE edge-verification rule, in one place
    (candidates from band collisions, verification over the
    {_N_PERMS}-component signatures; >= _INC_MIN_MATCH makes an edge).
    Every consumer — index probe, base edge build, within-batch
    dedup, cluster-update new<->new — must verify through this helper
    so the rule can never drift between them."""
    a = left_sig.select(F.col("doc_id").alias(left_key),
                        *[F.col(f"h{i}").alias(f"a{i}")
                          for i in range(_N_PERMS)])
    b = right_sig.select(F.col("doc_id").alias(right_key),
                         *[F.col(f"h{i}").alias(f"b{i}")
                           for i in range(_N_PERMS)])
    n_match = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(_N_PERMS))
    return (cand.join(a, left_key).join(b, right_key)
            .select(left_key, right_key,
                    n_match.cast("long").alias("n_match")))


def _verified_matches(spark: SparkSession, inc_sig: DataFrame, path: str,
                      exclude_batch: int | None = None) -> DataFrame:
    """(new_id, corpus_id, n_match) for every band-key collision of the
    probe signatures against the index at ``path`` — the shared
    candidate+verify core of probe_lsh_index (which keeps only each
    doc's best match) and the cluster-index update (which needs EVERY
    verified edge: connected components over best-only edges would
    split clusters). Partition-pruned exactly like the probe: the
    probe's band-key prefixes push into the bands read as a partition
    filter, and verification compares persisted 16-component
    signatures — corpus text is never touched."""
    width = lsh_pfx_width(path)  # slice band keys as the build did
    inc_bands = (_band_frame(inc_sig)
                 .withColumn("pfx", F.substring("band_key", 1, width)))
    # hard-bounded collect: ≤ min(16^width, increment band count)
    # distinct hex prefixes, regardless of corpus size
    prefixes = sorted(r["pfx"] for r in
                      inc_bands.select("pfx").distinct().collect())
    idx_bands = (spark.read.parquet(path + "/bands")
                 .filter(F.col("pfx").isin(prefixes)))  # partition-pruned
    if exclude_batch is not None:
        idx_bands = idx_bands.filter(
            F.col("ingest_batch") != int(exclude_batch))
    cand = (inc_bands.select(F.col("doc_id").alias("new_id"),
                             "band_id", "band_key")
            .join(idx_bands.select(F.col("doc_id").alias("corpus_id"),
                                   "band_id", "band_key"),
                  ["band_id", "band_key"])
            .select("new_id", "corpus_id").distinct())
    idx_sig = spark.read.parquet(path + "/sig")
    if exclude_batch is not None:
        idx_sig = idx_sig.filter(
            F.col("ingest_batch") != int(exclude_batch))
    return _sig_match_count(cand, inc_sig, idx_sig, "new_id", "corpus_id")


def probe_lsh_index(spark: SparkSession, docs: DataFrame,
                    path: str,
                    exclude_batch: int | None = None) -> DataFrame:
    """The incremental-probe core: per-document admission verdict of
    ``docs`` against the persisted index at ``path`` (shared by the
    catalog query and multi-batch lifecycle pipelines/tests).

    ``exclude_batch`` drops the index's ``ingest_batch=<id>`` partition
    from the probe — a re-run of a failed foreachBatch attempt must not
    be shadowed by its own earlier rows (the same self-exclusion rule
    as StreamingNearDupDedup's admitted-state read)."""
    # eager localCheckpoint, NOT cache(): the signatures are scanned
    # three times (bands, prefix collect, verify join) so materializing
    # once matters, but a cache() would pin the frame in the session's
    # CacheManager forever — under StreamingLshIngest every micro-batch
    # would leak one cached frame for the stream's lifetime. Checkpoint
    # blocks are dropped by the ContextCleaner when the batch's frames
    # are garbage-collected.
    inc_sig = _signatures_from(_hashed_shingles_of(
        parallel_scan(spark, docs, "doc_id"))).localCheckpoint(eager=True)
    m = _verified_matches(spark, inc_sig, path, exclude_batch)
    best = (m.filter(F.col("n_match") >= _INC_MIN_MATCH)
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("new_id")
                .orderBy(F.col("n_match").desc(), "corpus_id")))
            .filter(F.col("rn") == 1)
            .select("new_id", F.col("corpus_id").alias("dup_of"),
                    "n_match"))
    inc_ids = docs.select("doc_id")
    return (inc_ids.join(best, inc_ids["doc_id"] == best["new_id"], "left")
            .select(
                "doc_id",
                F.col("dup_of").cast("long").alias("dup_of"),
                F.coalesce("n_match", F.lit(0)).cast("long")
                 .alias("n_match_sig"),
                F.expr(f"CAST(coalesce(n_match, 0) * 1000000"
                       f" DIV {_N_PERMS} AS BIGINT)")
                 .alias("est_jaccard_micro"),
                F.when(F.col("dup_of").isNull(), 1).otherwise(0)
                 .cast("long").alias("admitted")))


_COMPACT_AFTER_BATCHES = 2  # a slice holding >= this many ingest
# batches' file sets is due for a background merge


def _lsh_compaction_policy_oracle_sql() -> str:
    mins = _minhash_select_sql()
    cb = " UNION ALL ".join(
        f"SELECT doc_id, {_band_key_sql(b)} AS band_key"
        f" FROM csig" for b in range(_N_BANDS))
    ib = " UNION ALL ".join(
        f"SELECT doc_id, {_band_key_sql(b)} AS band_key"
        f" FROM isig" for b in range(_N_BANDS))
    return f"""
WITH sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
csig AS (SELECT * FROM sig WHERE doc_id % {_INC_MOD} <> 0),
isig AS (SELECT * FROM sig WHERE doc_id % {_INC_MOD} = 0),
cb AS ({cb}),
ib AS ({ib}),
cpfx AS (SELECT substr(band_key, 1, 1) AS pfx, count(*) AS n
         FROM cb GROUP BY 1),
ipfx AS (SELECT substr(band_key, 1, 1) AS pfx, count(*) AS n
         FROM ib GROUP BY 1)
SELECT pfx,
       CAST(coalesce(c.n, 0) + coalesce(i.n, 0) AS BIGINT) AS n_rows,
       CAST((CASE WHEN c.n IS NULL THEN 0 ELSE 1 END)
            + (CASE WHEN i.n IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_batches,
       CAST(CASE WHEN (CASE WHEN c.n IS NULL THEN 0 ELSE 1 END)
                    + (CASE WHEN i.n IS NULL THEN 0 ELSE 1 END)
                    >= {_COMPACT_AFTER_BATCHES}
            THEN 1 ELSE 0 END AS BIGINT) AS compact_due
FROM cpfx c
FULL OUTER JOIN ipfx i USING (pfx)
ORDER BY pfx"""


@q("dedup_lsh_compaction_policy", _lsh_compaction_policy_oracle_sql())
def dedup_lsh_compaction_policy(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Compaction SCHEDULER report for the maintained LSH index
    (VERDICT r8 item 7's suggested lifecycle report): per band slice
    (pfx partition), how many ingest batches' file sets it holds, and
    whether a background merge is due (>= {_COMPACT_AFTER_BATCHES}
    batch partitions — each append lays one file set per touched
    slice, so probes pay n_batches footer opens per slice until
    ``compact_lsh_index`` folds them; this query is the decision the
    maintenance window runs before paying the fold). The artifact is
    the maintained index: built on the base split, one appended
    increment batch (the retrieval_bm25_incremental_serve recipe
    applied to LSH).

    Scale path: a pure PARTITION-COLUMN census — the scan projects
    only (pfx, ingest_batch), so parquet reads footers, never band
    rows; one 16^width-row aggregate. Exactness: the oracle re-derives
    which slices each batch's band keys touch from the corpus (the
    index is a deterministic function of it); int64 counts; pfx is the
    1-hex-char width every gate corpus builds (< 1M docs —
    _pfx_width_for), matching the artifact the Spark side reads.

    Reference: background merges are ClickHouse MergeTree's part-count
    discipline (SURVEY §2 S2); the reference delegates scheduling to
    managed ClickHouse — here it is an explicit, gateable report."""
    def make() -> str:
        p = _lsh_index_path(sf_dir) + "_inc"
        # width PINNED to 1: the oracle's substr(band_key, 1, 1) bakes
        # in the 1-hex-char slicing — pinning enforces that assumption
        # instead of relying on every gate corpus staying under
        # _PFX_DOCS_PER_WIDTH (ADVICE r9: a silently grown corpus
        # would diverge instead of failing loudly)
        build_lsh_index(spark, sf_dir, p, pfx_width=1)
        inc = (load_table(spark, sf_dir, "documents")
               .filter(F.col("doc_id") % _INC_MOD == 0)
               .select("doc_id", "text"))
        append_to_lsh_index(spark, p, inc, batch_id=0)
        return p

    path = cached_scalar(spark, sf_dir, "lsh_inc_index_path", make)
    return (spark.read.parquet(path + "/bands")
            .groupBy("pfx")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.countDistinct("ingest_batch").cast("long")
                 .alias("n_batches"))
            .select("pfx", "n_rows", "n_batches",
                    F.when(F.col("n_batches") >= _COMPACT_AFTER_BATCHES,
                           1).otherwise(0).cast("long")
                    .alias("compact_due"))
            .orderBy("pfx"))


def compact_lsh_index(spark: SparkSession, path: str,
                      exclude_batch: int | None = None) -> None:
    """Background-merge the persisted index: fold every ``ingest_batch``
    partition into the base (-1) partition, one writer per pfx slice —
    after K streaming appends each band slice holds K+1 small file
    sets, and probes pay per-file open cost for rows that could be one
    run. Probe verdicts are invariant under compaction (the row set is
    unchanged; batch provenance is only needed for idempotent re-runs,
    which compaction retires).

    ``exclude_batch`` keeps that one batch's partitions UNFOLDED — the
    in-loop auto-compaction hook passes the batch it is currently
    committing: folding the in-flight batch would strand its rows in
    base if foreachBatch retries it (the retry's dynamic overwrite
    could no longer replace them — duplicates). Full folds (no
    exclusion) remain maintenance-window ops.

    Safety is the AppendTable._swap_rewrite recipe: write-to-tmp reads
    the live files (removed only after the write completes), then
    rename-aside — a crash mid-swap leaves either the old or the new
    directory at a recoverable location. Run it in the maintenance
    window between batches, like any background merge: it must not
    race a concurrent append (the appender would write into the
    directory being swapped out)."""
    import os
    import shutil

    width = lsh_pfx_width(path)
    for sub, parts in (("/sig", ["ingest_batch"]),
                       ("/bands", ["pfx", "ingest_batch"])):
        live = path + sub
        df = spark.read.parquet(live).withColumn(
            "ingest_batch", folded_batch_tag("ingest_batch", exclude_batch))
        if "pfx" in parts:
            df = df.repartition("pfx")
        tmp, old = live + ".compact.tmp", live + ".compact.old"
        df.write.mode("overwrite").partitionBy(*parts).parquet(tmp)
        if "pfx" in parts:
            # the width rides inside the bands dir — carry it through
            # the rewrite so the swapped directory stays self-described
            _write_lsh_meta(tmp, width)
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)


def rebuild_lsh_index(spark: SparkSession, path: str,
                      pfx_width: int | None = None,
                      keep_provenance: bool = False) -> None:
    """REBUILD the band layout from the artifact's own signature table
    — the width-migration action the _pfx_width_for policy implies:
    when appends grow the corpus past a width threshold (1M docs → 2
    hex chars, 16M → 3, …), the existing slices become too coarse to
    prune well, and the bands must be re-laid-out at the new width.
    Signatures never recompute (they are width-independent and corpus
    text is NOT needed); the bands re-derive from the sig table with a
    freshly chosen (or given) width — the LSH twin of
    rebuild_ivf_index, completing the same lifecycle state machine.

    By default batch provenance folds into the new base (maintenance-
    window semantics, like compaction). ``keep_provenance=True``
    carries every row's ingest_batch through instead — the STREAMING
    width hook needs it: folding the in-flight batch would strand its
    rows in base, where a foreachBatch retry's self-exclusion
    (exclude_batch) can no longer hide them, so every doc the retry
    re-probes would collide with its own pre-crash copy and be
    rejected as a duplicate of itself (the same retry contract
    rebuild_ivf_index's keep_provenance protects). Retries stay exact
    either way the bands are laid out: band keys are a deterministic
    function of the signatures, so a re-append overwrites exactly the
    (new-width pfx, batch) partitions the rebuild gave those rows.

    Atomicity: the new width's meta rides INSIDE the rebuilt bands
    directory, so the single rename swaps layout and width together —
    no window where probes slice band keys with a width that doesn't
    match the partitions they prune against. Same maintenance-window
    caveat as every swap recipe here: don't race a concurrent append."""
    import os
    import shutil

    keep = ["ingest_batch"] if keep_provenance else []
    sig = spark.read.parquet(path + "/sig")
    if pfx_width is None:
        pfx_width = _pfx_width_for(sig.count())
    live = path + "/bands"
    tmp, old = live + ".rebuild.tmp", live + ".rebuild.old"
    bands = _band_frame(sig.drop("ingest_batch") if not keep else sig,
                        extra=keep)
    provenance = (F.col("ingest_batch").cast("int") if keep_provenance
                  else F.lit(-1))
    (bands
     .withColumn("pfx", F.substring("band_key", 1, int(pfx_width)))
     .withColumn("ingest_batch", provenance)
     .repartition("pfx")
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("pfx", "ingest_batch").parquet(tmp))
    _write_lsh_meta(tmp, pfx_width)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)
    # retire the pre-r9 top-level meta if present (bands/_lsh_meta.json
    # is checked first, so a stale legacy file is harmless — removing
    # it just keeps the artifact single-sourced)
    legacy = os.path.join(path, "meta.json")
    if os.path.exists(legacy):
        os.remove(legacy)
    if keep_provenance:
        return  # the sig table is untouched — nothing to fold
    # fold the sig table's batch provenance into the new base, like
    # every rebuild/compaction does (probes read sig without slicing,
    # so this is pure hygiene and file-count reduction)
    sig_live = path + "/sig"
    sig_tmp, sig_old = sig_live + ".rebuild.tmp", sig_live + ".rebuild.old"
    (spark.read.parquet(sig_live)
     .drop("ingest_batch").withColumn("ingest_batch", F.lit(-1))
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("ingest_batch").parquet(sig_tmp))
    if os.path.exists(sig_old):
        shutil.rmtree(sig_old)
    os.rename(sig_live, sig_old)
    os.rename(sig_tmp, sig_live)
    shutil.rmtree(sig_old)


# ---------------------------------------------------------------------------
# PERSISTED near-dup cluster labels (build → incremental update → read)
# ---------------------------------------------------------------------------
# The last heavyweight derived state to graduate from session memo to
# maintained artifact (VERDICT r9 item 1): where dedup_cluster_labels
# recomputes the CC fixpoint per session, this artifact persists the
# labels once and extends them per increment batch WITHOUT re-running
# the global fixpoint — components can only GROW when documents are
# added, so the increment's work is a union-find over the contracted
# graph {new doc ids} ∪ {touched component labels}, never the corpus.
#
# Layout under <path>/ :
#   lsh/     the MinHash-LSH probe artifact (build_lsh_index layout:
#            sig + pfx-partitioned bands) — the increment finds its
#            candidate edges by probing THIS, so base text is read
#            exactly once, at build time.
#   edges/   (u, v) verified near-dup edges (u < v), PARTITIONED BY
#            ingest_batch — batch re-runs replace their own partition.
#   labels/  (doc_id, label) as assigned AT WRITE TIME, PARTITIONED BY
#            ingest_batch. Historical rows are never rewritten by an
#            increment — relabels ride the merges/ overlay instead
#            (rewriting label partitions would shuffle rows ACROSS
#            partitions, which dynamic overwrite cannot retire safely:
#            the r8 stale-partition failure mode).
#   merges/  (old_label, new_label) — the FLATTENED relabel mapping
#            (pointer-jumped at write time, so reads resolve in ONE
#            broadcast join, no recursion). Tiny: one row per component
#            that ever lost a merge; compact_cluster_index folds it
#            into labels/ in a maintenance window.
#
# Edge rule (identical at build, probe, and in the oracle): two docs
# are near-dups iff they collide on >= 1 LSH band AND >= _INC_MIN_MATCH
# of _N_PERMS signature components agree — symmetric and a pure
# function of the immutable signatures, so base<->base edges never
# change after build: an increment only ADDS edges incident to new
# docs (new<->corpus via the index probe, new<->new within the batch).


def _cluster_index_path(sf_dir: str) -> str:
    import hashlib
    import os
    from ..core.session import scratch_root
    root = scratch_root()
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(root, "cluster_index", key)


_MERGES_SCHEMA = "old_label long, new_label long"

# past this many overlay rows, update_cluster_index stops materializing
# the overlay on the driver and pointer-jumps it distributedly instead
# (VERDICT r11 #5 — the _LOCAL_FINISH_EDGES loud-cap pattern: the
# overlay is bounded by compaction CADENCE, not structurally)
_MERGES_LOCAL_MAX = 1_000_000


def _write_merges_frame(spark: SparkSession, path: str,
                        df: DataFrame) -> None:
    """Publish the flattened merges overlay via write-to-tmp +
    rename-aside — the overlay is rewritten on every batch and holds
    ALL prior batches' relabel history, so a bare Spark overwrite's
    delete-then-write window would, on a crash, silently erase merges
    a retry cannot recompute (it only re-derives its OWN batch's
    entries). With the swap, a crash leaves either the old or the new
    overlay at a recoverable location and resolved reads never see a
    half-written table."""
    import os
    import shutil
    live = path + "/merges"
    tmp, old = live + ".swap.tmp", live + ".swap.old"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old, ignore_errors=True)


def _write_merges(spark: SparkSession, path: str,
                  mapping: dict[int, int]) -> None:
    """Driver-side overlay publish (the common, small-overlay path).
    coalesce(1): bounded by the number of ever-merged components — a
    k-row scheduler table, not data."""
    rows = sorted((int(o), int(n)) for o, n in mapping.items())
    _write_merges_frame(
        spark,
        path,
        (local_frame(spark, rows, _MERGES_SCHEMA) if rows
         else local_frame(spark, [], _MERGES_SCHEMA)).coalesce(1))


def cluster_labels_of(spark: SparkSession, path: str) -> DataFrame:
    """Resolved (doc_id, cluster_id) view of the artifact: stored
    labels overlaid with the flattened merges mapping — ONE broadcast
    join against a k-row table (k = merged components ever), so the
    read stays a single pass over labels/ at any scale."""
    labels = spark.read.parquet(path + "/labels")
    merges = spark.read.parquet(path + "/merges") \
        .withColumnRenamed("old_label", "label")
    return (labels.join(F.broadcast(merges), "label", "left")
            .select("doc_id",
                    F.coalesce("new_label", "label").cast("long")
                    .alias("cluster_id")))


def _base_verified_edges(spark: SparkSession, path: str) -> DataFrame:
    """(u < v) verified near-dup edges among everything currently in
    the artifact's OWN sig table — used at build time (and by tests as
    the full-recompute reference). Candidates come from band-key
    collisions, verification from the persisted signatures: text-free."""
    sig = spark.read.parquet(path + "/lsh/sig").drop("ingest_batch") \
        .localCheckpoint(eager=True)
    cand = _minhash_band_candidates(sig)
    return (_sig_match_count(cand, sig, sig, "doc1", "doc2")
            .filter(F.col("n_match") >= _INC_MIN_MATCH)
            .select(F.col("doc1").alias("u"), F.col("doc2").alias("v")))


def build_cluster_index(spark: SparkSession, sf_dir: str,
                        path: str | None = None,
                        pfx_width: int | None = None) -> str:
    """Build and PERSIST the near-dup cluster artifact over the BASE
    split (doc_id % {_INC_MOD} != 0): the LSH probe index, the verified
    edge table, the exact min-label CC labels, and an empty merges
    overlay. Corpus text is touched HERE, once — every later increment
    probes the persisted index instead (update_cluster_index)."""
    import os
    import shutil
    path = path or _cluster_index_path(sf_dir)
    if os.path.exists(path):  # a BUILD is a full rewrite (STATIC rule)
        shutil.rmtree(path)
    build_lsh_index(spark, sf_dir, path + "/lsh", pfx_width=pfx_width)
    edges = _base_verified_edges(spark, path).localCheckpoint(eager=True)
    (edges.withColumn("ingest_batch", F.lit(-1))
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("ingest_batch").parquet(path + "/edges"))
    nodes = (load_table(spark, sf_dir, "documents")
             .filter(F.col("doc_id") % _INC_MOD != 0).select("doc_id"))
    labels = connected_components(
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        nodes)
    (labels.select("doc_id", F.col("label").cast("long").alias("label"))
     .withColumn("ingest_batch", F.lit(-1))
     .write.mode("overwrite").option("partitionOverwriteMode", "static")
     .partitionBy("ingest_batch").parquet(path + "/labels"))
    _write_merges(spark, path, {})
    return path


def update_cluster_index(spark: SparkSession, path: str,
                         docs: DataFrame, batch_id: int,
                         merges_local_max: int = _MERGES_LOCAL_MAX) -> None:
    """Extend the persisted cluster labels with one increment batch —
    O(increment), never the corpus, and NEVER the global CC fixpoint:

    1. probe: the batch's signatures find verified edges against the
       saved index (partition-pruned bands + persisted-signature
       verify — the dedup_incremental_lsh machinery, ALL matches, not
       best-only) plus new<->new edges within the batch;
    2. contract BOTH sides IN SPARK before anything reaches the
       driver (VERDICT/ADVICE r10 hardening): within-batch components
       come from ``connected_components`` (whose local-finish bound +
       distributed fallback already price a pathological all-dup
       batch), and new<->corpus edges reduce to DISTINCT (batch
       component, resolved corpus label) pairs — one new doc
       near-dupping a large duplicate cluster contracts to ONE row,
       never O(cluster), and an all-one-template batch contracts to
       one component before the driver sees it. Contraction preserves
       the global min because a component's label IS its min id;
    3. union-find (driver-side, bounded by the DISTINCT contracted
       pair count — components, not edges or docs) computes each
       batch component's final label and each merged corpus
       component's winner; components only grow, so untouched labels
       are untouched rows;
    4. write: the batch's edges and labels land in their own
       ingest_batch partitions (idempotent re-runs — a retry replaces
       its own rows; its probe self-excludes via exclude_batch); the
       k merged components go into the FLATTENED merges overlay
       (existing entries pointer-jump through new winners, so reads
       stay one join deep). Up to ``merges_local_max`` overlay rows
       the rewrite is a driver dict (the k-row regime); past the cap
       the SAME update runs distributedly — one broadcast
       pointer-jump join over the overlay plus a union of the new
       entries — so an overlay that outgrew its compaction cadence
       never materializes on the driver (VERDICT r11 #5).

    A re-run after a crash recomputes the same final labels: the
    union-find's inputs (immutable signatures, resolved pre-batch
    labels) are deterministic, and min() is idempotent under replay —
    asserted in tests/test_cluster_index.py."""
    docs = docs.select("doc_id", "text").localCheckpoint(eager=True)
    inc_sig = _signatures_from(_hashed_shingles_of(
        parallel_scan(spark, docs, "doc_id"))).localCheckpoint(eager=True)

    # -- 1. edges -----------------------------------------------------------
    nc = (_verified_matches(spark, inc_sig, path + "/lsh",
                            exclude_batch=int(batch_id))
          .filter(F.col("n_match") >= _INC_MIN_MATCH)
          .select("new_id", "corpus_id").localCheckpoint(eager=True))
    nn = (_sig_match_count(_minhash_band_candidates(inc_sig),
                           inc_sig, inc_sig, "doc1", "doc2")
          .filter(F.col("n_match") >= _INC_MIN_MATCH)
          .select("doc1", "doc2").localCheckpoint(eager=True))

    # -- 2. contract both sides distributedly -------------------------------
    # within-batch components (doc_id -> blabel = min id of its batch
    # component); CC's local finish keeps normal batches driver-trivial
    # and its distributed star rounds absorb the quadratic all-dup case
    bl = connected_components(
        nn.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst")),
        docs.select("doc_id")) \
        .withColumnRenamed("label", "blabel").localCheckpoint(eager=True)
    # new<->corpus edges → DISTINCT (blabel, clabel): the only rows the
    # driver ever pulls, bounded by incident COMPONENT pairs
    contracted = (nc
                  .join(cluster_labels_of(spark, path)
                        .withColumnRenamed("doc_id", "corpus_id"),
                        "corpus_id")
                  .join(bl.withColumnRenamed("doc_id", "new_id"),
                        "new_id")
                  .select("blabel", F.col("cluster_id").alias("clabel"))
                  .distinct())
    pairs = sorted((int(r["blabel"]), int(r["clabel"]))
                   for r in contracted.collect())

    # -- 3. union-find over the contracted graph ----------------------------
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry

    for b, c in pairs:
        union(b, c)
    # winner map for every participating label — bounded like `pairs`
    winner_rows = sorted((x, find(x)) for x in set(parent))

    # -- 4. publish ----------------------------------------------------------
    edges = (nc.select(F.least("new_id", "corpus_id").alias("u"),
                       F.greatest("new_id", "corpus_id").alias("v"))
             .unionByName(nn.select(F.col("doc1").alias("u"),
                                    F.col("doc2").alias("v")))
             .dropDuplicates(["u", "v"]))
    (edges.withColumn("ingest_batch", F.lit(int(batch_id)))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("ingest_batch").parquet(path + "/edges"))
    wdf = (local_frame(spark, winner_rows, "blabel long, w long")
           if winner_rows
           else local_frame(spark, [], "blabel long, w long"))
    (bl.join(F.broadcast(wdf), "blabel", "left")
     .select("doc_id",
             F.coalesce("w", "blabel").cast("long").alias("label"))
     .withColumn("ingest_batch", F.lit(int(batch_id)))
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("ingest_batch").parquet(path + "/labels"))
    new_w = {lab: find(lab) for lab in {c for _, c in pairs}
             if find(lab) != lab}
    if new_w:
        # pointer-jump EXISTING entries through the new winners so the
        # mapping stays flat (one-join reads); new winners are either
        # new doc ids or still-live labels, never old_label keys.
        # Unchanged overlays skip the rewrite entirely (most batches
        # merge nothing — no reason to cycle the table).
        head = (spark.read.parquet(path + "/merges")
                .limit(merges_local_max + 1).collect())
        if len(head) <= merges_local_max:
            # common path: the overlay is a k-row scheduler table —
            # driver dict, sorted single-file rewrite
            merges = {int(r["old_label"]): int(r["new_label"])
                      for r in head}
            merges.update(new_w)
            merges = {o: new_w.get(n, n) for o, n in merges.items()}
            _write_merges(spark, path, merges)  # atomic swap
        else:
            # VERDICT r11 #5 (the local_finish_max_edges pattern): the
            # overlay is bounded only by compaction CADENCE, not
            # structurally — past the cap, never materialize it on the
            # driver. The same update runs as one broadcast
            # pointer-jump join (new_w is bounded by this batch's
            # contracted pairs) + a union of the new entries; retries
            # that already published their entries dedup on old_label.
            wdf2 = local_frame(spark, 
                sorted((int(o), int(n)) for o, n in new_w.items()),
                "lab long, w long")
            overlay = spark.read.parquet(path + "/merges")
            jumped = (overlay.join(
                          F.broadcast(wdf2),
                          overlay["new_label"] == wdf2["lab"], "left")
                      .select(overlay["old_label"],
                              F.coalesce(wdf2["w"], overlay["new_label"])
                              .alias("new_label")))
            # the NEW winner row must win over any existing overlay
            # entry for the same old_label (the driver-dict path's
            # merges.update(new_w) semantics) — anti-join the jumped
            # overlay against the new keys so the union is disjoint by
            # construction, never left to dropDuplicates row choice
            # (ADVICE r12: a retry after a conflicting publish would
            # otherwise pick an arbitrary row).
            updated = (jumped.join(
                           F.broadcast(wdf2.select(
                               F.col("lab").alias("old_label"))),
                           "old_label", "left_anti")
                       .unionByName(
                           wdf2.select(F.col("lab").alias("old_label"),
                                       F.col("w").alias("new_label"))))
            _write_merges_frame(spark, path, updated)
    # keep the probe index current: the batch's signatures/bands join
    # the corpus so the NEXT batch's probe sees them (idempotent by
    # batch id, same as every maintainer append)
    append_to_lsh_index(spark, path + "/lsh", docs,
                        batch_id=int(batch_id))


def compact_cluster_index(spark: SparkSession, path: str,
                          exclude_batch: int | None = None) -> None:
    """Background-fold the artifact: resolve the merges overlay INTO
    labels/ (one pass, rewritten rename-aside), fold edge/label batch
    provenance into the base partition, empty the overlay, and fold
    the EMBEDDED LSH probe index's batch partitions too (ADVICE r10:
    update_cluster_index appends sig/bands per batch, so a
    never-LSH-folded artifact would reopen one file set per
    ever-ingested batch at every probe — the exact growth this
    compaction family bounds). Resolved reads are invariant
    (cluster_labels_of composes the same mapping); the overlay returns
    to zero join-side rows. ``exclude_batch`` keeps the in-flight
    batch's partition tags (the auto-compaction retry contract — its
    rows still fold through the merge RESOLUTION, which is
    value-idempotent: a retry recomputes the same final labels against
    the now-resolved corpus). Same maintenance-window caveat as every
    swap recipe here."""
    import os
    import shutil
    compact_lsh_index(spark, path + "/lsh", exclude_batch=exclude_batch)
    merges = spark.read.parquet(path + "/merges") \
        .withColumnRenamed("old_label", "label")
    resolved = (spark.read.parquet(path + "/labels")
                .join(F.broadcast(merges), "label", "left")
                .select("doc_id",
                        F.coalesce("new_label", "label").cast("long")
                        .alias("label"),
                        folded_batch_tag("ingest_batch", exclude_batch)
                        .alias("ingest_batch")))
    live = path + "/labels"
    tmp, old = live + ".compact.tmp", live + ".compact.old"
    (resolved.write.mode("overwrite").partitionBy("ingest_batch")
     .parquet(tmp))
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)
    _write_merges(spark, path, {})
    e_live = path + "/edges"
    e_tmp, e_old = e_live + ".compact.tmp", e_live + ".compact.old"
    e = spark.read.parquet(e_live)
    if exclude_batch is not None:
        e = (e.withColumn("ingest_batch",
                          folded_batch_tag("ingest_batch", exclude_batch))
             .dropDuplicates(["u", "v", "ingest_batch"]))
    else:
        e = (e.drop("ingest_batch").dropDuplicates(["u", "v"])
             .withColumn("ingest_batch", F.lit(-1)))
    (e.write.mode("overwrite").partitionBy("ingest_batch").parquet(e_tmp))
    if os.path.exists(e_old):
        shutil.rmtree(e_old)
    os.rename(e_live, e_old)
    os.rename(e_tmp, e_live)
    shutil.rmtree(e_old)


def _inc_clusters_oracle_sql() -> str:
    """Full-recompute min-label CC over the WHOLE corpus (base +
    increment) under the artifact's edge rule — the recursive
    reachability template of _cluster_oracle_sql with MinHash-LSH
    verified edges instead of simhash ones. A hash-match proves the
    incremental path (build on base → probe/union-find/overlay on the
    increment) equals retraining from scratch, bit for bit."""
    mins = _minhash_select_sql()
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {_band_key_sql(b)} AS band_key"
        f" FROM sig" for b in range(_N_BANDS))
    match_sum = " + ".join(
        f"CASE WHEN s1.h{i} = s2.h{i} THEN 1 ELSE 0 END"
        for i in range(_N_PERMS))
    return f"""WITH RECURSIVE sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
edges AS MATERIALIZED (
  SELECT doc1 AS src, doc2 AS dst FROM cand c
  JOIN sig s1 ON s1.doc_id = c.doc1
  JOIN sig s2 ON s2.doc_id = c.doc2
  WHERE ({match_sum}) >= {_INC_MIN_MATCH}
),
sym AS MATERIALIZED (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
reach AS (
  SELECT doc_id, doc_id AS r FROM documents
  UNION
  SELECT w.doc_id, s.dst AS r
  FROM reach w JOIN sym s ON s.src = w.r
)
SELECT doc_id, CAST(min(r) AS BIGINT) AS cluster_id,
       CAST(CASE WHEN doc_id = min(r) THEN 1 ELSE 0 END AS BIGINT)
         AS is_canonical
FROM reach GROUP BY doc_id ORDER BY doc_id"""


@q("dedup_incremental_clusters", _inc_clusters_oracle_sql())
def dedup_incremental_clusters(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Near-dup cluster labels served from the MAINTAINED artifact —
    the lifecycle gate (VERDICT r9 item 1): the cluster index is built
    over the BASE split, then the daily increment (doc_id %
    {_INC_MOD} == 0) is folded in by ``update_cluster_index`` — probe
    the saved LSH index for the batch's edges, contract touched
    components to their labels, a batch-bounded union-find, and the
    flattened merges overlay — WITHOUT re-running the global CC
    fixpoint. The oracle recomputes true reachability over the full
    corpus, so a green row proves increment ≡ full retrain exactly.

    Scale path: the curation pipeline's most expensive derived state
    becomes O(increment) per day: only increment text is shingled; the
    probe reads matching index slices (partition-pruned); the
    union-find runs over the batch's edges; label history is never
    rewritten (relabels are a k-row overlay resolved by ONE broadcast
    join at read). Build + update run once per session (memoized) —
    the artifact lifecycle, not per-query cost."""
    path = cached_scalar(spark, sf_dir, "cluster_index_path",
                         lambda: _build_inc_cluster_index(spark, sf_dir))
    return (cluster_labels_of(spark, path)
            .select("doc_id", "cluster_id",
                    F.when(F.col("doc_id") == F.col("cluster_id"), 1)
                    .otherwise(0).cast("long").alias("is_canonical"))
            .orderBy("doc_id"))


def _build_inc_cluster_index(spark: SparkSession, sf_dir: str) -> str:
    """Build + one-batch update of the maintained cluster artifact —
    shared by the labels gate and the overlay-audit gate (same memo
    key, one artifact per session)."""
    p = _cluster_index_path(sf_dir) + "_inc"
    # width pinned like the policy gate: every gate corpus builds
    # 1-hex-char slices; the probe reads the width off the artifact
    build_cluster_index(spark, sf_dir, p, pfx_width=1)
    inc = (load_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") % _INC_MOD == 0)
           .select("doc_id", "text"))
    update_cluster_index(spark, p, inc, batch_id=0)
    return p


def _cluster_cc_ctes() -> str:
    """Shared oracle CTE body for the cluster-artifact gates: verified
    edges over the full corpus, full-graph and base-subgraph recursive
    reachability, and the distinct base-component labels."""
    mins = _minhash_select_sql()
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, {_band_key_sql(b)} AS band_key"
        f" FROM sig" for b in range(_N_BANDS))
    match_sum = " + ".join(
        f"CASE WHEN s1.h{i} = s2.h{i} THEN 1 ELSE 0 END"
        for i in range(_N_PERMS))
    return f"""sh AS ({_SHINGLE_SQL}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
edges AS MATERIALIZED (
  SELECT doc1 AS src, doc2 AS dst FROM cand c
  JOIN sig s1 ON s1.doc_id = c.doc1
  JOIN sig s2 ON s2.doc_id = c.doc2
  WHERE ({match_sum}) >= {_INC_MIN_MATCH}
),
symf AS MATERIALIZED (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
reachf AS (
  SELECT doc_id, doc_id AS r FROM documents
  UNION
  SELECT w.doc_id, s.dst AS r FROM reachf w JOIN symf s ON s.src = w.r
),
fullab AS MATERIALIZED (
  SELECT doc_id, min(r) AS lab FROM reachf GROUP BY doc_id),
symb AS MATERIALIZED (
  SELECT src, dst FROM edges
  WHERE src % {_INC_MOD} <> 0 AND dst % {_INC_MOD} <> 0
  UNION ALL
  SELECT dst, src FROM edges
  WHERE src % {_INC_MOD} <> 0 AND dst % {_INC_MOD} <> 0),
reachb AS (
  SELECT doc_id, doc_id AS r FROM documents WHERE doc_id % {_INC_MOD} <> 0
  UNION
  SELECT w.doc_id, s.dst AS r FROM reachb w JOIN symb s ON s.src = w.r
),
baselab AS MATERIALIZED (
  SELECT doc_id, min(r) AS lab FROM reachb GROUP BY doc_id),
baselabels AS (SELECT DISTINCT lab FROM baselab)"""


def _cluster_merges_oracle_sql() -> str:
    """The overlay's EXACT expected content, derived from first
    principles: after one increment, the merges mapping must equal
    {(L, full(L)) : L a BASE-split component label whose FULL-corpus
    label differs} — i.e. exactly the base components the increment's
    edges merged downward. Two recursive reachability chains (base
    subgraph, full graph) under the same verified-edge rule."""
    return f"""WITH RECURSIVE {_cluster_cc_ctes()}
SELECT CAST(b.lab AS BIGINT) AS old_label,
       CAST(f.lab AS BIGINT) AS new_label
FROM baselabels b
JOIN fullab f ON f.doc_id = b.lab
WHERE f.lab <> b.lab
ORDER BY old_label"""


@q("dedup_cluster_merges", _cluster_merges_oracle_sql())
def dedup_cluster_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIT of the cluster artifact's merges overlay: the persisted
    (old_label → new_label) mapping the increment update wrote, gated
    against its first-principles definition — the set of base-split
    component labels whose full-corpus label differs (the components
    the increment's edges merged downward). A green row proves the
    overlay is EXACTLY the base-vs-full label delta: nothing spurious,
    nothing missed, values fully flattened to the final winners —
    the monitor-side companion of dedup_incremental_clusters (which
    proves the RESOLVED read; this proves the overlay mechanism
    itself, the part a production compactor schedules on).

    Scale path: reading a k-row parquet table (k = merged components);
    the oracle's two CC chains are the spec, not the implementation."""
    path = cached_scalar(spark, sf_dir, "cluster_index_path",
                         lambda: _build_inc_cluster_index(spark, sf_dir))
    return (spark.read.parquet(path + "/merges")
            .select(F.col("old_label").cast("long").alias("old_label"),
                    F.col("new_label").cast("long").alias("new_label"))
            .orderBy("old_label"))


def _cluster_policy_oracle_sql() -> str:
    return f"""WITH RECURSIVE {_cluster_cc_ctes()},
bedges AS (SELECT * FROM edges
           WHERE src % {_INC_MOD} <> 0 AND dst % {_INC_MOD} <> 0),
delta AS (SELECT count(*) AS n FROM baselabels b
          JOIN fullab f ON f.doc_id = b.lab WHERE f.lab <> b.lab)
SELECT 'edges' AS tbl,
       CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_rows,
       CAST((CASE WHEN (SELECT count(*) FROM bedges) > 0
                  THEN 1 ELSE 0 END)
          + (CASE WHEN (SELECT count(*) FROM edges)
                     > (SELECT count(*) FROM bedges)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_batches,
       CAST(CASE WHEN (CASE WHEN (SELECT count(*) FROM bedges) > 0
                            THEN 1 ELSE 0 END)
                    + (CASE WHEN (SELECT count(*) FROM edges)
                               > (SELECT count(*) FROM bedges)
                            THEN 1 ELSE 0 END) >= {_COMPACT_AFTER_BATCHES}
                 THEN 1 ELSE 0 END AS BIGINT) AS compact_due
UNION ALL
SELECT 'labels' AS tbl,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows,
       CAST((CASE WHEN (SELECT count(*) FROM documents
                        WHERE doc_id % {_INC_MOD} <> 0) > 0
                  THEN 1 ELSE 0 END)
          + (CASE WHEN (SELECT count(*) FROM documents
                        WHERE doc_id % {_INC_MOD} = 0) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_batches,
       CAST(CASE WHEN (CASE WHEN (SELECT count(*) FROM documents
                                  WHERE doc_id % {_INC_MOD} <> 0) > 0
                            THEN 1 ELSE 0 END)
                    + (CASE WHEN (SELECT count(*) FROM documents
                                  WHERE doc_id % {_INC_MOD} = 0) > 0
                            THEN 1 ELSE 0 END) >= {_COMPACT_AFTER_BATCHES}
                 THEN 1 ELSE 0 END AS BIGINT) AS compact_due
UNION ALL
SELECT 'merges' AS tbl,
       CAST((SELECT n FROM delta) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_batches,
       CAST(CASE WHEN (SELECT n FROM delta) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS compact_due
ORDER BY tbl"""


@q("dedup_cluster_compaction_policy", _cluster_policy_oracle_sql())
def dedup_cluster_compaction_policy(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Compaction SCHEDULER report for the maintained cluster artifact
    — the fourth member of the policy family (LSH / IVF / BM25 /
    CLUSTERS): per table, the row count, how many ingest batches' file
    sets it holds (edges/labels fold like every batch-partitioned
    artifact) and, for the merges overlay, whether it has entries to
    fold into labels/ (every overlay row is one broadcast-join-side
    row every resolved read pays until ``compact_cluster_index`` bakes
    it in). ``compact_due`` is the decision the maintenance window —
    or the streaming hook — acts on.

    Scale path: two partition-column censuses (footer/listing IO) plus
    the k-row overlay count. Exactness: the oracle re-derives every
    number from the corpus under the artifact's own edge rule — edge
    counts from the verified-pair CTE (base and full splits), label
    rows = the document universe, overlay size = the base-vs-full
    label delta (the dedup_cluster_merges identity); int64 counts,
    total order on tbl."""
    path = cached_scalar(spark, sf_dir, "cluster_index_path",
                         lambda: _build_inc_cluster_index(spark, sf_dir))

    def census(tbl: str) -> tuple[int, int]:
        r = (spark.read.parquet(f"{path}/{tbl}")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.countDistinct("ingest_batch").alias("b"))
             .collect()[0])
        return int(r["n"]), int(r["b"])
    e_n, e_b = census("edges")
    l_n, l_b = census("labels")
    m_n = spark.read.parquet(path + "/merges").count()
    rows = [("edges", e_n, e_b,
             1 if e_b >= _COMPACT_AFTER_BATCHES else 0),
            ("labels", l_n, l_b,
             1 if l_b >= _COMPACT_AFTER_BATCHES else 0),
            ("merges", m_n, 0, 1 if m_n > 0 else 0)]
    return (local_frame(spark, 
        rows, "tbl string, n_rows long, n_batches long, compact_due long")
        .orderBy("tbl"))
