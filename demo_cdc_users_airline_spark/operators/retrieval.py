"""Full-text retrieval over the documents corpus: Okapi BM25 top-k.

The training-data use case is query-driven corpus exploration ("show me
the docs that look like this benchmark prompt") and lightweight quality
probes — the same ranked-retrieval primitive a search sidecar provides,
expressed as a pure Spark dataflow:

- per-document term frequencies for the (tiny, fixed) query term set
  are in-row ``filter()`` counts — the big side is scanned, never
  shuffled (a generic inverted-index build would shuffle one row per
  token OCCURRENCE; for a bounded query vocabulary that is pure waste);
- corpus statistics (N, Σdl, per-term document frequencies) are ONE
  partial-aggregatable global aggregate reduced to a single broadcast
  row (the J5 scalar-subquery pattern);
- scoring is a map over documents; the top-k is ``orderBy().limit()``
  → TakeOrderedAndProject (per-partition bounded heap, no global sort).

Cross-engine exactness: the BM25 term formula is rendered from ONE
shared SQL template into both engines, so the IEEE expression trees are
identical (``ln`` is bit-exact between the JVM and DuckDB — verified
empirically); per-term scores are quantized to int64 micros BEFORE the
cross-term sum, so the only cross-row/cross-term addition is exact
integer arithmetic (the repo's fixed-point oracle rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import cached_scalar, load_table, local_frame, parallel_scan
from .text import tokens

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# Okapi BM25 (Robertson et al.): k1=1.2, b=0.75. Literals below are the
# SAME source text on both sides, so both engines parse the same doubles
# (1 + k1 = 2.2 as a LITERAL, not computed — computing it from 1.2 gives
# a different double than parsing "2.2").
QUERY_TERMS = ("spark", "merge", "vector", "the")
TOP_K = 20


def _bm25_term_sql(t: str) -> str:
    """One query term's BM25 partial score in int64 micros — rendered
    into BOTH engines verbatim (identifiers tf_<t>, dl, df_<t>, n_docs,
    avgdl must be in scope)."""
    return (
        f"CAST(floor(1000000.0 * ("
        f"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{t} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{t} AS DOUBLE) * 2.2)"
        f" / (CAST(tf_{t} AS DOUBLE) + 1.2 * (0.25 + 0.75 * "
        f"(CAST(dl AS DOUBLE) / avgdl))))) AS BIGINT)")


_SCORE_SQL = " + ".join(_bm25_term_sql(t) for t in QUERY_TERMS)


@q("retrieval_bm25_topk", f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, len(toks) AS dl,
         {", ".join(f"len(list_filter(toks, w -> w = '{t}')) AS tf_{t}"
                    for t in QUERY_TERMS)}
  FROM t
),
st AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
                    for t in QUERY_TERMS)}
  FROM d
),
scored AS (
  SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
         {_SCORE_SQL} AS score_micro
  FROM d CROSS JOIN st
)
SELECT doc_id, n_tokens, score_micro,
       CAST(score_micro AS DOUBLE) / 1000000.0 AS score
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT {TOP_K}
""")
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{k} for a fixed query term set.

    Scale path: the corpus is scanned twice (stats, then scoring) and
    never shuffled — per-term tf is an in-row ``filter()`` count, the
    corpus stats collapse to one broadcast row, and the final top-k is
    TakeOrderedAndProject. At 100 TB the only data movement is the
    map-side-combined 1-row aggregate and k rows to the driver.
    """
    return (_bm25_scored(spark, sf_dir)
            .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
            .limit(TOP_K)
            .select("doc_id", "n_tokens", "score_micro",
                    (F.col("score_micro").cast("double") / F.lit(1000000.0))
                    .alias("score")))


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, score_micro) for the fixed query term set —
    shared by the plain BM25 top-k and the hybrid RRF fusion."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    base = d.select("doc_id", tokens("text").alias("__toks")).select(
        "doc_id", F.size("__toks").alias("dl"),
        *[F.expr(f"size(filter(__toks, w -> w = '{t}'))").alias(f"tf_{t}")
          for t in QUERY_TERMS])
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(sum(dl) AS DOUBLE) / CAST(count(1) AS DOUBLE)")
         .alias("avgdl"),
        *[F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
          for t in QUERY_TERMS])
    return (base.crossJoin(F.broadcast(stats))
            .select("doc_id", F.col("dl").cast("long").alias("n_tokens"),
                    F.expr(_SCORE_SQL).alias("score_micro")))


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 ∪ embedding-cosine, fused by reciprocal rank
# ---------------------------------------------------------------------------

RRF_K = 60        # the standard reciprocal-rank-fusion damping constant
RRF_POOL = 50     # per-modality candidate pool depth
HYBRID_TOPK = 20
_HYBRID_QVEC = 0  # the exemplar document whose embedding is the dense query

# documents.doc_id and embeddings.vec_id are the same id space in the
# testdata (one embedding per document), so the two rank lists fuse on it.

# dense-leg cosine on the repo-wide quantized-int64 convention
# (VERDICT r11 #3: this leg was the catalog's last double sequential
# fold — engine-identical only empirically; it now shares the same
# structurally-exact fragment every similarity probe uses). `a` is the
# query row, `b` the candidate — the fragment is symmetric in the dot.
from .similarity import QCOS_SQL as _QCOS_RRF
from .similarity import qnn_sql as _qnn_sql

_QNN_NOLAB = _qnn_sql(label=False)


@q("retrieval_hybrid_rrf", f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, len(toks) AS dl,
         {", ".join(f"len(list_filter(toks, w -> w = '{t}')) AS tf_{t}"
                    for t in QUERY_TERMS)}
  FROM t
),
st AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
                    for t in QUERY_TERMS)}
  FROM d
),
scored AS (
  SELECT doc_id, {_SCORE_SQL} AS score_micro FROM d CROSS JOIN st
),
br AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_micro DESC, doc_id) AS bm25_rank
  FROM scored
  QUALIFY bm25_rank <= {RRF_POOL}
),
cr AS (
  SELECT b.vec_id AS doc_id,
         row_number() OVER (ORDER BY {_QCOS_RRF} DESC, b.vec_id) AS cos_rank
  FROM ({_QNN_NOLAB}) b
  CROSS JOIN (SELECT qv, nn FROM ({_QNN_NOLAB})
              WHERE vec_id = {_HYBRID_QVEC}) a
  WHERE b.vec_id <> {_HYBRID_QVEC}
  QUALIFY cos_rank <= {RRF_POOL}
)
SELECT doc_id,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(cos_rank AS BIGINT) AS cos_rank,
       CAST(coalesce(1000000 // ({RRF_K} + bm25_rank), 0)
            + coalesce(1000000 // ({RRF_K} + cos_rank), 0) AS BIGINT)
         AS rrf_micro
FROM br FULL OUTER JOIN cr USING (doc_id)
ORDER BY rrf_micro DESC, doc_id
LIMIT {HYBRID_TOPK}
""")
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval: the BM25 rank list and the
    embedding-cosine rank list (query = an exemplar document's vector)
    fused by Reciprocal Rank Fusion — score(d) = Σ 1/(60 + rank_m(d))
    over the modalities that retrieved d, in exact micro-unit integer
    division, so fusion is engine-exact even though the underlying
    scores live on incomparable scales (the reason RRF is the standard
    fusion for hybrid search). The dense leg ranks by the repo-wide
    quantized-int64 cosine (exact order-independent integer dots, one
    engine-identical IEEE tree) — r12 retired its former double
    sequential fold, the catalog's last engine-dependent float path.

    Dataflow: each modality reduces to a top-{RRF_POOL} list via
    TakeOrderedAndProject (per-partition heap — never a global window);
    rank assignment happens driver-side on those bounded lists (the J5
    scalar pattern: k rows by construction), and the fusion is a tiny
    full-outer join + TakeOrdered — no shuffle touches corpus-sized
    data at any point.

    Scale path: one documents scan (BM25 scoring is map-only after the
    1-row stats broadcast), one embeddings scan (query vector
    broadcast), two bounded top-k reductions; at 100 TB per-modality
    serving would page through IVF/ANN instead of brute cosine, but
    the fusion stage is unchanged."""
    bm25_top = (_bm25_scored(spark, sf_dir)
                .orderBy(F.col("score_micro").desc(), "doc_id")
                .limit(RRF_POOL).select("doc_id").collect())
    from .similarity import qdot, quantize_expr

    e = parallel_scan(spark, load_table(spark, sf_dir, "embeddings"),
                      "vec_id")
    qn = (e.select("vec_id", quantize_expr("embedding").alias("qv"))
          .withColumn("nn", qdot("qv", "qv")))
    qv = (qn.filter(F.col("vec_id") == _HYBRID_QVEC)
          .select(F.col("qv").alias("q_qv"), F.col("nn").alias("q_nn")))
    cos = qdot("qv", "q_qv") / F.sqrt(F.col("nn") * F.col("q_nn"))
    cos_top = (qn.filter(F.col("vec_id") != _HYBRID_QVEC)
               .crossJoin(F.broadcast(qv))
               .select("vec_id", cos.alias("cosine"))
               .orderBy(F.col("cosine").desc(), "vec_id")
               .limit(RRF_POOL).select("vec_id").collect())
    b_df = local_frame(spark, 
        [(int(r["doc_id"]), i + 1) for i, r in enumerate(bm25_top)],
        "doc_id: long, bm25_rank: long")
    c_df = local_frame(spark, 
        [(int(r["vec_id"]), i + 1) for i, r in enumerate(cos_top)],
        "doc_id: long, cos_rank: long")
    rrf = (F.coalesce(F.expr(f"1000000 DIV ({RRF_K} + bm25_rank)"), F.lit(0))
           + F.coalesce(F.expr(f"1000000 DIV ({RRF_K} + cos_rank)"), F.lit(0)))
    return (b_df.join(c_df, "doc_id", "full")
            .select("doc_id", "bm25_rank", "cos_rank",
                    rrf.cast("long").alias("rrf_micro"))
            .orderBy(F.col("rrf_micro").desc(), "doc_id")
            .limit(HYBRID_TOPK))


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (Carbonell & Goldstein 1998) — the standard
# redundancy-vs-relevance re-rank a RAG serving stack applies to its
# retrieved pool before stuffing context
# ---------------------------------------------------------------------------

MMR_POOL = 10    # relevance pool depth per query (the retrieve stage)
MMR_K = 5        # diversified selections per query (the re-rank output)
# λ = 0.7 favors relevance; the literals are rendered verbatim into both
# engines so the IEEE trees are identical (the repo's literal rule)
_MMR_LAMBDA, _MMR_ONE_MINUS = "0.7", "0.3"


def _mmr_oracle_sql() -> str:
    cos = "list_dot_product({a}.qv::DOUBLE[], {b}.qv::DOUBLE[]) / sqrt({a}.nn * {b}.nn)"
    parts = [f"""WITH sq AS ({{quant}}),
sqn AS MATERIALIZED (
  SELECT vec_id, qv, list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS nn
  FROM sq
),
pool AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos.format(a='c', b='q')} AS rel
  FROM sqn q JOIN sqn c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 8
  QUALIFY row_number() OVER (PARTITION BY q.vec_id
                             ORDER BY {cos.format(a='c', b='q')} DESC,
                                      c.vec_id) <= {MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT p1.query_id, p1.neighbor_id AS a, p2.neighbor_id AS b,
         {cos.format(a='x', b='y')} AS sim
  FROM pool p1
  JOIN pool p2 ON p2.query_id = p1.query_id
              AND p2.neighbor_id <> p1.neighbor_id
  JOIN sqn x ON x.vec_id = p1.neighbor_id
  JOIN sqn y ON y.vec_id = p2.neighbor_id
),
sel1 AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel, {_MMR_LAMBDA} * rel AS mmr_score,
         CAST(1 AS BIGINT) AS mmr_rank
  FROM pool
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY {_MMR_LAMBDA} * rel DESC,
                                      neighbor_id) = 1
),
selu1 AS (SELECT query_id, neighbor_id FROM sel1)"""]
    for k in range(2, MMR_K + 1):
        parts.append(f""",
sel{k} AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel, mmr_score,
         CAST({k} AS BIGINT) AS mmr_rank
  FROM (
    SELECT p.query_id, p.neighbor_id, p.rel,
           {_MMR_LAMBDA} * p.rel - {_MMR_ONE_MINUS} * max(s.sim) AS mmr_score
    FROM pool p
    JOIN selu{k - 1} u ON u.query_id = p.query_id
    JOIN sims s ON s.query_id = p.query_id
               AND s.a = p.neighbor_id AND s.b = u.neighbor_id
    WHERE NOT EXISTS (SELECT 1 FROM selu{k - 1} x
                      WHERE x.query_id = p.query_id
                        AND x.neighbor_id = p.neighbor_id)
    GROUP BY p.query_id, p.neighbor_id, p.rel
  )
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY mmr_score DESC, neighbor_id) = 1
),
selu{k} AS (SELECT query_id, neighbor_id FROM selu{k - 1}
            UNION ALL SELECT query_id, neighbor_id FROM sel{k})""")
    rows = "\nUNION ALL ".join(
        f"SELECT query_id, mmr_rank, neighbor_id, rel AS relevance,"
        f" mmr_score FROM sel{k}" for k in range(1, MMR_K + 1))
    return "".join(parts) + "\n" + rows


from .similarity import QUANT_SQL as _QUANT_SQL


@q("retrieval_mmr_rerank", _mmr_oracle_sql().format(quant=_QUANT_SQL))
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: from each query's
    top-{MMR_POOL} cosine pool, greedily select {MMR_K} items by
    score(c) = λ·rel(c, q) − (1−λ)·max_{{s∈selected}} sim(c, s) — the
    classic relevance-vs-redundancy re-rank (λ=0.7) that keeps a RAG
    context window from filling with near-duplicates of one hit.

    Exactness: rel/sim are the repo's quantized-int64 cosines computed
    IN SPARK (identical doubles to the oracle's list_dot_product
    form); the greedy runs driver-side over the collected bounded pool
    (queries × {MMR_POOL} rows + pairwise sims — the same J5
    bounded-artifact pattern as the RRF fusion) combining those doubles
    with the same literal λ arithmetic the oracle's unrolled
    {MMR_K}-step CTE chain uses; selection is totally ordered by
    (mmr_score DESC, neighbor_id). Greedy MMR is inherently sequential
    in k — k is tiny and per-query pools are bounded, so the driver
    loop is the honest production layout (serving stacks re-rank
    per-request pools in process, never via cluster jobs).

    Scale path: the only corpus-sized work is the pool retrieve (one
    candidate scan against the broadcast query set + per-query top-k
    window); the pairwise-sim stage joins pool×pool per query
    (queries × {MMR_POOL}² rows, bounded)."""
    from .similarity import qdot, quantize_expr

    e = parallel_scan(spark, load_table(spark, sf_dir, "embeddings"),
                      "vec_id")
    qn = (e.select("vec_id", quantize_expr("embedding").alias("qv"))
          .withColumn("nn", qdot("qv", "qv")))
    queries = (qn.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("qv").alias("q_qv"), F.col("nn").alias("q_nn")))
    rel = qdot("qv", "q_qv") / F.sqrt(F.col("nn") * F.col("q_nn"))
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id").orderBy(F.col("rel").desc(),
                                                F.col("neighbor_id"))
    pool = (qn.crossJoin(F.broadcast(queries))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(F.col("query_id"), F.col("vec_id").alias("neighbor_id"),
                    rel.alias("rel"), "qv", "nn")
            .withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") <= MMR_POOL)
            .drop("__rn"))
    a = pool.select("query_id", F.col("neighbor_id").alias("a"),
                    F.col("qv").alias("a_qv"), F.col("nn").alias("a_nn"))
    b = pool.select("query_id", F.col("neighbor_id").alias("b"),
                    F.col("qv").alias("b_qv"), F.col("nn").alias("b_nn"))
    sim = qdot("a_qv", "b_qv") / F.sqrt(F.col("a_nn") * F.col("b_nn"))
    sims_rows = (a.join(b, "query_id")
                 .filter(F.col("a") != F.col("b"))
                 .select("query_id", "a", "b", sim.alias("sim"))
                 .collect())
    pool_rows = pool.select("query_id", "neighbor_id", "rel").collect()

    sims = {}
    for r in sims_rows:
        sims[(r["query_id"], r["a"], r["b"])] = r["sim"]
    by_q: dict[int, list] = {}
    for r in pool_rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["rel"]))
    out = []
    lam, one_minus = float(_MMR_LAMBDA), float(_MMR_ONE_MINUS)
    for qid, cands in by_q.items():
        selected: list[int] = []
        remaining = dict(cands)
        for rank in range(1, MMR_K + 1):
            best = None
            for nid, r in remaining.items():
                if selected:
                    score = lam * r - one_minus * max(
                        sims[(qid, nid, s)] for s in selected)
                else:
                    score = lam * r
                key = (-score, nid)
                if best is None or key < best[0]:
                    best = (key, nid, r, score)
            if best is None:      # pool smaller than MMR_K: emit what exists
                break             # (the oracle's step CTEs go empty the same way)
            _, nid, r, score = best
            selected.append(nid)
            del remaining[nid]
            out.append((int(qid), rank, int(nid), float(r), float(score)))
    return local_frame(spark, 
        out, "query_id: long, mmr_rank: long, neighbor_id: long,"
             " relevance: double, mmr_score: double")


# ---------------------------------------------------------------------------
# classic TF-IDF ranked retrieval (lnn weighting) — the pre-BM25 baseline
# every IR stack still exposes; sharing the BM25 scan/stats shape makes the
# two models directly comparable on identical corpus statistics
# ---------------------------------------------------------------------------


def _tfidf_term_sql(t: str) -> str:
    """One query term's TF-IDF partial score in int64 micros — rendered
    verbatim into BOTH engines (identifiers tf_<t>, df_<t>, n_docs in
    scope). (1 + ln tf) · ln((1+N)/(1+df)), the smoothed lnn scheme —
    zero when the term is absent (ln is never fed 0)."""
    return (
        f"CASE WHEN tf_{t} > 0 THEN CAST(floor(1000000.0 * ("
        f"(1.0 + ln(CAST(tf_{t} AS DOUBLE)))"
        f" * ln((1.0 + CAST(n_docs AS DOUBLE)) / (1.0 + CAST(df_{t} AS DOUBLE)))"
        f")) AS BIGINT) ELSE 0 END")


_TFIDF_SCORE_SQL = " + ".join(_tfidf_term_sql(t) for t in QUERY_TERMS)


@q("retrieval_tfidf_topk", f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, len(toks) AS dl,
         {", ".join(f"len(list_filter(toks, w -> w = '{t}')) AS tf_{t}"
                    for t in QUERY_TERMS)}
  FROM t
),
st AS (
  SELECT count(*) AS n_docs,
         {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
                    for t in QUERY_TERMS)}
  FROM d
),
scored AS (
  SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
         {_TFIDF_SCORE_SQL} AS score_micro
  FROM d CROSS JOIN st
)
SELECT doc_id, n_tokens, score_micro,
       CAST(score_micro AS DOUBLE) / 1000000.0 AS score
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT {TOP_K}
""")
def retrieval_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF (lnn) top-{TOP_K} for the fixed query term set —
    the classic vector-space baseline beside BM25, on the SAME corpus
    statistics (per-term df, N) so model comparisons are apples to
    apples.

    Scale path identical to BM25: per-term tf is an in-row ``filter()``
    count over the bound token array (the big side is never shuffled),
    corpus stats collapse to one broadcast row, per-term scores
    quantize to int64 micros BEFORE the cross-term sum (exact integer
    addition — the repo's fixed-point oracle rule), and the top-k is
    TakeOrderedAndProject. At 100 TB the only data movement is the
    1-row stats aggregate and k rows to the driver."""
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    base = d.select("doc_id", tokens("text").alias("__toks")).select(
        "doc_id", F.size("__toks").alias("dl"),
        *[F.expr(f"size(filter(__toks, w -> w = '{t}'))").alias(f"tf_{t}")
          for t in QUERY_TERMS])
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
          for t in QUERY_TERMS])
    return (base.crossJoin(F.broadcast(stats))
            .select("doc_id", F.col("dl").cast("long").alias("n_tokens"),
                    F.expr(_TFIDF_SCORE_SQL).alias("score_micro"))
            .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
            .limit(TOP_K)
            .select("doc_id", "n_tokens", "score_micro",
                    (F.col("score_micro").cast("double") / F.lit(1000000.0))
                    .alias("score")))


# ---------------------------------------------------------------------------
# BM25 served from a PERSISTED inverted index (prefix-partitioned postings)
# ---------------------------------------------------------------------------

# A different fixed query than retrieval_bm25_topk's, so the two serving
# paths are graded independently (mid-frequency corpus terms).
SERVE_TERMS = ("stream", "hash", "window", "filter")

# One query term's BM25 partial in int64 micros, over GENERIC posting
# columns (tf, df_t, dl, n_docs, avgdl in scope) — rendered into BOTH
# engines verbatim, same k1=1.2 / b=0.75 literals as _bm25_term_sql.
_SERVE_SCORE_SQL = (
    "CAST(floor(1000000.0 * ("
    "ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5)"
    " / (CAST(df_t AS DOUBLE) + 0.5))"
    " * (CAST(tf AS DOUBLE) * 2.2)"
    " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * "
    "(CAST(dl AS DOUBLE) / avgdl))))) AS BIGINT)")


def _bm25_index_path(sf_dir: str) -> str:
    import hashlib
    import os
    from ..core.session import scratch_root
    root = scratch_root()
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(root, "bm25_index", key)


def build_bm25_index(spark: SparkSession, sf_dir: str,
                     path: str | None = None) -> str:
    """Build and PERSIST the corpus inverted index — the offline half of
    a search deployment (build once, serve arbitrary queries from the
    artifact), the retrieval twin of dedup.build_lsh_index.

    Two parquet tables under ``path``:
      postings/  (term, doc_id, tf, dl) PARTITIONED BY (pfx,
                 ingest_batch) — pfx is the term's md5 head (2 hex
                 chars, 256 balanced slices; raw first letters skew).
                 dl is DENORMALIZED into the posting row (the classic
                 inline document norm), so scoring never joins back to
                 the corpus. A query's term set prunes the read to its
                 prefixes' partitions: serve-side IO scales with the
                 query's posting lists, not the corpus. The build owns
                 ingest_batch=-1; each streaming append owns its own
                 batch partition (the build_lsh_index layout), so
                 re-runs replace instead of duplicating.
      stats/     one row PER BATCH (n_docs, sum_dl), partitioned by
                 ingest_batch — the collection statistics as mergeable
                 partials (serve SUMs them: a bounded aggregate over
                 one row per ingest batch). Per-term df is NOT stored:
                 every posting of a term lives in its own pfx slice,
                 so the pruned read itself yields exact global df with
                 a k-term aggregate.
    """
    path = path or _bm25_index_path(sf_dir)
    d = parallel_scan(spark, load_table(spark, sf_dir, "documents"),
                      "doc_id")
    _write_bm25_batch(d, path, tag=-1, mode="overwrite")
    return path


def _write_bm25_batch(docs: DataFrame, path: str, tag: int,
                      mode: str) -> None:
    # the build (tag=-1) is a STATIC overwrite — it must wipe the whole
    # directory; per-batch idempotent appends use DYNAMIC overwrite so
    # a re-run replaces only its own ingest_batch partitions
    ow_mode = "static" if tag == -1 else "dynamic"
    tok = (docs.select("doc_id", tokens("text").alias("__toks"))
           .select("doc_id", F.size("__toks").alias("dl"),
                   F.explode("__toks").alias("term")))
    (tok.groupBy("term", "doc_id", "dl")
     .agg(F.count(F.lit(1)).alias("tf"))
     .withColumn("pfx", F.substring(F.md5("term"), 1, 2))
     .withColumn("ingest_batch", F.lit(tag))
     .repartition("pfx")
     .write.mode(mode).option("partitionOverwriteMode", ow_mode)
     .partitionBy("pfx", "ingest_batch").parquet(path + "/postings"))
    (docs.select(tokens("text").alias("__toks"))
     .agg(F.count(F.lit(1)).alias("n_docs"),
          # coalesce: an EMPTY batch's sum is NULL, and a NULL partial
          # would crash the Python merge in bm25_serve — an empty
          # micro-batch must write the additive identity (0, 0)
          F.coalesce(F.sum(F.size("__toks").cast("long")), F.lit(0))
          .cast("long").alias("sum_dl"))
     .withColumn("ingest_batch", F.lit(tag))
     .coalesce(1)
     .write.mode(mode).option("partitionOverwriteMode", ow_mode)
     .partitionBy("ingest_batch").parquet(path + "/stats"))


def append_to_bm25_index(spark: SparkSession, path: str,
                         docs: DataFrame,
                         batch_id: int | None = None) -> None:
    """MAINTAIN the persisted inverted index: tokenize a new batch and
    append its postings (pfx-partitioned, norms inline) plus its
    one-row stats partial — the daily-job half of the lifecycle (build
    once → per batch: APPEND), mirroring dedup.append_to_lsh_index.
    Serve needs no rebuild: per-term df comes from the pruned postings
    read (now including the batch's rows) and n_docs/avgdl from the
    SUM over the per-batch stats rows.

    With ``batch_id`` the write is IDEMPOTENT: the batch owns its
    ``ingest_batch=<id>`` partitions and a re-run REPLACES them via
    dynamic partition overwrite (tokenization is deterministic, so a
    re-run of the same batch touches exactly the same (pfx, batch)
    partitions). Without it (ad-hoc maintenance), rows land in
    ingest_batch=-2 as a plain append."""
    tag = -2 if batch_id is None else int(batch_id)
    mode = "append" if batch_id is None else "overwrite"
    _write_bm25_batch(docs, path, tag=tag, mode=mode)


def compact_bm25_index(spark: SparkSession, path: str,
                       exclude_batch: int | None = None) -> None:
    """Background-merge the persisted index: fold every batch's
    postings into the base (-1) partition, one writer per pfx slice,
    and the per-batch stats partials into ONE base row — after K
    streaming appends each queried slice opens K+1 file sets for rows
    that could be one run. Serve results are invariant (the posting
    row set is unchanged; the stats SUM is associative).
    ``exclude_batch`` keeps the in-flight batch's partitions — and its
    stats partial — unfolded (the auto-compaction hook's retry
    contract, see dedup.compact_lsh_index). Same rename-aside crash
    safety and same no-concurrent-append caveat."""
    import os
    import shutil

    from ..sources.tables import folded_batch_tag

    def swap(live: str, df: DataFrame, parts: list[str]) -> None:
        tmp, old = live + ".compact.tmp", live + ".compact.old"
        (df.write.mode("overwrite").partitionBy(*parts).parquet(tmp))
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)

    swap(path + "/postings",
         (spark.read.parquet(path + "/postings")
          .withColumn("ingest_batch",
                      folded_batch_tag("ingest_batch", exclude_batch))
          .repartition("pfx")),
         ["pfx", "ingest_batch"])
    # stats: the folded batches sum into one base partial; an excluded
    # in-flight batch keeps its own row (sums stay associative)
    swap(path + "/stats",
         (spark.read.parquet(path + "/stats")
          .withColumn("ingest_batch",
                      folded_batch_tag("ingest_batch", exclude_batch))
          .groupBy("ingest_batch")
          .agg(F.sum("n_docs").cast("long").alias("n_docs"),
               F.sum("sum_dl").cast("long").alias("sum_dl"))
          .select("n_docs", "sum_dl", "ingest_batch")
          .coalesce(1)),
         ["ingest_batch"])


def _bm25_serve_oracle_sql(terms: tuple = SERVE_TERMS,
                           topk: int = TOP_K) -> str:
    rows_ = " UNION ALL ".join(
        f"SELECT doc_id, dl, '{t}' AS term, tf_{t} AS tf FROM d"
        f" WHERE tf_{t} > 0" for t in terms)
    dfs = " UNION ALL ".join(
        f"SELECT '{t}' AS term, df_{t} AS df_t FROM st" for t in terms)
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, len(toks) AS dl,
         {", ".join(f"len(list_filter(toks, w -> w = '{t}')) AS tf_{t}"
                    for t in terms)}
  FROM t
),
st AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
                    for t in terms)}
  FROM d
),
rows_ AS ({rows_}),
dfs AS ({dfs}),
scored AS (
  SELECT r.doc_id,
         CAST(max(r.dl) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_terms_matched,
         CAST(sum({_SERVE_SCORE_SQL}) AS BIGINT) AS score_micro
  FROM rows_ r
  JOIN dfs USING (term)
  CROSS JOIN st
  GROUP BY r.doc_id
)
SELECT doc_id, n_tokens, n_terms_matched, score_micro,
       CAST(score_micro AS DOUBLE) / 1000000.0 AS score
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT {topk}"""


@q("retrieval_bm25_serve", _bm25_serve_oracle_sql())
def retrieval_bm25_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{k} SERVED from the persisted inverted index —
    the online half of a search deployment, and the third member of the
    r8 persisted-artifact-serving family (dedup_incremental_lsh probes
    the saved LSH bands, similarity_incremental_ivf ingests against the
    saved IVF cells, this serves ranked retrieval from saved postings).
    Where retrieval_bm25_topk scans the corpus per query (right for a
    FIXED bounded vocabulary), the index pays tokenization once and
    then serves ARBITRARY queries from posting slices.

    Scale path: the query's term prefixes are computed in PYTHON
    (hashlib md5 over the ≤|query| terms — no collect, no job) and push
    into the postings read as a PARTITION filter plus a pushed term
    filter, so serve-side IO is the query's posting lists, never the
    corpus. Per-term df is an exact k-row aggregate OVER the pruned
    read (a term's postings are complete within its partition); both
    bounded sides broadcast; the top-k is TakeOrderedAndProject.

    Exactness: the per-term score template is shared text with the
    oracle (identical IEEE trees; ln is bit-exact between the JVM and
    DuckDB), each term's partial is floored to int64 micros BEFORE the
    cross-term sum (exact integer addition), and docs matching zero
    query terms — absent from the postings — score exactly 0 in the
    full-scan formula too, so dropping them is lossless. The oracle
    recomputes from the corpus: the index is a deterministic function
    of it, so probing the artifact and recomputing agree bit-for-bit."""
    path = cached_scalar(spark, sf_dir, "bm25_index_path",
                         lambda: build_bm25_index(spark, sf_dir))
    return bm25_serve(spark, path)


def bm25_serve(spark: SparkSession, path: str,
               terms: tuple = SERVE_TERMS,
               topk: int = TOP_K) -> DataFrame:
    """Serve BM25 top-k for ``terms`` from the index at ``path`` — the
    explicit-path core of retrieval_bm25_serve, shared by the catalog
    query and the maintained-index lifecycle (append → serve reflects
    the batch with no rebuild; see tests/test_bm25_serve.py)."""
    import hashlib

    # stats are mergeable per-batch partials (one row per ingest
    # batch, folded to one by compact_bm25_index) — a hard-bounded
    # collect; integer sums are order-independent, and with only the
    # base row present the sum IS that row, so the downstream double
    # division is bit-identical to reading it directly
    stats_rows = spark.read.parquet(path + "/stats") \
        .select("n_docs", "sum_dl").collect()
    n_docs = sum(r["n_docs"] for r in stats_rows)
    # `or 0`: partials written before the empty-batch coalesce landed
    # may carry sum_dl=NULL — treat them as the additive identity
    sum_dl = sum(r["sum_dl"] or 0 for r in stats_rows)
    if n_docs == 0:
        # nothing indexed: avgdl is undefined (0/0) and the postings
        # directory may hold no files at all — serve the empty result
        # instead of NaN scores / a schema-inference error
        return (local_frame(spark, 
            [], "doc_id bigint, n_tokens bigint, n_terms_matched bigint,"
                " score_micro bigint, score double"))
    pfxs = sorted({hashlib.md5(t.encode()).hexdigest()[:2]
                   for t in terms})
    posts = (spark.read.parquet(path + "/postings")
             .filter(F.col("pfx").isin(pfxs))        # partition-pruned
             .filter(F.col("term").isin(list(terms))))
    st = local_frame(spark, [(n_docs, sum_dl)],
                               "n_docs bigint, sum_dl bigint") \
        .select("n_docs",
                F.expr("CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)")
                .alias("avgdl"))
    dfs = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (posts
              .join(F.broadcast(dfs), "term")   # ≤|query| rows
              .crossJoin(F.broadcast(st))       # 1 row
              .select("doc_id", "dl",
                      F.expr(_SERVE_SCORE_SQL).alias("s_micro"))
              .groupBy("doc_id")
              .agg(F.max("dl").cast("long").alias("n_tokens"),
                   F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
                   F.sum("s_micro").cast("long").alias("score_micro")))
    return (scored
            .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
            .limit(topk)
            .select("doc_id", "n_tokens", "n_terms_matched", "score_micro",
                    (F.col("score_micro").cast("double") / F.lit(1000000.0))
                    .alias("score")))


@q("retrieval_bm25_incremental_serve", _bm25_serve_oracle_sql())
def retrieval_bm25_incremental_serve(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """BM25 served from a MAINTAINED index — the lifecycle gate for the
    persisted postings artifact: the index is built over the BASE
    corpus split (doc_id % 8 != 0) only, then the increment
    (doc_id % 8 == 0, the daily batch) is APPENDED through
    ``append_to_bm25_index`` (its own ingest_batch partitions, one-row
    stats partial) — never rebuilt — and serving reads the grown
    artifact. The oracle recomputes BM25 over the FULL corpus, so a
    green row proves append+serve is BIT-IDENTICAL to a from-scratch
    rebuild: per-term df (postings complete within their pfx slices
    across batch partitions), n_docs/avgdl (the stats partials sum to
    the full-corpus row), and every score's IEEE tree all survive the
    incremental path. Where retrieval_bm25_serve certifies the serve
    plan, this certifies the MAINTENANCE path the streaming ingest
    (streaming/bm25_ingest.py) relies on.

    Scale path: identical to retrieval_bm25_serve (the serve core is
    shared); the append tokenizes only the increment. Build + append
    run once per session (memoized) — the artifact lifecycle, not the
    per-query cost."""
    path = cached_scalar(spark, sf_dir, "bm25_inc_index_path",
                         lambda: _build_inc_bm25_index(spark, sf_dir))
    return bm25_serve(spark, path)


def _build_inc_bm25_index(spark: SparkSession, sf_dir: str) -> str:
    """Build + one-batch append of the maintained BM25 index — shared
    by retrieval_bm25_incremental_serve and the compaction-policy
    census (same memo key, one artifact per session), the retrieval
    twin of kmeans_ivf._build_inc_ivf_index."""
    path = _bm25_index_path(sf_dir) + "_inc"
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    base = parallel_scan(spark, docs.filter(F.col("doc_id") % 8 != 0),
                         "doc_id")
    _write_bm25_batch(base, path, tag=-1, mode="overwrite")
    inc = parallel_scan(spark, docs.filter(F.col("doc_id") % 8 == 0),
                        "doc_id")
    append_to_bm25_index(spark, path, inc, batch_id=0)
    return path


_COMPACT_AFTER_BATCHES = 2  # a pfx slice holding >= this many ingest
# batches' file sets is due for a background merge (the LSH/IVF policy
# constant, dedup.py / kmeans_ivf.py)


def _bm25_compaction_policy_oracle_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
pr AS (SELECT doc_id, unnest(toks) AS term FROM t),
pairs AS (SELECT DISTINCT doc_id, term FROM pr),
cp AS (SELECT substr(md5(term), 1, 2) AS pfx, count(*) AS n
       FROM pairs WHERE doc_id % 8 <> 0 GROUP BY 1),
ip AS (SELECT substr(md5(term), 1, 2) AS pfx, count(*) AS n
       FROM pairs WHERE doc_id % 8 = 0 GROUP BY 1)
SELECT pfx,
       CAST(coalesce(c.n, 0) + coalesce(i.n, 0) AS BIGINT) AS n_rows,
       CAST((CASE WHEN c.n IS NULL THEN 0 ELSE 1 END)
            + (CASE WHEN i.n IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_batches,
       CAST(CASE WHEN (CASE WHEN c.n IS NULL THEN 0 ELSE 1 END)
                    + (CASE WHEN i.n IS NULL THEN 0 ELSE 1 END)
                    >= {_COMPACT_AFTER_BATCHES}
            THEN 1 ELSE 0 END AS BIGINT) AS compact_due
FROM cp c
FULL OUTER JOIN ip i USING (pfx)
ORDER BY pfx"""


@q("retrieval_bm25_compaction_policy", _bm25_compaction_policy_oracle_sql())
def retrieval_bm25_compaction_policy(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Compaction SCHEDULER report for the maintained BM25 index — the
    retrieval member of the policy family (dedup_lsh_compaction_policy,
    similarity_ivf_compaction_policy, VERDICT r9 item 2): per postings
    slice (pfx partition), how many ingest batches' file sets a serve
    would open (each append lays one file set per touched slice) and
    whether the background merge (compact_bm25_index) is due
    (>= {_COMPACT_AFTER_BATCHES} batch partitions). Shares the
    maintained artifact the incremental-serve gate builds (base index
    + one appended batch), so the report certifies the exact layout
    that serving reads.

    Scale path: a pure PARTITION-COLUMN census — the scan projects
    only (pfx, ingest_batch), so parquet reads footers, never posting
    rows; one 256-row aggregate. Exactness: the oracle re-derives
    which slices each batch's terms touch from the corpus (the index
    is a deterministic function of it: postings rows are the distinct
    (term, doc_id) pairs, pfx = md5 head — DuckDB's md5 and Spark's
    produce the same lowercase hex); int64 counts; total order on pfx.

    Reference: ClickHouse MergeTree's part-count merge scheduling
    (SURVEY §2 S2) — the reference delegates it to managed ClickHouse;
    here it is an explicit, gateable report."""
    path = cached_scalar(spark, sf_dir, "bm25_inc_index_path",
                         lambda: _build_inc_bm25_index(spark, sf_dir))
    return (spark.read.parquet(path + "/postings")
            .groupBy("pfx")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.countDistinct("ingest_batch").cast("long")
                 .alias("n_batches"))
            .select("pfx", "n_rows", "n_batches",
                    F.when(F.col("n_batches") >= _COMPACT_AFTER_BATCHES,
                           1).otherwise(0).cast("long")
                    .alias("compact_due"))
            .orderBy("pfx"))
