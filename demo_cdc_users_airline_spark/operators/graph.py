"""Graph analytics over the near-dup similarity graph: PageRank
centrality for canonical-document selection, and the triangle census
that monitors band-chaining pathologies.

A dedup pipeline that keeps "the best copy" can rank by a local
quality score (``dedup_cluster_keep_best``) — or by CENTRALITY: the
document most connected inside its near-dup neighborhood is the one
the most variants derive from, which is the copy a curator usually
wants as canonical (the same argument web search used for picking the
canonical URL of a mirror set). PageRank over the near-dup edge table
is the standard iterative-dataflow benchmark for a reason: it is the
shape every fixed-point graph computation (label propagation, hubs,
trust rank) takes on a cluster.

Spark-first design: the edge table is the MEMOIZED simhash near-dup
pair frame (built once per session, shared with cluster labels and the
curation verdict). Both operators reuse the layout the CC fixpoint in
``dedup.connected_components`` proved out:

- **local finish** (the default entry): near-dup EDGES are a tiny
  fraction of the corpus; when the deduped edge set fits the same
  1M-edge Arrow bound the CC loop uses, the rounds run driver-side in
  pure Python integer arithmetic — identical floor-div updates, so the
  result is bit-identical to the distributed loop (parity-tested). On
  a sub-driver-size edge set, distributed rounds are pure fixed cost
  (stage scheduling per round); this is how every production graph
  pipeline finishes small components.
- **distributed rounds** (the general path): each iteration is one
  co-partitioned join + one partial-aggregatable groupBy over EDGE
  rows only; ``localCheckpoint`` per round truncates lineage so the
  physical plan stays CONSTANT-SIZE across rounds (the r6 plan audit
  measured 462 exchanges from unbounded lineage growth — the exact
  failure mode checkpointing exists for). At a 1000-executor scale the
  edge frame would be pre-partitioned by ``src`` once and every round
  would reuse that single exchange.

Cross-engine exactness (the repo's fixed-point oracle rule): ranks are
int64 MICROS. Per round, each node emits ``pr div deg`` (exact integer
floor division) along every out-edge and collects
``150000 + (85 · Σ contrib) div 100`` — integer sums are
order-independent, so any partitioning, any join order, the driver's
Python replay, and DuckDB's chained ``AS MATERIALIZED`` CTE replay
(one CTE per round — plain CTEs would inline exponentially, see
tokenizer.py) produce bit-identical ranks. No doubles exist until the
final display column.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import cached_scalar, local_frame
from .dedup import (_LOCAL_FINISH_EDGES, _SH_BANDS, _SH_BITS, _SH_MASK,
                    _SH_MAX_HAMMING, _SIMHASH_CTES, dedup_simhash_pairs)

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


N_ROUNDS = 6          # fixed-round power iteration (micros converge fast
# on near-dup components, which are small-diameter by construction)
BASE_MICRO = 150_000  # floor(0.15 · 1e6): the teleport mass per node
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact integer ratio


_EDGES_SQL = f"""{_SIMHASH_CTES},
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
)"""


def _round_cte(i: int) -> str:
    """One power-iteration round as a MATERIALIZED CTE (exact integer
    arithmetic; materialization keeps the replay linear in rounds)."""
    return f"""pr{i} AS MATERIALIZED (
  SELECT s.dst AS node,
         {BASE_MICRO} + ({DAMP_NUM} * sum(p.pr // d.deg)) // {DAMP_DEN} AS pr
  FROM sym s
  JOIN pr{i - 1} p ON p.node = s.src
  JOIN deg d ON d.node = s.src
  GROUP BY s.dst
)"""


def _edges_bounded(spark: SparkSession, sf_dir: str, pairs: DataFrame,
                   max_edges: int) -> list[tuple[int, int]] | None:
    """Bounded Arrow collect of the (already-distinct) edge table:
    returns the edge list when it fits ``max_edges``, else None (the
    caller falls through to the distributed path). The limit(n+1) makes
    the probe itself bounded — the collect can never be corpus-scaled.

    MEMOIZED per (session, sf_dir, bound) alongside the other training
    artifacts (ADVICE r7): a session running PageRank AND the triangle
    census (or either twice) pays the collect once — the edge list is a
    deterministic function of the cached simhash pair frame."""
    def collect() -> list[tuple[int, int]] | None:
        pdf = pairs.select("doc1", "doc2").limit(max_edges + 1).toPandas()
        if len(pdf) > max_edges:
            return None
        return [(int(u), int(v))
                for u, v in zip(pdf["doc1"].tolist(), pdf["doc2"].tolist())]

    return cached_scalar(spark, sf_dir, f"graph_edges_{max_edges}", collect)


def _pagerank_local(edges: list[tuple[int, int]]
                    ) -> list[tuple[int, int, int]]:
    """Driver-side replay of the distributed rounds: identical int64
    floor-div arithmetic ⇒ identical ranks (parity-tested). Returns
    sorted (node, degree, pagerank_micro) rows."""
    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    deg = {n: len(vs) for n, vs in adj.items()}
    pr = {n: 1_000_000 for n in adj}
    for _ in range(N_ROUNDS):
        nxt: dict[int, int] = defaultdict(int)
        for u, vs in adj.items():
            c = pr[u] // deg[u]
            for v in vs:
                nxt[v] += c
        pr = {n: BASE_MICRO + (DAMP_NUM * s) // DAMP_DEN
              for n, s in nxt.items()}
    return sorted((n, deg[n], pr[n]) for n in deg)


@q("dedup_graph_pagerank", f"""
WITH {_EDGES_SQL},
sym AS MATERIALIZED (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
),
deg AS MATERIALIZED (
  SELECT src AS node, count(*) AS deg FROM sym GROUP BY src
),
pr0 AS MATERIALIZED (
  SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg
),
{",".join(_round_cte(i) for i in range(1, N_ROUNDS + 1))}
SELECT d.node AS doc_id, CAST(d.deg AS BIGINT) AS degree,
       CAST(p.pr AS BIGINT) AS pagerank_micro,
       CAST(p.pr AS DOUBLE) / 1000000.0 AS pagerank
FROM deg d JOIN pr{N_ROUNDS} p ON p.node = d.node
""")
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str,
                         local_finish_max_edges: int = _LOCAL_FINISH_EDGES,
                         ) -> DataFrame:
    """PageRank centrality over the simhash near-dup graph
    ({N_ROUNDS} fixed power-iteration rounds, damping 0.85, int64
    micro-units throughout).

    The graph is undirected (each verified near-dup pair contributes
    both directions), so every node in the edge set has out-degree ≥ 1
    and there is no dangling mass; isolated documents (no near-dups)
    are out of scope by construction — their rank is the base mass.

    Scale path (the CC layout, see module docstring): when the deduped
    edge set fits the 1M-edge Arrow bound, the rounds run driver-side —
    identical integer arithmetic, same hash, zero per-round Spark jobs.
    Above the bound, each round is one join of the checkpointed rank
    frame against the cached (src, dst, deg) edge frame (both sides
    keyed on the same column — AQE plans a co-partitioned join) plus
    one map-side-combinable integer sum keyed by ``dst``; the per-round
    ``localCheckpoint`` keeps the plan constant-size (without it the
    r6 audit measured 462 exchanges of lineage growth). All state lives
    in edge/node frames, never per-document payloads.
    """
    pairs = dedup_simhash_pairs(spark, sf_dir)  # memo-cached edge table
    if local_finish_max_edges:
        edges = _edges_bounded(spark, sf_dir, pairs,
                                local_finish_max_edges)
        if edges is not None:
            rows = _pagerank_local(edges)
            schema = "doc_id long, degree long, pagerank_micro long"
            out = (local_frame(spark, rows, schema) if rows
                   else local_frame(spark, [], schema))
            return out.select(
                "doc_id", "degree", "pagerank_micro",
                (F.col("pagerank_micro").cast("double")
                 / F.lit(1_000_000.0)).alias("pagerank"))
    sym = (pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
           .unionByName(
               pairs.select(F.col("doc2").alias("src"),
                            F.col("doc1").alias("dst"))))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # one checkpointed (src, dst, deg) frame feeds every round: lineage
    # ends here, so each round's plan is join+agg over two leaf frames
    sym_deg = sym.join(deg, "src").localCheckpoint(eager=False)
    pr = deg.select(F.col("src").alias("node"),
                    F.lit(1_000_000).cast("long").alias("pr"))
    for _ in range(N_ROUNDS):
        pr = (sym_deg.join(pr, sym_deg["src"] == pr["node"])
              .select("dst", F.expr("pr div deg").alias("contrib"))
              .groupBy("dst")
              .agg(F.sum("contrib").alias("s"))
              .select(F.col("dst").alias("node"),
                      (F.lit(BASE_MICRO)
                       + F.expr(f"({DAMP_NUM} * s) div {DAMP_DEN}"))
                      .cast("long").alias("pr"))
              .localCheckpoint(eager=False))
    return (deg.select(F.col("src").alias("doc_id"),
                       F.col("deg").cast("long").alias("degree"))
            .join(pr, F.col("doc_id") == F.col("node"))
            .select("doc_id", "degree",
                    F.col("pr").alias("pagerank_micro"),
                    (F.col("pr").cast("double") / F.lit(1_000_000.0))
                    .alias("pagerank")))


def _triangles_local(edges: list[tuple[int, int]]
                     ) -> tuple[int, int, int | None, int, int | None]:
    """Driver-side census on the bounded edge list — the same
    degree-ordered wedge enumeration as the distributed path (orient
    each edge toward its higher-(degree, id) endpoint; pivot only at
    the minimum-order node; close with a canonical-edge set lookup).
    Returns (n_nodes, n_edges, n_wedges, n_triangles, cc_micro); the
    wedge count / coefficient are None on an edgeless graph to match
    SQL's NULL-sum-over-empty semantics."""
    es = {(u, v) if u < v else (v, u) for u, v in edges}
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    deg = {n: len(vs) for n, vs in adj.items()}
    out: dict[int, list[int]] = defaultdict(list)
    for u, v in es:
        lo, hi = (u, v) if (deg[u], u) < (deg[v], v) else (v, u)
        out[lo].append(hi)
    n_tri = 0
    for hs in out.values():
        hs_sorted = sorted(hs)
        for i in range(len(hs_sorted)):
            for j in range(i + 1, len(hs_sorted)):
                if (hs_sorted[i], hs_sorted[j]) in es:
                    n_tri += 1
    n_wedges = (sum(d * (d - 1) // 2 for d in deg.values())
                if deg else None)
    cc = (3 * n_tri * 1_000_000) // n_wedges if n_wedges else None
    return len(deg), len(es), n_wedges, n_tri, cc


@q("dedup_graph_triangles", f"""
WITH {_EDGES_SQL},
sym AS MATERIALIZED (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
),
deg AS MATERIALIZED (
  SELECT src AS node, count(*) AS deg FROM sym GROUP BY src
),
ori AS MATERIALIZED (
  SELECT CASE WHEN da.deg < db.deg
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN e.src ELSE e.dst END AS lo,
         CASE WHEN da.deg < db.deg
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN e.dst ELSE e.src END AS hi
  FROM edges e
  JOIN deg da ON da.node = e.src
  JOIN deg db ON db.node = e.dst
),
wed AS (
  SELECT e1.lo AS a,
         least(e1.hi, e2.hi) AS b, greatest(e1.hi, e2.hi) AS c
  FROM ori e1 JOIN ori e2 ON e2.lo = e1.lo AND e1.hi < e2.hi
),
tri AS (
  SELECT count(*) AS n_tri
  FROM wed w JOIN edges e ON e.src = w.b AND e.dst = w.c
),
tots AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges)
SELECT t.n_nodes, ne.n_edges, t.n_wedges,
       CAST(tri.n_tri AS BIGINT) AS n_triangles,
       CAST(3 * tri.n_tri * 1000000 // nullif(t.n_wedges, 0) AS BIGINT)
         AS global_cc_micro
FROM tots t CROSS JOIN ne CROSS JOIN tri
""")
def dedup_graph_triangles(spark: SparkSession, sf_dir: str,
                          local_finish_max_edges: int = _LOCAL_FINISH_EDGES,
                          ) -> DataFrame:
    """Triangle census of the near-dup graph: triangle count, wedge
    count, and the global clustering coefficient (3·triangles /
    wedges) — the transitivity check on a dedup edge set. Near-dup
    similarity SHOULD be nearly transitive (A≈B≈C ⟹ A≈C); a LOW
    coefficient means the banding is chaining unrelated documents
    through hubs, exactly the pathology that merges distinct documents
    into one cluster — this query is the monitor for it.

    Spark-first scale shape: the MapReduce triangle algorithm of
    Suri & Vassilvitskii (WWW'11) — orient every edge from its
    lower-(degree, id) endpoint to the higher, enumerate wedges ONLY at
    each triangle's minimum-order pivot (a high-degree hub node
    acquires in-orientation, so it pivots almost nothing — the skew
    killer for star graphs), and close them with one join back to the
    id-canonical edge table. Every triangle is counted exactly once
    (unique pivot; b < c by id). All joins run on the bounded MEMOIZED
    edge table shared with PageRank/cluster labels — corpus text is
    never touched; when that edge set fits the 1M-edge Arrow bound the
    same census runs driver-side (identical algorithm, same counts —
    parity-tested). Exactness: pure int64 counts; the coefficient is
    one integer floor-division.
    """
    pairs = dedup_simhash_pairs(spark, sf_dir)
    if local_finish_max_edges:
        edge_list = _edges_bounded(spark, sf_dir, pairs,
                                    local_finish_max_edges)
        if edge_list is not None:
            row = _triangles_local(edge_list)
            return local_frame(spark, 
                [row], "n_nodes long, n_edges long, n_wedges long, "
                       "n_triangles long, global_cc_micro long")
    edges = pairs.select(F.col("doc1").alias("src"),
                         F.col("doc2").alias("dst"))
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")) \
             .agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("node").alias("__na"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("__nb"), F.col("deg").alias("db"))
    lower = (F.col("da") < F.col("db")) | \
            ((F.col("da") == F.col("db")) & (F.col("src") < F.col("dst")))
    ori = (edges.join(da, F.col("src") == F.col("__na"))
           .join(db, F.col("dst") == F.col("__nb"))
           .select(F.when(lower, F.col("src")).otherwise(F.col("dst"))
                   .alias("lo"),
                   F.when(lower, F.col("dst")).otherwise(F.col("src"))
                   .alias("hi")))
    e1 = ori.select(F.col("lo").alias("a"), F.col("hi").alias("h1"))
    e2 = ori.select(F.col("lo").alias("__a2"), F.col("hi").alias("h2"))
    wed = (e1.join(e2, (F.col("a") == F.col("__a2"))
                   & (F.col("h1") < F.col("h2")))
           .select(F.least("h1", "h2").alias("b"),
                   F.greatest("h1", "h2").alias("c")))
    tri = (wed.join(edges, (F.col("b") == F.col("src"))
                    & (F.col("c") == F.col("dst")))
           .agg(F.count(F.lit(1)).alias("n_tri")))
    tots = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) DIV 2")).cast("long")
        .alias("n_wedges"))
    ne = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (tots.crossJoin(F.broadcast(ne)).crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_wedges",
                    F.col("n_tri").cast("long").alias("n_triangles"),
                    F.expr("CAST(3 * n_tri * 1000000"
                           " DIV nullif(n_wedges, 0) AS BIGINT)")
                    .alias("global_cc_micro")))
