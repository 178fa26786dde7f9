"""Cardinality sketches: HyperLogLog distinct-count estimation with an
exact-vs-estimate evaluation report — the canonical approximate
aggregate of a 100 TB engine (ClickHouse's ``uniq``, Spark's
``approx_count_distinct``), re-derived here with ENGINE-PORTABLE
integer arithmetic so the DuckDB oracle hash-matches bit-for-bit:

- per element: a 60-bit md5 hash splits into an 8-bit register bucket
  and a 52-bit remainder whose leading-zero count (via minimal-width
  ``bin()`` string length — identical in Spark and DuckDB) gives the
  rank rho;
- per group: registers M_j = max(rho) per bucket — a tiny
  partial-aggregatable state (≤ 256 rows per group on the wire
  REGARDLESS of element count; exact countDistinct must shuffle every
  distinct key — that contrast is the whole point of the sketch);
- the harmonic sum Σ 2^(−M_j) is computed EXACTLY as the int64
  Σ 2^(53−M_j) (≤ 256·2^53 < 2^63), so the raw HLL estimate
  α·m²·2^53 / S involves exactly one int→double conversion and one
  division — deterministic on every engine;
- the small-range linear-counting correction m·ln(m/V) needs ln(),
  whose libm rounding is NOT cross-engine stable — but V (the
  zero-register count) is an integer in [1, m], so the correction is a
  256-entry LOOKUP TABLE computed once in Python and embedded as EXACT
  integer-ratio literals (m/2^k — see _exact_dbl_sql: DuckDB's decimal
  literal path mis-rounds ~12% of 17-digit repr() strings by 1 ulp).
  The full Flajolet et al. estimator, zero libm calls at query time.

Like dedup_minhash_estimate and corpus_decontaminate_bloom, the exact
answer rides along: the operator is both the production sketch and its
own evaluation harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table

QUERIES: dict[str, object] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


_CMS_D = 4                  # count-min rows
_CMS_W = 1024               # cells per row (ε = e/w ≈ 0.27% of mass)
_CMS_TOPK = 20


def cms_token_hashes(docs: DataFrame) -> DataFrame:
    """(w, h): one 60-bit md5 per token occurrence — the shared
    tokenize+hash transform of the batch sketch and its streaming twin
    (streaming/frequency.py), so both count in the identical cell
    space."""
    from .text import tokens as _tokens

    return (docs.select(F.explode(_tokens("text")).alias("w"))
            .filter(F.length("w") > 0)
            .select("w", F.expr("CAST(conv(substring(md5(w), 1, 15), 16, 10)"
                                " AS BIGINT)").alias("h")))


def cms_probe_cells(col: str = "h"):
    """The d probe (j, cell) structs for a bound hash column — disjoint
    15-bit slices mod w (see the operator docstring for why one md5
    supplies all rows)."""
    return F.array(
        *[F.struct(F.lit(j).alias("j"),
                   F.expr(f"({col} >> {15 * j}) & {_CMS_W - 1}")
                   .alias("cell"))
          for j in range(_CMS_D)])


def cms_cell_counts(tw: DataFrame) -> DataFrame:
    """(j, cell, c): the d×w counter table for a (w, h) token frame —
    partial-aggregatable (≤ d·w rows per map partition on the wire)."""
    cells = (tw.select(F.explode(cms_probe_cells()).alias("jc"))
             .select("jc.j", "jc.cell"))
    return cells.groupBy("j", "cell").agg(F.count(F.lit(1)).alias("c"))


@q("corpus_token_cms_topk", f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
),
tw AS (
  SELECT w, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
  FROM toks WHERE length(w) > 0
),
cells AS (
  SELECT j.j AS j, (t.h >> (15 * j.j)) & {_CMS_W - 1} AS cell
  FROM tw t CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j) j
),
cms AS (SELECT j, cell, count(*) AS c FROM cells GROUP BY 1, 2),
top AS (
  SELECT w, h, count(*) AS n_exact
  FROM tw GROUP BY w, h
  ORDER BY n_exact DESC, w LIMIT {_CMS_TOPK}
),
est AS (
  SELECT t.w, t.n_exact, min(m.c) AS cms_estimate
  FROM top t
  CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j) j
  JOIN cms m ON m.j = j.j AND m.cell = (t.h >> (15 * j.j)) & {_CMS_W - 1}
  GROUP BY t.w, t.n_exact
)
SELECT w AS token, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - n_exact AS BIGINT) AS overestimate
FROM est
""")
def corpus_token_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: the exact top-{_CMS_TOPK} corpus
    tokens next to their CMS estimates from a fixed {_CMS_D}×{_CMS_W}
    counter table — the streaming-frequency sketch that replaces a
    full-vocabulary count at scale, graded against the exact answer
    (same evaluation-harness pattern as the HLL/minhash/bloom reports).

    Engine-portable construction: one 60-bit md5 per token occurrence
    supplies all {_CMS_D} row-cells as disjoint 15-bit slices (mod w) —
    integer-exact end to end, so estimates hash-match the oracle, and
    the CMS invariant estimate ≥ exact is structural (counters only
    ever over-count on collisions).

    Scale path: the sketch build is a token map + a groupBy whose KEY
    SPACE is the fixed d·w = {_CMS_D * _CMS_W} cells — partial
    aggregation collapses every map partition to ≤ d·w rows before the
    wire, the exact property that makes CMS a streaming sketch. The
    exact top-k (the grading branch) is one token groupBy +
    TakeOrdered; the estimate probe joins k rows against the broadcast
    {_CMS_D * _CMS_W}-row counter table."""
    d = load_table(spark, sf_dir, "documents")
    tw = cms_token_hashes(d).cache()
    cms = cms_cell_counts(tw)
    top = (tw.groupBy("w", "h").agg(F.count(F.lit(1)).alias("n_exact"))
           .orderBy(F.col("n_exact").desc(), "w").limit(_CMS_TOPK))
    probes = (top.select("w", "n_exact",
                         F.explode(cms_probe_cells()).alias("jc"))
              .select("w", "n_exact", "jc.j", "jc.cell"))
    est = (probes.join(F.broadcast(cms), ["j", "cell"])
           .groupBy("w", "n_exact").agg(F.min("c").alias("cms_estimate")))
    return est.select(
        F.col("w").alias("token"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("n_exact")).cast("long")
        .alias("overestimate"))


_QS_BINS = 1024  # fixed histogram resolution (types × 1024 wire state)

# rank targets shared with events_value_percentiles' total-order rule
_QS_RANKS = (("p50", "(n + 1) DIV 2", "(n + 1) // 2"),
             ("p90", "(9 * n + 9) DIV 10", "(9 * n + 9) // 10"),
             ("p99", "(99 * n + 99) DIV 100", "(99 * n + 99) // 100"))


def _qs_est_sql(b: str) -> str:
    # bin-midpoint estimate; op order (add, scale, divide) is textually
    # identical in both engines — one IEEE rounding per step
    return f"(mn + (CAST({b} AS DOUBLE) + 0.5) * (mx - mn) / {_QS_BINS}.0)"


@q("events_value_quantile_sketch", f"""
WITH src AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
rng AS (SELECT min(value) AS mn, max(value) AS mx FROM src),
b AS (
  SELECT s.event_type,
         CASE WHEN r.mx = r.mn THEN 0
              ELSE least(CAST(floor((s.value - r.mn) * {_QS_BINS}.0
                                    / (r.mx - r.mn)) AS BIGINT),
                         {_QS_BINS - 1})
         END AS bin
  FROM src s CROSS JOIN rng r
),
hist AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM hist
),
sel AS (
  SELECT event_type, n,
         {", ".join(f"min(CASE WHEN cum >= {duck} THEN bin END) AS b_{name}"
                    for name, _, duck in _QS_RANKS)}
  FROM cum GROUP BY event_type, n
),
ex AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM src
),
exact AS (
  SELECT event_type,
         {", ".join(f"max(CASE WHEN rn = {duck} THEN value END) AS {name}"
                    for name, _, duck in _QS_RANKS)}
  FROM ex GROUP BY event_type, n
)
SELECT s.event_type, CAST(s.n AS BIGINT) AS n_events,
       {", ".join(f"e.{name} AS {name}, {_qs_est_sql(f's.b_{name}')} AS {name}_est"
                  for name, _, _ in _QS_RANKS)}
FROM sel s CROSS JOIN rng r
JOIN exact e ON e.event_type = s.event_type
""")
def events_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch graded against exact order statistics:
    per event type, p50/p90/p99 estimated from a fixed {_QS_BINS}-bin
    histogram over the data-anchored global [min, max] next to the
    exact rank values — operationalizing events_value_percentiles'
    documented scale path ('switch hot groups to sketches at 100 TB').

    Scale path: the histogram build is a map (one subtraction, one
    power-of-two scale, one division per row) + a groupBy whose key
    space is types × {_QS_BINS} — partial aggregation bounds wire state
    regardless of row count, and the bin selection runs on the tiny
    histogram. The exact branch (one per-type rank window over every
    row) is the thing this replaces at scale; it rides along here as
    the grading harness, the same pattern as the HLL/CMS/bloom reports.

    Deterministic: bin indices floor single-rounding IEEE expressions
    evaluated with identical op order in both engines; estimates are
    bin midpoints derived from the two anchored scalars; all counts
    and ranks are exact integers (ranks use the repo's total-order
    tiebreak on event_id; NULL values are excluded by both sides)."""
    ev = load_table(spark, sf_dir, "events")
    src = (ev.filter(F.col("value").isNotNull())
           .select("event_type", "event_id", "value"))
    rng = src.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    b = (src.crossJoin(F.broadcast(rng))
         .select("event_type", F.expr(
             f"CASE WHEN mx = mn THEN 0"
             f" ELSE least(CAST(floor((value - mn) * {_QS_BINS}.0D"
             f" / (mx - mn)) AS BIGINT), {_QS_BINS - 1}) END").alias("bin")))
    hist = b.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W
    wt = W.partitionBy("event_type")
    cum = hist.select(
        "event_type", "bin",
        F.sum("c").over(wt.orderBy("bin")).alias("cum"),
        F.sum("c").over(wt).alias("n"))
    sel = (cum.groupBy("event_type", "n")
           .agg(*[F.min(F.when(F.col("cum") >= F.expr(spk), F.col("bin")))
                  .alias(f"b_{name}") for name, spk, _ in _QS_RANKS]))
    ex = src.select(
        "event_type", "value",
        F.row_number().over(wt.orderBy("value", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"))
    exact = (ex.groupBy("event_type", "n")
             .agg(*[F.max(F.when(F.col("rn") == F.expr(spk), F.col("value")))
                    .alias(name) for name, spk, _ in _QS_RANKS])
             .drop("n"))
    out_cols = ["event_type", F.col("n").cast("long").alias("n_events")]
    for name, _, _ in _QS_RANKS:
        out_cols.append(F.col(name))
        out_cols.append(F.expr(_qs_est_sql(f"b_{name}")).alias(f"{name}_est"))
    return (sel.crossJoin(F.broadcast(rng))
            .join(exact, "event_type")
            .select(*out_cols))


_HLL_B = 8                 # register-index bits
_HLL_M = 1 << _HLL_B       # 256 registers
_HLL_RBITS = 60 - _HLL_B   # 52-bit remainder
# alpha_256 · m² · 2^53 as ONE Python double: both engines parse the
# same shortest-repr literal, so the estimate's arithmetic sequence
# (constant / double(S)) is a single rounding each
import math as _math  # noqa: E402


def _exact_dbl_sql(x: float) -> str:
    """A computed double as SQL that parses BIT-IDENTICALLY everywhere:
    an exact integer ratio m / 2^k (or product m · 2^k). DuckDB's
    literal path mis-rounds ~12% of 17-significant-digit repr() strings
    by 1 ulp (measured: 32/256 of the LC table values — decimal
    fraction literals route through DECIMAL inference); exact-integer
    strings below 2^63 parse exactly on every engine, and the single
    multiply/divide reproduces the target double exactly because the
    true result IS that double (IEEE correctly-rounded ⇒ exact)."""
    if x == 0:
        return "0.0"
    frac, e = _math.frexp(x)          # x = frac·2^e, 0.5 ≤ |frac| < 1
    mi, ee = int(frac * (1 << 53)), e - 53
    while mi % 2 == 0 and ee < 0:
        mi //= 2
        ee += 1
    if ee >= 0:
        return f"(CAST({mi} AS DOUBLE) * {1 << ee})"
    return f"(CAST({mi} AS DOUBLE) / {1 << -ee})"


_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUM_F = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 53)
_HLL_NUM = _exact_dbl_sql(_HLL_NUM_F)

# linear-counting correction table: m·ln(m/V) for V = 1..m, computed
# once driver-side (index V is 1-based in both engines' list access)
_HLL_LC = [_HLL_M * _math.log(_HLL_M / v) for v in range(1, _HLL_M + 1)]
_HLL_LC_SQL = "[" + ", ".join(_exact_dbl_sql(x) for x in _HLL_LC) + "]"


@q("events_hll_distinct", f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hh
  FROM events
),
rho AS (
  SELECT event_type, hh % {_HLL_M} AS bucket,
         max(CASE WHEN (hh >> {_HLL_B}) = 0 THEN {_HLL_RBITS + 1}
                  ELSE {_HLL_RBITS + 1} - length(bin(hh >> {_HLL_B}))
             END) AS reg
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         sum(CAST(1 AS BIGINT) << ({_HLL_RBITS + 1} - reg)) AS s_present,
         count(*) AS n_buckets
  FROM rho GROUP BY 1
),
raws AS (
  SELECT event_type,
         {_HLL_NUM} / CAST(s_present
             + ({_HLL_M} - n_buckets)
               * (CAST(1 AS BIGINT) << {_HLL_RBITS + 1}) AS DOUBLE) AS raw,
         {_HLL_M} - n_buckets AS v
  FROM agg
),
est AS (
  SELECT event_type, raw, v,
         CASE WHEN raw <= {2.5 * _HLL_M} AND v > 0
              THEN ({_HLL_LC_SQL})[v] ELSE raw END AS corrected
  FROM raws
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT s.event_type,
       CAST(e.n_exact AS BIGINT) AS n_exact,
       s.corrected AS hll_estimate,
       CAST(s.v AS BIGINT) AS n_zero_registers,
       CAST(CASE WHEN e.n_exact = 0 THEN 0
                 ELSE floor(abs(s.corrected - CAST(e.n_exact AS DOUBLE))
                            * 1000000.0 / CAST(e.n_exact AS DOUBLE))
            END AS BIGINT) AS err_micro
FROM est s JOIN ex e ON e.event_type = s.event_type
""")
def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users vs the 256-register HLL
    estimate, the zero-register count, and the relative error in
    integer micro-units.

    Scale path: the sketch side is a map (hash/bucket/rho) + a
    (type, bucket)-keyed MAX — partial aggregation collapses each map
    partition to ≤ m rows per group before the wire, so the shuffle is
    O(groups·m) regardless of data size; the register rollup and the
    estimate are group-sized arithmetic. The exact countDistinct branch
    exists to GRADE the sketch (at 100 TB it is the thing you could no
    longer afford — its shuffle carries every distinct key)."""
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, "event_type", "user_id")
    est = hll_estimate(regs, "event_type")
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    joined = est.join(ex, "event_type")
    err = F.when(F.col("n_exact") == 0, 0).otherwise(
        F.floor(F.abs(F.col("hll_estimate") - F.col("n_exact").cast("double"))
                * 1000000.0 / F.col("n_exact").cast("double"))).cast("long")
    return joined.select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        "hll_estimate",
        "n_zero_registers",
        err.alias("err_micro"))


def hll_registers(df: DataFrame, key: str, elem: str) -> DataFrame:
    """(key, bucket, reg) — the HLL register state of ``elem`` grouped
    by ``key``. MAX-mergeable: registers of any row-partition of ``df``
    merge by per-(key, bucket) max into exactly the whole-data state
    (the property the streaming form leans on — merging is idempotent
    AND commutative, so replays and re-merges are harmless)."""
    hh = F.expr(f"CAST(conv(substring(md5(CAST({elem} AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT)")
    return (df.select(F.col(key), hh.alias("hh"))
            .select(key, (F.col("hh") % _HLL_M).alias("bucket"),
                    F.expr(f"CASE WHEN (hh >> {_HLL_B}) = 0"
                           f" THEN {_HLL_RBITS + 1}"
                           f" ELSE {_HLL_RBITS + 1} - length(bin(hh >> {_HLL_B}))"
                           f" END").alias("r"))
            .groupBy(key, "bucket")
            .agg(F.max("r").alias("reg")))


def hll_estimate(regs: DataFrame, key: str) -> DataFrame:
    """(key, hll_estimate, n_zero_registers) from a register frame —
    the corrected Flajolet estimator (lookup-table linear counting)."""
    agg = (regs.groupBy(key)
           .agg(F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT),"
                             f" {_HLL_RBITS + 1} - reg)")).alias("s_present"),
                F.count(F.lit(1)).alias("n_buckets")))
    s_total = F.expr(f"CAST(s_present + ({_HLL_M} - n_buckets)"
                     f" * shiftleft(CAST(1 AS BIGINT), {_HLL_RBITS + 1})"
                     f" AS DOUBLE)")
    raws = agg.select(
        key,
        (F.lit(_HLL_NUM_F) / s_total).alias("raw"),
        (F.lit(_HLL_M) - F.col("n_buckets")).alias("v"))
    lc = F.array(*[F.lit(x) for x in _HLL_LC])
    return raws.select(
        key,
        F.when((F.col("raw") <= F.lit(2.5 * _HLL_M)) & (F.col("v") > 0),
               F.element_at(lc, F.col("v").cast("int")))
         .otherwise(F.col("raw")).alias("hll_estimate"),
        F.col("v").cast("long").alias("n_zero_registers"))
