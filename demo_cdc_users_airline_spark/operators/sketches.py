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
  256-entry LOOKUP TABLE computed once in Python and embedded as the
  same shortest-repr double literals in both engines. The full
  Flajolet et al. estimator, zero libm calls at query time.

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


_HLL_B = 8                 # register-index bits
_HLL_M = 1 << _HLL_B       # 256 registers
_HLL_RBITS = 60 - _HLL_B   # 52-bit remainder
# alpha_256 · m² · 2^53 as ONE Python double: both engines parse the
# same shortest-repr literal, so the estimate's arithmetic sequence
# (constant / double(S)) is a single rounding each
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUM = repr(_HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 53))

# linear-counting correction table: m·ln(m/V) for V = 1..m, computed
# once driver-side (index V is 1-based in both engines' list access)
import math as _math  # noqa: E402

_HLL_LC = [_HLL_M * _math.log(_HLL_M / v) for v in range(1, _HLL_M + 1)]
_HLL_LC_SQL = "[" + ", ".join(repr(x) for x in _HLL_LC) + "]"


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
       CAST(floor(abs(s.corrected - CAST(e.n_exact AS DOUBLE)) * 1000000.0
           / CAST(e.n_exact AS DOUBLE)) AS BIGINT) AS err_micro
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
    hh = F.expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT)")
    h = ev.select("event_type", hh.alias("hh"))
    rho = (h.select("event_type",
                    (F.col("hh") % _HLL_M).alias("bucket"),
                    F.expr(f"CASE WHEN (hh >> {_HLL_B}) = 0"
                           f" THEN {_HLL_RBITS + 1}"
                           f" ELSE {_HLL_RBITS + 1} - length(bin(hh >> {_HLL_B}))"
                           f" END").alias("r"))
           .groupBy("event_type", "bucket")
           .agg(F.max("r").alias("reg")))
    agg = (rho.groupBy("event_type")
           .agg(F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT),"
                             f" {_HLL_RBITS + 1} - reg)")).alias("s_present"),
                F.count(F.lit(1)).alias("n_buckets")))
    s_total = F.expr(f"CAST(s_present + ({_HLL_M} - n_buckets)"
                     f" * shiftleft(CAST(1 AS BIGINT), {_HLL_RBITS + 1})"
                     f" AS DOUBLE)")
    raws = agg.select(
        "event_type",
        (F.lit(float(_HLL_NUM)) / s_total).alias("raw"),
        (F.lit(_HLL_M) - F.col("n_buckets")).alias("v"))
    lc = F.array(*[F.lit(x) for x in _HLL_LC])
    est = raws.select(
        "event_type", "v",
        F.when((F.col("raw") <= F.lit(2.5 * _HLL_M)) & (F.col("v") > 0),
               F.element_at(lc, F.col("v").cast("int")))
         .otherwise(F.col("raw")).alias("corrected"))
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    joined = est.join(ex, "event_type")
    err = F.floor(F.abs(F.col("corrected") - F.col("n_exact").cast("double"))
                  * 1000000.0 / F.col("n_exact").cast("double")).cast("long")
    return joined.select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("corrected").alias("hll_estimate"),
        F.col("v").cast("long").alias("n_zero_registers"),
        err.alias("err_micro"))
