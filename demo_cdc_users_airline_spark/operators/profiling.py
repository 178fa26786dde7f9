"""Dataset profiling: the per-column statistics card a warehouse (or a
training-data registry) computes on ingest — row/null/distinct counts
and numeric ranges for every column, in ONE scan.

This is the generic-table complement to ``corpus_stats_report`` (which
cards the documents corpus specifically): the reference's operational
story (datasource health, quarantine accounting) implies exactly this
kind of column-level profile, and every large-scale data pipeline runs
one before accepting a drop.

Spark-first shape: all per-column aggregates evaluate inside ONE
hash-aggregate pass (count / null-count / min / max are plain
map-side-combinable aggregates; the exact distinct counts share one
Expand — Spark's multi-distinct rewrite), producing a single row that
unpivots driver-free via ``stack()`` into the (column → metrics) card.
At 100 TB the exact distincts are the one expensive term — the
HLL sketch in ``sketches.py`` is the documented approximate drop-in —
but the scan count stays ONE either way.

Cross-engine exactness: numeric ranges surface as DOUBLE (bigint and
double min/max are exact; timestamps convert to epoch seconds — a
42-bit integer, exact in a double); VARCHAR columns emit NULL ranges
rather than risking engine-specific string collation or float
formatting. Counts are int64.
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


# (column, kind) — kind decides the min/max surface: numeric columns
# profile as-is, timestamps as epoch seconds, strings skip ranges.
_ORDERS_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _range_sql(col: str, kind: str, fn: str) -> str:
    if kind == "num":
        return f"CAST({fn}({col}) AS DOUBLE)"
    if kind == "ts":
        return f"CAST(epoch({fn}({col})) AS DOUBLE)"
    return "CAST(NULL AS DOUBLE)"


@q("orders_table_profile", f"""
WITH agg AS (
  SELECT count(*) AS n_rows,
         {", ".join(
             f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nn_{c}, "
             f"count(DISTINCT {c}) AS nd_{c}, "
             f"{_range_sql(c, k, 'min')} AS mn_{c}, "
             f"{_range_sql(c, k, 'max')} AS mx_{c}"
             for c, k in _ORDERS_COLS)}
  FROM orders
)
{" UNION ALL ".join(
    f"SELECT '{c}' AS column_name, CAST(n_rows AS BIGINT) AS n_rows, "
    f"CAST(nn_{c} AS BIGINT) AS n_nulls, CAST(nd_{c} AS BIGINT) AS n_distinct, "
    f"mn_{c} AS min_num, mx_{c} AS max_num FROM agg"
    for c, _ in _ORDERS_COLS)}
""")
def orders_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of the ``orders`` table: rows, nulls, exact
    distincts, numeric/epoch ranges — one row per column, one scan.

    Scale path: a single hash-aggregate pass (the distinct counts share
    Spark's multi-distinct Expand; at petabyte scale swap them for the
    HLL sketch in sketches.py — same card, one pass, bounded state);
    the unpivot is a ``stack()`` over the 1-row aggregate, so nothing
    after the reduce touches table-sized data.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, k in _ORDERS_COLS:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if k == "num":
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
        elif k == "ts":
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"mn_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"mx_{c}"))
    row = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _ORDERS_COLS)
    return (row.select(
        F.col("n_rows"),
        F.expr(f"stack({len(_ORDERS_COLS)}, {stack}) AS "
               f"(column_name, n_nulls, n_distinct, min_num, max_num)"))
        .select("column_name", F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_nulls").cast("long").alias("n_nulls"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                "min_num", "max_num"))


# ---------------------------------------------------------------------------
# shuffle-key skew diagnostic
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10


@q("events_key_skew_report", f"""
WITH k AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(cnt) AS BIGINT) AS max_key_rows
  FROM k
),
top AS (
  SELECT user_id, CAST(cnt AS BIGINT) AS cnt
  FROM k ORDER BY cnt DESC, user_id LIMIT {SKEW_TOP_K}
),
ranked AS (
  SELECT user_id, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS BIGINT)
           AS rnk
  FROM top
)
SELECT r.rnk, r.user_id, r.cnt,
       CAST(r.cnt * 1000000 // t.total_rows AS BIGINT) AS share_micro,
       t.total_rows, t.n_keys, t.max_key_rows,
       CAST(t.max_key_rows * 1000000
            // greatest(t.total_rows // t.n_keys, 1) AS BIGINT)
         AS skew_factor_micro
FROM ranked r CROSS JOIN tot t
""")
def events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic for the events stream: the top heavy
    hitters by key (user_id) with their share of all rows, plus the
    corpus-level skew factor (max key size ÷ mean key size, in micros)
    — the report you run BEFORE keying a 100 TB join or window on a
    column, because one hot key = one straggler task. (AQE's skew-join
    split and the repo's salting patterns are the remedies; this query
    is the detector.)

    Scale path: one partial-agg shuffle to per-key counts; the top-k is
    a distributed TakeOrdered (never a global sort); the rank comes
    from a k×k broadcast self-count over the 10 survivors — NOT a
    partition-less window (the invariant this query itself polices);
    corpus totals ride a broadcast 1-row frame. Exactness: pure int64
    counts and integer-div micros; (cnt DESC, user_id) totally orders
    the top-k.
    """
    e = load_table(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = k.agg(F.sum("cnt").cast("long").alias("total_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("cnt").cast("long").alias("max_key_rows"))
    top = (k.select("user_id", F.col("cnt").cast("long").alias("cnt"))
           .orderBy(F.col("cnt").desc(), "user_id").limit(SKEW_TOP_K))
    # rank r = |{rows lexicographically ≥ me}| over the k survivors:
    # a k² broadcast comparison (k = 10) replaces the global window
    a, b = top.alias("a"), top.alias("b")
    ranked = (a.join(F.broadcast(b),
                     (F.col("b.cnt") > F.col("a.cnt"))
                     | ((F.col("b.cnt") == F.col("a.cnt"))
                        & (F.col("b.user_id") <= F.col("a.user_id"))))
              .groupBy(F.col("a.user_id").alias("user_id"),
                       F.col("a.cnt").alias("cnt"))
              .agg(F.count(F.lit(1)).cast("long").alias("rnk"))
              .select("rnk", "user_id", "cnt"))
    return (ranked.crossJoin(F.broadcast(tot))
            .select("rnk", "user_id", "cnt",
                    F.expr("CAST(cnt * 1000000 DIV total_rows AS BIGINT)")
                    .alias("share_micro"),
                    "total_rows", "n_keys", "max_key_rows",
                    F.expr("CAST(max_key_rows * 1000000"
                           " DIV greatest(total_rows DIV n_keys, 1)"
                           " AS BIGINT)").alias("skew_factor_micro")))


# ---------------------------------------------------------------------------
# Z-order (Morton curve) layout report
# ---------------------------------------------------------------------------

_Z_BITS = 16          # 16 bits per dimension → 32-bit Morton code
_Z_BUCKET_SHIFT = 26  # 2^32 z-space // 2^26 → 64 layout buckets


def _zorder_sql(x: str, y: str, intdiv: str) -> str:
    """Bit-interleave SQL for two {0..2^16-1} int columns — built from
    integer div/mod/mul only, so the same math parses on both engines
    (``intdiv`` is ``DIV`` for Spark, ``//`` for DuckDB)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({x} {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@q("orders_zorder_layout", f"""
WITH dims AS (
  SELECT o_orderkey,
         o_custkey % {1 << _Z_BITS} AS x,
         date_diff('day', DATE '1970-01-01', o_orderdate)
           % {1 << _Z_BITS} AS y
  FROM orders
),
z AS (
  SELECT o_orderkey, x, y,
         CAST({_zorder_sql('x', 'y', '//')} AS BIGINT) AS zval
  FROM dims
)
SELECT CAST(zval // {1 << _Z_BUCKET_SHIFT} AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max,
       CAST(max(x) - min(x) AS BIGINT) AS x_span,
       CAST(max(y) - min(y) AS BIGINT) AS y_span
FROM z GROUP BY 1
""")
def orders_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout report for orders clustered on
    (customer, order day): interleave the low {16} bits of both
    dimensions into one sort key, bucket the curve, and report each
    bucket's per-dimension min/max envelope. Sorting files by ``zval``
    is how lakehouse tables (Delta OPTIMIZE ZORDER, Iceberg sort
    orders) make min/max file pruning effective on BOTH columns at
    once — a single-column sort gives tight envelopes on one dimension
    and useless full-range envelopes on the other; the Morton buckets'
    bounded x_span AND y_span are the pruning story, measured.

    Scale path: the z-value is pure per-row integer math (div/mod/add —
    whole-stage-codegen, no UDF) and the report is one partial-agg
    shuffle on the bucket id. At 100 TB the same zval feeds
    ``repartitionByRange(zval).sortWithinPartitions(zval)`` to actually
    lay the files out; this query is the planner's evidence.
    Exactness: integer bit arithmetic and day indexes are
    engine-identical; day numbers (< 2^16 until 2149) and 16-bit
    residues keep every term in int64.
    """
    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        "o_orderkey",
        (F.col("o_custkey") % (1 << _Z_BITS)).alias("x"),
        (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
         .cast("long") % (1 << _Z_BITS)).alias("y"))
    z = dims.select(
        "o_orderkey", "x", "y",
        F.expr(f"CAST({_zorder_sql('x', 'y', 'DIV')} AS BIGINT)")
        .alias("zval"))
    return (z.groupBy((F.col("zval") / (1 << _Z_BUCKET_SHIFT))
                      .cast("long").alias("zbucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("x").cast("long").alias("x_min"),
                 F.max("x").cast("long").alias("x_max"),
                 F.min("y").cast("long").alias("y_min"),
                 F.max("y").cast("long").alias("y_max"),
                 (F.max("x") - F.min("x")).cast("long").alias("x_span"),
                 (F.max("y") - F.min("y")).cast("long").alias("y_span")))


# ---------------------------------------------------------------------------
# partial-aggregate state merge (AggregatingMergeTree semantics)
# ---------------------------------------------------------------------------


@q("events_agg_state_rollup", """
WITH st AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         count(*) AS n, sum(CAST(value AS DECIMAL(38,6))) AS v,
         min(ts) AS mn, max(ts) AS mx,
         count(DISTINCT event_type) AS dt
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(sum(v) AS DOUBLE) AS total_value,
       min(mn) AS first_ts, max(mx) AS last_ts,
       CAST(count(*) AS BIGINT) AS n_active_days,
       CAST(max(dt) AS BIGINT) AS max_daily_types
FROM st GROUP BY 1
""")
def events_agg_state_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation through mergeable partial states — the
    ClickHouse AggregatingMergeTree pattern (reference family: the
    MergeTree engines behind `kits/users/pg`'s datasources): level 1
    reduces raw events to per-(user, day) state rows (count / decimal
    sum / min / max — each re-aggregatable), level 2 merges states to
    per-user lifetime totals WITHOUT touching raw data again. In
    production the level-1 frame is the stored rollup table that
    absorbs each day's increment; every downstream consumer pays
    |users × days|, not |events| — the incremental-view pattern at
    100 TB.

    Exactness: count/min/max merge trivially; the value sum stays in
    DECIMAL(38,6) through BOTH levels (associative — chcompat.dec_sum's
    rule) and casts to double once. max_daily_types shows a
    NON-mergeable aggregate (distinct count) pinned to level 1, where
    it is still exact — the design boundary the pattern imposes.
    Scale path: two partial-agg shuffles, the second over the already
    tiny state table; (user, day) keying means the level-2 exchange
    satisfies any per-user consumer downstream.
    """
    e = load_table(spark, sf_dir, "events")
    st = (e.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum(F.col("value").cast("decimal(38,6)")).alias("v"),
               F.min("ts").alias("mn"), F.max("ts").alias("mx"),
               F.countDistinct("event_type").alias("dt")))
    return (st.groupBy("user_id")
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.sum("v").cast("double").alias("total_value"),
                 F.min("mn").alias("first_ts"),
                 F.max("mx").alias("last_ts"),
                 F.count(F.lit(1)).cast("long").alias("n_active_days"),
                 F.max("dt").cast("long").alias("max_daily_types")))
