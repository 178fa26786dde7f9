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
