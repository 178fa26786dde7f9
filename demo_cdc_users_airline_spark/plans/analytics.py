"""Operator-coverage analytics queries over the driver testdata.

Each entry demonstrates one-or-more operators from SURVEY.md §2 on the
TPC-H-ish tables, in the exact shape the reference uses them (reference
file:line cited per query). Every query is paired with an ANSI-SQL
DuckDB oracle (same column aliases) for the driver's correctness gate.

Determinism rules used throughout (see functions.chcompat.dec_sum):
- double sums go through DECIMAL so they are exact and order-independent
  (bit-identical under any partitioning and vs DuckDB);
- time-relative filters ("last hour") anchor on max(ts) in the data, the
  frozen-clock pattern (SURVEY §2 P10/F1) — deterministic, no wall clock;
- every top-k / latest-per-key has a total order (explicit tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec_sum, to_start_of_minute
from ..sources.loader import cached_scalar, load_table
from .framework import Context, Node, Pipe, Registry

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
# CDC-shape queries over `events` (key=user_id, version=ts, unique event_id)
# ---------------------------------------------------------------------------

@q("cdc_latest_row_per_key", """
SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""")
def cdc_latest_row_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D2: `ORDER BY key, ver DESC LIMIT 1 BY key` / `FINAL` dedup —
    latest_flight_info.pipe:6-9, users_api_rmt.pipe:6. One shuffle on the
    key; at scale this reads the compacted VersionedTable instead."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (ev.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .select("user_id", "event_id", "event_type", "value", "ts"))


@q("cdc_latest_state_argmax", """
SELECT user_id,
       arg_max(event_type, ts ORDER BY ts, event_id) AS last_type,
       arg_max(value, ts ORDER BY ts, event_id) AS last_value,
       max(CAST(ts AS TIMESTAMP)) AS last_ts,
       count(*) AS n_events
FROM events GROUP BY user_id
""")
def cdc_latest_state_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: argMax-reconstruct latest row per key — users_api_batch.pipe:9-18.
    groupBy + max_by(struct) = partial-aggregatable, map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("last_type"),
        F.max_by("value", key).alias("last_value"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# DuckDB arg_max has no ORDER BY tiebreak arg — emulate with a window in
# the oracle instead (same total order as the Spark struct key).
ORACLE["cdc_latest_state_argmax"] = """
WITH latest AS (
  SELECT user_id, event_type AS last_type, value AS last_value
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
stats AS (
  SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS last_ts, count(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT l.user_id, l.last_type, l.last_value, s.last_ts, s.n_events
FROM latest l JOIN stats s USING (user_id)
"""


@q("cdc_soft_delete_filtered_state", """
WITH latest AS (
  SELECT user_id, event_type AS last_type, value AS last_value,
         CAST(ts AS TIMESTAMP) AS last_ts
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT user_id, last_type, last_value, last_ts FROM latest
WHERE last_type <> 'error'
""")
def cdc_soft_delete_filtered_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 + D2: the endpoint pattern `WHERE deleted = false` over the
    deduped latest state — users_api_batch.pipe:48-53 (soft-delete filter
    at read time; 'error' plays the deleted flag on this dataset)."""
    latest = cdc_latest_row_per_key(spark, sf_dir)
    return (latest.filter(F.col("event_type") != "error")
            .select("user_id",
                    F.col("event_type").alias("last_type"),
                    F.col("value").alias("last_value"),
                    F.col("ts").alias("last_ts")))


@q("cdc_incremental_snapshot", """
WITH wm AS (SELECT max(ts) - INTERVAL 7 DAY AS last_batch_ts FROM events),
new_events AS (
  SELECT user_id, event_type AS last_type, value AS last_value,
         CAST(ts AS TIMESTAMP) AS last_ts
  FROM events, wm WHERE ts > wm.last_batch_ts
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
backfill AS (
  SELECT user_id, event_type AS last_type, value AS last_value,
         CAST(ts AS TIMESTAMP) AS last_ts
  FROM events, wm WHERE ts <= wm.last_batch_ts
    AND user_id NOT IN (SELECT user_id FROM new_events)
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT *, 1 AS is_new FROM new_events
UNION ALL
SELECT *, 0 AS is_new FROM backfill
""")
def cdc_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 self-watermarking snapshot: scalar watermark (J5) + changed-keys
    argMax reconstruct (A6) + NOT-IN backfill (P8 → left_anti) + UNION ALL
    (U1) — users_batch_copy.pipe:8-54 re-shaped onto the events table."""
    ev = load_table(spark, sf_dir, "events")
    # scalar subquery as collected literal (users_batch_copy.pipe:10)
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("wm")).first()[0]

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .select("user_id",
                          F.col("event_type").alias("last_type"),
                          F.col("value").alias("last_value"),
                          F.col("ts").alias("last_ts")))

    new_events = latest(ev.filter(F.col("ts") > F.lit(wm)))
    backfill = (latest(ev.filter(F.col("ts") <= F.lit(wm)))
                .join(new_events.select("user_id"), "user_id", "left_anti"))
    return (new_events.withColumn("is_new", F.lit(1))
            .unionByName(backfill.withColumn("is_new", F.lit(0))))


@q("events_per_minute_gapfill", """
WITH bounds AS (
  SELECT date_trunc('minute', min(CAST(ts AS TIMESTAMP))) AS t0,
         date_trunc('minute', max(CAST(ts AS TIMESTAMP))) AS t1
  FROM events WHERE ts > (SELECT max(ts) - INTERVAL 6 HOUR FROM events)
),
series AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS minute FROM bounds
),
agg AS (
  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute, count(*) AS n_events
  FROM events WHERE ts > (SELECT max(ts) - INTERVAL 6 HOUR FROM events)
  GROUP BY 1
)
SELECT s.minute, coalesce(a.n_events, 0) AS n_events
FROM series s LEFT JOIN agg a ON s.minute = a.minute
""")
def events_per_minute_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4/F22 + A9/F6: generated minute series LEFT JOIN per-minute agg,
    zero-filled — flights_missed_pct_minute.pipe:50-59 (`numbers(61)` gap
    fill). Series via sequence+explode (Spark's numbers()); anchor on
    max(ts) for determinism (frozen-now pattern, SURVEY P10)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = cached_scalar(spark, sf_dir, "max_ts",
                           lambda: ev.agg(F.max("ts")).first()[0])
    win = ev.filter(F.col("ts") > F.lit(anchor) - F.expr("INTERVAL 6 HOUR"))
    bounds = win.agg(
        F.date_trunc("minute", F.min("ts")).alias("t0"),
        F.date_trunc("minute", F.max("ts")).alias("t1"))
    series = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 MINUTE"))).alias("minute"))
    agg = (win.groupBy(to_start_of_minute("ts").alias("minute"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    return (series.join(agg, "minute", "left")
            .select("minute", F.coalesce("n_events", F.lit(0)).alias("n_events")))


@q("events_last_hour_stats", """
WITH anchor AS (SELECT max(ts) AS now_ts FROM events)
SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS time_interval,
       count(DISTINCT user_id) AS active_users,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events, anchor
WHERE ts > now_ts - INTERVAL 1 HOUR AND event_type IN ('click','view','purchase')
GROUP BY 1
""")
def events_last_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A9/P7/P10: per-minute distinct actors over the trailing hour with
    an IN-list filter — active_flights_past_hour.pipe:4-13 +
    passengers_by_flight_status.pipe:8-11, anchored clock."""
    ev = load_table(spark, sf_dir, "events")
    anchor = cached_scalar(spark, sf_dir, "max_ts",
                           lambda: ev.agg(F.max("ts")).first()[0])
    return (ev.filter((F.col("ts") > F.lit(anchor) - F.expr("INTERVAL 1 HOUR"))
                      & F.col("event_type").isin("click", "view", "purchase"))
            .groupBy(to_start_of_minute("ts").alias("time_interval"))
            .agg(F.countDistinct("user_id").alias("active_users"),
                 F.count(F.lit(1)).alias("n_events"),
                 dec_sum("value").alias("total_value")))


@q("events_json_extract", """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1
""")
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: JSONPath column extraction with declared target type — the
    Kafka-datasource ingest projection (users_raw.datasource:3-14), done
    with get_json_object (JVM-side, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.withColumn("k_mod", (F.get_json_object("props", "$.k").cast("int") % 10))
            .groupBy("k_mod")
            .agg(F.count(F.lit(1)).alias("n"), dec_sum("value").alias("total_value")))


# ---------------------------------------------------------------------------
# Relational operator suite over the TPC-H-ish tables
# ---------------------------------------------------------------------------

@q("pricing_summary", """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3/A8 + P5: the classic scan→filter→agg shape (pipe aggregates
    à la flights_missed_pct_minute.pipe:24-29). Filter pushes to parquet;
    decimal sums are shuffle-order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(dec_sum("l_quantity").alias("sum_qty"),
                 dec_sum("l_extendedprice").alias("sum_base_price"),
                 F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(38,6)")).cast("double").alias("sum_disc_price"),
                 (dec_sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order")))


@q("regional_customer_value", """
SELECT r.r_name AS region, n.n_name AS nation,
       count(*) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""")
def regional_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/A10: chained inner equi-joins on small dims → broadcast hash
    joins, no shuffle of the big side (flights_missed_pct_minute.pipe:10-12
    join shape; SURVEY §4 join strategy)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (c.join(n, c["c_nationkey"] == n["n_nationkey"])
             .join(r, n["n_regionkey"] == r["r_regionkey"])
             .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
             .agg(F.count(F.lit(1)).alias("n_customers"),
                  dec_sum("c_acctbal").alias("total_acctbal")))


@q("customer_order_summary_left", """
SELECT c.c_custkey, c.c_name,
       count(o.o_orderkey) AS n_orders,
       coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS total_spend
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""")
def customer_order_summary_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A11: left outer join keeping order-less customers, coalesce over
    aggregates — baggage_by_flight_status.pipe:12-14 +
    users_batch_copy.pipe:13-23."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, o["o_custkey"] == c["c_custkey"], "left")
             .groupBy("c_custkey", "c_name")
             .agg(F.count("o_orderkey").alias("n_orders"),
                  F.coalesce(dec_sum("o_totalprice"), F.lit(0.0)).alias("total_spend")))


@q("customers_without_urgent_orders", """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
""")
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/J6: NOT IN (filtered subquery) → left_anti join —
    users_api_batch.pipe:33 (`id NOT IN (select id from get_new_events)`)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
             .select("c_custkey", "c_name"))


@q("orders_above_global_avg", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                           / count(*) FROM orders)
""")
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: scalar subquery as broadcast constant — the reference's
    `WITH (SELECT max(...)) AS last_batch_ts` pattern
    (users_batch_copy.pipe:10): collect the scalar, use as a literal."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg((dec_sum("o_totalprice") / F.count(F.lit(1)))).first()[0]
    return (o.filter(F.col("o_totalprice") > F.lit(avg_price))
             .select("o_orderkey", "o_custkey", "o_totalprice"))


@q("top_customers", """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend,
       count(*) AS n_orders
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 20
""")
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3/D5: multi-key agg + total-order sort + LIMIT n (demo_airport.py:235;
    dash head(30)). Spark executes as TakeOrderedAndProject — no full sort
    at scale. Decimal spend ⇒ deterministic top-k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, o["o_custkey"] == c["c_custkey"])
             .groupBy("c_custkey", "c_name")
             .agg(dec_sum("o_totalprice").alias("total_spend"),
                  F.count(F.lit(1)).alias("n_orders"))
             .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
             .limit(20))


@q("order_priority_conditional_agg", """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS fulfilled,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_orders,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS pending,
       round(coalesce(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) * 100.0
             / nullif(count(*), 0), 0), 2) AS fulfilled_pct,
       count(*) - (count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                 + count(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                 + count(CASE WHEN o_orderstatus = 'P' THEN 1 END)) AS other
FROM orders GROUP BY o_orderpriority
""")
def order_priority_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8 + F13/F14/F15: COUNT(CASE WHEN …) pivot-style buckets, derived
    arithmetic over aggregates, nullIf div-by-zero guard —
    passengers_by_flight_status.pipe:8-17, flights_missed_pct_minute.pipe:27."""
    o = load_table(spark, sf_dir, "orders")

    def bucket(status):
        return F.count(F.when(F.col("o_orderstatus") == status, 1))

    return (o.groupBy("o_orderpriority")
            .agg(bucket("F").alias("fulfilled"),
                 bucket("O").alias("open_orders"),
                 bucket("P").alias("pending"),
                 F.round(F.coalesce(bucket("F") * 100.0 / F.nullif(F.count(F.lit(1)), F.lit(0)),
                                    F.lit(0.0)), 2).alias("fulfilled_pct"),
                 (F.count(F.lit(1)) - (bucket("F") + bucket("O") + bucket("P"))).alias("other")))


@q("order_status_case_rank", """
SELECT o_orderstatus,
       CASE WHEN o_orderstatus = 'F' THEN 3
            WHEN o_orderstatus = 'P' THEN 2
            WHEN o_orderstatus = 'O' THEN 1
            ELSE 6 END AS status_rank,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
""")
def order_status_case_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/F16: ORDER BY CASE categorical ranking —
    baggage_by_flight_status.pipe:17-26 (rank exposed as a column so the
    custom order is value-checked, not just row order)."""
    o = load_table(spark, sf_dir, "orders")
    rank = (F.when(F.col("o_orderstatus") == "F", 3)
             .when(F.col("o_orderstatus") == "P", 2)
             .when(F.col("o_orderstatus") == "O", 1)
             .otherwise(6))
    return (o.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("status_rank", rank)
            .select("o_orderstatus", "status_rank", "n")
            .orderBy("status_rank"))


@q("union_order_segments", """
SELECT o_orderkey, o_totalprice, 'urgent' AS segment FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus <> 'F'
UNION ALL
SELECT o_orderkey, o_totalprice, 'big' AS segment FROM orders
WHERE o_totalprice > 400000 AND (o_orderstatus = 'F' OR o_orderpriority = '5-LOW')
""")
def union_order_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 + P7/P9: schema-aligned UNION ALL of two filtered branches with
    IN-lists and AND/OR combinators — users_api_batch.pipe:40-44,
    passengers_by_flight_status.pipe:24-26."""
    o = load_table(spark, sf_dir, "orders")
    urgent = (o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
                       & (F.col("o_orderstatus") != "F"))
              .select("o_orderkey", "o_totalprice", F.lit("urgent").alias("segment")))
    big = (o.filter((F.col("o_totalprice") > 400000)
                    & ((F.col("o_orderstatus") == "F") | (F.col("o_orderpriority") == "5-LOW")))
           .select("o_orderkey", "o_totalprice", F.lit("big").alias("segment")))
    return urgent.unionByName(big)


@q("part_supplier_analysis", """
SELECT p.p_brand, p.p_type,
       count(DISTINCT l.l_suppkey) AS n_suppliers,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size IN (1, 5, 9, 14, 23) AND l.l_returnflag <> 'R'
GROUP BY p.p_brand, p.p_type
""")
def part_supplier_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/A2/P7: fact-to-dim broadcast join + exact count distinct +
    IN-list/inequality filters (TPC-H Q16 shape on reference operators)."""
    li = load_table(spark, sf_dir, "lineitem")
    # no forced broadcast: part scales with SF (unlike nation/region's
    # fixed 25/5 rows), so the hint is AQE's call — it still picks a
    # broadcast whenever the filtered slice is under the threshold
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_size").isin(1, 5, 9, 14, 23)))
    return (li.filter(F.col("l_returnflag") != "R")
            .join(p, li["l_partkey"] == p["p_partkey"])
            .groupBy("p_brand", "p_type")
            .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
                 dec_sum("l_quantity").alias("total_qty")))


@q("lineitem_ship_minute_projection", """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)) AS DOUBLE) AS charged,
       year(l_shipdate) AS ship_year
FROM lineitem
WHERE l_shipdate IS NOT NULL AND l_quantity >= 30 AND l_discount BETWEEN 0.05 AND 0.07
""")
def lineitem_ship_minute_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P5/P6 + F7/F18: pure projection+filter — pushed to the parquet
    scan (PushedFilters + pruned ReadSchema; SURVEY §4), arithmetic in
    whole-stage codegen. Exact decimal output for oracle parity."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate").isNotNull()
                      & (F.col("l_quantity") >= 30)
                      & F.col("l_discount").between(0.05, 0.07))
            .select("l_orderkey", "l_linenumber",
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))
                     * (1 + F.col("l_tax"))).cast("decimal(18,6)").cast("double").alias("charged"),
                    F.year("l_shipdate").cast("long").alias("ship_year")))


@q("airport_status_board", """
WITH anchor AS (SELECT max(CAST(ts AS TIMESTAMP)) AS now_ts FROM events),
flights AS (
  SELECT CAST(user_id % 20 + 1 AS SMALLINT) AS id,
         concat('FL', lpad(CAST(user_id % 20 + 1 AS VARCHAR), 2, '0')) AS flight_number,
         list_extract(['open','closed','boarding','boarded','departed'],
                      CAST(user_id % 20 AS INT) % 5 + 1) AS status,
         CAST(count(DISTINCT user_id) AS SMALLINT) AS passenger_count,
         CASE WHEN CAST(user_id % 20 AS INT) % 5 = 4
              THEN (SELECT now_ts - INTERVAL 10 SECOND FROM anchor) END AS departed_at
  FROM events GROUP BY user_id % 20
),
passengers AS (
  SELECT CAST(user_id AS INT) AS id,
         CAST(user_id % 20 + 1 AS SMALLINT) AS flight_id,
         CASE event_type WHEN 'signup' THEN 'onboarded'
                         WHEN 'error' THEN 'notboarded'
                         WHEN 'purchase' THEN 'idle'
                         ELSE 'checkedin' END AS status
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
-- passengers_by_flight_status.pipe:4-38 verbatim logic
SELECT f.flight_number,
       f.status AS flight_status,
       CAST(f.passenger_count AS BIGINT) AS booked,
       count(CASE WHEN p.status = 'checkedin' AND f.status IN ('open','closed') THEN 1 END) AS checkedin,
       count(CASE WHEN p.status = 'checkedin' AND f.status = 'boarding' THEN 1 END) AS boarding,
       count(CASE WHEN p.status = 'onboarded' AND f.status IN ('boarding','boarded','departed') THEN 1 END) AS onboarded,
       count(CASE WHEN p.status = 'notboarded' AND f.status IN ('boarded','departed') THEN 1 END) AS notboarded,
       f.passenger_count - (
         count(CASE WHEN p.status = 'checkedin' AND f.status IN ('open','closed') THEN 1 END)
         + count(CASE WHEN p.status = 'checkedin' AND f.status = 'boarding' THEN 1 END)
         + count(CASE WHEN p.status = 'onboarded' AND f.status IN ('boarding','boarded','departed') THEN 1 END)
         + count(CASE WHEN p.status = 'notboarded' AND f.status IN ('boarded','departed') THEN 1 END)
       ) AS notcheckedin
FROM flights f
LEFT JOIN passengers p ON p.flight_id = f.id
WHERE f.status <> 'departed'
   OR (f.status = 'departed'
       AND f.departed_at > (SELECT now_ts - INTERVAL 20 SECOND FROM anchor))
GROUP BY f.flight_number, f.passenger_count, f.status
""")
def airport_status_board(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The airport kit's most complex pipe — passengers_by_flight_status
    (left join + 4 conditional-count buckets + derived notcheckedin +
    departed-recently exclusion) — run as the ACTUAL product pipe code
    over an events-derived flights/passengers CDC mapping, verified
    against a verbatim SQL translation of the reference pipe."""
    from ..core.clock import Clock
    from .airport import register_airport_pipes

    ev = load_table(spark, sf_dir, "events")
    anchor = cached_scalar(spark, sf_dir, "max_ts",
                           lambda: ev.agg(F.max("ts")).first()[0])
    bucket = (F.col("user_id") % 20).cast("int")
    flights_status = F.element_at(
        F.array(*[F.lit(s) for s in
                  ("open", "closed", "boarding", "boarded", "departed")]),
        bucket % 5 + 1)
    flights_raw = (ev.groupBy((F.col("user_id") % 20 + 1).cast("smallint").alias("id"))
                   .agg(F.countDistinct("user_id").cast("smallint").alias("passenger_count"),
                        F.min("ts").alias("created_at"),
                        F.max("ts").alias("updated_at"),
                        F.max("ts").alias("__timestamp"))
                   .withColumn("flight_number",
                               F.concat(F.lit("FL"), F.lpad((F.col("id")).cast("string"), 2, "0")))
                   .withColumn("status", F.element_at(
                       F.array(*[F.lit(s) for s in
                                 ("open", "closed", "boarding", "boarded", "departed")]),
                       ((F.col("id") - 1) % 5 + 1).cast("int")))
                   .withColumn("departed_at",
                               F.when(F.col("status") == "departed",
                                      F.lit(anchor) - F.expr("INTERVAL 10 SECOND")))
                   .withColumn("closed_at", F.lit(None).cast("timestamp"))
                   .withColumn("boarding_at", F.lit(None).cast("timestamp"))
                   .withColumn("boarded_at", F.lit(None).cast("timestamp")))
    pax_status = (F.when(F.col("event_type") == "signup", "onboarded")
                  .when(F.col("event_type") == "error", "notboarded")
                  .when(F.col("event_type") == "purchase", "idle")
                  .otherwise("checkedin"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    passengers_raw = (ev.withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") == 1)
                      .select(F.col("user_id").cast("int").alias("id"),
                              (F.col("user_id") % 20 + 1).cast("smallint").alias("flight_id"),
                              pax_status.alias("status"),
                              F.col("ts").alias("created_at"),
                              F.col("ts").alias("updated_at"),
                              F.lit(None).cast("timestamp").alias("notboarded_at"),
                              F.lit(None).cast("timestamp").alias("checkedin_at"),
                              F.lit(None).cast("timestamp").alias("onboarded_at"),
                              F.col("ts").alias("__timestamp")))
    reg = Registry(spark)
    reg.add_datasource("flights_raw", flights_raw)
    reg.add_datasource("passengers_raw", passengers_raw)
    reg.add_datasource("baggage_raw", passengers_raw)  # unused by this pipe
    register_airport_pipes(reg)
    out = reg.endpoint("passengers_by_flight_status", clock=Clock.fixed(anchor))
    return out.withColumn("booked", F.col("booked").cast("long"))


@q("airport_missed_pct_series", """
WITH anchor AS (SELECT max(CAST(ts AS TIMESTAMP)) AS now_ts FROM events),
flights AS (
  SELECT CAST(user_id % 20 + 1 AS SMALLINT) AS id,
         CAST(count(DISTINCT user_id) AS SMALLINT) AS passenger_count,
         CASE WHEN CAST(user_id % 20 AS INT) % 3 = 0 THEN NULL
              ELSE (SELECT now_ts FROM anchor)
                   - to_minutes(CAST(user_id % 20 AS INT) * 7 % 55)
                   - to_seconds(11) END AS closed_at
  FROM events GROUP BY user_id % 20
),
passengers AS (
  SELECT CAST(user_id AS INT) AS id,
         CAST(user_id % 20 + 1 AS SMALLINT) AS flight_id,
         CASE event_type WHEN 'error' THEN 'notboarded' ELSE 'onboarded' END AS status
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
),
-- flights_missed_pct_minute.pipe node 0
node0 AS (
  SELECT f.closed_at, f.passenger_count AS booked_passengers,
         count(p.id) AS missed_passengers
  FROM flights f JOIN passengers p ON p.flight_id = f.id
  WHERE f.closed_at IS NOT NULL AND p.status = 'notboarded'
  GROUP BY f.id, f.closed_at, f.passenger_count
),
-- node 1: pct per minute inside the [now-1h, now] param window
node1 AS (
  SELECT date_trunc('minute', closed_at) AS window,
         round(coalesce(sum(missed_passengers) * 100
               / nullif(sum(booked_passengers), 0), 0), 2) AS flights_missed_pct
  FROM node0, anchor
  WHERE closed_at >= now_ts - INTERVAL 1 HOUR AND closed_at <= now_ts
  GROUP BY 1
),
-- node 2: 61-minute gap-filled series
series AS (
  SELECT unnest(generate_series(date_trunc('minute', now_ts) - INTERVAL 1 HOUR,
                                date_trunc('minute', now_ts),
                                INTERVAL 1 MINUTE)) AS series_time
  FROM anchor
)
SELECT s.series_time AS time_interval,
       coalesce(n.flights_missed_pct, 0) AS flights_missed_pct
FROM series s LEFT JOIN node1 n ON s.series_time = n.window
""")
def airport_missed_pct_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flights_missed_pct_minute — the reference's most intricate pipe
    (3 nodes: join+agg, windowed pct with nullIf guard, scalar-CTE
    61-minute gap-filled series; flights_missed_pct_minute.pipe:4-60) —
    run as the ACTUAL product pipe over an events-derived mapping with
    the clock frozen at max(ts). Some flights carry NULL closed_at and
    some minutes are empty, exercising both exclusion and zero-fill."""
    from ..core.clock import Clock
    from .airport import register_airport_pipes

    ev = load_table(spark, sf_dir, "events")
    anchor = cached_scalar(spark, sf_dir, "max_ts",
                           lambda: ev.agg(F.max("ts")).first()[0])
    fid = (F.col("user_id") % 20 + 1).cast("smallint")
    flights_raw = (ev.groupBy(fid.alias("id"))
                   .agg(F.countDistinct("user_id").cast("smallint").alias("passenger_count"),
                        F.min("ts").alias("created_at"),
                        F.max("ts").alias("updated_at"),
                        F.max("ts").alias("__timestamp"))
                   .withColumn("closed_at", F.when(
                       ((F.col("id") - 1) % 3) == 0, F.lit(None).cast("timestamp"))
                       .otherwise(F.lit(anchor)
                                  - ((F.col("id") - 1) * 7 % 55)
                                  * F.expr("INTERVAL 1 MINUTE")
                                  - F.expr("INTERVAL 11 SECOND")))
                   .withColumn("flight_number", F.concat(F.lit("FL"), F.col("id")))
                   .withColumn("status", F.lit("closed"))
                   .withColumn("departed_at", F.lit(None).cast("timestamp"))
                   .withColumn("boarding_at", F.lit(None).cast("timestamp"))
                   .withColumn("boarded_at", F.lit(None).cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    passengers_raw = (ev.withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") == 1)
                      .select(F.col("user_id").cast("int").alias("id"),
                              fid.alias("flight_id"),
                              F.when(F.col("event_type") == "error", "notboarded")
                               .otherwise("onboarded").alias("status"),
                              F.col("ts").alias("created_at"),
                              F.col("ts").alias("updated_at"),
                              F.lit(None).cast("timestamp").alias("notboarded_at"),
                              F.lit(None).cast("timestamp").alias("checkedin_at"),
                              F.lit(None).cast("timestamp").alias("onboarded_at"),
                              F.col("ts").alias("__timestamp")))
    reg = Registry(spark)
    reg.add_datasource("flights_raw", flights_raw)
    reg.add_datasource("passengers_raw", passengers_raw)
    reg.add_datasource("baggage_raw", passengers_raw)  # unused by this pipe
    register_airport_pipes(reg)
    return reg.endpoint("flights_missed_pct_minute", clock=Clock.fixed(anchor))


@q("users_api_batch_live", """
WITH anchor AS (SELECT max(CAST(ts AS TIMESTAMP)) AS now_ts FROM events),
users_raw AS (
  SELECT CAST(user_id AS SMALLINT) AS id,
         concat('user-', user_id) AS name,
         concat(user_id, '@x.com') AS email,
         'addr' AS address, '555' AS phone_number,
         CAST(CASE WHEN value > 250 THEN 1 ELSE 0 END AS SMALLINT) AS email_verified,
         CAST(0 AS SMALLINT) AS onboarded,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS SMALLINT) AS deleted,
         substr(event_type, 1, 2) AS lang,
         epoch_us(CAST(ts AS TIMESTAMP)) AS created_at,
         epoch_us(CAST(ts AS TIMESTAMP)) AS updated_at,
         CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS __timestamp
  FROM events
),
wm AS (SELECT epoch_us(now_ts - INTERVAL 7 DAY) AS last_batch_ts FROM anchor),
-- previous snapshot: argMax state of events at/before the watermark,
-- stamped batch_max_updated = watermark (the seeded users_batch table)
users_batch AS (
  SELECT id, name, email, address, phone_number, email_verified, onboarded,
         deleted, __timestamp AS event_timestamp, lang,
         make_timestamp(created_at) AS created_at,
         updated_at AS updated_at_unix,
         (SELECT last_batch_ts FROM wm) AS batch_max_updated
  FROM users_raw, wm WHERE updated_at <= wm.last_batch_ts
  QUALIFY row_number() OVER (PARTITION BY id
                             ORDER BY updated_at DESC, __timestamp DESC) = 1
),
-- users_api_batch.pipe get_new_events (no coalesce defaults)
new_events AS (
  SELECT id, name, email, address, phone_number, email_verified, onboarded,
         deleted, __timestamp AS event_timestamp, lang,
         make_timestamp(created_at) AS created_at,
         updated_at AS updated_at_unix
  FROM users_raw, wm WHERE updated_at > wm.last_batch_ts
  QUALIFY row_number() OVER (PARTITION BY id
                             ORDER BY updated_at DESC, __timestamp DESC) = 1
),
-- backfill_last_batch: previous-snapshot rows whose id did not change
backfill AS (
  SELECT id, name, email, address, phone_number, email_verified, onboarded,
         deleted, event_timestamp, lang, created_at, updated_at_unix
  FROM users_batch
  WHERE batch_max_updated = (SELECT last_batch_ts FROM wm)
    AND id NOT IN (SELECT id FROM new_events)
),
-- produce_api: SELECT * EXCEPT(...), µs → timestamp
produced AS (
  SELECT id, name, email, address, phone_number, email_verified, onboarded,
         deleted, event_timestamp, lang, created_at,
         make_timestamp(updated_at_unix) AS updated_at
  FROM backfill
  UNION ALL
  SELECT id, name, email, address, phone_number, email_verified, onboarded,
         deleted, event_timestamp, lang, created_at,
         make_timestamp(updated_at_unix) AS updated_at
  FROM new_events
)
-- api_publish: deleted = false, order by id
SELECT * FROM produced WHERE deleted = 0
""")
def users_api_batch_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """users_api_batch.pipe end-to-end as ACTUAL product code: seeded
    previous snapshot (users_batch) + fresh events → watermark scalar,
    argMax reconstruct of changed ids, NOT-IN backfill, EXCEPT reshape
    with µs→timestamp, soft-delete filter, ORDER BY id. The full live
    read path of §3.3's incremental-snapshot algorithm."""
    from .framework import Registry as _Reg
    from .users import register_users_pipes

    ev = load_table(spark, sf_dir, "events")
    anchor = cached_scalar(spark, sf_dir, "max_ts",
                           lambda: ev.agg(F.max("ts")).first()[0])
    users_raw = ev.select(
        F.col("user_id").cast("smallint").alias("id"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("name"),
        F.concat(F.col("user_id"), F.lit("@x.com")).alias("email"),
        F.lit("addr").alias("address"), F.lit("555").alias("phone_number"),
        F.when(F.col("value") > 250, 1).otherwise(0).cast("smallint").alias("email_verified"),
        F.lit(0).cast("smallint").alias("onboarded"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
         .cast("smallint").alias("deleted"),
        F.substring("event_type", 1, 2).alias("lang"),
        F.unix_micros(F.col("ts")).alias("created_at"),
        F.unix_micros(F.col("ts")).alias("updated_at"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("__timestamp"),
    )
    import datetime as _dt

    wm_us = int(((anchor - _dt.timedelta(days=7))
                 - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    w = Window.partitionBy("id").orderBy(F.col("updated_at").desc(),
                                         F.col("__timestamp").desc())
    users_batch = (users_raw.filter(F.col("updated_at") <= wm_us)
                   .withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1)
                   .select("id", "name", "email", "address", "phone_number",
                           "email_verified", "onboarded", "deleted",
                           F.col("__timestamp").alias("event_timestamp"),
                           "lang",
                           F.timestamp_micros("created_at").alias("created_at"),
                           F.col("updated_at").alias("updated_at_unix"),
                           F.lit(wm_us).alias("batch_max_updated")))
    reg = _Reg(spark)
    reg.add_datasource("users_raw", users_raw)
    reg.add_datasource("users_batch", users_batch)
    register_users_pipes(reg)
    return reg.endpoint("users_api_batch")


@q("supplier_part_coverage", """
SELECT n.n_name AS nation,
       count(DISTINCT s.s_suppkey) AS n_suppliers,
       count(DISTINCT l.l_partkey) AS n_parts_shipped,
       CAST(sum(CAST(s.s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
GROUP BY n.n_name
""")
def supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/A2 on the supplier dimension (completes coverage of every
    testdata table), decomposed instead of expanded: the SQL's left
    join multiplies s_acctbal by the supplier's lineitem count and runs
    two count-distincts over the 2×|lineitem| expansion (×3 again via
    the multi-distinct Expand). Here the fact table reduces FIRST —
    per-supplier lineitem counts and distinct (suppkey, partkey) pairs
    ride ONE suppkey exchange — and the outer-join arithmetic becomes
    acctbal × max(1, c) per supplier, exact in DECIMAL (integer-scaled
    decimal multiplication IS repeated addition, so the oracle's
    expansion-sum matches bit-for-bit). Nothing lineitem-sized is ever
    joined or expanded; the preserved-small-side outer join (which no
    engine can broadcast) disappears entirely."""
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    sn = (s.join(n, s["s_nationkey"] == n["n_nationkey"])
          .select("s_suppkey", F.col("n_name").alias("nation"),
                  "s_acctbal"))
    # r14 (guide §2.3): aggregate straight off the scan. The previous
    # shape repartitioned the fact scan and pre-deduped (suppkey,
    # partkey) before a countDistinct that dedups again — the double
    # dedup over the exchanged stream profiled at 23.5 task-CPU-s and
    # the parts side alone A/B'd 4.49 s vs 1.58 s for this shape. Both
    # reduces are partial aggregates pipelined into the scan task; the
    # shuffles carry only (nation|suppkey)-keyed partials.
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey",
                                                      "l_partkey")
    per_supp = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("__c"))
    bal = (sn.join(per_supp, sn["s_suppkey"] == per_supp["l_suppkey"], "left")
           .groupBy("nation")
           .agg(F.countDistinct("s_suppkey").alias("n_suppliers"),
                F.sum(F.col("s_acctbal").cast("decimal(38,6)")
                      * F.coalesce("__c", F.lit(1)).cast("long"))
                 .cast("double").alias("total_acctbal")))
    parts = (li.join(F.broadcast(sn.select("s_suppkey", "nation")),
                     li["l_suppkey"] == sn["s_suppkey"])
             .groupBy("nation")
             .agg(F.countDistinct("l_partkey").alias("n_parts_shipped")))
    return (bal.join(parts, "nation", "left")
            .select("nation", "n_suppliers",
                    F.coalesce("n_parts_shipped", F.lit(0)).cast("long")
                    .alias("n_parts_shipped"),
                    "total_acctbal"))


@q("pipe_node_dag", """
WITH node0 AS (
  SELECT user_id, event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute
  FROM events, (SELECT max(ts) AS now_ts FROM events) anchor
  WHERE ts > now_ts - INTERVAL 2 HOUR
),
node1 AS (
  SELECT minute AS time_interval, count(DISTINCT user_id) AS active_users
  FROM node0 GROUP BY minute
),
node2 AS (
  SELECT minute AS time_interval, count(*) AS errors
  FROM node0 WHERE event_type = 'error' GROUP BY minute
)
SELECT n1.time_interval, n1.active_users, n2.errors
FROM node1 n1 JOIN node2 n2 ON n1.time_interval = n2.time_interval
""")
def pipe_node_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 pipe/node framework end-to-end through the driver gate: a
    4-node pipe (project → two aggregations → node-on-node join), the
    passenger_activity.pipe shape, resolved via the Registry with a
    frozen data-anchored clock. Catalyst sees ONE composed plan across
    all nodes (cross-node reuse is inlined and optimized globally)."""
    from ..core.clock import Clock

    ev = load_table(spark, sf_dir, "events")
    anchor = cached_scalar(spark, sf_dir, "max_ts",
                           lambda: ev.agg(F.max("ts")).first()[0])

    def node0(ctx: Context) -> DataFrame:
        now = ctx.clock.now_col()
        return (ctx.ref("events")
                .filter(F.col("ts") > now - F.expr("INTERVAL 2 HOUR"))
                .select("user_id", "event_type",
                        to_start_of_minute("ts").alias("minute")))

    def node1(ctx: Context) -> DataFrame:
        return (ctx.ref("node0")
                .groupBy(F.col("minute").alias("time_interval"))
                .agg(F.countDistinct("user_id").alias("active_users")))

    def node2(ctx: Context) -> DataFrame:
        return (ctx.ref("node0").filter(F.col("event_type") == "error")
                .groupBy(F.col("minute").alias("time_interval"))
                .agg(F.count(F.lit(1)).alias("errors")))

    def node3(ctx: Context) -> DataFrame:
        return (ctx.ref("node1").join(ctx.ref("node2"), "time_interval")
                .select("time_interval", "active_users", "errors"))

    reg = Registry(spark)
    reg.add_datasource("events", ev)
    reg.add_pipe(Pipe("activity", [Node("node0", node0), Node("node1", node1),
                                   Node("node2", node2), Node("node3", node3)]))
    return reg.endpoint("activity", clock=Clock.fixed(anchor))


@q("users_mv_rmt_endpoint", """
WITH users_raw AS (
  -- PG-connector-shaped CDC log derived from events: key=user_id,
  -- version=epoch-µs ts, nullable payload columns, __timestamp=arrival
  SELECT CAST(user_id AS SMALLINT) AS id,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE concat('user-', user_id) END AS name,
         concat(user_id, '@example.com') AS email,
         CASE WHEN value > 250 THEN CAST(1 AS SMALLINT)
              ELSE CAST(0 AS SMALLINT) END AS email_verified,
         CASE WHEN event_type = 'purchase' THEN CAST(1 AS SMALLINT)
              ELSE CAST(0 AS SMALLINT) END AS deleted,
         CASE WHEN event_type IS NULL THEN NULL ELSE substr(event_type, 1, 2) END AS lang,
         epoch_us(CAST(ts AS TIMESTAMP)) AS created_at,
         CASE WHEN event_id % 97 = 0 THEN NULL
              ELSE epoch_us(CAST(ts AS TIMESTAMP)) END AS updated_at,
         CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS __timestamp
  FROM events
),
mv AS (
  -- users_mv.pipe:4-17: coalesce defaults, µs→timestamp, FixedString(2)
  SELECT id,
         coalesce(name, '') AS name,
         coalesce(email, '') AS email,
         coalesce(email_verified, 0) AS email_verified,
         coalesce(deleted, 0) AS deleted,
         __timestamp AS event_timestamp,
         substr(coalesce(lang, ''), 1, 2) AS lang,
         make_timestamp(coalesce(created_at, 0)) AS created_at,
         coalesce(make_timestamp(updated_at), __timestamp) AS updated_at,
         __timestamp
  FROM users_raw
)
-- users_api_rmt.pipe:6-7: SELECT * FROM users_latest FINAL ORDER BY id
SELECT id, name, email, email_verified, deleted, event_timestamp, lang,
       created_at, updated_at
FROM mv
QUALIFY row_number() OVER (PARTITION BY id
                           ORDER BY updated_at DESC, __timestamp DESC) = 1
""")
def users_mv_rmt_endpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The users kit's real code path through the correctness gate:
    a PG-connector-shaped CDC log (nullable columns, epoch-µs Int64
    versions, NULL-version rows — SURVEY §1.3) is derived from the
    events table, then runs the ACTUAL ``users_mv_pg`` transform
    (coalesce defaults / µs conversion / FixedString) and the
    VersionedTable FINAL dedup + ORDER BY id endpoint
    (users_mv.pipe:4-17 → users_api_rmt.pipe:6-7)."""
    from ..sources.tables import VersionedTable
    from .users import users_mv_pg

    ev = load_table(spark, sf_dir, "events")
    users_raw = ev.select(
        F.col("user_id").cast("smallint").alias("id"),
        F.when(F.col("event_type") == "error", F.lit(None))
         .otherwise(F.concat(F.lit("user-"), F.col("user_id"))).alias("name"),
        F.concat(F.col("user_id"), F.lit("@example.com")).alias("email"),
        F.lit(None).cast("string").alias("address"),
        F.lit(None).cast("string").alias("phone_number"),
        F.when(F.col("value") > 250, 1).otherwise(0).cast("smallint").alias("email_verified"),
        F.lit(0).cast("smallint").alias("onboarded"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
         .cast("smallint").alias("deleted"),
        F.substring("event_type", 1, 2).alias("lang"),
        F.unix_micros(F.col("ts")).alias("created_at"),
        F.when(F.col("event_id") % 97 == 0, F.lit(None))
         .otherwise(F.unix_micros(F.col("ts"))).alias("updated_at"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("__timestamp"),
    )
    mv = users_mv_pg(users_raw)
    vt = VersionedTable(spark, path="<in-memory>", key=["id"],
                        version="updated_at", tiebreak=["__timestamp"])
    latest = vt.dedup(mv)
    return latest.select("id", "name", "email", "email_verified", "deleted",
                         "event_timestamp", "lang", "created_at", "updated_at")


@q("orders_rollup_summary", """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""")
def orders_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation (A-family completion): order counts and
    decimal-exact revenue at (priority, status), per-priority subtotal,
    and grand-total levels in ONE pass via GROUP BY ROLLUP. The
    grouping() indicator columns disambiguate subtotal rows from
    natural NULL key values — required for an exact cross-engine hash
    (both engines emit NULL for rolled-up levels).

    Scale path: ROLLUP compiles to a single Expand + hash aggregate —
    one shuffle carrying (levels × groups) partial rows with map-side
    combine, not one job per level."""
    o = load_table(spark, sf_dir, "orders")
    return (o.rollup("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dec_sum("o_totalprice").alias("total_price"),
                 F.grouping("o_orderpriority").cast("long").alias("g_priority"),
                 F.grouping("o_orderstatus").cast("long").alias("g_status"))
            .select("o_orderpriority", "o_orderstatus", "g_priority",
                    "g_status", "n_orders", "total_price"))


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@q("events_type_pivot", f"""
SELECT user_id,
       {", ".join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
                  f" AS n_{t}" for t in _PIVOT_TYPES)},
       {" + ".join(f"CAST(count(*) FILTER (WHERE event_type = '{t}')"
                   f" AS BIGINT)" for t in _PIVOT_TYPES)} AS n_profiled
FROM events GROUP BY user_id
""")
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-entity activity profile via the relational PIVOT: one
    row per user with a count column per event type — the
    feature-table shape (one entity row, one column per behavior)
    that activation dashboards and feature stores consume.

    Spark's ``groupBy().pivot(values).agg`` with an EXPLICIT value
    list plans the standard two-phase pivot: a combinable
    (user, type) aggregate collapses raw events map-side, then the
    pivot aggregate regroups the already-aggregated ≤ users×types
    rows — the second exchange never carries event-sized data. An
    implicit pivot (no value list) would add a collect-distinct job
    and make the output schema data-dependent — both wrong at 100 TB,
    so the explicit list is the only form offered. Integer counts end
    to end; absent cells coalesce to 0; ``n_profiled`` sums the
    listed columns on BOTH sides (a plain count(*) would silently
    diverge if an unlisted type appeared)."""
    e = load_table(spark, sf_dir, "events")
    wide = (e.groupBy("user_id")
            .pivot("event_type", _PIVOT_TYPES)
            .agg(F.count(F.lit(1))))
    n_total = None
    for t in _PIVOT_TYPES:
        c = F.coalesce(F.col(t), F.lit(0)).cast("long")
        n_total = c if n_total is None else n_total + c
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
          for t in _PIVOT_TYPES],
        n_total.cast("long").alias("n_profiled"))


@q("events_type_hour_cube", """
SELECT event_type,
       CAST(hour(ts) AS BIGINT) AS hr,
       CAST(grouping(event_type) AS BIGINT) AS g_type,
       CAST(grouping(hour(ts)) AS BIGINT) AS g_hour,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, hour(ts))
""")
def events_type_hour_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heat-map aggregation via GROUP BY CUBE: event counts
    and decimal-exact value mass per (type, hour-of-day) cell, both
    one-dimensional marginals, and the grand total — completing the
    multi-level-aggregation family (ROLLUP: orders_rollup_summary,
    GROUPING SETS: corpus_stats_report; CUBE is GROUPING SETS over the
    full power set). grouping() indicators disambiguate marginal rows.

    Scale path: one Expand (×4) + one partially-aggregatable hash
    exchange for all four levels — key space types × 24 cells, so the
    combine collapses each map partition to ≤ 4·|cells| rows
    regardless of event volume."""
    e = (load_table(spark, sf_dir, "events")
         .select("event_type", F.hour("ts").alias("hr"), "value"))
    return (e.cube("event_type", "hr")
            .agg(F.grouping("event_type").cast("long").alias("g_type"),
                 F.grouping("hr").cast("long").alias("g_hour"),
                 F.count(F.lit(1)).alias("n_events"),
                 dec_sum("value").alias("total_value"))
            .select("event_type", F.col("hr").cast("long").alias("hr"),
                    "g_type", "g_hour", "n_events", "total_value"))


@q("events_limit3_by_user", """
SELECT user_id, CAST(rn AS BIGINT) AS recency_rank, event_id, event_type,
       value, CAST(ts AS TIMESTAMP) AS ts
FROM (
  -- rank on MICROSECOND-truncated ts so both engines see the same
  -- precision (Spark reads the NANOS parquet via a µs conversion;
  -- ranking raw nanos here would silently diverge on same-µs
  -- different-ns events — ADVICE r6)
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                        event_id DESC) AS rn
  FROM events
)
WHERE rn <= 3
""")
def events_limit3_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 generalized: ClickHouse `LIMIT n BY key` for n > 1 — the last
    3 events per user with an explicit recency rank (the activity-feed
    query every CDC consumer serves; `cdc_latest_row_per_key` is the
    n = 1 special case).

    Scale path: identical to D1 — ONE hash shuffle on the key, then a
    per-key bounded window (rank state = n rows per key, never the full
    history); at scale the window evaluates per partition after the
    exchange, so no global sort exists anywhere. Total order (ts DESC,
    event_id DESC) makes every rank engine-deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (ev.withColumn("recency_rank", F.row_number().over(w))
            .filter(F.col("recency_rank") <= 3)
            .select("user_id",
                    F.col("recency_rank").cast("long").alias("recency_rank"),
                    "event_id", "event_type", "value", "ts"))


@q("shipping_priority_topk", """
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
  AND l.l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""")
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped-revenue top-10 for one
    market segment — the canonical fact-fact-dim join + aggregate +
    top-k that exercises the optimizer end to end (segment filter on
    the dim, date filters pushed into BOTH fact scans, join order, and
    a bounded TakeOrdered instead of a global sort).

    Scale path: both date predicates push to the parquet scans
    (min/max pruning drops whole files); the segment-filtered customer
    side broadcasts (1/5 of a dim table — at 100 TB still MBs); the
    orders⋈lineitem join shuffles on orderkey, which ALSO serves the
    groupBy (one exchange, AQE coalesced); top-10 is a distributed
    TakeOrdered heap. Exactness: revenue products round once in IEEE
    double then sum in DECIMAL(38,6) (chcompat.dec_sum rule); (revenue
    DESC, o_orderdate, l_orderkey) totally orders the result."""
    cutoff = F.lit("1996-01-01").cast("timestamp")
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING")
         .select("c_custkey"))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") < cutoff)
         .select("o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(o.join(F.broadcast(c),
                           o["o_custkey"] == c["c_custkey"]),
                    li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum((F.col("l_extendedprice")
                        * (1 - F.col("l_discount")))
                       .cast("decimal(38,6)")).cast("double")
                 .alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate",
                    "o_orderpriority")
            .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
            .limit(10))


@q("users_customer_reconciliation", """
WITH e AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
c AS (SELECT c_custkey, c_acctbal FROM customer)
SELECT coalesce(e.user_id, c.c_custkey) AS entity_id,
       CAST(CASE WHEN e.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS in_events,
       CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS in_customers,
       CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events,
       c.c_acctbal AS acctbal
FROM e FULL OUTER JOIN c ON c.c_custkey = e.user_id
""")
def users_customer_reconciliation(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Cross-system reconciliation via FULL OUTER join — the audit
    query run when two systems (here the CDC event stream and the
    warehouse customer master) are supposed to describe the same
    entity set: every id from EITHER side appears exactly once, with
    presence flags and per-side facts, so "in A not B" / "in B not A" /
    "in both" all fall out of one result. Completes the join-type
    surface (inner / left / anti / semi / cross / as-of already
    covered) with the one shape none of them can express — both
    unmatched sides at once.

    Scale path: the event side reduces to per-key counts BEFORE the
    join (partial-agg shuffle), so the full outer joins two key-sized
    tables co-partitioned on the id — a full outer can never broadcast
    (both sides' unmatched rows must survive), which is exactly why
    the pre-aggregation matters at 100 TB. Exactness: int64 counts and
    flags; acctbal passes through untouched (exact double)."""
    e = (load_table(spark, sf_dir, "events")
         .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")))
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_acctbal")
    return (e.join(c, e["user_id"] == c["c_custkey"], "full_outer")
            .select(
                F.coalesce("user_id", "c_custkey").alias("entity_id"),
                F.when(F.col("user_id").isNull(), 0).otherwise(1)
                .cast("long").alias("in_events"),
                F.when(F.col("c_custkey").isNull(), 0).otherwise(1)
                .cast("long").alias("in_customers"),
                F.coalesce("n_events", F.lit(0)).cast("long")
                .alias("n_events"),
                F.col("c_acctbal").alias("acctbal")))


@q("orders_large_volume_topk", """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY b.total_qty DESC, o.o_orderkey
LIMIT 100
""")
def orders_large_volume_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total line
    quantity exceeds 300, with their customer — the canonical
    HAVING-filtered aggregate feeding a join funnel (the optimizer
    must reduce the FACT table before any join, which is the whole
    trick: the filtered aggregate is tiny, so both joins broadcast it
    into the dimension scans instead of shuffling orders/customer).

    Scale path: lineitem reduces FIRST via one combinable groupBy on
    its own key (map-side partials shrink each task to its distinct
    orderkeys); the HAVING survivor set is a fraction of a percent of
    orders, so it broadcasts into the orders join and the result into
    customer — at 100 TB nothing but the initial aggregate shuffles
    corpus-scale data. The broadcast decision is left to AQE/the
    threshold (no explicit hint — ADVICE r7): the survivor aggregate
    still GROWS with SF, so a forced ``F.broadcast`` would bypass the
    64 MB guard and OOM the driver at some scale (the r2
    regional_supplier_revenue lesson); AQE's runtime size check picks
    broadcast when it actually fits and a shuffle join when it
    doesn't. Top-k is TakeOrdered, never a global sort.
    Exactness: the quantity sum runs through DECIMAL on both engines
    (dec_sum rule) and the comparison is against an exact decimal; the
    output double is one final cast. Total order: (total_qty DESC,
    o_orderkey).
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)"))
                .alias("__qty_dec"))
           .filter(F.col("__qty_dec") > 300)
           .select("l_orderkey",
                   F.col("__qty_dec").cast("double").alias("total_qty")))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (big
            .join(o, big["l_orderkey"] == o["o_orderkey"])
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    "o_totalprice", "total_qty")
            .orderBy(F.col("total_qty").desc(), "o_orderkey")
            .limit(100))


@q("events_user_anomaly_days", """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT user_id,
         list_sort(list(n_events)) AS cs,
         count(*) AS n_days
  FROM daily GROUP BY 1
),
m AS (
  SELECT user_id, n_days,
         cs[CAST((n_days + 1) // 2 AS INTEGER)] AS med_daily
  FROM med
)
SELECT d.user_id, d.day, CAST(d.n_events AS BIGINT) AS n_events,
       CAST(m.med_daily AS BIGINT) AS median_daily,
       CAST(m.n_days AS BIGINT) AS n_active_days,
       CAST(d.n_events * 1000000 // m.med_daily AS BIGINT) AS lift_micro
FROM daily d JOIN m USING (user_id)
WHERE d.n_events > 2 * m.med_daily
""")
def events_user_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity anomaly days: days where a user's event count
    exceeds 2× their own median daily count — the robust (median-based)
    outlier rule that survives skewed users where a global mean/stddev
    threshold drowns in heavy hitters. The abuse/incident triage query
    every event warehouse serves.

    Exactness: the median is the lower-middle ORDER STATISTIC (the
    ceil(n/2)-th smallest), an exact integer on both engines — never
    the interpolated even-count average, which is a float. The flag
    and the lift are integer comparisons/floor divisions.

    Scale path: one combinable (user, day) count, then the per-user
    day-count lists are BOUNDED (≤ days in the retention window, ~30
    rows/user), so collect_list + array_sort is in-row work on a tiny
    array — no per-user sort window, no global sort; the flag join
    rides the same user-key exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id",
                        F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events")))
    m = (daily.groupBy("user_id")
         .agg(F.array_sort(F.collect_list("n_events")).alias("cs"),
              F.count(F.lit(1)).alias("n_days"))
         .select("user_id", "n_days",
                 F.expr("cs[CAST((n_days + 1) DIV 2 AS INT) - 1]")
                 .alias("med_daily")))
    return (daily.join(m, "user_id")
            .filter(F.col("n_events") > 2 * F.col("med_daily"))
            .select("user_id", "day",
                    F.col("n_events").cast("long").alias("n_events"),
                    F.col("med_daily").cast("long").alias("median_daily"),
                    F.col("n_days").cast("long").alias("n_active_days"),
                    F.expr("CAST(n_events * 1000000 DIV med_daily"
                           " AS BIGINT)").alias("lift_micro")))


@q("regional_supplier_revenue", """
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""")
def regional_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier revenue): revenue from orders where the
    supplier and the customer share a nation, per nation of one region —
    the canonical 6-table join whose defining trick is the NON-key
    equality (s_nationkey = c_nationkey) closing a cycle in the join
    graph; the optimizer must thread two independent fact→dim paths to
    the same tiny dimension.

    Scale path: the region filter reduces nation to a ≤25-row broadcast
    BEFORE any fact joins (region⋈nation is dim-side planning);
    o_orderdate pushes to the orders scan (partition/file pruning at
    scale); lineitem⋈orders⋈customer shuffle on their natural keys;
    supplier (1/10⁴ of lineitem in TPC-H proportions) joins by AQE's
    choice — no forced broadcast of a side that scales with SF (the r2
    lesson). The nation-equality predicate applies at the supplier join,
    so mismatched-nation rows die before the aggregate. Exactness:
    DECIMAL revenue sum (dec_sum rule), one final double cast; total
    order (revenue DESC, nation)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1995-01-01")
                 & (F.col("o_orderdate") < "1997-01-01")))
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nr = (load_table(spark, sf_dir, "nation")
          .join(load_table(spark, sf_dir, "region")
                .filter(F.col("r_name") == "ASIA"),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("n_nationkey", "n_name"))
    joined = (c.join(o, F.col("o_custkey") == F.col("c_custkey"))
              .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(s, (F.col("s_suppkey") == F.col("l_suppkey"))
                    & (F.col("s_nationkey") == F.col("c_nationkey")))
              .join(F.broadcast(nr),
                    F.col("n_nationkey") == F.col("c_nationkey")))
    return (joined.groupBy(F.col("n_name").alias("nation"))
            .agg(F.sum(F.expr("CAST(l_extendedprice * (1 - l_discount)"
                              " AS DECIMAL(38,6))")).alias("__rev"),
                 F.count(F.lit(1)).alias("n_lineitems"))
            .select("nation", F.col("__rev").cast("double").alias("revenue"),
                    "n_lineitems")
            .orderBy(F.col("revenue").desc(), "nation"))


@q("orders_per_customer_histogram", """
WITH co AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM co GROUP BY 1
""")
def orders_per_customer_histogram(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): the histogram of
    orders-per-customer INCLUDING the zero bucket — the count-of-counts
    query behind engagement distributions and the relational twin of
    corpus_token_spectrum's Zipf table. The zero bucket is the whole
    point: an inner join can never see customers with no orders, so the
    left join is semantically load-bearing.

    Scale path: orders pre-aggregates to (custkey, n) on ITS OWN key
    first (map-side combinable; the join input shrinks from orders to
    customers with ≥1 order), the left join runs co-partitioned on
    custkey, and the histogram groupBy reduces to ≤ max-orders rows —
    the second aggregate's key space is tiny regardless of data size.
    Exactness: pure int64 counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    per = (load_table(spark, sf_dir, "orders")
           .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")))
    co = (c.join(per, c["c_custkey"] == per["o_custkey"], "left")
          .select(F.coalesce("n", F.lit(0)).alias("n_orders")))
    return (co.groupBy("n_orders")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
            .select(F.col("n_orders").cast("long").alias("n_orders"),
                    "n_customers"))


@q("events_type_markov", """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev_type
  FROM events
),
tr AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
m AS (SELECT prev_type, sum(n) AS tot FROM tr GROUP BY 1)
SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n_transitions,
       CAST(m.tot AS BIGINT) AS n_from,
       CAST(t.n * 1000000 // m.tot AS BIGINT) AS p_micro
FROM tr t JOIN m ON m.prev_type = t.prev_type
""")
def events_type_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next | prev) with exact integer floor-div
    probabilities — the behavioral twin of the token-bigram LM
    (corpus_bigram_next_word models text; this models users), and the
    table behind next-action prediction, funnel-shortcut detection,
    and bot fingerprinting (bots have near-deterministic rows).

    Exercises `lag()` — the one sequence primitive the catalog's
    window family (row_number / min / sum / lead-in-SCD2) didn't yet
    cover on the events table. Ranking uses the µs-truncated (ts,
    event_id) total order on BOTH engines (the ADVICE r6 precision
    rule).

    Scale path: ONE user-key window exchange orders each user's
    history (per-user state only — no global sort), the transition
    count is map-side combinable on a types² key space, and the
    marginal RE-AGGREGATES the transition table (types-sized), so the
    probability join touches bounded frames only."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    seq = ev.select("user_id", "event_type",
                    F.lag("event_type").over(w).alias("prev_type"))
    tr = (seq.filter(F.col("prev_type").isNotNull())
          .groupBy("prev_type", F.col("event_type").alias("next_type"))
          .agg(F.count(F.lit(1)).alias("n")))
    m = tr.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (tr.join(F.broadcast(m), "prev_type")
            .select("prev_type", "next_type",
                    F.col("n").cast("long").alias("n_transitions"),
                    F.col("tot").cast("long").alias("n_from"),
                    F.expr("CAST(n * 1000000 DIV tot AS BIGINT)")
                    .alias("p_micro")))


@q("returned_item_revenue_topk", """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       c.c_acctbal AS acctbal,
       n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_returned_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def returned_item_revenue_topk(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the 20 customers who
    returned the most revenue in a quarter — the complaint-triage /
    churn-risk report, and the classic 4-table top-k whose fact side
    shrinks twice before anything wide happens.

    Scale path: BOTH fact filters push to their scans (o_orderdate to
    orders — partition pruning at scale; l_returnflag = 'R' to
    lineitem, killing ~2/3 of the fact before the join);
    lineitem⋈orders shuffles co-partitioned on orderkey, the survivor
    set joins customer on custkey, and the ≤25-row nation dim
    broadcasts; the top-20 is orderBy().limit() →
    TakeOrderedAndProject, never a global sort. Exactness: revenue
    through DECIMAL(38,6) (the dec_sum rule) with ONE final double
    cast; acctbal is a GROUP KEY (never summed — no float accumulation
    hazard); total order (revenue DESC, c_custkey)."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R"))
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1996-04-01")))
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
              .join(c, F.col("c_custkey") == F.col("o_custkey"))
              .join(F.broadcast(n),
                    F.col("n_nationkey") == F.col("c_nationkey")))
    return (joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(F.expr("CAST(l_extendedprice * (1 - l_discount)"
                              " AS DECIMAL(38,6))")).alias("__rev"),
                 F.count(F.lit(1)).cast("long").alias("n_returned_items"))
            .select("c_custkey", "c_name",
                    F.col("__rev").cast("double").alias("revenue"),
                    F.col("c_acctbal").alias("acctbal"),
                    F.col("n_name").alias("nation"),
                    "n_returned_items")
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


@q("orders_with_returns_by_priority", """
SELECT o.o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY 1
ORDER BY 1
""")
def orders_with_returns_by_priority(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape (order-priority checking): orders in a year
    that had AT LEAST ONE returned line item, counted by priority —
    the EXISTS/semi-join surface (the testdata carries no
    l_commitdate/l_receiptdate, so the reference predicate "committed
    late" becomes "had a return"; the join SHAPE — fact-to-fact EXISTS
    decorrelated to a semi join — is the point). Completes the join
    family: inner (J1), left outer (J2), anti (J6/P8), full outer
    (users_customer_reconciliation), and now semi as a gated query.

    Scale path: both filters push to their scans; the semi join
    shuffles co-partitioned on orderkey and emits each qualifying
    order ONCE regardless of its return count (no post-join distinct —
    left_semi's semantics ARE the dedup); the priority aggregate
    reduces to ≤5 rows map-side. Exactness: int64 counts, total order
    on the priority string."""
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1997-01-01")))
    returned = (load_table(spark, sf_dir, "lineitem")
                .filter(F.col("l_returnflag") == "R")
                .select("l_orderkey"))
    return (o.join(returned, o["o_orderkey"] == returned["l_orderkey"],
                   "left_semi")
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
            .orderBy("priority"))


@q("promo_revenue_share", """
SELECT
  CAST(sum(CASE WHEN p.p_type = 'PROMO'
       THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
       ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS promo_revenue,
  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
       AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
  100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
       THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
       ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
       / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
              AS DECIMAL(38,6))) AS DOUBLE) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-07-01'
""")
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): the share of a period's revenue
    from promotional parts — the conditional-sum-over-join ratio every
    marketing dashboard runs (the testdata's p_type domain is flat
    labels, so the reference predicate LIKE 'PROMO%' is the equality).

    Scale path: the shipdate filter pushes to the lineitem scan
    (partition pruning at scale); lineitem⋈part joins by AQE's choice —
    part scales with SF, so no forced broadcast (the r2 lesson, same
    as Q5's supplier side); both conditional sums ride ONE global
    aggregate (map-side partials → a 1-row result). Exactness: both
    sums through DECIMAL(38,6) (exact integer-like accumulation in any
    partition order), each cast to DOUBLE once, and the percentage is
    the IDENTICAL IEEE tree on both engines (100.0 * promo / total —
    two exact doubles in, one rounding per operator)."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-07-01")))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))"
    agg = (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
           .agg(F.expr(f"sum(CASE WHEN p_type = 'PROMO' THEN {rev}"
                       f" ELSE CAST(0 AS DECIMAL(38,6)) END)")
                .alias("__promo"),
                F.expr(f"sum({rev})").alias("__total")))
    return agg.select(
        F.col("__promo").cast("double").alias("promo_revenue"),
        F.col("__total").cast("double").alias("total_revenue"),
        F.expr("100.0 * CAST(__promo AS DOUBLE)"
               " / CAST(__total AS DOUBLE)").alias("promo_pct"))


@q("forecast_revenue_change", """
SELECT CAST(sum(CAST(l_extendedprice * l_discount
            AS DECIMAL(38,6))) AS DOUBLE) AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the revenue a year's
    small-quantity mid-discount lines would have added had the discount
    been dropped — THE scan-efficiency marker query: no join, no group
    key, one conjunctive filter block over the fact and a single global
    sum. A warehouse that cannot run Q6 at IO speed cannot run anything.

    Scale path: every predicate (shipdate range, discount range,
    quantity bound) pushes to the parquet scan — row-group statistics
    prune before decode, partition pruning applies at scale — and the
    aggregate is map-side partials into a 1-row result: the whole plan
    is scan → filter → partial agg → ONE exchange. Exactness: the
    product sums through DECIMAL(38,6) (partition-order-independent),
    one final double cast; discount literals parse to the same doubles
    in both engines, so the BETWEEN is the identical comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1997-01-01")
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.sum(F.expr("CAST(l_extendedprice * l_discount"
                              " AS DECIMAL(38,6))")).alias("__d"),
                 F.count(F.lit(1)).cast("long").alias("n_lineitems"))
            .select(F.col("__d").cast("double").alias("revenue_delta"),
                    "n_lineitems"))


@q("part_min_cost_supplier", """
WITH eligible AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
ec AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
           AS cost
  FROM lineitem l
  JOIN eligible e ON e.s_suppkey = l.l_suppkey
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
),
argmin AS (
  SELECT l_partkey, min({'cost': cost, 'sk': l_suppkey}) AS b
  FROM ec GROUP BY 1
),
best AS (
  SELECT l_partkey, b.sk AS s_suppkey, b.cost AS min_cost FROM argmin
)
SELECT p.p_partkey, p.p_name, e.s_name AS supplier_name,
       e.n_name AS nation, e.s_acctbal AS acctbal,
       CAST(b.min_cost AS DOUBLE) AS min_cost
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN eligible e ON e.s_suppkey = b.s_suppkey
ORDER BY min_cost, p_partkey
LIMIT 100
""")
def part_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's shape (minimum-cost supplier): for each size-15 part,
    the EUROPE supplier offering it at the lowest effective price — the
    correlated scalar subquery (``cost = (SELECT min(cost) ... WHERE
    same part)``) DECORRELATED to a per-key min aggregate + join-back,
    the one classic decorrelation the catalog didn't gate yet (Q4's
    EXISTS became a semi join; this becomes argmin-per-group). The
    testdata has no partsupp table, so the offer relation is lineitem
    and ps_supplycost is the line's discounted price — the join SHAPE
    is the point (reference kit has no TPC-H; the shape completes the
    §2 join family alongside plans/analytics.py Q4/Q10/Q14).

    Scale path: the part filter (1/50 of a SF-scaling dim) reduces the
    fact FIRST via a semi join, and the region filter reduces it again
    through the supplier side — both before any aggregate; the argmin
    is ONE ordered-struct min on the fact's own key (l_partkey) —
    min(struct(cost, suppkey)) is min_by with a TOTAL ordering key —
    so the whole decorrelation costs one fact scan and one exchange
    (the equivalent min-aggregate + equality-join-back form scans the
    fact twice in Spark, which shares broadcast exchanges but not
    scans); AQE picks broadcast for the reduced semi-join sides (no
    forced broadcast on SF-scaling dims — the r2 lesson); the final
    dim joins carry ≤|filtered parts| rows; top-100 is
    TakeOrderedAndProject. Exactness: cost through DECIMAL(38,6) (the
    dec_sum rule — min is exact), lexicographic struct comparison
    makes the tiebreak min(l_suppkey)-at-equal-cost on BOTH engines,
    ONE final double cast, total order (min_cost, p_partkey)."""
    eligible = (load_table(spark, sf_dir, "supplier")
                .join(F.broadcast(load_table(spark, sf_dir, "nation")
                                  .select("n_nationkey", "n_regionkey",
                                          "n_name")),
                      F.col("n_nationkey") == F.col("s_nationkey"))
                .join(F.broadcast(load_table(spark, sf_dir, "region")
                                  .filter(F.col("r_name") == "EUROPE")
                                  .select("r_regionkey")),
                      F.col("r_regionkey") == F.col("n_regionkey"))
                .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    parts = (load_table(spark, sf_dir, "part")
             .filter(F.col("p_size") == 15))
    ec = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey",
                  F.expr("CAST(l_extendedprice * (1 - l_discount)"
                         " AS DECIMAL(38,6))").alias("cost"))
          .join(parts.select("p_partkey"),
                F.col("p_partkey") == F.col("l_partkey"), "left_semi")
          .join(eligible.select("s_suppkey"),
                F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"))
    best = (ec.groupBy("l_partkey")
            .agg(F.min(F.struct("cost", "l_suppkey")).alias("__b"))
            .select("l_partkey",
                    F.col("__b.l_suppkey").alias("s_suppkey"),
                    F.col("__b.cost").alias("min_cost")))
    return (best
            .join(parts.select("p_partkey", "p_name"),
                  F.col("p_partkey") == F.col("l_partkey"))
            .join(eligible, "s_suppkey")
            .select("p_partkey", "p_name",
                    F.col("s_name").alias("supplier_name"),
                    F.col("n_name").alias("nation"),
                    F.col("s_acctbal").alias("acctbal"),
                    F.col("min_cost").cast("double").alias("min_cost"))
            .orderBy("min_cost", "p_partkey")
            .limit(100))


@q("top_supplier_by_revenue", """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM rev r
JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
""")
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose quarter revenue
    equals the MAXIMUM per-supplier revenue — the max-of-an-aggregate
    scalar subquery, the third classic decorrelation in the catalog
    (Q4's EXISTS → semi join; Q2's per-group min → ordered-struct
    argmin; this one → aggregate once, collect the 1-row max as a
    literal, filter — the reference's own `WITH (SELECT max(...))`
    watermark pattern, users_batch_copy.pipe:10, applied to an
    aggregate instead of a column). Emits EVERY tied supplier, as the
    spec requires — an argmax-row shortcut would drop ties.

    Scale path: the shipdate filter pushes to the fact scan; revenue
    reduces map-side onto the fact's own key (supplier-count rows out);
    the max is a driver literal from that SMALL aggregate (one extra
    pass over supplier-count rows, never the fact — the fact is
    scanned ONCE); the equality filter survivors (>=1 row) join the
    supplier dim by AQE's choice. Exactness: revenue through
    DECIMAL(38,6) — the max and the equality filter compare exact
    decimals, never doubles — with ONE final double cast; total order
    on s_suppkey."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(F.expr("CAST(l_extendedprice * (1 - l_discount)"
                             " AS DECIMAL(38,6))")).alias("total_revenue"))
           # pin the reduced frame: the max fold AND the equality
           # filter both read it — without the checkpoint each would
           # re-scan the fact (the Q11/Q20 recipe)
           .localCheckpoint(eager=True))
    # scalar subquery → broadcast literal (J5 pattern): the max of a
    # supplier-count-sized aggregate, collected exactly as DECIMAL
    mx = rev.agg(F.max("total_revenue")).first()[0]
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.filter(F.col("total_revenue") == F.lit(mx))
            .join(s, F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    F.col("total_revenue").cast("double")
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


@q("small_quantity_order_revenue", """
WITH pl AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice,
         sum(CAST(l.l_quantity AS DECIMAL(38,6)))
           OVER (PARTITION BY l.l_partkey) AS qsum,
         count(*) OVER (PARTITION BY l.l_partkey) AS qcnt
  FROM lineitem l
  WHERE l.l_partkey IN
        (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
         / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_lines
FROM pl
WHERE l_quantity < 0.2 * (CAST(qsum AS DOUBLE) / qcnt)
""")
def small_quantity_order_revenue(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): yearly revenue lost if
    a brand's small-quantity orders (below 20% of the part's average
    order quantity) moved to bulk — the CORRELATED AVG subquery
    (`l_quantity < 0.2 * (SELECT avg(l_quantity) ... WHERE same
    part)`), the fourth decorrelation shape in the catalog. Instead of
    the aggregate + join-back (which re-scans the fact), the per-part
    average rides a WINDOW over l_partkey: ONE fact scan, ONE keyed
    exchange — each line sees its own part's average and filters
    in-place.

    Scale path: the brand filter (1/|brands| of an SF-scaling dim)
    reduces the fact first via a semi join (AQE broadcast at gate SF);
    the window partitions on the fact's own join key — no skew beyond
    a part's line count; the final 1-row aggregate is map-side
    partials. Exactness: the quantity average is a DECIMAL(38,6)
    windowed sum with ONE double cast then the division — the same
    IEEE tree both engines (never a native double avg, whose
    accumulation order is engine-dependent); revenue through
    DECIMAL(38,6), one double cast, /7.0 is one more identical
    rounding."""
    parts = (load_table(spark, sf_dir, "part")
             .filter(F.col("p_brand") == "Brand#13")
             .select("p_partkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(parts, F.col("p_partkey") == F.col("l_partkey"),
                "left_semi"))
    w = Window.partitionBy("l_partkey")
    pl = (li.withColumn("qsum", F.sum(F.expr(
              "CAST(l_quantity AS DECIMAL(38,6))")).over(w))
          .withColumn("qcnt", F.count(F.lit(1)).over(w)))
    return (pl.filter(F.col("l_quantity")
                      < 0.2 * (F.col("qsum").cast("double")
                               / F.col("qcnt")))
            .agg(F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(38,6))"))
                 .alias("__rev"),
                 F.count(F.lit(1)).cast("long").alias("n_small_lines"))
            .select((F.col("__rev").cast("double") / F.lit(7.0))
                    .alias("avg_yearly"),
                    "n_small_lines"))


@q("discounted_brand_revenue", """
SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
            AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""")
def discounted_brand_revenue(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): one revenue total over a
    DISJUNCTION of brand/size/quantity predicate blocks — the classic
    OR-of-ANDs pushdown marker: a naive engine evaluates the whole
    disjunction post-join; a good plan pushes each side's derivable
    conjuncts to its own scan (quantity bounds to lineitem, brand/size
    to part) and keeps only the cross-table residual on the join.

    Scale path: Catalyst derives `l_quantity BETWEEN min-lo AND
    max-hi` for the fact scan and the brand/size union for the part
    scan (asserted in tests/test_operators_r9.py), so both scans prune
    before the join; the join is AQE's choice (SF-scaling part side);
    the 1-row aggregate is map-side partials. Exactness: revenue
    through DECIMAL(38,6), one double cast; integer-valued quantity
    bounds compare identically as doubles on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#13")
         & F.col("p_size").between(1, 10)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#20")
           & F.col("p_size").between(1, 20)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#9")
           & F.col("p_size").between(1, 30)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)))
    return (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
            .filter(cond)
            .agg(F.sum(F.expr("CAST(l_extendedprice * (1 - l_discount)"
                              " AS DECIMAL(38,6))")).alias("__rev"),
                 F.count(F.lit(1)).cast("long").alias("n_lines"))
            .select(F.col("__rev").cast("double").alias("revenue"),
                    "n_lines"))


@q("important_part_value", """
WITH pv AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS v
  FROM lineitem GROUP BY 1
)
SELECT pv.l_partkey AS p_partkey, p.p_name,
       CAST(pv.v AS DOUBLE) AS total_value
FROM pv
JOIN part p ON p.p_partkey = pv.l_partkey
WHERE pv.v * (SELECT count(*) * 2 FROM pv) > (SELECT sum(v) * 3 FROM pv)
ORDER BY pv.v DESC, p_partkey
""")
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape (important stock): parts whose traded value
    exceeds a data-derived global threshold — the group-aggregate-vs-
    global-scalar HAVING, the fifth decorrelation shape in the catalog
    (the global scalars collect as driver literals off the already-
    reduced per-part frame, the Q15 recipe one level up: the group
    values AND the threshold derive from ONE aggregate pass). TPC-H
    scales Q11's share threshold by 1/SF; the testdata's part-value
    distribution is flat (max ≈ 1.8× mean at every SF), so the
    SF-stable spec is "parts trading above 1.5× the mean part value" —
    2 / 29 / 252 survivors at sf0.001/0.01/0.1.

    Scale path: ONE fact scan reduces onto the fact's own key
    (localCheckpoint pins the per-part frame so the threshold fold
    never re-scans the fact); the survivor set joins the part dim by
    AQE's choice. Exactness: the 1.5×-mean test is the all-integer
    DECIMAL comparison ``v · 2n > 3 · total`` — no float fraction, no
    division on either engine; the order key is the exact decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = (li.groupBy("l_partkey")
          .agg(F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(38,6))"))
               .alias("v")))
    # localCheckpoint: the global scalars fold over this SAME per-part
    # frame — without pinning it, the lazy survivor plan would re-scan
    # the fact a second time for a part-count-sized reduction
    pv = pv.localCheckpoint(eager=True)
    total, n = pv.agg(F.sum("v"), F.count(F.lit(1))).first()
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (pv.filter(F.col("v") * (2 * int(n)) > F.lit(total) * 3)
            .join(p, F.col("p_partkey") == F.col("l_partkey"))
            .select(F.col("l_partkey").alias("p_partkey"), "p_name",
                    F.col("v").cast("double").alias("total_value"),
                    F.col("v").alias("__v"))
            .orderBy(F.col("__v").desc(), "p_partkey")
            .drop("__v"))


@q("sole_returner_suppliers", """
WITH l AS (SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem)
SELECT s.s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT)
         AS n_orders
FROM l l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY 1
ORDER BY n_orders DESC, s_name
LIMIT 10
""")
def sole_returner_suppliers(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape (suppliers who kept orders waiting): the
    hardest classic decorrelation — a correlated EXISTS and a
    correlated NOT EXISTS against the SAME fact, both with an
    inequality residual (another supplier's line / another supplier's
    offending line). The testdata has no receipt/commit dates, so the
    predicate becomes "the order's SOLE returner on a multi-supplier
    order" (l_returnflag takes the late-delivery role); the join
    SHAPE — fact ⋉ fact ▷ fact with (equi key + non-equi residual) —
    is the point. Spark decorrelates to a left-semi and a left-anti
    self-join, each hashing on l_orderkey with the ``suppkey <>``
    residual evaluated post-probe.

    Scale path: all three fact legs project 3 narrow columns; the
    semi/anti joins co-partition on l_orderkey (one exchange each leg,
    shared key); the anti leg pre-filters to returned lines only; the
    supplier dim joins after the fact collapses to qualifying
    (order, supplier) pairs; top-10 is TakeOrderedAndProject.
    Exactness: int64 distinct-order counts; total order
    (n_orders DESC, s_name)."""
    l = (load_table(spark, sf_dir, "lineitem")
         .select("l_orderkey", "l_suppkey", "l_returnflag"))
    l1 = (l.filter(F.col("l_returnflag") == "R")
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_suppkey").alias("sk")))
    l2 = l.select(F.col("l_orderkey").alias("ok2"),
                  F.col("l_suppkey").alias("sk2"))
    l3 = (l.filter(F.col("l_returnflag") == "R")
          .select(F.col("l_orderkey").alias("ok3"),
                  F.col("l_suppkey").alias("sk3")))
    qualified = (l1
                 .join(l2, (F.col("ok") == F.col("ok2"))
                       & (F.col("sk") != F.col("sk2")), "left_semi")
                 .join(l3, (F.col("ok") == F.col("ok3"))
                       & (F.col("sk") != F.col("sk3")), "left_anti"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (qualified
            .join(s, F.col("s_suppkey") == F.col("sk"))
            .groupBy("s_name")
            .agg(F.countDistinct("ok").cast("long").alias("n_orders"))
            .orderBy(F.col("n_orders").desc(), "s_name")
            .limit(10))


@q("dormant_valuable_customers", """
WITH pos AS (SELECT c_acctbal FROM customer WHERE c_acctbal > 0.0)
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
         AS total_acctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,6)))
                                 AS DOUBLE) / count(*) FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
ORDER BY 1
""")
def dormant_valuable_customers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape (global sales opportunity): customers whose
    balance beats the average POSITIVE balance but who placed no
    recent order, rolled up per nation — the composite that stacks
    three already-gated primitives exactly as Q22 does: a scalar
    subquery over a DIFFERENT filter of the same dim (avg positive
    balance → driver literal), a filtered NOT EXISTS (→ left-anti
    join against the recent orders slice), and the per-nation rollup.
    (The testdata's every customer has SOME order, so Q22's "never
    ordered" becomes "no order since 2000" — the churn cut.)

    Scale path: the threshold folds over the customer dim once
    (driver literal); the anti join pre-filters orders to the recent
    window (pushed date filter — at scale, partition pruning) and
    co-partitions on custkey; nation broadcasts; the rollup is
    ≤25 rows. Exactness: the average is the DECIMAL-sum/count tree
    (identical on both engines); the survivor sum runs through
    DECIMAL(38,6) with one double cast; int64 counts; total order on
    nation."""
    cust = load_table(spark, sf_dir, "customer")
    # dec_sum already ends in the double cast, so this is the oracle's
    # exact CAST(sum AS DOUBLE)/count tree
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg((dec_sum("c_acctbal") / F.count(F.lit(1))))
               .first()[0])
    recent = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (cust.filter(F.col("c_acctbal") > F.lit(avg_bal))
            .join(recent, cust["c_custkey"] == recent["o_custkey"],
                  "left_anti")
            .join(F.broadcast(n),
                  F.col("n_nationkey") == F.col("c_nationkey"))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_custs"),
                 F.sum(F.expr("CAST(c_acctbal AS DECIMAL(38,6))"))
                 .cast("double").alias("total_acctbal"))
            .orderBy("nation"))


@q("dominant_part_suppliers", """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(38,6))) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
pt AS (SELECT l_partkey, sum(q) AS tq FROM ps GROUP BY 1),
dominant AS (
  SELECT DISTINCT ps.l_suppkey
  FROM ps JOIN pt USING (l_partkey)
  WHERE ps.l_partkey IN
        (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND ps.q * 2 > pt.tq
)
SELECT s.s_suppkey, s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_suppkey
""")
def dominant_part_suppliers(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """TPC-H Q20's shape (potential part promotion): suppliers who
    shipped MORE THAN HALF of some promo part's yearly volume — the
    nested-aggregate-threshold-inside-a-semi-join-chain (Q20's
    `ps_availqty > 0.5 * (SELECT sum(l_quantity) ...)` correlated
    threshold, re-anchored on lineitem since the testdata has no
    partsupp): per-(part, supplier) volume compares against the
    per-part total derived FROM THE SAME aggregate, the survivors
    collapse to a supplier id set, and that set semi-joins into the
    supplier dim.

    Scale path: the fact reduces ONCE onto (partkey, suppkey) — the
    pinned frame (localCheckpoint) feeds both the per-part total and
    the comparison join, so the fact is never re-scanned; the part
    filter prunes before the totals compare; the dominant set is
    supplier-count-bounded and semi-joins the dim. Exactness: volumes
    through DECIMAL(38,6); the half test is the all-integer comparison
    ``q·2 > tq``; total order on s_suppkey."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1997-01-01")))
    promo = (load_table(spark, sf_dir, "part")
             .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    ps = (li.join(promo, F.col("p_partkey") == F.col("l_partkey"),
                  "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(F.expr("CAST(l_quantity AS DECIMAL(38,6))"))
               .alias("q"))
          .localCheckpoint(eager=True))  # feeds pt AND the compare join
    pt = ps.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    dominant = (ps.join(pt, "l_partkey")
                .filter(F.col("q") * 2 > F.col("tq"))
                .select("l_suppkey").distinct())
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (s.join(dominant, s["s_suppkey"] == dominant["l_suppkey"],
                   "left_semi")
            .join(F.broadcast(n),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
            .orderBy("s_suppkey"))
