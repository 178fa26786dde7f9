"""Temporal operators Spark lacks as built-ins: as-of join and
sessionization, in their one-shuffle scalable formulations.

- **as-of join** (`events_asof_last_purchase`): attach to every event
  the user's most recent purchase at-or-before its timestamp. Spark has
  no ASOF JOIN operator; the naive range join explodes to
  O(events × purchases-per-key) rows. Because the right stream here is
  a *subset* of the left, the scalable plan needs NO join at all: one
  window pass with ``last(..., ignorenulls)`` over
  (partition key, order time) carries the most recent purchase struct
  forward — ONE shuffle, O(events) rows end to end. (For a general
  disjoint right stream, union the tagged streams first and run the
  same window — same single shuffle.) The DuckDB oracle is the
  *independent* range-join + QUALIFY formulation, so the gate
  cross-checks two different algorithms for the same semantics.

- **sessionization** (`events_sessionization`): split each user's
  event stream into sessions at inactivity gaps > 6 h — the classic
  lag → boundary-flag → running-sum pattern; both windows share one
  (partition, order), so Spark plans a single shuffle + sort. Gap
  compares use integer epoch-micros (exact on both engines).

At 100 TB both operators shuffle each event row exactly once, carry
no per-key state beyond the window frame, and need no driver round
trips — the canonical distributed formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def asof_last_marker(events: DataFrame, key: str, time: str, uid: str,
                     marker) -> DataFrame:
    """Generic as-of: carry the latest marker-row (ts, id) forward over
    each key's timeline (inclusive — a marker row sees itself)."""
    w = (Window.partitionBy(key).orderBy(time, uid)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    mark = F.when(marker, F.struct(F.col(time).alias("mts"),
                                   F.col(uid).alias("mid")))
    return events.withColumn("__last_marker",
                             F.last(mark, ignorenulls=True).over(w))


@q("events_asof_last_purchase", """
WITH p AS (
  SELECT user_id, ts AS pts, event_id AS pid
  FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT e.event_id, e.user_id, e.ts, p.pid, p.pts,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY p.pts DESC NULLS LAST,
                                     p.pid DESC NULLS LAST) AS rn
  FROM events e
  LEFT JOIN p ON p.user_id = e.user_id
             AND (p.pts < e.ts OR (p.pts = e.ts AND p.pid <= e.event_id))
)
SELECT event_id, user_id, ts,
       pid AS last_purchase_id, pts AS last_purchase_ts,
       epoch_us(ts) - epoch_us(pts) AS micros_since_purchase
FROM ranked WHERE rn = 1
""")
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event ↦ the user's most recent purchase at or
    before it (purchase attribution). See module docstring for why the
    single-window plan beats a range join at scale."""
    e = load_table(spark, sf_dir, "events")
    withm = asof_last_marker(e.select("event_id", "user_id", "ts", "event_type"),
                             key="user_id", time="ts", uid="event_id",
                             marker=F.col("event_type") == "purchase")
    return withm.select(
        "event_id", "user_id", "ts",
        F.col("__last_marker.mid").alias("last_purchase_id"),
        F.col("__last_marker.mts").alias("last_purchase_ts"),
        (F.unix_micros("ts") - F.unix_micros("__last_marker.mts"))
        .alias("micros_since_purchase"))


SESSION_GAP_MICROS = 6 * 3600 * 1_000_000  # 6 h inactivity ends a session


@q("events_sessionization", f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > {SESSION_GAP_MICROS}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_micros
FROM s GROUP BY user_id, session_seq
""")
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream (6 h inactivity
    boundary): lag → boundary flag → running sum → per-session rollup.
    Both windows share one (partition, order) ⇒ one shuffle + sort."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(F.lag("ts").over(w).isNull()
                    | (gap > SESSION_GAP_MICROS), 1).otherwise(0)
    s = (e.select("user_id", "ts", "event_id")
         .withColumn("session_seq", F.sum(is_new).over(run)))
    return (s.groupBy("user_id", "session_seq")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                 .alias("duration_micros")))
