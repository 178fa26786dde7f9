"""Temporal operators Spark lacks as built-ins: as-of join,
sessionization, and funnel analysis, in their one-shuffle scalable
formulations.

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

- **funnel** (`events_funnel_conversion`): ordered multi-step funnel
  (signup → view → click → purchase) with strictly-later stage
  matching. The naive formulation chains one self-join per stage
  (k joins, k shuffles of the full event table); here ALL stage
  timestamps come from one window pass — running-min columns chained
  over the same (user, time) sort, so Spark plans ONE shuffle + sort
  + k stacked Window operators. The oracle is the independent
  join-chain formulation, cross-checking two algorithms.

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


# ---------------------------------------------------------------------------
# funnel analysis
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("signup", "view", "click", "purchase")

# Stage k matches the user's earliest stage-k event STRICTLY after their
# stage-(k-1) timestamp. Strict `<` on ts only: a same-timestamp pair
# never advances the funnel, so the result is value-determined and
# independent of any within-timestamp ordering (no tiebreak needed —
# the lesson from the as-of/sessionization tie advisories applied from
# the start).


def _funnel_oracle_sql() -> str:
    prev = None
    ctes = []
    for k, stage in enumerate(FUNNEL_STAGES, start=1):
        if prev is None:
            ctes.append(f"""u1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{stage}' GROUP BY 1
)""")
        else:
            ctes.append(f"""u{k} AS (
  SELECT e.user_id, min(e.ts) AS t{k}
  FROM events e JOIN u{prev} p ON p.user_id = e.user_id
  WHERE e.event_type = '{stage}' AND e.ts > p.t{prev}
  GROUP BY 1
)""")
        prev = k
    counts = ", ".join(
        f"(SELECT count(*) FROM u{k}) AS n{k}"
        for k in range(1, len(FUNNEL_STAGES) + 1))
    rows = []
    for k, stage in enumerate(FUNNEL_STAGES, start=1):
        prev_ratio = ("CAST(NULL AS DOUBLE)" if k == 1
                      else f"CAST(n{k} AS DOUBLE) / nullif(n{k - 1}, 0)")
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS stage_idx, '{stage}' AS stage,"
            f" CAST(n{k} AS BIGINT) AS n_users,"
            f" {prev_ratio} AS conv_from_prev,"
            f" CAST(n{k} AS DOUBLE) / nullif(n1, 0) AS conv_from_first FROM c")
    return ("WITH " + ",\n".join(ctes)
            + f",\nc AS (SELECT {counts})\n"
            + "\nUNION ALL ".join(rows))


@q("events_funnel_conversion", _funnel_oracle_sql())
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per-user earliest signup, earliest view strictly
    after it, earliest click strictly after that, earliest purchase
    strictly after that; then per-stage user counts and conversion
    rates (one row per stage).

    Dataflow: chained running-min window columns over ONE
    (user_id, ts, event_id) sort — t1r carries the earliest signup seen
    so far; a view row qualifies iff t1r < its ts (value-equivalent to
    "earliest signup < ts" since any earlier-ts row sorts first), and
    its ts becomes a candidate for t2r; likewise for clicks and
    purchases. One shuffle + one sort + 4 stacked Window operators —
    vs the oracle's k-join chain (4 shuffles of the event table), the
    cross-checked independent algorithm.

    Scale path: events shuffle exactly once on user_id; per-stage
    counts are a partial-aggregatable count over the per-user frame;
    the 4-row stage table with conversion ratios derives from one
    global-agg row (broadcast-sized). Conversion ratios are divisions
    of exact int64 counts — engine-identical doubles.
    """
    e = (load_table(spark, sf_dir, "events")
         .select("user_id", "ts", "event_id", "event_type"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lvl = e.withColumn(
        "c1", F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts")))
    for k, stage in enumerate(FUNNEL_STAGES[1:], start=2):
        lvl = (lvl.withColumn(f"t{k - 1}r", F.min(f"c{k - 1}").over(w))
               .withColumn(f"c{k}", F.when(
                   (F.col("event_type") == stage)
                   & (F.col(f"t{k - 1}r") < F.col("ts")), F.col("ts"))))
    per_user = lvl.groupBy("user_id").agg(
        *[F.min(f"c{k}").alias(f"t{k}")
          for k in range(1, len(FUNNEL_STAGES) + 1)])
    counts = per_user.agg(
        *[F.count(f"t{k}").alias(f"n{k}")
          for k in range(1, len(FUNNEL_STAGES) + 1)])
    stage_rows = []
    for k, stage in enumerate(FUNNEL_STAGES, start=1):
        prev_ratio = ("CAST(NULL AS DOUBLE)" if k == 1
                      else f"CAST(n{k} AS DOUBLE) / nullif(n{k - 1}, 0)")
        stage_rows.append(F.expr(
            f"struct(CAST({k} AS BIGINT) AS stage_idx, '{stage}' AS stage,"
            f" n{k} AS n_users, {prev_ratio} AS conv_from_prev,"
            f" CAST(n{k} AS DOUBLE) / nullif(n1, 0) AS conv_from_first)"))
    return (counts.select(F.explode(F.array(*stage_rows)).alias("s"))
            .select("s.stage_idx", "s.stage", "s.n_users",
                    "s.conv_from_prev", "s.conv_from_first"))


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 24 * 3600 * 1_000_000


@q("events_retention_cohorts", f"""
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
coh AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1),
siz AS (SELECT cohort_week, count(*) AS cohort_size FROM coh GROUP BY 1),
act AS (
  SELECT c.cohort_week,
         (epoch_us(u.wk) - epoch_us(c.cohort_week)) // {_WEEK_US} AS week_offset,
         count(*) AS n_active
  FROM uw u JOIN coh c USING (user_id)
  GROUP BY 1, 2
)
SELECT a.cohort_week, CAST(a.week_offset AS BIGINT) AS week_offset,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(a.n_active * 1000000 // s.cohort_size AS BIGINT)
         AS retained_pct_micro
FROM act a JOIN siz s USING (cohort_week)
""")
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users cohorted by their first
    active week; each (cohort, week-offset) cell counts how many of the
    cohort's users were active that week, with retention as a micro-unit
    integer share (floor(1e6 · active/size) — exact on both engines).

    Dataflow: the corpus compacts to distinct (user, week) pairs FIRST
    (the only pass over raw events, map-side combinable); the cohort
    week is min(week) over that compact frame (min commutes with the
    monotone date_trunc), and the matrix is a join + groupBy over
    per-user-week rows. Mirrors the reference's dashboard-rollup style
    over the events stream (kits/users: activity endpoints).

    Scale path: raw events reduce to |users|×|weeks| rows in the first
    exchange; everything after operates on the compacted frame. The
    per-cohort sizes are a tiny second aggregate joined broadcast."""
    e = load_table(spark, sf_dir, "events")
    uw = (e.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
          .distinct())
    coh = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    siz = coh.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (uw.join(coh, "user_id")
           .select("cohort_week",
                   ((F.unix_micros("wk") - F.unix_micros("cohort_week"))
                    / F.lit(_WEEK_US)).cast("long").alias("week_offset"))
           .groupBy("cohort_week", "week_offset")
           .agg(F.count(F.lit(1)).alias("n_active")))
    return (act.join(F.broadcast(siz), "cohort_week")
            .select("cohort_week",
                    F.col("week_offset").cast("long").alias("week_offset"),
                    F.col("n_active").cast("long").alias("n_active"),
                    F.col("cohort_size").cast("long").alias("cohort_size"),
                    F.expr("CAST(n_active * 1000000 DIV cohort_size AS BIGINT)")
                    .alias("retained_pct_micro")))


# ---------------------------------------------------------------------------
# exact percentiles (order statistics)
# ---------------------------------------------------------------------------

# ceil(q·n) as pure integer arithmetic per quantile — no float index, no
# interpolation: the selected element is an ACTUAL value, so the result
# is engine-exact (interpolated percentile definitions differ between
# engines; order statistics don't).
_PCTL_RANKS = (("p50", "(n + 1) // 2", "(n + 1) DIV 2"),
               ("p90", "(9 * n + 9) // 10", "(9 * n + 9) DIV 10"),
               ("p99", "(99 * n + 99) // 100", "(99 * n + 99) DIV 100"))


@q("events_value_percentiles", f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value NULLS LAST, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       {", ".join(f"max(CASE WHEN rn = {duck} THEN value END) AS {name}"
                  for name, duck, _ in _PCTL_RANKS)}
FROM r
GROUP BY event_type, n
""")
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of the event value per event type, as order
    statistics: rank every value within its type (ties broken by
    event_id — the repo's total-order rule) and pick the ceil(q·n)-th
    element with integer rank targets.

    Scale path: ONE shuffle on event_type (both window functions share
    the partition spec), then a per-type groupBy that reduces to one
    row per type. Per-type skew is the known cost of exact per-group
    order statistics — at 100 TB switch the hot groups to
    approx_percentile sketches (t-digest partial merge) and keep this
    exact form for the long tail; the reference exposes only the
    managed engine's quantile functions (SURVEY §2 F-family)."""
    e = load_table(spark, sf_dir, "events")
    wp = Window.partitionBy("event_type")
    r = e.select(
        "event_type", "value",
        F.row_number().over(
            wp.orderBy(F.col("value").asc_nulls_last(), "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"))
    return (r.groupBy("event_type", "n")
            .agg(*[F.max(F.when(F.col("rn") == F.expr(spk), F.col("value")))
                   .alias(name) for name, _, spk in _PCTL_RANKS])
            .select("event_type", F.col("n").cast("long").alias("n_events"),
                    "p50", "p90", "p99"))


# ---------------------------------------------------------------------------
# time-series anomaly detection (z-score over minute counts)
# ---------------------------------------------------------------------------

_ANOM_REPORT_Z = 2.0  # report threshold; is_anomaly flags |z| > 3

# Variance from INTEGER power sums — never stddev_samp()/stddev(): the
# engines' streaming variance implementations (Welford vs two-pass)
# differ in final-bit rounding. (n·Σc² − (Σc)²) / (n·(n−1)) over exact
# int64 sums is one double division, textually identical both sides.
_ANOM_STATS = ("CAST(n * sumsq - tot * tot AS DOUBLE)"
               " / CAST(n * (n - 1) AS DOUBLE)")
_ANOM_Z = ("(CAST(cnt AS DOUBLE) - CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))"
           " / sqrt(var)")


@q("events_minute_anomalies", f"""
WITH mc AS (
  SELECT event_type, date_trunc('minute', ts) AS minute, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, count(*) AS n, sum(cnt) AS tot,
         sum(cnt * cnt) AS sumsq
  FROM mc GROUP BY 1 HAVING count(*) > 1
),
z AS (
  SELECT mc.event_type, mc.minute, mc.cnt, {_ANOM_STATS} AS var,
         st.n, st.tot
  FROM mc JOIN st USING (event_type)
)
SELECT event_type, minute, CAST(cnt AS BIGINT) AS n_events,
       CAST(floor(1000000.0 * ({_ANOM_Z})) AS BIGINT) AS zscore_micro,
       abs({_ANOM_Z}) > 3.0 AS is_anomaly
FROM z
WHERE var > 0 AND abs({_ANOM_Z}) >= {_ANOM_REPORT_Z}
""")
def events_minute_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute event-count anomalies: minutes whose count deviates
    ≥ {_ANOM_REPORT_Z}σ from their event type's mean minute rate
    (is_anomaly at 3σ) — the ops-dashboard alerting query over the CDC
    event stream.

    Scale path: raw events reduce to (type, minute) counts in one
    map-side-combinable exchange; per-type stats are a tiny second
    aggregate joined broadcast; scoring is a map. Variance comes from
    integer power sums (see _ANOM_STATS) so both engines compute the
    identical double."""
    e = load_table(spark, sf_dir, "events")
    mc = (e.groupBy("event_type", F.date_trunc("minute", F.col("ts")).alias("minute"))
          .agg(F.count(F.lit(1)).alias("cnt")))
    st = (mc.groupBy("event_type")
          .agg(F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("tot"),
               F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"))
          .filter(F.col("n") > 1))
    z = (mc.join(F.broadcast(st), "event_type")
         .withColumn("var", F.expr(_ANOM_STATS)))
    zexp = F.expr(_ANOM_Z)
    return (z.filter((F.col("var") > 0) & (F.abs(zexp) >= _ANOM_REPORT_Z))
            .select("event_type", "minute",
                    F.col("cnt").cast("long").alias("n_events"),
                    F.floor(F.lit(1000000.0) * zexp).cast("long")
                    .alias("zscore_micro"),
                    (F.abs(zexp) > 3.0).alias("is_anomaly")))


# ---------------------------------------------------------------------------
# trailing time-window statistics (RANGE frame)
# ---------------------------------------------------------------------------

@q("events_daily_moving_stats", """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS day_num,
         count(*) AS n_events,
         sum(CAST(value AS DECIMAL(38,6))) AS v
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       CAST(sum(n_events) OVER w AS DOUBLE) / count(*) OVER w
         AS avg_events_7d,
       CAST(sum(v) OVER w AS DOUBLE) AS value_sum_7d
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""")
def events_daily_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type and day: the day's event count plus trailing-7-day
    average daily count and value sum — the moving-window KPI shape of
    the reference's dashboard series, using a RANGE frame over integer
    day numbers (a gap in the day sequence correctly shrinks the
    window, which a ROWS frame would get wrong).

    Exactness: the frame bound is an integer day offset; windowed value
    sums run over DECIMAL(38,6) (associative — see chcompat.dec_sum)
    and cast to double once at the end; the average divides exact int64
    counts. Scale path: raw events reduce to (type, day) rows in one
    combinable exchange; the window runs per type over day-count-sized
    data."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type",
                       F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.col("value").cast("decimal(38,6)")).alias("v"))
             .withColumn("day_num",
                         F.datediff(F.col("day"), F.lit("1970-01-01"))))
    w = (Window.partitionBy("event_type").orderBy("day_num")
         .rangeBetween(-6, Window.currentRow))
    return (daily.select(
        "event_type", "day", F.col("n_events").cast("long").alias("n_events"),
        (F.sum("n_events").over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("avg_events_7d"),
        F.sum("v").over(w).cast("double").alias("value_sum_7d")))


@q("events_scd2_history", """
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS version,
       event_id, event_type, value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_current,
       epoch_us(lead(ts) OVER w) - epoch_us(ts) AS valid_micros
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history: each CDC change row
    becomes a versioned validity interval — ``valid_from`` = its own
    timestamp, ``valid_to`` = the key's next change (NULL while
    current), plus a monotonically increasing per-key version. This is
    the standard warehouse materialization downstream of the
    reference's CDC stream (the ReplacingMergeTree keeps only the
    latest row — `kits/users/pg` datasources; SCD2 is its full-history
    dual, which ClickHouse users build from the same versioned stream).

    Plan: ``row_number``/``lead`` share ONE (user_id; ts, event_id)
    window sort, so each change row shuffles exactly once and the
    operator carries no state beyond the frame — the interval
    construction that a naive self-join ("next change per row") would
    pay a second shuffle and a range probe for. Total order within key
    via the (ts, event_id) tiebreak keeps version numbers deterministic
    under equal timestamps. ``valid_micros`` derives from integer
    epoch-micros (exact on both engines)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        "event_id", "event_type", "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
        (F.unix_micros(nxt) - F.unix_micros("ts")).alias("valid_micros"))


@q("events_activity_streaks", """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS d
  FROM events
),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
),
runs AS (
  SELECT user_id, grp, count(*) AS len, min(d) AS start_d
  FROM isl GROUP BY 1, 2
),
agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_streaks,
         CAST(max(len) AS BIGINT) AS longest_streak,
         CAST(sum(len) AS BIGINT) AS active_days
  FROM runs GROUP BY 1
),
first_longest AS (
  SELECT r.user_id, min(r.start_d) AS fs
  FROM runs r JOIN agg a ON a.user_id = r.user_id
                        AND r.len = a.longest_streak
  GROUP BY 1
)
SELECT a.user_id, a.n_streaks, a.longest_streak, a.active_days,
       CAST(f.fs AS BIGINT) AS longest_streak_start_day
FROM agg a JOIN first_longest f USING (user_id)
""")
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity streaks per user — the islands-and-gaps pattern: on the
    distinct (user, active-day) frame, ``day − row_number`` is constant
    exactly along a consecutive-day run, so one grouped count per
    (user, constant) yields every streak; per user we report streak
    count, the longest streak, total active days, and the first day of
    the (earliest) longest streak — the retention/engagement KPI shape
    (login streaks) warehouses compute daily.

    Plan: ``repartition(user_id)`` → ``dropDuplicates([user_id, day])``
    → per-user window rides ONE exchange (HashPartitioning(user_id)
    satisfies clustering for the superset dedup key and the window —
    the repo's documented one-exchange shape); everything after the
    distinct runs on active-day-sized data. Integer day numbers and
    counts end to end — engine-exact, no timezone arithmetic beyond
    the shared UTC date_trunc."""
    e = load_table(spark, sf_dir, "events")
    days = (e.select("user_id",
                     F.datediff(F.date_trunc("day", F.col("ts")),
                                F.lit("1970-01-01")).alias("d"))
            .repartition("user_id")
            .dropDuplicates(["user_id", "d"]))
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    runs = (isl.groupBy("user_id", "grp")
            .agg(F.count(F.lit(1)).alias("len"),
                 F.min("d").alias("start_d")))
    agg = (runs.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_streaks"),
                F.max("len").cast("long").alias("longest_streak"),
                F.sum("len").cast("long").alias("active_days")))
    first_longest = (runs.join(agg, "user_id")
                     .filter(F.col("len") == F.col("longest_streak"))
                     .groupBy("user_id")
                     .agg(F.min("start_d").cast("long")
                          .alias("longest_streak_start_day")))
    return (agg.join(first_longest, "user_id")
            .select("user_id", "n_streaks", "longest_streak",
                    "active_days", "longest_streak_start_day"))


@q("events_cumulative_users", """
WITH act AS (
  SELECT date_trunc('day', ts) AS day,
         count(DISTINCT user_id) AS active_users
  FROM events GROUP BY 1
),
fs AS (
  SELECT user_id, min(date_trunc('day', ts)) AS day
  FROM events GROUP BY 1
),
nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
SELECT a.day,
       CAST(a.active_users AS BIGINT) AS active_users,
       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY a.day)
            AS BIGINT) AS cum_users
FROM act a LEFT JOIN nu n ON n.day = a.day
""")
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active, new, and CUMULATIVE distinct users — the growth
    chart every product dashboard opens with. The naive formulation
    (count(DISTINCT user) over an ever-growing window) re-scans all
    history per day; this is the scalable dual: a distinct count is a
    sum of FIRST TOUCHES, so per-user min(day) → per-day new-user
    counts → one running sum reproduces the cumulative distinct
    exactly, with each event shuffling once.

    Scale path: both aggregations are partial-agg shuffles on bounded
    keys (user, day). The running sum does NOT use a partition-less
    window (the plan invariant the repo enforces): it is the textbook
    distributed prefix sum — range-partition by day, a PER-PARTITION
    local prefix (window keyed on the partition id), then add each
    slice's base offset from a #partitions-row driver aggregate (the
    corpus_curriculum_order 2-pass recipe, summing instead of
    ranking). Every first day is an active day, so the left join never
    drops a day. Exactness: pure int64 counts; the prefix is invariant
    to where the range sampler puts slice boundaries because day is
    totally ordered.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    act = (e.groupBy(day.alias("day"))
           .agg(F.countDistinct("user_id").alias("active_users")))
    nu = (e.groupBy("user_id").agg(F.min(day).alias("day"))
          .groupBy("day").agg(F.count(F.lit(1)).alias("new_users")))
    daily = (act.join(nu, "day", "left")
             .select("day",
                     F.col("active_users").cast("long")
                     .alias("active_users"),
                     F.coalesce("new_users", F.lit(0)).cast("long")
                     .alias("new_users")))
    n_parts = max(spark.sparkContext.defaultParallelism, 4)
    # localCheckpoint pins ONE materialization of the sampled range
    # exchange: the base-offset collect and the final read must see the
    # same slice contents (see corpus_curriculum_order)
    sliced = (daily.repartitionByRange(n_parts, "day")
              .sortWithinPartitions("day")
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    wloc = (Window.partitionBy("__pid").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sizes = {r["__pid"]: r["s"] for r in
             sliced.groupBy("__pid")
             .agg(F.sum("new_users").alias("s")).collect()}
    base, acc = {}, 0
    for pid in sorted(sizes):
        base[pid] = acc
        acc += sizes[pid]
    base_map = F.create_map(
        *[F.lit(x) for kv in sorted(base.items()) for x in kv])
    return (sliced
            .withColumn("__loc", F.sum("new_users").over(wloc))
            .select("day", "active_users", "new_users",
                    (base_map[F.col("__pid")] + F.col("__loc"))
                    .cast("long").alias("cum_users")))
