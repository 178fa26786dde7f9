"""Airport kit: the nine published airport pipes.

Re-expresses kits/airport/mysql/pipes/* (reference SQL cited per pipe)
over three CDC event-log datasources registered as ``flights_raw``,
``passengers_raw``, ``baggage_raw`` (typed rows + ``__timestamp``).

Scale notes: the ``latest_*`` pipes are windowed dedup over the full
event history — at 100 TB they read from a compacted VersionedTable
instead (sources.tables.VersionedTable.compact), which keeps them
O(|entities|) and broadcastable into the join pipes. The join pipes
then become broadcast hash joins with no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import to_start_of_minute
from .framework import Context, Node, Param, Pipe, Registry


def _latest_by_id(df: DataFrame, cols: list[str]) -> DataFrame:
    """``ORDER BY id, __timestamp DESC LIMIT 1 BY id`` (latest_flight_info.pipe:6-9).

    Top-1 per key by ingestion time — the reference's event-log dedup.
    row_number over a hash-partitioned window: one shuffle on id.
    """
    w = Window.partitionBy("id").orderBy(F.col("__timestamp").desc(),
                                         F.col("updated_at").desc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .select(*cols))


def _status_rank():
    # shared ORDER BY CASE across baggage/passengers_by_flight_status
    # (baggage_by_flight_status.pipe:17-26)
    return (F.when(F.col("flight_status") == "departed", 5)
             .when(F.col("flight_status") == "boarded", 4)
             .when(F.col("flight_status") == "boarding", 3)
             .when(F.col("flight_status") == "closed", 2)
             .when(F.col("flight_status") == "open", 1)
             .otherwise(6))


def latest_flight_info_pipe() -> Pipe:
    def endpoint(ctx: Context) -> DataFrame:
        return _latest_by_id(ctx.ref("flights_raw"),
                             ["id", "flight_number", "status",
                              "passenger_count", "departed_at", "closed_at"])
    return Pipe("latest_flight_info", [Node("endpoint", endpoint)])


def latest_passenger_info_pipe() -> Pipe:
    def node(ctx: Context) -> DataFrame:
        return _latest_by_id(ctx.ref("passengers_raw"), ["id", "flight_id", "status"])
    return Pipe("latest_passenger_info", [Node("latest_passenger_info_0", node)])


def latest_baggage_info_pipe() -> Pipe:
    def node(ctx: Context) -> DataFrame:
        return _latest_by_id(ctx.ref("baggage_raw"), ["id", "flight_id", "status", "weight"])
    return Pipe("latest_baggage_info", [Node("latest_baggage_info_0", node)])


def active_flights_past_hour_pipe() -> Pipe:
    """active_flights_past_hour.pipe:4-13: per-minute count of distinct
    not-yet-departed flights created in the last hour."""

    def node(ctx: Context) -> DataFrame:
        now = ctx.clock.now_col()
        return (ctx.ref("flights_raw")
                .filter((F.col("created_at") > now - F.expr("INTERVAL 1 HOUR"))
                        & F.col("departed_at").isNull())
                .groupBy(to_start_of_minute("updated_at").alias("time_interval"))
                .agg(F.countDistinct("id").alias("active_flights"))
                .orderBy("time_interval"))

    return Pipe("active_flights_past_hour", [Node("active_flights_past_hour_0", node)])


def baggage_by_flight_status_pipe() -> Pipe:
    """baggage_by_flight_status.pipe: latest flights LEFT JOIN latest baggage,
    conditional weight sums per status, categorical status ordering."""

    def endpoint(ctx: Context) -> DataFrame:
        now = ctx.clock.now_col()
        fl = ctx.ref("latest_flight_info")
        bl = ctx.ref("latest_baggage_info")

        def wsum(status: str):
            return F.round(
                F.sum(F.when(bl["status"] == status, bl["weight"]).otherwise(0.0)), 2)

        joined = (fl.filter(F.col("departed_at").isNull()
                            | (F.col("departed_at") > now - F.expr("INTERVAL 30 SECOND")))
                    .join(bl, fl["id"] == bl["flight_id"], "left"))
        return (joined.groupBy(fl["flight_number"].alias("flight_number"),
                               fl["departed_at"],
                               fl["status"].alias("flight_status"))
                .agg(wsum("checkedin").alias("baggage_checkedin"),
                     wsum("loaded").alias("baggage_loaded"),
                     wsum("offloaded").alias("baggage_offloaded"))
                .drop("departed_at")
                .orderBy(_status_rank(), F.col("flight_number").asc()))

    return Pipe("baggage_by_flight_status", [Node("endpoint", endpoint)])


def passengers_by_flight_status_pipe() -> Pipe:
    """passengers_by_flight_status.pipe: latest flights LEFT JOIN latest
    passengers, stage-bucketed counts + derived notcheckedin."""

    def node(ctx: Context) -> DataFrame:
        now = ctx.clock.now_col()
        f = ctx.ref("latest_flight_info")
        p = ctx.ref("latest_passenger_info")

        checkedin = F.count(F.when((p["status"] == "checkedin")
                                   & f["status"].isin("open", "closed"), 1))
        boarding = F.count(F.when((p["status"] == "checkedin")
                                  & (f["status"] == "boarding"), 1))
        onboarded = F.count(F.when((p["status"] == "onboarded")
                                   & f["status"].isin("boarding", "boarded", "departed"), 1))
        notboarded = F.count(F.when((p["status"] == "notboarded")
                                    & f["status"].isin("boarded", "departed"), 1))

        joined = (f.filter((F.col("status") != "departed")
                           | ((F.col("status") == "departed")
                              & (F.col("departed_at") > now - F.expr("INTERVAL 20 SECOND"))))
                    .join(p, p["flight_id"] == f["id"], "left"))
        return (joined.groupBy(f["flight_number"].alias("flight_number"),
                               f["passenger_count"],
                               f["status"].alias("flight_status"))
                .agg(checkedin.alias("checkedin"),
                     boarding.alias("boarding"),
                     onboarded.alias("onboarded"),
                     notboarded.alias("notboarded"))
                .withColumn("booked", F.col("passenger_count"))
                .withColumn("notcheckedin",
                            F.col("passenger_count") - (F.col("checkedin") + F.col("boarding")
                                                        + F.col("onboarded") + F.col("notboarded")))
                .select("flight_number", "flight_status", "booked", "checkedin",
                        "boarding", "onboarded", "notboarded", "notcheckedin")
                .orderBy(_status_rank(), F.col("flight_number").asc()))

    return Pipe("passengers_by_flight_status", [Node("passengers_by_flight_status_0", node)])


def passenger_activity_pipe() -> Pipe:
    """passenger_activity.pipe: 4-node chain — per-minute check-in starts vs
    completions over the last hour of passenger events."""

    def node0(ctx: Context) -> DataFrame:
        now = ctx.clock.now_col()
        return (ctx.ref("passengers_raw")
                .filter(F.col("updated_at") > now - F.expr("INTERVAL 1 HOUR"))
                .select("id",
                        to_start_of_minute("checkedin_at").alias("started_at"),
                        to_start_of_minute(
                            F.coalesce("onboarded_at", "notboarded_at")).alias("completed_at")))

    def node1(ctx: Context) -> DataFrame:
        return (ctx.ref("passenger_activity_0")
                .groupBy(F.col("started_at").alias("interval"))
                .agg(F.countDistinct("id").alias("passengers_checkedin")))

    def node2(ctx: Context) -> DataFrame:
        return (ctx.ref("passenger_activity_0")
                .groupBy(F.col("completed_at").alias("interval"))
                .agg(F.countDistinct("id").alias("passengers_completed")))

    def node3(ctx: Context) -> DataFrame:
        s = ctx.ref("passenger_activity_1")
        c = ctx.ref("passenger_activity_2")
        return (s.join(c, "interval", "inner")
                 .select("interval", "passengers_checkedin", "passengers_completed")
                 .orderBy("interval"))

    return Pipe("passenger_activity", [
        Node("passenger_activity_0", node0),
        Node("passenger_activity_1", node1),
        Node("passenger_activity_2", node2),
        Node("passenger_activity_3", node3),
    ])


def flights_missed_pct_minute_pipe() -> Pipe:
    """flights_missed_pct_minute.pipe: missed-boarding percentage per minute
    with a gap-filled 61-minute series (CTE scalars, numbers() cross join,
    LEFT JOIN + ifNull — SURVEY J3/J4/F21/F22) and typed start/end params."""

    def node0(ctx: Context) -> DataFrame:
        f = ctx.ref("latest_flight_info")
        p = ctx.ref("latest_passenger_info")
        return (f.join(p, p["flight_id"] == f["id"], "inner")
                 .filter(f["closed_at"].isNotNull() & (p["status"] == "notboarded"))
                 .groupBy(f["id"], f["closed_at"],
                          f["passenger_count"].alias("booked_passengers"))
                 .agg(F.count(p["id"]).alias("missed_passengers"))
                 .select("closed_at", "booked_passengers", "missed_passengers"))

    def node1(ctx: Context) -> DataFrame:
        start = ctx.param("start")
        end = ctx.param("end")
        pct = F.round(
            F.coalesce(F.sum("missed_passengers") * 100
                       / F.nullif(F.sum("booked_passengers"), F.lit(0)),
                       F.lit(0.0)), 2)
        return (ctx.ref("flights_missed_pct_minute_0")
                .filter((F.col("closed_at") >= F.lit(start))
                        & (F.col("closed_at") <= F.lit(end)))
                .groupBy(to_start_of_minute("closed_at").alias("window"))
                .agg(pct.alias("flights_missed_pct")))

    def node2(ctx: Context) -> DataFrame:
        # WITH current_time/start_time scalars + numbers(61) series
        # (flights_missed_pct_minute.pipe:40-60) → sequence+explode: the
        # Spark-native gap-fill series generator (no table function needed).
        spark = ctx.spark
        now = ctx.clock.now_col()
        series = (spark.range(1)
                  .select(F.explode(F.sequence(
                      F.date_trunc("minute", now) - F.expr("INTERVAL 1 HOUR"),
                      F.date_trunc("minute", now),
                      F.expr("INTERVAL 1 MINUTE"))).alias("series_time"))
                  .filter(F.col("series_time") <= now))
        agg = ctx.ref("flights_missed_pct_minute_1")
        return (series.join(agg, series["series_time"] == agg["window"], "left")
                .select(F.col("series_time").alias("time_interval"),
                        F.coalesce("flights_missed_pct", F.lit(0.0)).alias("flights_missed_pct"))
                .orderBy("time_interval"))

    return Pipe(
        "flights_missed_pct_minute",
        [Node("flights_missed_pct_minute_0", node0),
         Node("flights_missed_pct_minute_1", node1),
         Node("flights_missed_pct_minute_2", node2)],
        params=[
            Param("start", "DateTime",
                  default=lambda clk: clk.now() - __import__("datetime").timedelta(hours=1)),
            Param("end", "DateTime", default=lambda clk: clk.now()),
        ],
    )


def active_vs_missed_flights_pipe() -> Pipe:
    """active_vs_missed_flights.pipe:4-12 — pipe-on-pipe inner join."""

    def node(ctx: Context) -> DataFrame:
        f = ctx.ref("flights_missed_pct_minute")
        a = ctx.ref("active_flights_past_hour")
        return (f.join(a, "time_interval", "inner")
                 .select("time_interval", "flights_missed_pct", "active_flights"))

    return Pipe("active_vs_missed_flights", [Node("active_vs_missed_flights_0", node)])


def register_airport_pipes(registry: Registry) -> Registry:
    for p in (latest_flight_info_pipe(), latest_passenger_info_pipe(),
              latest_baggage_info_pipe(), active_flights_past_hour_pipe(),
              baggage_by_flight_status_pipe(), passengers_by_flight_status_pipe(),
              passenger_activity_pipe(), flights_missed_pct_minute_pipe(),
              active_vs_missed_flights_pipe()):
        registry.add_pipe(p)
    return registry
