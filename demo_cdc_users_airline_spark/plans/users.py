"""Users kit: CDC materialization + the three published users queries.

Re-expresses kits/users/{pg,mysql}/pipes/* (reference SQL cited per
function) over the engine's VersionedTable / AppendTable abstractions.

Registry datasources expected:
- ``users_raw``      — typed PG-shape CDC log (sources.cdc.USERS_RAW_PG_SCHEMA
                       + ``__timestamp``)
- ``users_latest``   — dedup-on-read view of the latest-state VersionedTable
- ``users_batch``    — the scheduled-copy target AppendTable's contents
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import arg_max, from_unix_ts64_micro, to_fixed_string
from .framework import Context, Node, Pipe, Registry

# ---------------------------------------------------------------------------
# users_mv — materialized-view transform raw → latest
# ---------------------------------------------------------------------------


def users_mv_pg(users_raw: DataFrame) -> DataFrame:
    """kits/users/pg/pipes/users_mv.pipe:4-17.

    Coalesce nullable PG columns to non-null defaults (''/0), convert
    epoch-µs Int64 timestamps, fix lang to width 2, carry ingestion time
    as ``event_timestamp``; fall back to ingestion time when the event
    carries no ``updated_at``.
    """
    return users_raw.select(
        F.col("id"),
        F.coalesce("name", F.lit("")).alias("name"),
        F.coalesce("email", F.lit("")).alias("email"),
        F.coalesce("address", F.lit("")).alias("address"),
        F.coalesce("phone_number", F.lit("")).alias("phone_number"),
        F.coalesce("email_verified", F.lit(0)).cast("smallint").alias("email_verified"),
        F.coalesce("onboarded", F.lit(0)).cast("smallint").alias("onboarded"),
        F.coalesce("deleted", F.lit(0)).cast("smallint").alias("deleted"),
        F.col("__timestamp").alias("event_timestamp"),
        to_fixed_string(F.coalesce("lang", F.lit("")), 2).alias("lang"),
        from_unix_ts64_micro(F.coalesce("created_at", F.lit(0))).alias("created_at"),
        F.coalesce(from_unix_ts64_micro("updated_at"), F.col("__timestamp")).alias("updated_at"),
        F.col("__timestamp"),
    )


def users_mv_mysql(users_raw: DataFrame) -> DataFrame:
    """kits/users/mysql/pipes/users_mv.pipe:4-8 (DateTime shape, no coalesce)."""
    return users_raw.select(
        "id", "name", "email", "address", "phone_number",
        "email_verified", "onboarded", "deleted", "created_at", "updated_at",
        F.col("__timestamp").alias("event_timestamp"),
        to_fixed_string("lang", 2).alias("lang"),
        F.col("__timestamp"),
    )


# ---------------------------------------------------------------------------
# users_api_rmt — SELECT * FROM users_latest FINAL ORDER BY id
# ---------------------------------------------------------------------------


def users_api_rmt_pipe() -> Pipe:
    """kits/users/pg/pipes/users_api_rmt.pipe:4-7."""

    def users_api_0(ctx: Context) -> DataFrame:
        return ctx.ref("users_latest").orderBy("id")

    return Pipe("users_api_rmt", [Node("users_api_0", users_api_0)])


# ---------------------------------------------------------------------------
# users_batch_copy — the four-node self-watermarking incremental snapshot
# ---------------------------------------------------------------------------

_ARGMAX_COLS = [
    ("name", "''"), ("email", "''"), ("address", "''"),
    ("phone_number", "''"),
]


def _last_batch_ts(ctx: Context) -> int:
    """Scalar ``WITH (SELECT max(batch_max_updated) FROM users_batch)``.

    users_batch_copy.pipe:10. Empty target → ClickHouse non-null max = 0
    (the documented first-run path); we coalesce NULL → 0 to match.
    """
    def _collect() -> int:
        row = (ctx.ref("users_batch")
               .agg(F.max("batch_max_updated")).first())
        return int(row[0]) if row and row[0] is not None else 0
    return ctx.scalar("last_batch_ts", _collect)


def _get_new_events(ctx: Context, coalesce_defaults: bool) -> DataFrame:
    """users_batch_copy.pipe:8-27 (with coalesce) / users_api_batch.pipe:4-23.

    Group events newer than the watermark by id and reconstruct the latest
    row per id via argMax on every column — single shuffle on the key with
    map-side partial aggregation (scale path of the CDC dedup).
    Ties on updated_at break by ingestion time ``__timestamp``
    (users_raw.datasource:18 sorting key).
    """
    last_batch_ts = _last_batch_ts(ctx)
    raw = ctx.ref("users_raw").filter(F.col("updated_at") > F.lit(last_batch_ts))
    tb = "__timestamp"

    def am(colname):
        return arg_max(colname, "updated_at", tb)

    aggs = [
        am("name").alias("name"),
        am("email").alias("email"),
        am("address").alias("address"),
        am("phone_number").alias("phone_number"),
        am("email_verified").alias("email_verified"),
        am("onboarded").alias("onboarded"),
        am("deleted").alias("deleted"),
        am("__timestamp").alias("event_timestamp"),
        arg_max(to_fixed_string("lang", 2), "updated_at", tb).alias("lang"),
        arg_max(from_unix_ts64_micro("created_at"), "updated_at", tb).alias("created_at"),
        F.max("updated_at").alias("updated_at_unix"),
        F.max("updated_at").alias("batch_max_updated"),
    ]
    out = raw.groupBy("id").agg(*aggs)
    if coalesce_defaults:
        out = out.select(
            "id",
            F.coalesce("name", F.lit("")).alias("name"),
            F.coalesce("email", F.lit("")).alias("email"),
            F.coalesce("address", F.lit("")).alias("address"),
            F.coalesce("phone_number", F.lit("")).alias("phone_number"),
            F.coalesce("email_verified", F.lit(0)).cast("smallint").alias("email_verified"),
            F.coalesce("onboarded", F.lit(0)).cast("smallint").alias("onboarded"),
            F.coalesce("deleted", F.lit(0)).cast("smallint").alias("deleted"),
            F.coalesce("event_timestamp", F.timestamp_seconds(F.lit(0))).alias("event_timestamp"),
            F.coalesce("lang", F.lit("")).alias("lang"),
            F.coalesce("created_at", F.timestamp_micros(F.lit(0))).alias("created_at"),
            F.coalesce("updated_at_unix", F.lit(0)).alias("updated_at_unix"),
            F.col("batch_max_updated"),
        )
    return out


def users_batch_copy_pipe() -> Pipe:
    """kits/users/pg/pipes/users_batch_copy.pipe — TYPE copy, hourly.

    Self-watermarking incremental snapshot (SURVEY §3.3): each run appends
    a complete current snapshot stamped with the new watermark, composed of
    changed rows (argMax-reconstructed) plus an anti-join backfill of
    unchanged rows from the previous snapshot.
    """

    def get_new_events(ctx: Context) -> DataFrame:
        return _get_new_events(ctx, coalesce_defaults=True)

    def backfill_last_batch(ctx: Context) -> DataFrame:
        # users_batch_copy.pipe:37-42: previous snapshot rows whose id did
        # not change — NOT IN (subquery) ⇒ left_anti join (SURVEY P8/J6).
        last_batch_ts = _last_batch_ts(ctx)
        prev = ctx.ref("users_batch").filter(
            F.col("batch_max_updated") == F.lit(last_batch_ts))
        changed_ids = ctx.ref("get_new_events").select("id")
        return prev.join(changed_ids, "id", "left_anti")

    def produce_new_batch(ctx: Context) -> DataFrame:
        # users_batch_copy.pipe:50-54 — UNION ALL, schema-aligned by name.
        return ctx.ref("backfill_last_batch").unionByName(ctx.ref("get_new_events"))

    def update_batch_max_ts(ctx: Context) -> DataFrame:
        # users_batch_copy.pipe:63-66 — stamp every row with the new
        # watermark scalar (max updated_at_unix over the produced batch).
        batch = ctx.ref("produce_new_batch")
        row = batch.agg(F.max("updated_at_unix")).first()
        new_max_ts = int(row[0]) if row and row[0] is not None else 0
        return batch.withColumn("batch_max_updated", F.lit(new_max_ts).cast("long"))

    return Pipe("users_batch_copy", [
        Node("get_new_events", get_new_events),
        Node("backfill_last_batch", backfill_last_batch),
        Node("produce_new_batch", produce_new_batch),
        Node("update_batch_max_ts", update_batch_max_ts),
    ])


def run_users_batch_copy(registry: Registry, batch_table) -> None:
    """Execute one scheduled run of the copy pipe (COPY_SCHEDULE analogue)."""
    snapshot = registry.endpoint("users_batch_copy")
    batch_table.append(snapshot)


# ---------------------------------------------------------------------------
# users_api_batch — live endpoint over the batch snapshot + fresh events
# ---------------------------------------------------------------------------


def users_api_batch_pipe() -> Pipe:
    """kits/users/pg/pipes/users_api_batch.pipe."""

    def get_new_events(ctx: Context) -> DataFrame:
        return _get_new_events(ctx, coalesce_defaults=False)

    def backfill_last_batch(ctx: Context) -> DataFrame:
        last_batch_ts = _last_batch_ts(ctx)
        prev = ctx.ref("users_batch").filter(
            F.col("batch_max_updated") == F.lit(last_batch_ts))
        return prev.join(ctx.ref("get_new_events").select("id"), "id", "left_anti")

    def produce_api(ctx: Context) -> DataFrame:
        # users_api_batch.pipe:38-44: SELECT * EXCEPT (batch_max_updated,
        # updated_at_unix), fromUnixTimestamp64Micro(updated_at_unix) AS
        # updated_at — on each branch, then UNION ALL.
        def shape(df: DataFrame) -> DataFrame:
            return (df.withColumn("updated_at", from_unix_ts64_micro("updated_at_unix"))
                      .drop("batch_max_updated", "updated_at_unix"))

        return shape(ctx.ref("backfill_last_batch")).unionByName(
            shape(ctx.ref("get_new_events")))

    def api_publish(ctx: Context) -> DataFrame:
        # users_api_batch.pipe:48-53: deleted = false, order by id.
        return ctx.ref("produce_api").filter(F.col("deleted") == 0).orderBy("id")

    return Pipe("users_api_batch", [
        Node("get_new_events", get_new_events),
        Node("backfill_last_batch", backfill_last_batch),
        Node("produce_api", produce_api),
        Node("api_publish", api_publish),
    ])


def register_users_pipes(registry: Registry) -> Registry:
    registry.add_pipe(users_api_rmt_pipe())
    registry.add_pipe(users_batch_copy_pipe())
    registry.add_pipe(users_api_batch_pipe())
    return registry
