"""Streaming CDC ingestion: continuous upsert into a VersionedTable.

Reproduces the reference's ingest loop (SURVEY §3.1): Kafka topic →
JSONPath extraction → raw append table → materialized-view transform →
ReplacingMergeTree latest table, as ONE Structured Streaming query per
source table:

    readStream → parse_cdc_json → foreachBatch:
        (a) append typed rows to the raw history table
        (b) append quarantine rows to the side table
        (c) apply the mv transform and merge into the latest table

Delivery semantics match the reference: at-least-once upstream +
idempotent sink — duplicates/out-of-order arrivals are absorbed
because VersionedTable resolves reads by max (version, __timestamp)
(ReplacingMergeTree ENGINE_VER semantics), so no watermark/state is
needed and per-key state is unbounded by design (a table of entities,
not windows — SURVEY §2.8). Periodic ``compact()`` plays the
background-merge role.

Kafka vs files: the container has no broker, so tests drive the same
code with the file source (``readStream.format("json")`` or
``text``); on a cluster swap ``source_stream`` for
``spark.readStream.format("kafka")...`` — everything downstream is
identical. Checkpoint dir ≡ consumer group id (offset tracking).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.cdc import parse_cdc_json
from ..sources.tables import AppendTable, VersionedTable


@dataclass
class CdcPipeline:
    """One table's continuous ingest pipeline (raw + quarantine + latest)."""

    spark: SparkSession
    schema: T.StructType
    raw_table: AppendTable
    latest_table: VersionedTable
    quarantine_table: AppendTable | None = None
    mv_transform: Callable[[DataFrame], DataFrame] | None = None
    store_raw_value: bool = False
    compact_every_n_batches: int = 0  # 0 = never; the background-merge cadence
    _batches_seen: int = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body — the reference's per-ingested-block MV fire
        (users_mv.pipe TYPE materialized)."""
        good, quarantine = parse_cdc_json(
            batch_df, self.schema, store_raw_value=self.store_raw_value)
        good = good.localCheckpoint(eager=True)  # parse once, reuse twice
        self.raw_table.append(good)
        if self.quarantine_table is not None:
            q = quarantine.localCheckpoint(eager=True)
            if q.limit(1).count():
                self.quarantine_table.append(q)
        block = self.mv_transform(good) if self.mv_transform else good
        self.latest_table.merge(block)
        self._batches_seen += 1
        if (self.compact_every_n_batches
                and self._batches_seen % self.compact_every_n_batches == 0):
            # ReplacingMergeTree background merge analogue: bound the
            # version history so latest() stays O(|keys|)
            self.latest_table.compact()

    def replay_quarantine(self, fix: Callable[[DataFrame], DataFrame] | None = None
                          ) -> tuple[int, int]:
        """Re-ingest quarantined rows after an upstream fix — the
        reference's quarantine recovery workflow (rows park with their
        raw payload precisely so they can be re-sent once the producer
        or schema is repaired).

        ``fix`` optionally transforms the raw ``value`` column (e.g.
        repair a malformed payload). Recovered rows route through the
        NORMAL ingest path (raw append + mv transform + versioned
        merge — idempotent, so replaying an already-recovered row is
        harmless); still-bad rows remain quarantined. Returns
        ``(n_recovered, n_remaining)``.
        """
        qt = self.quarantine_table
        if qt is None or not qt.exists():
            return (0, 0)
        raw = qt.read().select(F.col("__value").alias("value"))
        if fix is not None:
            raw = fix(raw)
        good, still_bad = parse_cdc_json(
            raw, self.schema, store_raw_value=self.store_raw_value)
        # materialize BEFORE truncating the table they are derived from
        good = good.localCheckpoint(eager=True)
        still_bad = still_bad.localCheckpoint(eager=True)
        n_good, n_bad = good.count(), still_bad.count()
        if n_good:
            self.raw_table.append(good)
            block = self.mv_transform(good) if self.mv_transform else good
            self.latest_table.merge(block)
        # atomic swap, never truncate-then-append: the parked raw
        # payloads are the ONLY copy of the unrecoverable rows, and a
        # crash between a truncate and the re-append would lose them —
        # the rename-aside swap leaves either the old or the new row set
        # on disk at every instant
        qt._swap_rewrite(still_bad, ".replay")
        return n_good, n_bad

    def start(self, source_stream: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        """Attach to a streaming source of raw JSON lines (col ``value``)."""
        writer = (source_stream.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def kafka_source_options(brokers: str, topic: str, group_id: str,
                         auto_offset_reset: str = "latest",
                         store_headers: bool = False) -> dict[str, str]:
    """Reader options mapping the reference's Kafka datasource settings
    (users_raw.datasource:20-27) onto Structured Streaming's Kafka source:

    - KAFKA_TOPIC            → ``subscribe``
    - KAFKA_AUTO_OFFSET_RESET → ``startingOffsets`` (first start only;
      after that the checkpoint owns offsets)
    - KAFKA_GROUP_ID         → ``groupIdPrefix`` for broker-side
      monitoring parity. Offset *tracking* does NOT use the group:
      Structured Streaming commits offsets to the checkpoint dir, so the
      checkpoint passed to ``CdcPipeline.start`` is the real group
      identity (derive it from group_id for 1:1 semantics).
    - KAFKA_STORE_HEADERS    → ``includeHeaders``

    ``failOnDataLoss=false`` matches the reference's at-least-once
    posture (retention-expired offsets skip forward rather than kill the
    ingest; the idempotent RMT sink absorbs any replay).
    """
    if auto_offset_reset not in ("latest", "earliest"):
        raise ValueError(f"unsupported KAFKA_AUTO_OFFSET_RESET {auto_offset_reset!r}")
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": auto_offset_reset,
        "groupIdPrefix": group_id,
        "includeHeaders": "true" if store_headers else "false",
        "failOnDataLoss": "false",
    }


def kafka_reader(spark: SparkSession, brokers: str, topic: str, group_id: str,
                 auto_offset_reset: str = "latest",
                 store_headers: bool = False):
    """Configured ``readStream.format("kafka")`` reader (not yet loaded —
    split from kafka_source so option wiring is testable without a
    broker/connector in the container)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
            brokers, topic, group_id, auto_offset_reset, store_headers).items():
        reader = reader.option(k, v)
    return reader


def kafka_source(spark: SparkSession, brokers: str, topic: str, group_id: str,
                 auto_offset_reset: str = "latest",
                 store_headers: bool = False) -> DataFrame:
    """The real Kafka CDC source: message value → the same ``value``
    string column ``file_json_source`` produces, so a CdcPipeline runs
    unchanged on either. On a cluster:

        pipe.start(kafka_source(spark, brokers, topic, group),
                   checkpoint_dir=f"/checkpoints/{group}")
    """
    return (kafka_reader(spark, brokers, topic, group_id,
                         auto_offset_reset, store_headers)
            .load()
            .selectExpr("CAST(value AS STRING) AS value"))


def file_json_source(spark: SparkSession, directory: str) -> DataFrame:
    """File-based stand-in for the Kafka source: each file is a batch of
    JSON-line CDC events; ``value`` column mirrors the Kafka message."""
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(directory)
            .select(F.col("value")))
