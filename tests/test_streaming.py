"""Structured Streaming CDC pipeline (SURVEY §3.1, file-source stand-in).

Verifies the continuous ingest loop end-to-end: JSON event files →
parse/quarantine → raw append + mv transform + VersionedTable merge,
with checkpointed progress across restarts, duplicate-delivery
idempotence, and propagation latency within the reference's 15 s
budget (modules/utils.py:48-49).
"""

import time

from demo_cdc_users_airline_spark.plans.users import users_mv_pg
from demo_cdc_users_airline_spark.sources.cdc import USERS_RAW_PG_SCHEMA
from demo_cdc_users_airline_spark.sources.tables import (
    AppendTable,
    VersionedTable,
)
from demo_cdc_users_airline_spark.streaming.upsert import CdcPipeline, file_json_source

from fixtures import gen_users_events, users_events_to_json_lines


def make_pipeline(spark, tmp_path, latest_cls=VersionedTable):
    raw = AppendTable(spark, str(tmp_path / "raw"))
    latest = latest_cls(spark, str(tmp_path / "latest"), key=["id"],
                        version="updated_at", tiebreak=["__timestamp"])
    quarantine = AppendTable(spark, str(tmp_path / "quarantine"))
    return CdcPipeline(
        spark=spark, schema=USERS_RAW_PG_SCHEMA, raw_table=raw,
        latest_table=latest, quarantine_table=quarantine,
        mv_transform=users_mv_pg, store_raw_value=False,
    )


def run_available(pipeline, spark, src_dir, ckpt_dir):
    stream = file_json_source(spark, str(src_dir))
    q = pipeline.start(stream, str(ckpt_dir), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_ingest_restart_and_idempotence(spark, tmp_path):
    events, truth = gen_users_events(n=120, seed=21, null_probability=0.0)
    lines = users_events_to_json_lines(events)
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    pipeline = make_pipeline(spark, tmp_path)

    # batch 1: first half
    (src / "batch1.json").write_text("\n".join(lines[:60]) + "\n")
    t0 = time.monotonic()
    run_available(pipeline, spark, src, ckpt)
    latency = time.monotonic() - t0
    assert latency < 15, f"propagation {latency:.1f}s exceeds the 15s budget"
    assert pipeline.raw_table.read().count() == 60

    # restart with a new file: checkpoint must skip batch1
    (src / "batch2.json").write_text("\n".join(lines[60:]) + "\n")
    run_available(pipeline, spark, src, ckpt)
    assert pipeline.raw_table.read().count() == 120

    state = {r["id"]: r for r in pipeline.latest_table.latest().collect()}
    assert len(state) == len(truth)
    for uid, t in truth.items():
        assert state[uid]["updated_at"] == t["updated_at"]
        assert int(state[uid]["deleted"]) == t["deleted"]

    # duplicate delivery: replay the same events as a new file (new data,
    # same content) — final state must be unchanged (idempotent sink)
    (src / "batch3_dupes.json").write_text("\n".join(lines[:60]) + "\n")
    run_available(pipeline, spark, src, ckpt)
    state2 = {r["id"]: r for r in pipeline.latest_table.latest().collect()}
    assert {k: (v["updated_at"], v["deleted"]) for k, v in state2.items()} \
        == {k: (v["updated_at"], v["deleted"]) for k, v in state.items()}


def test_stream_quarantine_side_output(spark, tmp_path):
    events, _ = gen_users_events(n=20, seed=22)
    lines = users_events_to_json_lines(events)
    lines.insert(0, "NOT-JSON {{{{")
    src = tmp_path / "incoming"
    src.mkdir()
    pipeline = make_pipeline(spark, tmp_path)
    (src / "b.json").write_text("\n".join(lines) + "\n")
    run_available(pipeline, spark, src, tmp_path / "ckpt")
    assert pipeline.raw_table.read().count() == 20
    assert pipeline.quarantine_table.read().count() == 1


def test_stream_into_merge_on_write_backend(spark, tmp_path):
    """The MERGE-based RMT backend drops into the identical streaming
    loop: same CdcPipeline, same idempotence, state stays compacted."""
    from demo_cdc_users_airline_spark.sources.tables import MergeOnWriteTable

    events, truth = gen_users_events(n=60, seed=33, null_probability=0.0)
    lines = users_events_to_json_lines(events)
    src = tmp_path / "incoming"
    src.mkdir()
    pipeline = make_pipeline(spark, tmp_path, latest_cls=MergeOnWriteTable)
    (src / "b1.json").write_text("\n".join(lines[:40]) + "\n")
    (src / "b2.json").write_text("\n".join(lines[40:]) + "\n")
    run_available(pipeline, spark, src, tmp_path / "ckpt")
    state = {r["id"]: r for r in pipeline.latest_table.latest().collect()}
    assert len(state) == len(truth)
    for uid, t in truth.items():
        assert state[uid]["updated_at"] == t["updated_at"]
    # merge-on-write: stored table IS the state (one row per key)
    assert pipeline.latest_table.read().count() == len(truth)
    # duplicate replay absorbs
    (src / "b3_dupes.json").write_text("\n".join(lines[:40]) + "\n")
    run_available(pipeline, spark, src, tmp_path / "ckpt")
    state2 = {r["id"]: r["updated_at"] for r in pipeline.latest_table.latest().collect()}
    assert state2 == {k: v["updated_at"] for k, v in state.items()}


def test_kafka_source_option_wiring():
    """Broker-free validation of the Kafka reader construction: the
    reference's datasource settings (users_raw.datasource:20-27) must map
    onto the Structured Streaming Kafka source options exactly."""
    import pytest

    from demo_cdc_users_airline_spark.streaming.upsert import (
        kafka_reader,
        kafka_source_options,
    )

    opts = kafka_source_options(
        brokers="broker1:9092,broker2:9092",
        topic="postgres_cdc_demo.public.users",
        group_id="postgres_cdc_demo.public.users_1694424162",
        auto_offset_reset="latest",
        store_headers=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "postgres_cdc_demo.public.users",
        "startingOffsets": "latest",
        "groupIdPrefix": "postgres_cdc_demo.public.users_1694424162",
        "includeHeaders": "false",
        "failOnDataLoss": "false",
    }
    assert kafka_source_options("b", "t", "g", "earliest",
                                store_headers=True)["startingOffsets"] == "earliest"
    assert kafka_source_options("b", "t", "g", store_headers=True)["includeHeaders"] == "true"
    with pytest.raises(ValueError):
        kafka_source_options("b", "t", "g", auto_offset_reset="none")

    class FakeReader:
        def __init__(self):
            self.fmt = None
            self.opts = {}

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

    class FakeSpark:
        def __init__(self):
            self.readStream = FakeReader()

    fake = FakeSpark()
    reader = kafka_reader(fake, "b:9092", "topic", "grp")
    assert reader.fmt == "kafka"
    assert reader.opts["subscribe"] == "topic"
    assert reader.opts["kafka.bootstrap.servers"] == "b:9092"


def test_quarantine_replay_recovers_fixed_rows(spark, tmp_path):
    """Quarantine recovery: after an upstream fix, replayed rows flow
    through the normal ingest path; unrecoverable rows stay parked."""
    from pyspark.sql import functions as F

    events, truth = gen_users_events(n=10, seed=44, null_probability=0.0)
    lines = users_events_to_json_lines(events)
    # two bad rows: one repairable (stray prefix), one hopeless
    lines.insert(0, "GARBAGE>>" + lines[0])
    lines.insert(1, "{{{not json")
    src = tmp_path / "incoming"
    src.mkdir()
    pipeline = make_pipeline(spark, tmp_path)
    (src / "b.json").write_text("\n".join(lines) + "\n")
    run_available(pipeline, spark, src, tmp_path / "ckpt")
    assert pipeline.quarantine_table.read().count() == 2

    recovered, remaining = pipeline.replay_quarantine(
        fix=lambda df: df.withColumn(
            "value", F.regexp_replace("value", r"^GARBAGE>>", "")))
    assert (recovered, remaining) == (1, 1)
    assert pipeline.quarantine_table.read().count() == 1
    # the recovered duplicate of row 0 is absorbed idempotently: final
    # state still matches the replay truth
    state = {r["id"]: r for r in pipeline.latest_table.latest().collect()}
    assert len(state) == len(truth)
    for uid, t in truth.items():
        assert state[uid]["updated_at"] == t["updated_at"]
    # replaying again with no fix is a no-op for the hopeless row
    assert pipeline.replay_quarantine() == (0, 1)
