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
from demo_cdc_users_airline_spark.sources.tables import AppendTable, VersionedTable
from demo_cdc_users_airline_spark.streaming.upsert import CdcPipeline, file_json_source

from fixtures import gen_users_events, users_events_to_json_lines


def make_pipeline(spark, tmp_path):
    raw = AppendTable(spark, str(tmp_path / "raw"))
    latest = VersionedTable(spark, str(tmp_path / "latest"), key=["id"],
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
