"""Watermarked streaming minute-rollup: append-mode window finalization
must match a batch re-aggregation of the same events exactly."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.rollup import StreamingMinuteRollup

SCHEMA = T.StructType([T.StructField("ts", T.TimestampType()),
                       T.StructField("value", T.DoubleType())])


def write_events_file(path, minute_values):
    """minute_values: list of (minute_offset, value) — one event each."""
    lines = [json.dumps({"ts": f"2026-01-01 10:{m:02d}:30.000000", "value": v})
             for m, v in minute_values]
    path.write_text("\n".join(lines) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.ts", "j.value"))


def run_once(spark, rollup, src_dir, ckpt):
    q = rollup.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def test_windows_finalize_once_and_match_batch_replay(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = AppendTable(spark, str(tmp_path / "rollup"))
    rollup = StreamingMinuteRollup(out_table=out, watermark_delay="10 minutes")

    # batch 1: minutes 0-5 (two events in minute 0); batch 2 advances the
    # clock to minute 40, pushing the watermark to ~minute 30 so the
    # early windows finalize and are emitted exactly once
    write_events_file(src / "a.json",
                      [(0, 1.0), (0, 2.5), (1, 3.0), (3, 4.0), (5, 5.0)])
    write_events_file(src / "b.json", [(40, 7.0)])
    run_once(spark, rollup, src, tmp_path / "ckpt")

    rows = {r["minute"].minute: (r["n_events"], r["total_value"])
            for r in out.read().collect()}
    assert rows.get(0) == (2, 3.5)      # two events aggregated exactly
    assert rows.get(1) == (1, 3.0)
    assert rows.get(3) == (1, 4.0)
    assert rows.get(5) == (1, 5.0)
    assert 40 not in rows               # open window not yet finalized
    assert len(rows) == 4

    # a later batch must not re-emit finalized windows (append-once)
    write_events_file(src / "c.json", [(55, 9.0)])
    run_once(spark, rollup, src, tmp_path / "ckpt")
    rows2 = [r for r in out.read().collect() if r["minute"].minute == 0]
    assert len(rows2) == 1              # still exactly one row for minute 0
    # minute-40 window finalized once the watermark passed it
    finalized = {r["minute"].minute for r in out.read().collect()}
    assert 40 in finalized

    # the materialized rollup equals a batch replay over on-time events
    batch = (spark.read.format("text").load(str(src))
             .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
             .select("j.ts", "j.value"))
    replay = {r["minute"].minute: (r["n_events"], r["total_value"])
              for r in rollup.plan(batch).collect()}
    got = {r["minute"].minute: (r["n_events"], r["total_value"])
           for r in out.read().collect()}
    for minute, agg in got.items():     # every emitted window is exact
        assert replay[minute] == agg


def test_append_idempotent_batch_rerun(spark, tmp_path):
    """foreachBatch is at-least-once: simulate the crash-between-sink-
    write-and-checkpoint-commit case by re-running a batch id — the sink
    must REPLACE the batch's rows, not duplicate them (ADVICE r2)."""
    from demo_cdc_users_airline_spark.sources.tables import AppendTable

    t = AppendTable(spark, str(tmp_path / "idem"))
    b0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    t.append_idempotent(b0, 0)
    t.append_idempotent(b0, 0)                    # the retry
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) == [
        (1, 10.0), (2, 20.0)]
    b1 = spark.createDataFrame([(3, 30.0)], "k int, v double")
    t.append_idempotent(b1, 1)                    # later batch appends
    assert t.read().count() == 3
    t.append_idempotent(b1, 1)                    # its retry is absorbed too
    assert t.read().count() == 3
    assert "ingest_batch_id" not in t.read().columns
