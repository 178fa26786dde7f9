"""Streaming sessionization (applyInPandasWithState): gap semantics,
event-time timeout closure, restart survival, and parity with the batch
operator's session summaries."""

import datetime as dt
import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.sessionize import StreamingSessionize

SCHEMA = T.StructType([T.StructField("user_id", T.LongType()),
                       T.StructField("ts", T.TimestampType())])

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
GAP_US = 30 * 60 * 1_000_000          # 30 min sessions for the test


def write_events(path, events):
    path.write_text("\n".join(
        json.dumps({"user_id": u, "ts": (T0 + dt.timedelta(minutes=m))
                    .strftime("%Y-%m-%dT%H:%M:%S")})
        for u, m in events) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.user_id", "j.ts"))


def run_once(spark, sess, src_dir, ckpt):
    q = sess.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(180)
    assert not q.isActive


def test_sessions_close_on_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = AppendTable(spark, str(tmp_path / "sessions"))
    sess = StreamingSessionize(out_table=out, gap_micros=GAP_US,
                               watermark_delay="5 minutes")

    # file a: user 1 has two sessions separated by an in-batch 40-min gap
    # (minutes 0..10, then 50..55); user 2 one session (minutes 0..5)
    write_events(src / "a.json", [(1, 0), (1, 10), (1, 50), (1, 55),
                                  (2, 0), (2, 5)])
    # file b: far-future event pushes the watermark past every session
    write_events(src / "b.json", [(9, 600)])
    # file c: processed with b's watermark -> timeouts fire
    write_events(src / "c.json", [(9, 601)])
    run_once(spark, sess, src, tmp_path / "ckpt")

    rows = {(r["user_id"], r["session_start"].minute): r
            for r in out.read().collect()}
    # user 1's FIRST session closed by the in-batch gap, second by timeout
    s10 = rows[(1, 0)]
    assert s10["session_end"] == T0 + dt.timedelta(minutes=10)
    assert s10["n_events"] == 2 and s10["duration_micros"] == 10 * 60 * 1_000_000
    s150 = rows[(1, 50)]
    assert s150["n_events"] == 2
    s2 = rows[(2, 0)]
    assert s2["n_events"] == 2 and s2["duration_micros"] == 5 * 60 * 1_000_000
    # user 9's session is still OPEN (nothing beyond its last + gap)
    assert not any(u == 9 for u, _ in rows)

    # restart: state survives the stop — a new far-future file closes 9
    write_events(src / "d.json", [(7, 2000)])
    write_events(src / "e.json", [(7, 2001)])
    run_once(spark, sess, src, tmp_path / "ckpt")
    rows2 = [r for r in out.read().collect() if r["user_id"] == 9]
    assert len(rows2) == 1 and rows2[0]["n_events"] == 2


def test_streaming_matches_batch_sessionization(spark, tmp_path):
    """Every CLOSED streaming session must equal the batch operator's
    summary row for the same (user, start) — same start/end/count."""
    from demo_cdc_users_airline_spark.operators.temporal import (
        events_sessionization,
    )

    src = tmp_path / "in"
    src.mkdir()
    out = AppendTable(spark, str(tmp_path / "sessions"))
    sess = StreamingSessionize(out_table=out, gap_micros=GAP_US,
                               watermark_delay="5 minutes")
    data = [(1, 0), (1, 5), (1, 45), (2, 3), (2, 20), (3, 7)]
    write_events(src / "a.json", data)
    write_events(src / "b.json", [(9, 500)])
    write_events(src / "c.json", [(9, 501)])
    run_once(spark, sess, src, tmp_path / "ckpt")

    # batch replay with the SAME gap over the same events
    ev = spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), i)
         for i, (u, m) in enumerate(data)],
        "user_id long, ts timestamp, event_id long")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(F.lag("ts").over(w).isNull() | (gap > GAP_US), 1).otherwise(0)
    batch = (ev.withColumn("seq", F.sum(is_new).over(run))
             .groupBy("user_id", "seq")
             .agg(F.min("ts").alias("session_start"),
                  F.max("ts").alias("session_end"),
                  F.count(F.lit(1)).alias("n_events")))
    expect = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
              for r in batch.collect()}
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in out.read().collect()}
    assert got == expect  # every session closed; closed set == batch set


def test_sessionize_on_rocksdb_state_store(spark, tmp_path):
    """applyInPandasWithState sessionization on the RocksDB provider
    (ROADMAP note: the dedup suite exercised RocksDB, the pandas-state
    operator did not): identical session semantics, state surviving a
    restart against the same RocksDB checkpoint, and real RocksDB
    artifacts in the state directory."""
    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        src = tmp_path / "in"
        src.mkdir()
        out = AppendTable(spark, str(tmp_path / "sessions"))
        sess = StreamingSessionize(out_table=out, gap_micros=GAP_US,
                                   watermark_delay="5 minutes")
        write_events(src / "a.json", [(1, 0), (1, 10), (2, 0), (2, 5)])
        write_events(src / "b.json", [(9, 600)])
        write_events(src / "c.json", [(9, 601)])
        run_once(spark, sess, src, tmp_path / "ckpt")
        rows = {(r["user_id"], r["session_start"].minute): r
                for r in out.read().collect()}
        assert rows[(1, 0)]["n_events"] == 2
        assert rows[(2, 0)]["n_events"] == 2
        assert not any(u == 9 for u, _ in rows)  # still open in state

        # restart on the SAME RocksDB checkpoint: user 9's open session
        # closes when a later watermark arrives -> state really survived
        write_events(src / "d.json", [(7, 2000)])
        write_events(src / "e.json", [(7, 2001)])
        run_once(spark, sess, src, tmp_path / "ckpt")
        nine = [r for r in out.read().collect() if r["user_id"] == 9]
        assert len(nine) == 1 and nine[0]["n_events"] == 2

        state = tmp_path / "ckpt" / "state"
        files = [p.name for p in state.rglob("*") if p.is_file()]
        assert any(n.endswith((".zip", ".sst", ".changelog"))
                   or "rocksdb" in n.lower() for n in files), files
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
