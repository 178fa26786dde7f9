"""Continuous-trigger streaming soak (SURVEY §3.1 / BASELINE 15 s budget).

Runs the CdcPipeline under a real continuous micro-batch trigger while
event files arrive over time, and measures end-to-end propagation
latency (file landed → latest-state queryable) the way the reference
measures it (demo_users.py:245-262: poll until convergence, report
latency, 15 s timeout).
"""

import time

from demo_cdc_users_airline_spark.plans.users import users_mv_pg
from demo_cdc_users_airline_spark.sources.cdc import USERS_RAW_PG_SCHEMA
from demo_cdc_users_airline_spark.sources.tables import AppendTable, VersionedTable
from demo_cdc_users_airline_spark.streaming.upsert import CdcPipeline, file_json_source

from fixtures import gen_users_events, users_events_to_json_lines

TIMEOUT_WAIT = 15   # modules/utils.py:48
SLEEP_WAIT = 0.5    # poll finer than the reference's 1 s to measure latency


def test_continuous_propagation_latency(spark, tmp_path):
    events, truth = gen_users_events(n=150, seed=31, null_probability=0.0)
    lines = users_events_to_json_lines(events)
    src = tmp_path / "incoming"
    src.mkdir()
    latest = VersionedTable(spark, str(tmp_path / "latest"), key=["id"],
                            version="updated_at", tiebreak=["__timestamp"])
    pipeline = CdcPipeline(spark=spark, schema=USERS_RAW_PG_SCHEMA,
                           raw_table=AppendTable(spark, str(tmp_path / "raw")),
                           latest_table=latest, mv_transform=users_mv_pg)
    stream = file_json_source(spark, str(src))
    query = (stream.writeStream
             .foreachBatch(pipeline.process_batch)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(processingTime="1 second")
             .start())
    try:
        latencies = []
        cut1, cut2 = 50, 100
        for lo, hi in ((0, cut1), (cut1, cut2), (cut2, len(lines))):
            batch_truth_ids = {e["id"] for e in events[:hi]}
            max_updated = max(e["updated_at"] for e in events[:hi])
            (src / f"batch_{lo}.json").write_text("\n".join(lines[lo:hi]) + "\n")
            t0 = time.monotonic()
            converged = False
            while time.monotonic() - t0 < TIMEOUT_WAIT:
                if latest.exists():
                    rows = latest.latest().collect()
                    got = {r["id"] for r in rows}
                    got_max = max((r["updated_at"] for r in rows), default=None)
                    import datetime
                    want_max = (datetime.datetime(1970, 1, 1)
                                + datetime.timedelta(microseconds=max_updated))
                    if got == batch_truth_ids and got_max == want_max:
                        converged = True
                        break
                time.sleep(SLEEP_WAIT)
            latency = time.monotonic() - t0
            latencies.append(latency)
            assert converged, (f"batch [{lo}:{hi}) did not converge within "
                               f"{TIMEOUT_WAIT}s (reference budget)")
        print(f"\npropagation latencies: {[f'{x:.1f}s' for x in latencies]}")
        # final state equals the replay truth
        state = {r["id"]: r for r in latest.latest().collect()}
        assert len(state) == len(truth)
        for uid, t in truth.items():
            assert int(state[uid]["deleted"]) == t["deleted"]
    finally:
        query.stop()


def test_compaction_cadence_bounds_state(spark, tmp_path):
    """VERDICT r5 item 6: with compact_every_n_batches set, the
    versioned table's ON-DISK history stays O(|entities|) as batches
    accumulate — latest() reads a bounded file set, and LWW state is
    untouched by every compaction."""
    import glob

    events, truth = gen_users_events(n=180, seed=47, null_probability=0.0)
    lines = users_events_to_json_lines(events)
    src = tmp_path / "incoming"
    src.mkdir()
    latest = VersionedTable(spark, str(tmp_path / "latest"), key=["id"],
                            version="updated_at", tiebreak=["__timestamp"])
    pipeline = CdcPipeline(spark=spark, schema=USERS_RAW_PG_SCHEMA,
                           raw_table=AppendTable(spark, str(tmp_path / "raw")),
                           latest_table=latest, mv_transform=users_mv_pg,
                           compact_every_n_batches=2)

    chunks = [lines[i:i + 30] for i in range(0, len(lines), 30)]  # 6 batches
    seen_events = 0
    for i, chunk in enumerate(chunks):
        (src / f"batch_{i}.json").write_text("\n".join(chunk) + "\n")
        stream = file_json_source(spark, str(src))
        q = pipeline.start(stream, str(tmp_path / "ckpt"), trigger_once=True)
        q.awaitTermination(120)
        assert not q.isActive
        seen_events += len(chunk)
        n_keys = len({e["id"] for e in events[:seen_events]})
        n_rows = latest.read().count()
        if pipeline._batches_seen % 2 == 0:
            # post-compact: exactly one row per live key on disk
            assert n_rows == n_keys, (i, n_rows, n_keys)
        else:
            # at most one uncompacted batch of history on top
            assert n_rows <= n_keys + len(chunk), (i, n_rows, n_keys)

    assert pipeline._batches_seen == len(chunks)
    # the data-file set is bounded (one compacted snapshot, not history)
    files = glob.glob(str(tmp_path / "latest" / "**" / "*.parquet"),
                      recursive=True)
    assert 0 < len(files) <= 32, len(files)
    # raw append-only audit log keeps the FULL history
    assert pipeline.raw_table.read().count() == len(events)
    # LWW state unchanged by compaction: equals the replay truth
    state = {r["id"]: r for r in latest.latest().collect()}
    assert len(state) == len(truth)
    for uid, t in truth.items():
        assert int(state[uid]["deleted"]) == t["deleted"]
