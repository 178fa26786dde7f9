"""Stream-stream attribution join: streamed edges must equal the batch
join over the same data, and a restarted stream must emit only the new
matches (including cross-run pairs whose click arrived in run 1)."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.joins import (
    StreamingAttributionJoin,
)

SCHEMA = T.StructType([T.StructField("user_id", T.LongType()),
                       T.StructField("event_id", T.LongType()),
                       T.StructField("epoch", T.LongType())])

T0 = 1_700_000_000


def write_rows(path, rows):
    path.write_text("\n".join(
        json.dumps({"user_id": u, "event_id": e, "epoch": T0 + m * 60})
        for u, e, m in rows) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.user_id", "j.event_id",
                    F.timestamp_seconds("j.epoch").alias("ts")))


def run_once(spark, aj, clicks_dir, purchases_dir, ckpt):
    q = aj.start(source(spark, clicks_dir), source(spark, purchases_dir),
                 str(ckpt), trigger_once=True)
    q.awaitTermination(180)
    assert not q.isActive


def edges(table):
    return {(r["user_id"], r["click_id"], r["purchase_id"], r["lag_micros"])
            for r in table.read().collect()}


# (user, event_id, minute): purchases at +30min match a 1h window;
# +90min does not; user 2's purchase precedes its click (no match)
CLICKS_A = [(1, 100, 0), (1, 101, 45), (2, 102, 50)]
PURCH_A = [(1, 500, 30), (2, 501, 10)]
CLICKS_B = [(3, 103, 60)]
PURCH_B = [(1, 502, 70), (3, 503, 61)]


def _expected(spark, aj, clicks, purchases):
    raw = [(u, e, T0 + m * 60) for u, e, m in clicks]
    rawp = [(u, e, T0 + m * 60) for u, e, m in purchases]
    c = (spark.createDataFrame(raw, SCHEMA)
         .select("user_id", "event_id",
                 F.timestamp_seconds("epoch").alias("ts")))
    p = (spark.createDataFrame(rawp, SCHEMA)
         .select("user_id", "event_id",
                 F.timestamp_seconds("epoch").alias("ts")))
    return {(r["user_id"], r["click_id"], r["purchase_id"], r["lag_micros"])
            for r in aj.plan(c, p).collect()}


def test_streamed_edges_match_batch_join_and_restart(spark, tmp_path):
    clicks_dir, purch_dir = tmp_path / "clicks", tmp_path / "purchases"
    clicks_dir.mkdir()
    purch_dir.mkdir()
    aj = StreamingAttributionJoin(
        out_table=AppendTable(spark, str(tmp_path / "edges")))

    write_rows(clicks_dir / "a.json", CLICKS_A)
    write_rows(purch_dir / "a.json", PURCH_A)
    run_once(spark, aj, clicks_dir, purch_dir, tmp_path / "ckpt")

    exp_a = _expected(spark, aj, CLICKS_A, PURCH_A)
    assert edges(aj.out_table) == exp_a
    # sanity on the fixture: in-window pair found, pre-click purchase not
    assert any(c == 100 and p == 500 for _, c, p, _ in exp_a)
    assert not any(c == 102 for _, c, p, _ in exp_a)

    # restart with new files: cross-run matches (run-1 click 100/101 ⋈
    # run-2 purchase 502) come from the join STATE surviving the
    # checkpoint; total equals the batch join over everything
    write_rows(clicks_dir / "b.json", CLICKS_B)
    write_rows(purch_dir / "b.json", PURCH_B)
    run_once(spark, aj, clicks_dir, purch_dir, tmp_path / "ckpt")

    exp_all = _expected(spark, aj, CLICKS_A + CLICKS_B, PURCH_A + PURCH_B)
    assert edges(aj.out_table) == exp_all
    assert any(c == 101 and p == 502 for _, c, p, _ in exp_all)  # cross-run
    assert len(exp_all) > len(exp_a)
