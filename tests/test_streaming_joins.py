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


def test_left_outer_emits_unconverted_clicks_after_watermark(spark, tmp_path):
    """Outer rows (click, NULL purchase) may only appear once the
    purchase watermark proves the window closed — and then exactly
    once."""
    clicks_dir, purch_dir = tmp_path / "clicks", tmp_path / "purchases"
    clicks_dir.mkdir()
    purch_dir.mkdir()
    aj = StreamingAttributionJoin(
        out_table=AppendTable(spark, str(tmp_path / "edges")),
        join_type="left_outer")

    # user 10's click 900 never converts; user 9's click 901 does
    write_rows(clicks_dir / "a.json", [(10, 900, 0), (9, 901, 5)])
    write_rows(purch_dir / "a.json", [(9, 700, 20)])
    run_once(spark, aj, clicks_dir, purch_dir, tmp_path / "ckpt")

    first = edges(aj.out_table)
    # the in-window inner match emits eagerly
    assert any(c == 901 and p == 700 for _, c, p, _ in first)
    # click 900's fate is still open (watermark hasn't passed 0+60+10)
    assert not any(c == 900 and p is None for _, c, p, _ in first)

    # advance the watermark far past every open window on both sides
    write_rows(clicks_dir / "b.json", [(8, 902, 500)])
    write_rows(purch_dir / "b.json", [(8, 701, 500)])
    run_once(spark, aj, clicks_dir, purch_dir, tmp_path / "ckpt")
    # one more cycle: outer rows flush on the trigger AFTER the
    # watermark update takes effect
    write_rows(purch_dir / "c.json", [(7, 702, 501)])
    run_once(spark, aj, clicks_dir, purch_dir, tmp_path / "ckpt")

    final = edges(aj.out_table)
    outer_900 = [(u, c, p, l) for u, c, p, l in final
                 if c == 900 and p is None]
    assert len(outer_900) == 1          # exactly one NULL-purchase row
    assert outer_900[0][3] is None      # no lag for an unconverted click
    # converted clicks never get a spurious outer row
    assert not any(c == 901 and p is None for _, c, p, _ in final)
