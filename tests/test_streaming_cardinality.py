"""Streaming HLL: the continuously-merged register table must equal the
batch registers over the same data (max-merge exactness), survive
restarts, and absorb duplicate deliveries without drift."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.sketches import (
    _HLL_M,
    hll_registers,
)
from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.cardinality import (
    StreamingHllDistinct,
)

SCHEMA = T.StructType([T.StructField("event_type", T.StringType()),
                       T.StructField("user_id", T.LongType())])


def write_events(path, rows):
    path.write_text("\n".join(json.dumps({"event_type": t, "user_id": u})
                              for t, u in rows) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.event_type", "j.user_id"))


def run_once(spark, hll, src_dir, ckpt):
    q = hll.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def _regs(table):
    return {(r["event_type"], r["bucket"]): r["reg"]
            for r in table.read().collect()}


def test_streaming_registers_match_batch_and_survive_restart(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    state = AppendTable(spark, str(tmp_path / "hll_state"))
    hll = StreamingHllDistinct(state_table=state)

    batch_a = [("view", u) for u in range(200)] + [("click", u) for u in range(50)]
    batch_b = [("view", u) for u in range(150, 400)] + [("buy", 7)]
    write_events(src / "a.json", batch_a)
    write_events(src / "b.json", batch_b)
    run_once(spark, hll, src, tmp_path / "ckpt")

    # streaming state == batch registers over the union (max-merge exact)
    all_rows = spark.createDataFrame(batch_a + batch_b, SCHEMA)
    expect = {(r["event_type"], r["bucket"]): r["reg"]
              for r in hll_registers(all_rows, "event_type", "user_id").collect()}
    assert _regs(state) == expect

    # estimates serve per key, bounded registers
    est = {r["event_type"]: r for r in hll.estimate().collect()}
    assert set(est) == {"view", "click", "buy"}
    assert abs(est["view"]["hll_estimate"] - 400) / 400 < 0.25
    assert abs(est["click"]["hll_estimate"] - 50) / 50 < 0.25
    assert state.read().count() <= 3 * _HLL_M  # state is keys x m, bounded

    # restart + duplicate delivery: max-merge absorbs the replayed file
    write_events(src / "c.json", batch_a)  # exact duplicates
    run_once(spark, hll, src, tmp_path / "ckpt")
    assert _regs(state) == expect  # no drift

    # genuinely new elements move registers forward only
    write_events(src / "d.json", [("view", u) for u in range(400, 500)])
    run_once(spark, hll, src, tmp_path / "ckpt")
    after = _regs(state)
    assert all(after[k] >= v for k, v in expect.items())
    est2 = {r["event_type"]: r for r in hll.estimate().collect()}
    assert est2["view"]["hll_estimate"] > est["view"]["hll_estimate"]
