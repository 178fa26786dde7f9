"""Streaming histogram: merged bins must equal a batch-computed
histogram over the same data, re-runs must not double-count, estimates
must land within one bin width of the exact order statistic, and
compaction must preserve the histogram."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.quantile import (
    QS_BINS,
    StreamingValueHistogram,
)

SCHEMA = T.StructType([T.StructField("event_type", T.StringType()),
                       T.StructField("value", T.DoubleType())])

LO, HI = 0.0, 100.0


def write_rows(path, rows):
    path.write_text("\n".join(json.dumps({"event_type": t, "value": v})
                              for t, v in rows) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.event_type", "j.value"))


def run_once(spark, h, src_dir, ckpt):
    q = h.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def _hist(h):
    return {(r["key"], r["bin"]): r["c"] for r in h.histogram().collect()}


BATCH_A = [("view", float(v)) for v in range(0, 60)] + [("click", 5.0)]
BATCH_B = [("view", float(v)) for v in range(60, 100)] + \
          [("click", 95.0), ("click", None)]


def test_streaming_histogram_matches_batch_and_is_idempotent(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    h = StreamingValueHistogram(
        state_table=AppendTable(spark, str(tmp_path / "hist_state")),
        lo=LO, hi=HI)
    write_rows(src / "a.json", BATCH_A)
    write_rows(src / "b.json", BATCH_B)
    run_once(spark, h, src, tmp_path / "ckpt")

    # streaming state == one batch pass over the union
    all_rows = spark.createDataFrame(BATCH_A + BATCH_B, SCHEMA)
    expect = {(r["key"], r["bin"]): r["c"]
              for r in h._bins(all_rows)
              .withColumn("c", F.col("c").cast("long")).collect()}
    assert _hist(h) == expect

    # crash-rerun replaces its own partition: no double counting
    h.process_batch(spark.createDataFrame(BATCH_B, SCHEMA), 1)
    assert _hist(h) == expect

    # estimates: within one bin width of the exact order statistic
    width = (HI - LO) / QS_BINS
    qs = {r["key"]: r for r in h.quantiles().collect()}
    values = sorted(v for t, v in BATCH_A + BATCH_B
                    if t == "view" and v is not None)
    n = len(values)
    for name, rank in (("p50_est", (n + 1) // 2),
                       ("p90_est", (9 * n + 9) // 10),
                       ("p99_est", (99 * n + 99) // 100)):
        exact = values[rank - 1]
        assert abs(qs["view"][name] - exact) <= width, (name, exact)
    assert qs["view"]["n"] == n
    assert qs["click"]["n"] == 2  # NULL value excluded


def test_out_of_range_values_clamp_into_edge_bins(spark, tmp_path):
    h = StreamingValueHistogram(
        state_table=AppendTable(spark, str(tmp_path / "hist_state")),
        lo=LO, hi=HI)
    rows = [("view", -50.0), ("view", 250.0), ("view", 50.0)]
    h.process_batch(spark.createDataFrame(rows, SCHEMA), 0)
    hist = _hist(h)
    assert hist[("view", 0)] == 1              # below lo → first bin
    assert hist[("view", QS_BINS - 1)] == 1    # above hi → last bin
    assert sum(hist.values()) == 3             # nothing dropped


def test_compact_preserves_histogram(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    h = StreamingValueHistogram(
        state_table=AppendTable(spark, str(tmp_path / "hist_state")),
        lo=LO, hi=HI)
    write_rows(src / "a.json", BATCH_A)
    write_rows(src / "b.json", BATCH_B)
    run_once(spark, h, src, tmp_path / "ckpt")
    before = _hist(h)
    h.compact()
    assert _hist(h) == before
    raw = spark.read.parquet(str(tmp_path / "hist_state"))
    assert raw.select("ingest_batch_id").distinct().count() == 1


def test_histogram_rejects_degenerate_range(spark, tmp_path):
    import pytest

    for lo, hi in ((10.0, 10.0), (10.0, 5.0)):
        with pytest.raises(ValueError, match="hi > lo"):
            StreamingValueHistogram(
                state_table=AppendTable(spark, str(tmp_path / "s")),
                lo=lo, hi=hi)
