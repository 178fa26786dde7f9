"""Streaming CMS: summed batch partials must equal the batch counter
table over the same data, re-runs must not double-count (batch-id
idempotence), compaction must preserve counters, and estimates must
never underestimate."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.sketches import (
    _CMS_D,
    _CMS_W,
    cms_cell_counts,
    cms_token_hashes,
)
from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.frequency import (
    StreamingCmsFrequency,
)

SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType())])


def write_docs(path, docs):
    path.write_text("\n".join(json.dumps({"doc_id": i, "text": t})
                              for i, t in docs) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.doc_id", "j.text"))


def run_once(spark, cms, src_dir, ckpt):
    q = cms.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def _counters(cms):
    return {(r["j"], r["cell"]): r["c"] for r in cms.counters().collect()}


BATCH_A = [(1, "alpha beta alpha"), (2, "beta gamma delta"),
           (3, "alpha alpha epsilon")]
BATCH_B = [(4, "beta beta zeta"), (5, "alpha eta theta gamma")]


def _batch_expect(spark):
    docs = spark.createDataFrame(BATCH_A + BATCH_B, SCHEMA)
    return {(r["j"], r["cell"]): r["c"]
            for r in cms_cell_counts(cms_token_hashes(docs)).collect()}


def test_streaming_counters_match_batch_and_are_idempotent(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    cms = StreamingCmsFrequency(
        state_table=AppendTable(spark, str(tmp_path / "cms_state")))

    write_docs(src / "a.json", BATCH_A)
    write_docs(src / "b.json", BATCH_B)
    run_once(spark, cms, src, tmp_path / "ckpt")

    expect = _batch_expect(spark)
    assert _counters(cms) == expect

    # crash-rerun of a committed batch: the partial REPLACES its own
    # partition — counters unchanged (sum-merge would have doubled)
    docs_b = spark.createDataFrame(BATCH_B, SCHEMA)
    cms.process_batch(docs_b, 1)
    assert _counters(cms) == expect

    # estimates never underestimate; unique tokens are near-exact at
    # this fill
    est = {r["token"]: r["cms_estimate"]
           for r in cms.estimate(["alpha", "beta", "nosuchtoken"]).collect()}
    assert est["alpha"] >= 5 and est["beta"] >= 4
    assert est["nosuchtoken"] >= 0


def test_compact_preserves_counters_and_bounds_state(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    cms = StreamingCmsFrequency(
        state_table=AppendTable(spark, str(tmp_path / "cms_state")))
    write_docs(src / "a.json", BATCH_A)
    write_docs(src / "b.json", BATCH_B)
    run_once(spark, cms, src, tmp_path / "ckpt")

    before = _counters(cms)
    cms.compact()
    assert _counters(cms) == before
    # single reserved partition, ≤ d·w rows
    raw = spark.read.parquet(str(tmp_path / "cms_state"))
    assert raw.select("ingest_batch_id").distinct().count() == 1
    assert raw.count() <= _CMS_D * _CMS_W

    # post-compaction ingest keeps accumulating correctly
    docs_c = [(6, "alpha iota")]
    write_docs(src / "c.json", docs_c)
    run_once(spark, cms, src, tmp_path / "ckpt")
    all_docs = spark.createDataFrame(BATCH_A + BATCH_B + docs_c, SCHEMA)
    expect = {(r["j"], r["cell"]): r["c"]
              for r in cms_cell_counts(cms_token_hashes(all_docs)).collect()}
    assert _counters(cms) == expect
