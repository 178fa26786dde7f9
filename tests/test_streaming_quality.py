"""Streaming quality gate: batch/streaming parity (same shared
transforms), routing correctness, and idempotent re-delivery."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.quality import StreamingQualityGate

SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType()),
                       T.StructField("lang", T.StringType())])

GOOD = ("the quick brown fox jumps over a lazy dog and then the small "
        "cat is seen to walk in the garden of old houses near a river "
        "bank where children play games")
SPAMMY = "spam ham " * 40
TINY = "too short"


def write_docs(path, docs):
    path.write_text("\n".join(
        json.dumps({"doc_id": i, "text": t, "lang": "en"})
        for i, t in docs) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.doc_id", "j.text", "j.lang"))


def run_once(spark, gate, src_dir, ckpt):
    q = gate.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def test_gate_routes_and_matches_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    gate = StreamingQualityGate(
        admitted=AppendTable(spark, str(tmp_path / "adm")),
        rejected=AppendTable(spark, str(tmp_path / "rej")))
    write_docs(src / "a.json", [(1, GOOD), (2, SPAMMY)])
    write_docs(src / "b.json", [(3, TINY)])
    run_once(spark, gate, src, tmp_path / "ckpt")

    adm = {r["doc_id"] for r in gate.admitted.read().collect()}
    rej = {r["doc_id"]: r for r in gate.rejected.read().collect()}
    assert adm == {1}
    assert set(rej) == {2, 3}
    assert rej[2]["is_repetitive"]              # rejected for repetition
    assert rej[3]["quality_score"] * 3 < 2      # rejected for quality

    # parity: the same docs through the BATCH transforms agree exactly
    batch = spark.createDataFrame(
        [(1, GOOD, "en"), (2, SPAMMY, "en"), (3, TINY, "en")], SCHEMA)
    expect = {r["doc_id"]: r["admit"]
              for r in StreamingQualityGate.score(batch).collect()}
    assert expect == {1: True, 2: False, 3: False}


def test_batch_redelivery_is_idempotent(spark, tmp_path):
    """Re-running a micro-batch (the foreachBatch retry case) replaces
    its own rows instead of duplicating them."""
    src = tmp_path / "in"
    src.mkdir()
    gate = StreamingQualityGate(
        admitted=AppendTable(spark, str(tmp_path / "adm")),
        rejected=AppendTable(spark, str(tmp_path / "rej")))
    write_docs(src / "a.json", [(1, GOOD), (2, SPAMMY)])
    run_once(spark, gate, src, tmp_path / "ckpt")
    df = spark.createDataFrame([(1, GOOD, "en"), (2, SPAMMY, "en")], SCHEMA)
    gate.process_batch(df, 0)  # simulate redelivery of batch 0
    assert gate.admitted.read().count() == 1
    assert gate.rejected.read().count() == 1
