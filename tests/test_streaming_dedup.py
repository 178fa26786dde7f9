"""Streaming exact dedup: first-writer-wins across micro-batches and
restarts, via the built-in dropDuplicates state store."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.dedup import StreamingExactDedup

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


def run_once(spark, dedup, src_dir, ckpt):
    q = dedup.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def test_first_writer_wins_across_batches_and_restart(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = AppendTable(spark, str(tmp_path / "kept"))
    dedup = StreamingExactDedup(out_table=out)

    # batch a: unique texts (one internal dup pair: docs 2+3 same text);
    # batch b: re-sends doc 1's text (cross-batch dup) + one new text
    write_docs(src / "a.json", [(1, "alpha beta"), (2, "gamma delta"),
                                (3, "gamma delta"), (4, "epsilon")])
    write_docs(src / "b.json", [(11, "alpha beta"), (12, "zeta eta")])
    run_once(spark, dedup, src, tmp_path / "ckpt")

    rows = {r["fingerprint"]: r for r in out.read().collect()}
    assert len(rows) == 4  # alpha/gamma/epsilon/zeta — each exactly once
    texts = {r["text"] for r in rows.values()}
    assert texts == {"alpha beta", "gamma delta", "epsilon", "zeta eta"}
    # cross-batch: batch a's writer won for "alpha beta"
    alpha = next(r for r in rows.values() if r["text"] == "alpha beta")
    assert alpha["doc_id"] == 1

    # restart with a new file: the state store still remembers everything
    write_docs(src / "c.json", [(21, "epsilon"), (22, "theta iota")])
    run_once(spark, dedup, src, tmp_path / "ckpt")
    rows2 = out.read().collect()
    assert len(rows2) == 5  # only "theta iota" was admitted
    assert sum(1 for r in rows2 if r["text"] == "epsilon") == 1


def test_first_writer_wins_on_rocksdb_state_store(spark, tmp_path):
    """Same pipeline, RocksDB state backend (the production state store
    for corpus-sized fingerprint sets — off-heap, incremental
    checkpoints): semantics must be identical to the default HDFS-backed
    provider, and the checkpoint must really contain RocksDB state."""
    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        src = tmp_path / "in"
        src.mkdir()
        out = AppendTable(spark, str(tmp_path / "kept"))
        dedup = StreamingExactDedup(out_table=out)
        write_docs(src / "a.json", [(1, "alpha beta"), (2, "gamma delta"),
                                    (3, "gamma delta"), (4, "epsilon")])
        write_docs(src / "b.json", [(11, "alpha beta"), (12, "zeta eta")])
        run_once(spark, dedup, src, tmp_path / "ckpt")

        rows = {r["text"]: r["doc_id"] for r in out.read().collect()}
        assert rows == {"alpha beta": 1, "gamma delta": 2,
                        "epsilon": 4, "zeta eta": 12}

        # restart against the same RocksDB checkpoint: state survives
        write_docs(src / "c.json", [(21, "epsilon"), (22, "theta iota")])
        run_once(spark, dedup, src, tmp_path / "ckpt")
        assert len(out.read().collect()) == 5

        # the state directory holds RocksDB SST/changelog artifacts,
        # proving the provider actually engaged
        state = tmp_path / "ckpt" / "state"
        files = [p.name for p in state.rglob("*") if p.is_file()]
        assert any(n.endswith((".zip", ".sst", ".changelog")) or "rocksdb" in n.lower()
                   for n in files), files
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_ttl_dedup_absorbs_resends_then_forgets(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics end-to-end: a re-send
    inside the TTL is dropped; the same content far past the TTL is
    admitted again (bounded state forgets — by design)."""
    import json as _json

    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType()),
                           T.StructField("epoch", T.LongType())])
    t0 = 1_700_000_000

    def write(path, rows):
        path.write_text("\n".join(
            _json.dumps({"doc_id": i, "text": t, "epoch": t0 + m * 60})
            for i, t, m in rows) + "\n")

    def src(directory):
        return (spark.readStream.format("text")
                .option("maxFilesPerTrigger", 1)
                .load(str(directory))
                .select(F.from_json(F.col("value"), schema).alias("j"))
                .select("j.doc_id", "j.text",
                        F.timestamp_seconds("j.epoch").alias("ts")))

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    out = AppendTable(spark, str(tmp_path / "kept"))

    def sink(df, bid):
        out.append_idempotent(df, bid)

    def run():
        q = (StreamingExactDedup.plan_with_ttl(src(src_dir), "ts",
                                               "10 minutes")
             .writeStream.outputMode("append")
             .foreachBatch(sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert not q.isActive

    # original + in-TTL re-send (dropped), then far-future re-publish
    # of the same text after the watermark evicted its fingerprint
    write(src_dir / "a.json", [(1, "alpha beta", 0)])
    write(src_dir / "b.json", [(2, "alpha beta", 5), (3, "gamma", 6)])
    run()
    docs = [r["doc_id"] for r in out.read().collect()]
    assert sorted(docs) == [1, 3]          # re-send 2 absorbed

    # advance event time far past TTL (own run, so the watermark
    # update commits), then re-publish the same text
    write(src_dir / "c.json", [(4, "unrelated", 600)])
    run()
    write(src_dir / "d.json", [(5, "alpha beta", 601)])
    run()
    docs = sorted(r["doc_id"] for r in out.read().collect())
    assert 5 in docs                       # state forgot -> re-admitted
    assert docs == [1, 3, 4, 5]
