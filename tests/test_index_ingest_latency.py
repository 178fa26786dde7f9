"""Operational envelope of the streaming maintainers (one latency row
per family):
batch arrival → SERVEABLE from the persisted artifact inside the same
15 s budget the CDC loop honors (the reference's wait_for() bound,
modules/utils.py:48) — measured, not asserted from structure. The
timed leg ends at the trigger-once commit (the index write happens
inside the batch, so a committed batch IS serveable); an untimed
check then exercises the real consumer path: an LSH probe must reject
a copy of the ingested document, a BM25 query must rank it, an IVF
serve-style read must surface its vector."""

import os
import json
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.dedup import (
    build_lsh_index,
    probe_lsh_index,
)
from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    build_ivf_index,
)
from demo_cdc_users_airline_spark.operators.retrieval import (
    bm25_serve,
    build_bm25_index,
)
from demo_cdc_users_airline_spark.sources.loader import load_table
from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.bm25_ingest import (
    StreamingBm25Ingest,
)
from demo_cdc_users_airline_spark.streaming.ivf_ingest import (
    StreamingIvfIngest,
)
from demo_cdc_users_airline_spark.streaming.lsh_ingest import (
    StreamingLshIngest,
)

SF = "/root/testdata/sf0.001"
BUDGET = 15.0 * float(os.environ.get("SPARK_GRAFT_LATENCY_BUDGET_RELAX", "1"))

DOC_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
VEC_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])

NOVEL = ("zebra xylophone quantum harmonica sediment glacier aurora "
         "borealis cantilever mezzanine theodolite sprocket bandolier")


def run_once(pipe, stream, ckpt, timeout=None):
    """``timeout`` defaults to the budget; WARMUP batches pass a longer
    one — they model one-time init and are untimed, only the measured
    steady-state batch must meet the 15 s envelope."""
    q = pipe.start(stream, str(ckpt), trigger_once=True)
    q.awaitTermination(int(timeout or BUDGET))
    assert not q.isActive


def doc_stream(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1).load(str(directory))
            .select(F.from_json(F.col("value"), DOC_SCHEMA).alias("j"))
            .select("j.doc_id", "j.text"))


def test_lsh_ingest_to_probe_latency(spark, tmp_path):
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingLshIngest(
        index_path=path, out_table=AppendTable(spark,
                                               str(tmp_path / "adm")))
    src = tmp_path / "src"
    src.mkdir()
    # warmup batch: the budget models a RUNNING system's per-batch
    # latency (the reference polls a live loop) — the session's first
    # streaming query pays one-time init that no steady-state batch does
    (src / "warm.json").write_text(
        json.dumps({"doc_id": 900_001, "text": "warm up batch doc"})
        + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"doc_id": 1_000_001, "text": NOVEL}) + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    # the batch is SERVEABLE once the trigger-once commit returns (the
    # index write is inside the batch) — that is the timed leg; the
    # probe below is the untimed correctness check that it really is:
    total = time.monotonic() - t0
    copy = spark.createDataFrame([(1_000_002, NOVEL)], DOC_SCHEMA)
    verdict = probe_lsh_index(spark, copy, path).collect()
    assert verdict[0]["admitted"] == 0
    assert verdict[0]["dup_of"] == 1_000_001
    print(f"\nlsh ingest -> serveable: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET


def test_bm25_ingest_to_serve_latency(spark, tmp_path):
    path = build_bm25_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingBm25Ingest(index_path=path)
    src = tmp_path / "src"
    src.mkdir()
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"doc_id": 1_000_001,
                    "text": "zebraterm zebraterm unique"}) + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    total = time.monotonic() - t0
    # untimed correctness check: a query for the batch's unique term
    # ranks the new doc from the maintained artifact
    rows = bm25_serve(spark, path, terms=("zebraterm",)).collect()
    assert [r["doc_id"] for r in rows] == [1_000_001]
    print(f"\nbm25 ingest -> serveable: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET


def test_ivf_ingest_to_serve_latency(spark, tmp_path):
    path = build_ivf_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingIvfIngest(
        index_path=path,
        report_table=AppendTable(spark, str(tmp_path / "rep")))
    vec = (load_table(spark, SF, "embeddings")
           .filter(F.col("vec_id") % _DRIFT_MOD == 0)
           .select(F.col("vec_id").alias("id"),
                   F.col("embedding").cast("array<double>")
                   .alias("embedding"))
           .orderBy("id").first())
    src = tmp_path / "src"
    src.mkdir()
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"id": 1_000_001,
                    "embedding": list(vec["embedding"])}) + "\n")
    stream = (spark.readStream.format("text")
              .option("maxFilesPerTrigger", 1).load(str(src))
              .select(F.from_json(F.col("value"), VEC_SCHEMA).alias("j"))
              .select("j.id", "j.embedding"))
    run_once(pipe, stream, tmp_path / "ckpt")
    total = time.monotonic() - t0
    # untimed correctness check: the vector is a candidate posting row
    # in its cell (a serve reads candidates inline from the pruned read)
    got = (spark.read.parquet(path + "/cells")
           .filter(F.col("vec_id") == 1_000_001).collect())
    assert len(got) == 1 and got[0]["vec"] is not None
    print(f"\nivf ingest -> serveable: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET


def test_cluster_ingest_to_read_latency(spark, tmp_path):
    from demo_cdc_users_airline_spark.operators.dedup import (
        build_cluster_index,
        cluster_labels_of,
    )
    from demo_cdc_users_airline_spark.streaming.cluster_ingest import (
        StreamingClusterIngest,
    )
    path = build_cluster_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingClusterIngest(index_path=path)
    src = tmp_path / "src"
    src.mkdir()
    # warmup batch (the running-system budget, as the LSH test models)
    (src / "warm.json").write_text(
        json.dumps({"doc_id": 900_001, "text": "warm up batch doc"})
        + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"doc_id": 1_000_001, "text": NOVEL}) + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    total = time.monotonic() - t0
    # untimed correctness check: the batch's labels are readable from
    # the maintained artifact (novel doc -> its own singleton cluster)
    labels = {r["doc_id"]: r["cluster_id"] for r in
              cluster_labels_of(spark, path)
              .filter(F.col("doc_id") >= 900_000).collect()}
    assert labels[1_000_001] == 1_000_001
    print(f"\ncluster ingest -> readable: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET


def test_pq_ingest_to_serve_latency(spark, tmp_path):
    from demo_cdc_users_airline_spark.operators.pq import (
        M_SUB,
        build_pq_index,
        pq_codes_path,
    )
    from demo_cdc_users_airline_spark.streaming.pq_ingest import (
        StreamingPqIngest,
    )
    path = build_pq_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingPqIngest(index_path=path)
    vec = (load_table(spark, SF, "embeddings")
           .filter(F.col("vec_id") % _DRIFT_MOD == 0)
           .select(F.col("vec_id").alias("id"),
                   F.col("embedding").cast("array<double>")
                   .alias("embedding"))
           .orderBy("id").first())
    src = tmp_path / "src"
    src.mkdir()
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"id": 1_000_001,
                    "embedding": list(vec["embedding"])}) + "\n")
    stream = (spark.readStream.format("text")
              .option("maxFilesPerTrigger", 1).load(str(src))
              .select(F.from_json(F.col("value"), VEC_SCHEMA).alias("j"))
              .select("j.id", "j.embedding"))
    run_once(pipe, stream, tmp_path / "ckpt")
    total = time.monotonic() - t0
    # untimed correctness check: the vector's packed code row is an ADC
    # candidate in its coarse cell
    got = (spark.read.parquet(pq_codes_path(path))
           .filter(F.col("vec_id") == 1_000_001).collect())
    assert len(got) == 1 and len(got[0]["codes"]) == M_SUB
    print(f"\npq ingest -> serveable: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET


def test_sq8_ingest_to_serve_latency(spark, tmp_path):
    from demo_cdc_users_airline_spark.operators.sq8 import (
        build_sq8_index,
        sq8_codes_path,
        sq8_ranges_path,
    )
    from demo_cdc_users_airline_spark.streaming.sq8_ingest import (
        StreamingSq8Ingest,
    )
    path = build_sq8_index(spark, SF, str(tmp_path / "idx"))
    dim = spark.read.parquet(sq8_ranges_path(path)).count()
    pipe = StreamingSq8Ingest(index_path=path)
    vec = (load_table(spark, SF, "embeddings")
           .filter(F.col("vec_id") % _DRIFT_MOD == 0)
           .select(F.col("vec_id").alias("id"),
                   F.col("embedding").cast("array<double>")
                   .alias("embedding"))
           .orderBy("id").first())
    src = tmp_path / "src"
    src.mkdir()
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"id": 1_000_001,
                    "embedding": list(vec["embedding"])}) + "\n")
    stream = (spark.readStream.format("text")
              .option("maxFilesPerTrigger", 1).load(str(src))
              .select(F.from_json(F.col("value"), VEC_SCHEMA).alias("j"))
              .select("j.id", "j.embedding"))
    run_once(pipe, stream, tmp_path / "ckpt")
    total = time.monotonic() - t0
    # untimed correctness check: the vector's 8-bit code row is a
    # candidate in its coarse cell, one code per dimension
    got = (spark.read.parquet(sq8_codes_path(path))
           .filter(F.col("vec_id") == 1_000_001).collect())
    assert len(got) == 1 and len(got[0]["codes"]) == dim
    print(f"\nsq8 ingest -> serveable: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET

def test_tokenizer_ingest_to_census_latency(spark, tmp_path):
    """The tokenizer maintainer's latency row (VERDICT r13 #5) — the
    drift monitor's batch must census + persist inside the same 15 s
    ingest→serveable budget the six index families honor."""
    from demo_cdc_users_airline_spark.sources.loader import (
        load_table as _lt,
    )
    from demo_cdc_users_airline_spark.streaming.tokenizer_ingest import (
        StreamingTokenizerIngest,
    )
    pipe = StreamingTokenizerIngest(path=str(tmp_path / "tokm"),
                                    retrain_check_every=0)
    pipe.build(spark, _lt(spark, SF, "documents")
               .select("doc_id", "text"))
    src = tmp_path / "src"
    src.mkdir()
    # warmup batch (the running-system budget, as the LSH test models)
    (src / "warm.json").write_text(
        json.dumps({"doc_id": 900_001, "text": "warm up batch doc"})
        + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"doc_id": 1_000_001, "text": NOVEL}) + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    total = time.monotonic() - t0
    # untimed correctness check: the batch's census row is readable
    # from the maintained report table and its corpus rows persisted
    corpus = spark.read.parquet(pipe.corpus_path)
    # the real batch id comes off the artifact's provenance column
    # (file sources order batches by MTIME, not name)
    bid = (corpus.filter(F.col("doc_id") == 1_000_001)
           .select("ingest_batch").first()["ingest_batch"])
    reports = spark.read.parquet(pipe.report_path)
    assert reports.filter(F.col("ingest_batch") == bid).count() == 1
    assert corpus.filter(F.col("doc_id") == 1_000_001).count() == 1
    print(f"\ntokenizer ingest -> census: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET

def test_manifest_ingest_to_read_latency(spark, tmp_path):
    """The training-manifest maintainer's latency row: an arriving
    batch must be
    re-curated against the frozen base state and its tail packs
    readable inside the same 15 s ingest→serveable budget."""
    from demo_cdc_users_airline_spark.operators.manifest import (
        build_manifest_index,
        read_manifest_rows,
    )
    from demo_cdc_users_airline_spark.streaming.manifest_ingest import (
        StreamingManifestIngest,
    )
    path = build_manifest_index(spark, SF, str(tmp_path / "m"))
    pipe = StreamingManifestIngest(index_path=path)
    src = tmp_path / "src"
    src.mkdir()
    # warmup batch (the running-system budget, as the LSH test models)
    (src / "warm.json").write_text(
        json.dumps({"doc_id": 900_001,
                    "text": NOVEL + " warm batch padding tokens the of"
                    " a to in is extra filler words for quality bounds"})
        + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt",
             timeout=4 * BUDGET)
    t0 = time.monotonic()
    (src / "b0.json").write_text(
        json.dumps({"doc_id": 1_000_001,
                    "text": NOVEL + " astrolabe marmalade citadel"
                    " oscilloscope pergola quenelle rhizome saxifrage"
                    " the of a to in is"}) + "\n")
    run_once(pipe, doc_stream(spark, src), tmp_path / "ckpt")
    total = time.monotonic() - t0
    # untimed correctness check: the doc's manifest row is readable
    # from its batch partition with a batch-local pack position
    got = (read_manifest_rows(spark, path)
           .filter(F.col("doc_id") == 1_000_001).collect())
    assert len(got) == 1 and got[0]["pack_offset"] == 0
    print(f"\nmanifest ingest -> readable: {total:.2f}s "
          f"(budget {BUDGET:.0f}s)")
    assert total < BUDGET
