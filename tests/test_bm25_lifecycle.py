"""The maintained-BM25-index lifecycle: build once → per batch APPEND
(idempotent by batch id, batch or streaming) → serve reflects every
batch with no rebuild → compact folds batches back into the base.
The binding invariant: append+serve is BIT-IDENTICAL to rebuilding
the index over the grown corpus and serving from that."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.retrieval import (
    SERVE_TERMS,
    _write_bm25_batch,
    append_to_bm25_index,
    bm25_serve,
    build_bm25_index,
    compact_bm25_index,
)
from demo_cdc_users_airline_spark.sources.loader import load_table
from demo_cdc_users_airline_spark.streaming.bm25_ingest import (
    StreamingBm25Ingest,
)

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType())])

# batch docs that use the serve vocabulary: the first is stuffed with
# the rarest-boosting pattern (many hits of one term, short doc) so it
# must surface in the top-k — proof serve sees the appended rows
BATCH_1 = [(9_000_001, "stream stream stream stream stream"),
           (9_000_002, "hash window filter stream hash window")]
BATCH_2 = [(9_000_003, "window window filter filter hash"),
           (9_000_004, "completely unrelated vocabulary only")]


def corpus_plus(spark, extra):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    return docs.unionByName(spark.createDataFrame(extra, SCHEMA))


def rebuilt_serve_rows(spark, tmp_path, extra):
    # ground truth: a from-scratch index over the grown corpus
    path = str(tmp_path / "rebuild")
    _write_bm25_batch(corpus_plus(spark, extra), path,
                      tag=-1, mode="overwrite")
    return bm25_serve(spark, path).collect()


def parquet_files(root):
    return [os.path.join(d, f) for d, _, fs in os.walk(root)
            for f in fs if f.endswith(".parquet")]


def test_append_then_serve_equals_rebuild(spark, tmp_path):
    path = build_bm25_index(spark, SF, str(tmp_path / "idx"))
    append_to_bm25_index(spark, path,
                         spark.createDataFrame(BATCH_1, SCHEMA),
                         batch_id=0)
    got = bm25_serve(spark, path).collect()
    assert got == rebuilt_serve_rows(spark, tmp_path, BATCH_1)
    # the appended docs are served (rank-limited serve may cut them —
    # tf saturation caps a 5-token doc's score — so serve unbounded)
    all_ids = {r["doc_id"]
               for r in bm25_serve(spark, path, topk=1 << 20).collect()}
    assert {9_000_001, 9_000_002} <= all_ids


def test_append_rerun_is_idempotent(spark, tmp_path):
    path = build_bm25_index(spark, SF, str(tmp_path / "idx"))
    batch = spark.createDataFrame(BATCH_1, SCHEMA)
    append_to_bm25_index(spark, path, batch, batch_id=3)
    n_posts = spark.read.parquet(path + "/postings").count()
    stats = sorted(map(tuple, spark.read.parquet(path + "/stats")
                       .collect()))
    append_to_bm25_index(spark, path, batch, batch_id=3)  # retry
    assert spark.read.parquet(path + "/postings").count() == n_posts
    assert sorted(map(tuple, spark.read.parquet(path + "/stats")
                      .collect())) == stats


def write_docs(path, docs):
    path.write_text("\n".join(json.dumps({"doc_id": i, "text": t})
                              for i, t in docs) + "\n")


def test_streaming_ingest_then_compact(spark, tmp_path):
    path = build_bm25_index(spark, SF, str(tmp_path / "idx"))
    src = tmp_path / "src"
    src.mkdir()
    write_docs(src / "b0.json", BATCH_1)
    write_docs(src / "b1.json", BATCH_2)
    pipe = StreamingBm25Ingest(index_path=path)
    stream = (spark.readStream.format("text")
              .option("maxFilesPerTrigger", 1)
              .load(str(src))
              .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
              .select("j.doc_id", "j.text"))
    q = pipe.start(stream, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(180)
    assert not q.isActive

    want = rebuilt_serve_rows(spark, tmp_path, BATCH_1 + BATCH_2)
    assert bm25_serve(spark, path).collect() == want
    # each batch owns its own partitions; n_docs partials sum correctly
    stats = spark.read.parquet(path + "/stats")
    assert {r["ingest_batch"] for r in stats.collect()} == {-1, 0, 1}
    base_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in stats.collect()) == base_docs + 4

    n_files = len(parquet_files(path))
    compact_bm25_index(spark, path)
    # serve invariant under compaction; stats folded to ONE base row
    assert bm25_serve(spark, path).collect() == want
    folded = spark.read.parquet(path + "/stats").collect()
    assert len(folded) == 1 and folded[0]["ingest_batch"] == -1
    assert folded[0]["n_docs"] == base_docs + 4
    assert len(parquet_files(path)) < n_files
    assert not [d for d in os.listdir(str(tmp_path / "idx"))
                if ".compact." in d]
