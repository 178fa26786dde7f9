"""Streaming cluster-label maintenance: the persisted artifact
(test_cluster_index's deterministic merge corpus) extended at stream
cadence through StreamingClusterIngest — resolved labels equal the
batch-mode lifecycle and the full-recompute ground truth; retries and
empty batches are safe."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.dedup import (
    build_cluster_index,
)
from demo_cdc_users_airline_spark.streaming.cluster_ingest import (
    StreamingClusterIngest,
)
from tests.test_cluster_index import (
    BASE,
    BATCH0,
    BATCH1,
    EXPECTED,
    _resolved,
    _write_corpus,
)

SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType())])


def write_docs(path, docs: dict[int, str]):
    path.write_text("\n".join(json.dumps({"doc_id": i, "text": t})
                              for i, t in sorted(docs.items())) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.doc_id", "j.text"))


def test_stream_extends_labels_to_ground_truth(spark, tmp_path):
    sf = _write_corpus(tmp_path / "corpus", BASE)
    path = build_cluster_index(spark, sf, str(tmp_path / "clu"))
    pipe = StreamingClusterIngest(index_path=path)

    src = tmp_path / "src"
    src.mkdir()
    write_docs(src / "b0.json", BATCH0)
    write_docs(src / "b1.json", BATCH1)
    q = pipe.start(source(spark, src), str(tmp_path / "ckpt"),
                   trigger_once=True)
    q.awaitTermination(180)
    assert not q.isActive

    # two micro-batches later the resolved labels ARE the full-corpus
    # ground truth (cross-cluster merge + new-min relabel included)
    assert _resolved(spark, path) == EXPECTED

    # mid-stream retry (foreachBatch at-least-once): re-running a
    # batch against post-batch state changes nothing. The stream
    # assigns batch ids by file MODIFICATION order (not name), so read
    # BATCH1's actual id off the artifact's own provenance column.
    bid = int(spark.read.parquet(path + "/labels")
              .filter(F.col("doc_id") == 24)
              .select("ingest_batch").first()[0])
    b1 = spark.createDataFrame(sorted(BATCH1.items()), SCHEMA)
    pipe.process_batch(b1, bid)
    assert _resolved(spark, path) == EXPECTED
    assert spark.read.parquet(path + "/labels").count() == len(EXPECTED)

    # empty micro-batch: structural no-op
    n_edges = spark.read.parquet(path + "/edges").count()
    pipe.process_batch(spark.createDataFrame([], SCHEMA), 99)
    assert spark.read.parquet(path + "/edges").count() == n_edges
    assert _resolved(spark, path) == EXPECTED


def test_autocompact_folds_overlay_and_batches_in_loop(spark, tmp_path):
    sf = _write_corpus(tmp_path / "corpus", BASE)
    path = build_cluster_index(spark, sf, str(tmp_path / "clu"))
    pipe = StreamingClusterIngest(index_path=path, compact_check_every=1)

    src = tmp_path / "src"
    src.mkdir()
    write_docs(src / "b0.json", BATCH0)
    write_docs(src / "b1.json", BATCH1)
    q = pipe.start(source(spark, src), str(tmp_path / "ckpt"),
                   trigger_once=True)
    q.awaitTermination(180)
    assert not q.isActive

    # resolution unchanged by in-loop folding, overlay baked into
    # labels, older batch provenance folded (the in-flight batch kept)
    assert _resolved(spark, path) == EXPECTED
    assert spark.read.parquet(path + "/merges").count() == 0
    batches = {r[0] for r in spark.read.parquet(path + "/labels")
               .select("ingest_batch").distinct().collect()}
    assert -1 in batches and len(batches) <= 2

    # retry of the LAST batch across the fold stays idempotent
    last = max(batches)
    last_docs = {int(r["doc_id"]): None for r in
                 spark.read.parquet(path + "/labels")
                 .filter(F.col("ingest_batch") == last).collect()}
    batch = {i: t for i, t in {**BATCH0, **BATCH1}.items()
             if i in last_docs}
    pipe.process_batch(
        spark.createDataFrame(sorted(batch.items()), SCHEMA), int(last))
    assert _resolved(spark, path) == EXPECTED
    assert spark.read.parquet(path + "/labels").count() == len(EXPECTED)


def test_overlay_fold_is_gated_on_size(spark, tmp_path):
    """ADVICE r10: a small merges overlay alone must NOT trigger the
    O(corpus) labels/edges rewrite — resolved reads pay one broadcast
    join regardless — until it accumulates past overlay_fold_min."""
    sf = _write_corpus(tmp_path / "corpus", BASE)
    path = build_cluster_index(spark, sf, str(tmp_path / "clu"))
    from demo_cdc_users_airline_spark.operators.dedup import (
        update_cluster_index,
    )
    b0 = spark.createDataFrame(sorted(BATCH0.items()), SCHEMA)
    update_cluster_index(spark, path, b0, 0)  # produces merges {2: 0}
    assert spark.read.parquet(path + "/merges").count() == 1

    # overlay of 1 < overlay_fold_min and no foldable batch (only the
    # base and the in-flight batch 0) -> no fold
    pipe = StreamingClusterIngest(index_path=path, compact_check_every=1)
    assert pipe._maybe_compact(spark, 0) is False
    assert spark.read.parquet(path + "/merges").count() == 1

    # lowering the gate makes the same overlay fold
    eager = StreamingClusterIngest(index_path=path,
                                   compact_check_every=1,
                                   overlay_fold_min=1)
    assert eager._maybe_compact(spark, 0) is True
    assert spark.read.parquet(path + "/merges").count() == 0
