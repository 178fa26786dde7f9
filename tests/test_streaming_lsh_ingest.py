"""Streaming LSH ingest against the persisted index: probe → admit →
idempotent append, across micro-batches and batch re-runs."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.dedup import build_lsh_index
from demo_cdc_users_airline_spark.sources.loader import load_table
from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.lsh_ingest import (
    StreamingLshIngest,
)

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType())])

NOVEL_1 = ("zebra xylophone quantum harmonica sediment glacier "
           "aurora borealis cantilever mezzanine theodolite sprocket "
           "bandolier chrysanthemum ocelot parallax")
NOVEL_2 = ("completely different administrative spreadsheet quarterly "
           "revenue overhead projector stapler bulldozer metronome "
           "accordion tambourine velocipede gyroscope astrolabe sextant")


def base_text(spark):
    # an actual BASE document (doc_id % 8 != 0 — in the built index)
    return (load_table(spark, SF, "documents")
            .filter(F.col("doc_id") % 8 != 0)
            .orderBy("doc_id").select("text").first()["text"])


def write_docs(path, docs):
    path.write_text("\n".join(json.dumps({"doc_id": i, "text": t})
                              for i, t in docs) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.doc_id", "j.text"))


def run_once(spark, pipe, src_dir, ckpt):
    q = pipe.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(180)
    assert not q.isActive


@pytest.fixture()
def pipe(spark, tmp_path):
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    out = AppendTable(spark, str(tmp_path / "admitted"))
    return StreamingLshIngest(index_path=path, out_table=out)


def test_index_duplicate_rejected_novel_admitted(spark, tmp_path, pipe):
    src = tmp_path / "src"
    src.mkdir()
    # 1000001: verbatim copy of a base doc (16/16 signature match →
    # rejected via the INDEX); 1000002: novel → admitted
    write_docs(src / "b0.json", [(1_000_001, base_text(spark)),
                                 (1_000_002, NOVEL_1)])
    run_once(spark, pipe, src, tmp_path / "ckpt")
    admitted = {r["doc_id"]
                for r in pipe.out_table.read().select("doc_id").collect()}
    assert admitted == {1_000_002}
    # the admitted doc is now IN the index (its own batch partition)
    sig = spark.read.parquet(pipe.index_path + "/sig")
    assert sig.filter(F.col("doc_id") == 1_000_002).count() == 1
    assert sig.filter(F.col("doc_id") == 1_000_001).count() == 0


def test_cross_batch_dup_rejected_via_appended_index(spark, tmp_path, pipe):
    src = tmp_path / "src"
    src.mkdir()
    write_docs(src / "b0.json", [(2_000_001, NOVEL_1)])
    run_once(spark, pipe, src, tmp_path / "ckpt")
    # batch 2: a copy of batch 1's admitted doc → rejected via the
    # index partition batch 1 appended; plus a within-batch dup pair
    write_docs(src / "b1.json", [(2_000_002, NOVEL_1),
                                 (2_000_003, NOVEL_2),
                                 (2_000_004, NOVEL_2)])
    run_once(spark, pipe, src, tmp_path / "ckpt")
    admitted = {r["doc_id"]
                for r in pipe.out_table.read().select("doc_id").collect()}
    # 2000004 loses the within-batch greedy race to 2000003 (lower id)
    assert admitted == {2_000_001, 2_000_003}


def test_batch_rerun_is_idempotent(spark, tmp_path, pipe):
    docs = spark.createDataFrame(
        [(3_000_001, NOVEL_1), (3_000_002, NOVEL_2)], SCHEMA)
    pipe.process_batch(docs, batch_id=7)
    sig_n = spark.read.parquet(pipe.index_path + "/sig").count()
    bands_n = spark.read.parquet(pipe.index_path + "/bands").count()
    out_n = pipe.out_table.read().count()
    # simulate a foreachBatch retry: same batch id, same data
    pipe.process_batch(docs, batch_id=7)
    assert spark.read.parquet(pipe.index_path + "/sig").count() == sig_n
    assert spark.read.parquet(pipe.index_path + "/bands").count() == bands_n
    assert pipe.out_table.read().count() == out_n
    # and the re-run was not shadowed by its own first attempt: both
    # docs are still admitted (exclude_batch kept them out of the probe)
    assert {r["doc_id"] for r in
            pipe.out_table.read().select("doc_id").collect()} == \
        {3_000_001, 3_000_002}


def test_empty_micro_batch_is_a_safe_noop(spark, pipe):
    # foreachBatch delivers empty batches (idle triggers, filtered
    # sources): the maintainer must process one without error and
    # leave both sinks and the index unchanged (the BM25 maintainer's
    # ADVICE-r8 empty-batch guarantee, asserted for LSH too)
    from demo_cdc_users_airline_spark.operators.dedup import (
        probe_lsh_index,
    )

    docs = (load_table(spark, SF, "documents")
            .filter("doc_id % 8 = 0").select("doc_id", "text"))
    before = sorted(tuple(r) for r in
                    probe_lsh_index(spark, docs, pipe.index_path)
                    .collect())
    n_sig = spark.read.parquet(pipe.index_path + "/sig").count()

    empty = spark.createDataFrame([], SCHEMA)
    pipe.process_batch(empty, 99)

    assert spark.read.parquet(pipe.index_path + "/sig").count() == n_sig
    after = sorted(tuple(r) for r in
                   probe_lsh_index(spark, docs, pipe.index_path)
                   .collect())
    assert after == before


def test_width_auto_rebuild_fires_on_corpus_growth(spark, tmp_path,
                                                   monkeypatch):
    """The LSH twin of the IVF drift hook: when appends grow the
    corpus past a `_pfx_width_for` threshold, the maintainer rebuilds
    the band layout at the wider prefix in its quiesced window —
    verdicts invariant through the swap."""
    from demo_cdc_users_airline_spark.operators import dedup as dd

    # shrink the width policy so the gate corpus can cross a threshold:
    # base split is 438 shingled docs -> width 1; +2 admitted -> width 2
    base_n = (load_table(spark, SF, "documents")
              .filter((F.col("doc_id") % 8 != 0)).count())
    monkeypatch.setattr(dd, "_PFX_DOCS_PER_WIDTH", base_n + 1)

    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    assert dd.lsh_pfx_width(path) == 1  # policy chose 1 at build size
    out = AppendTable(spark, str(tmp_path / "admitted"))
    pipe = StreamingLshIngest(index_path=path, out_table=out,
                              rebuild_check_every=1)

    batch = spark.createDataFrame(
        [(2_000_001, NOVEL_1), (2_000_002, NOVEL_2)], SCHEMA)
    pipe.process_batch(batch, 0)

    # growth crossed the threshold: the hook re-laid-out the bands at
    # width 2 — with batch PROVENANCE PRESERVED (keep_provenance: the
    # in-flight batch must stay replaceable for foreachBatch retries)
    assert dd.lsh_pfx_width(path) == 2
    pfxs = {r["pfx"] for r in spark.read.parquet(path + "/bands")
            .select("pfx").distinct().collect()}
    assert pfxs and all(len(p) == 2 for p in pfxs)
    assert {r[0] for r in spark.read.parquet(path + "/bands")
            .select("ingest_batch").distinct().collect()} == {-1, 0}

    # the retry contract ACROSS the width swap: re-running the batch
    # must re-admit the same docs (its pre-crash rows self-excluded by
    # ingest_batch — a provenance-folding rebuild would make every doc
    # collide with its own copy in base and reject itself, emptying
    # the batch's admitted output)
    n_sig = spark.read.parquet(path + "/sig").count()
    pipe.process_batch(batch, 0)
    assert {r["doc_id"] for r in pipe.out_table.read()
            .select("doc_id").collect()} == {2_000_001, 2_000_002}
    assert spark.read.parquet(path + "/sig").count() == n_sig
    # verdicts are width-invariant: a verbatim base copy is still
    # rejected, a novel doc admitted, through the swapped layout
    batch2 = spark.createDataFrame(
        [(3_000_001, base_text(spark)),
         (3_000_002, "totally novel words nobody ever wrote before "
                     "hovercraft eel typewriter marmalade")], SCHEMA)
    pipe.process_batch(batch2, 1)
    admitted = {r["doc_id"]
                for r in pipe.out_table.read().select("doc_id").collect()}
    assert 3_000_001 not in admitted and 3_000_002 in admitted
