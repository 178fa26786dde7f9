"""Incrementally-maintained training-manifest lifecycle (VERDICT r13
#2): build (frozen curation state + base rows) → per-batch frozen-state
re-curation appended as batch-local tail packs → idempotent retry →
rebuild-diff census identities. The gated queries prove the MATH
equals first principles; these tests pin the artifact MECHANICS the
hash gate can't see (purge-first layout, touched-streams-only writes,
rejection semantics per curation stage, rf fallback)."""

import json
import os

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.manifest import (
    _GATE_BATCH_ID,
    _INC_MOD,
    build_manifest_index,
    corpus_manifest_rebuild_diff,
    manifest_rf_path,
    manifest_rows_path,
    read_manifest_rows,
    update_manifest_index,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def _inc_docs(spark, sf_dir=SF):
    return (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % _INC_MOD == 0)
            .select("doc_id", "text", "source"))


def _rows(spark, path):
    return sorted(tuple(r) for r in
                  read_manifest_rows(spark, path).collect())


def test_build_layout_and_base_rows(spark, tmp_path):
    path = build_manifest_index(spark, SF, str(tmp_path / "m"))
    for sub in ("clu", "rows", "rf", "fp", "bench", "merges.json"):
        assert os.path.exists(os.path.join(path, sub)), sub
    df = read_manifest_rows(spark, path)
    rows = df.collect()
    assert rows and {r["ingest_batch"] for r in rows} == {-1}
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # base rows come only from the base split, never the bench slice
    assert all(r["doc_id"] % _INC_MOD != 0 for r in rows)
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    # eval splits are never epoch-expanded
    ev = [r for r in rows if r["split"] != "train"]
    assert ev and all(r["copy"] == 1 and r["rf_ppm"] == 1000000
                      for r in ev)
    # the packing running-sum identity per (split, shard) stream
    by_stream = {}
    for r in rows:
        by_stream.setdefault((r["split"], r["shard"]), []).append(r)
    for (split, shard), rs in by_stream.items():
        rs.sort(key=lambda r: (r["doc_id"], r["copy"]))
        off = 0
        for r in rs:
            assert r["pack_id"] == shard * 1000000 + off // 2048
            assert r["pack_offset"] == off % 2048
            assert r["spans_boundary"] == (
                1 if off % 2048 + r["n_tokens"] > 2048 else 0)
            off += r["n_tokens"]


def test_batch_append_touches_only_its_own_partitions(spark, tmp_path):
    path = build_manifest_index(spark, SF, str(tmp_path / "m"))
    base_before = _rows(spark, path)
    update_manifest_index(spark, path, _inc_docs(spark),
                          batch_id=_GATE_BATCH_ID)
    after = read_manifest_rows(spark, path)
    batch_rows = after.filter(F.col("ingest_batch") == 0).collect()
    assert batch_rows
    assert all(r["doc_id"] % _INC_MOD == 0 for r in batch_rows)
    # base partitions byte-identical: the append wrote ONLY its own
    # (split, shard, ingest_batch=0) directories
    base_after = sorted(
        tuple(r) for r in after.filter(F.col("ingest_batch") == -1)
        .collect())
    assert base_after == base_before
    # batch-local pack namespace: every stream's offsets restart at 0
    streams = {}
    for r in batch_rows:
        streams.setdefault((r["split"], r["shard"]), []).append(r)
    for rs in streams.values():
        rs.sort(key=lambda r: (r["doc_id"], r["copy"]))
        assert rs[0]["pack_offset"] == 0


def test_batch_retry_is_idempotent_and_purges_stale(spark, tmp_path):
    path = build_manifest_index(spark, SF, str(tmp_path / "m"))
    update_manifest_index(spark, path, _inc_docs(spark), batch_id=3)
    before = _rows(spark, path)
    update_manifest_index(spark, path, _inc_docs(spark), batch_id=3)
    assert _rows(spark, path) == before  # retry replaces its own rows
    # a retry that admits FEWER streams must purge the attempt's extra
    # partitions, not strand them (the dynamic-overwrite gap)
    half = _inc_docs(spark).filter(F.col("doc_id") % (2 * _INC_MOD) == 0)
    update_manifest_index(spark, path, half, batch_id=3)
    left = (read_manifest_rows(spark, path)
            .filter(F.col("ingest_batch") == 3).collect())
    assert left and all(r["doc_id"] % (2 * _INC_MOD) == 0 for r in left)


def test_batch_curation_rejections(spark, tmp_path):
    path = build_manifest_index(spark, SF, str(tmp_path / "m"))
    base_doc = (load_table(spark, SF, "documents")
                .filter((F.col("doc_id") % _INC_MOD != 0)
                        & (F.col("doc_id") % 97 != 0))
                .orderBy("doc_id").first())
    novel = ("zebra xylophone quantum harmonica sediment glacier "
             "aurora borealis cantilever mezzanine theodolite sprocket "
             "bandolier astrolabe marmalade citadel oscilloscope "
             "pergola quenelle rhizome saxifrage the of a to in is "
             "topaz verdigris wisteria yardarm zeppelin ansible "
             "bathyscaphe chrysalis dirigible")
    batch = spark.createDataFrame(
        [(90_000_001, base_doc["text"], "srcX"),       # exact dup of base
         (90_000_002, base_doc["text"] + " extraword", "srcX"),  # near-dup
         (90_000_003, "too short", "srcX"),            # quality reject
         (90_000_004, novel, "srcX"),                  # admitted
         (90_000_004 + 97 - (90_000_004 % 97),         # bench-slice id
          novel + " other", "srcX")],
        "doc_id long, text string, source string")
    update_manifest_index(spark, path, batch, batch_id=9)
    got = {r["doc_id"] for r in read_manifest_rows(spark, path)
           .filter(F.col("ingest_batch") == 9).collect()}
    assert got == {90_000_004}
    # unseen source → frozen-rf fallback: exactly one copy at 1e6 ppm
    row = (read_manifest_rows(spark, path)
           .filter(F.col("doc_id") == 90_000_004).collect())
    assert len(row) == 1 and row[0]["rf_ppm"] == 1000000 \
        and row[0]["copy"] == 1


def test_frozen_state_means_cross_batch_independence(spark, tmp_path):
    """Two batches carrying the SAME novel doc are both admitted (each
    curates against the frozen BASE only — the documented pure-function
    property that makes retries idempotent; the rebuild diff prices the
    resulting duplicates)."""
    path = build_manifest_index(spark, SF, str(tmp_path / "m"))
    novel = ("zebra xylophone quantum harmonica sediment glacier "
             "aurora borealis cantilever mezzanine theodolite sprocket "
             "bandolier astrolabe marmalade citadel oscilloscope "
             "pergola quenelle rhizome saxifrage the of a to in is")
    b = spark.createDataFrame([(91_000_001, novel, "srcY")],
                              "doc_id long, text string, source string")
    update_manifest_index(spark, path, b, batch_id=1)
    b2 = spark.createDataFrame([(91_000_002, novel + " ", "srcY")],
                               "doc_id long, text string, source string")
    update_manifest_index(spark, path, b2, batch_id=2)
    got = (read_manifest_rows(spark, path)
           .filter(F.col("doc_id") >= 91_000_000).collect())
    assert {r["doc_id"] for r in got} == {91_000_001, 91_000_002}


def test_rebuild_diff_census_identities(spark):
    """Per split: stable + moved + added = rebuild rows, and
    stable + moved + dropped = incremental rows — the census is a
    partition of both sides."""
    rows = corpus_manifest_rebuild_diff(spark, SF).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    for r in rows:
        assert r["n_stable"] + r["n_moved"] + r["n_added"] \
            == r["n_rebuild"], r
        assert r["n_stable"] + r["n_moved"] + r["n_dropped"] \
            == r["n_incremental"], r


def test_frozen_rf_round_trips(spark, tmp_path):
    path = build_manifest_index(spark, SF, str(tmp_path / "m"))
    rf = {r["source"]: r["rf_ppm"] for r in
          spark.read.parquet(manifest_rf_path(path)).collect()}
    assert rf and all(v > 0 for v in rf.values())
    with open(path + "/merges.json") as f:
        merges = json.load(f)
    assert merges and all(len(m) == 4 for m in merges)
    # rows/ is the only subtree a batch append writes
    assert os.path.isdir(manifest_rows_path(path))
