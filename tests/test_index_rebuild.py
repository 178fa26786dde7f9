"""rebuild_ivf_index: the staleness monitor's ACTION — fresh Lloyd on
the full drifted corpus read back from the artifact itself, published
as a new ``v<N>/`` generation behind ONE atomic pointer replace
(VERDICT r8 item 3; single-rename hardening VERDICT r9 item 4).
Completes the lifecycle state machine build → append → serve →
compact → monitor → REBUILD."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators import kmeans_ivf as ki
from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    _SERVE_QBOUND,
    _quantized_vectors,
    append_to_ivf_index,
    assign_cells,
    build_ivf_index,
    ivf_cells_path,
    ivf_codebook_path,
    ivf_serve,
    kmeans_fit,
    load_codebook,
    rebuild_ivf_index,
    save_codebook,
)

SF = "/root/testdata/sf0.001"


def _grown_index(spark, path, sf_dir=SF):
    build_ivf_index(spark, sf_dir, path)
    inc = (_quantized_vectors(spark, sf_dir)
           .filter((F.col("id") % _DRIFT_MOD == 0)
                   & (F.col("id") >= _SERVE_QBOUND)))
    append_to_ivf_index(spark, path, inc, batch_id=0)
    return path


def test_rebuild_equals_retrain_and_serve_continuity(spark, tmp_path):
    path = _grown_index(spark, str(tmp_path / "idx"))

    # serve works BEFORE the rebuild (the stale codebook still answers)
    before = ivf_serve(spark, SF, path).collect()
    assert before

    rebuild_ivf_index(spark, path)

    # rebuild ≡ retrain: the published codebook is bit-identical to a
    # from-scratch Lloyd fit on the grown corpus — i.e. the staleness
    # monitor's recall gap (saved vs retrained) closes to 0 exactly
    grown = (_quantized_vectors(spark, SF)
             .filter(~((F.col("id") % _DRIFT_MOD == 0)
                       & (F.col("id") < _SERVE_QBOUND))))
    assert load_codebook(spark, ivf_codebook_path(path)) == \
        kmeans_fit(grown)

    # serve continuity: the published artifact serves bit-identically
    # to a FRESH index built outright on the same grown corpus
    fresh = str(tmp_path / "fresh")
    cb = load_codebook(spark, ivf_codebook_path(path))
    save_codebook(spark, fresh + "/codebook", cb)
    (assign_cells(grown, cb)
     .select(F.col("id").alias("vec_id"), "cell", "q_err", "vec")
     .withColumn("ingest_batch", F.lit(-1))
     .repartition("cell")
     .write.mode("overwrite").partitionBy("cell", "ingest_batch")
     .parquet(fresh + "/cells"))
    after = sorted(tuple(r) for r in ivf_serve(spark, SF, path).collect())
    want = sorted(tuple(r) for r in ivf_serve(spark, SF, fresh).collect())
    assert after == want


def test_rebuild_retires_batch_provenance_and_leaves_no_debris(
        spark, tmp_path):
    path = _grown_index(spark, str(tmp_path / "idx"))
    n_before = spark.read.parquet(ivf_cells_path(path)).count()
    batches_before = {r[0] for r in
                      spark.read.parquet(ivf_cells_path(path))
                      .select("ingest_batch").distinct().collect()}
    assert batches_before == {-1, 0}  # base + the appended batch

    rebuild_ivf_index(spark, path)

    cells = spark.read.parquet(ivf_cells_path(path))
    # same vector population, folded into the new base partition
    assert cells.count() == n_before
    assert {r[0] for r in cells.select("ingest_batch").distinct()
            .collect()} == {-1}
    # publish retired the flat generation: only the pointer and the
    # live v1 remain under the root
    assert sorted(os.listdir(path)) == ["_ivf_live.json", "v1"]
    # APPENDS after a rebuild land in the live generation (the
    # resolver, not the retired flat path)
    inc = (_quantized_vectors(spark, SF)
           .filter((F.col("id") % _DRIFT_MOD == 0)
                   & (F.col("id") < _SERVE_QBOUND)))
    append_to_ivf_index(spark, path, inc, batch_id=1)
    assert {r[0] for r in spark.read.parquet(ivf_cells_path(path))
            .select("ingest_batch").distinct().collect()} == {-1, 1}
    # and a SECOND rebuild rolls v1 → v2 through the same one-rename
    # publish (the versioned → versioned arm of the swap)
    rebuild_ivf_index(spark, path)
    assert sorted(os.listdir(path)) == ["_ivf_live.json", "v2"]
    assert spark.read.parquet(ivf_cells_path(path)).count() \
        == n_before + inc.count()


def test_crash_before_publish_serves_old_and_retry_completes(
        spark, tmp_path, monkeypatch):
    """Kill window A: staging finished, pointer NOT yet replaced — the
    old generation must keep serving, bit-identically, and a retry
    must complete over the stranded staging debris."""
    path = _grown_index(spark, str(tmp_path / "idx"))
    before = sorted(tuple(r) for r in ivf_serve(spark, SF, path).collect())
    cb_before = load_codebook(spark, ivf_codebook_path(path))

    real_replace = os.replace

    def killed(src, dst):
        if dst.endswith("_ivf_live.json"):
            raise RuntimeError("killed before publish")
        return real_replace(src, dst)

    with monkeypatch.context() as m:
        m.setattr(os, "replace", killed)
        with pytest.raises(RuntimeError, match="killed before publish"):
            rebuild_ivf_index(spark, path)

    # the staged v1 is debris; the pointer is absent → flat layout is
    # still live and serves exactly what it served before the crash
    assert os.path.exists(str(tmp_path / "idx" / "v1"))
    assert not os.path.exists(str(tmp_path / "idx" / "_ivf_live.json"))
    assert load_codebook(spark, ivf_codebook_path(path)) == cb_before
    assert sorted(tuple(r) for r in
                  ivf_serve(spark, SF, path).collect()) == before

    # retry: overwrites the debris and publishes
    rebuild_ivf_index(spark, path)
    assert sorted(os.listdir(path)) == ["_ivf_live.json", "v1"]
    grown = (_quantized_vectors(spark, SF)
             .filter(~((F.col("id") % _DRIFT_MOD == 0)
                       & (F.col("id") < _SERVE_QBOUND))))
    assert load_codebook(spark, ivf_codebook_path(path)) == \
        kmeans_fit(grown)


def test_crash_after_publish_serves_new_despite_stranded_old(
        spark, tmp_path, monkeypatch):
    """Kill window B: pointer replaced, retired generation NOT yet
    removed — the new generation must be what serves; the stranded
    old dirs are inert debris."""
    path = _grown_index(spark, str(tmp_path / "idx"))

    with monkeypatch.context() as m:
        m.setattr(ki, "_retire_dirs", lambda dirs: None)  # crash here
        rebuild_ivf_index(spark, path)

    # old flat generation stranded beside the published v1
    assert os.path.exists(str(tmp_path / "idx" / "cells"))
    assert os.path.exists(str(tmp_path / "idx" / "v1"))
    # the pointer wins: reads resolve to v1, and the codebook is the
    # retrained one (≡ fresh Lloyd on the grown corpus)
    assert ivf_codebook_path(path).endswith("/v1/codebook")
    grown = (_quantized_vectors(spark, SF)
             .filter(~((F.col("id") % _DRIFT_MOD == 0)
                       & (F.col("id") < _SERVE_QBOUND))))
    assert load_codebook(spark, ivf_codebook_path(path)) == \
        kmeans_fit(grown)
    # serving matches a debris-free rebuild of the same index exactly
    clean = _grown_index(spark, str(tmp_path / "clean"))
    rebuild_ivf_index(spark, clean)
    assert sorted(tuple(r) for r in ivf_serve(spark, SF, path).collect()) \
        == sorted(tuple(r) for r in ivf_serve(spark, SF, clean).collect())


def test_rebuild_never_scans_source_corpus(spark, tmp_path):
    """The artifact is self-contained: a rebuild trains on the cells
    table's inline vectors. Proof ON THE REAL ENTRY POINT (ADVICE r9):
    build the index from a COPY of the testdata, DELETE the copy, then
    run rebuild_ivf_index itself — any scan of the source corpus would
    fail loudly on the missing files."""
    src = tmp_path / "data"
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "embeddings.parquet"),
                src / "embeddings.parquet")
    path = _grown_index(spark, str(tmp_path / "idx"), sf_dir=str(src))
    n = spark.read.parquet(ivf_cells_path(path)).count()
    spark.catalog.clearCache()  # drop memoized _quantized_vectors
    shutil.rmtree(src)  # the source corpus is GONE

    rebuild_ivf_index(spark, path)  # must not touch the source

    assert os.path.exists(str(tmp_path / "idx" / "_ivf_live.json"))
    cells = spark.read.parquet(ivf_cells_path(path))
    assert cells.count() == n
    # and the retrain really happened on the inline vectors: codebook
    # equals a fresh Lloyd fit on the artifact's own rows
    vecs = cells.select(F.col("vec_id").alias("id"), "vec")
    assert load_codebook(spark, ivf_codebook_path(path)) == \
        kmeans_fit(vecs)
