"""Persisted IVF×SQ8 index lifecycle (the SIXTH artifact family,
VERDICT r11 #7's sanctioned scalar-quantization tier): build → append
(clamped to the SAVED ranges, idempotent, even across a range swap) →
serve (partition-pruned, column-pruned) → compact (serve-invariant) →
rebuild (≡ retrain, one atomic pointer publish, clip saturation gone
by construction) — plus the clip-drift hook of StreamingSq8Ingest."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators import sq8 as sq8m
from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    _SERVE_QBOUND,
    _quantized_vectors,
    kmeans_fit,
    load_codebook,
)
from demo_cdc_users_airline_spark.operators.sq8 import (
    append_to_sq8_index,
    build_sq8_index,
    compact_sq8_index,
    load_ranges,
    rebuild_sq8_index,
    sq8_coarse_path,
    sq8_codes_path,
    sq8_fit,
    sq8_ranges_path,
    sq8_serve,
)

SF = "/root/testdata/sf0.001"


def _inc(spark, sf_dir=SF):
    return (_quantized_vectors(spark, sf_dir)
            .filter((F.col("id") % _DRIFT_MOD == 0)
                    & (F.col("id") >= _SERVE_QBOUND)))


def _grown(spark, path, sf_dir=SF):
    build_sq8_index(spark, sf_dir, path)
    append_to_sq8_index(spark, path, _inc(spark, sf_dir), batch_id=0)
    return path


def _codes_rows(spark, path):
    return sorted(
        (r["vec_id"], r["cell"], r["ingest_batch"], r["n_clip"],
         tuple(r["codes"]))
        for r in spark.read.parquet(sq8_codes_path(path)).collect())


def _serve_rows(spark, path, sf_dir=SF):
    return sorted(tuple(r) for r in
                  sq8_serve(spark, sf_dir, path).collect())


def test_build_layout_base_never_clips(spark, tmp_path):
    path = build_sq8_index(spark, SF, str(tmp_path / "idx"))
    for sub in ("coarse", "ranges", "codes"):
        assert os.path.exists(os.path.join(path, sub)), sub
    codes = spark.read.parquet(sq8_codes_path(path))
    assert set(codes.columns) >= {"vec_id", "cell", "codes", "n_clip",
                                  "vec", "ingest_batch"}
    # ranges were fit on exactly these rows — nothing can clip, and
    # every code is on the 0..255 rail range
    assert codes.filter(F.col("n_clip") != 0).count() == 0
    mn, mx = codes.select(
        F.min(F.array_min("codes")), F.max(F.array_max("codes"))).first()
    assert mn >= 0 and mx <= 255
    # the saved ranges ARE a fresh fit of the base split
    base = (_quantized_vectors(spark, SF)
            .filter(F.col("id") % _DRIFT_MOD != 0))
    assert load_ranges(spark, sq8_ranges_path(path)) == sq8_fit(base)


def test_append_retry_is_idempotent(spark, tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    before = _codes_rows(spark, path)
    append_to_sq8_index(spark, path, _inc(spark), batch_id=0)  # retry
    assert _codes_rows(spark, path) == before


def test_untagged_append_is_also_idempotent(spark, tmp_path):
    """ADVICE r13 #2: batch_id=None shares the purge-first contract —
    a re-run replaces the -2 partition instead of accumulating
    duplicate vec_ids that could surface twice in serve results."""
    path = build_sq8_index(spark, SF, str(tmp_path / "idx"))
    append_to_sq8_index(spark, path, _inc(spark), batch_id=None)
    before = _codes_rows(spark, path)
    append_to_sq8_index(spark, path, _inc(spark), batch_id=None)  # re-run
    after = _codes_rows(spark, path)
    assert after == before
    codes = spark.read.parquet(sq8_codes_path(path))
    assert codes.count() == codes.select("vec_id").distinct().count()


def test_append_retry_across_rebuild_swap(spark, tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    rebuild_sq8_index(spark, path, keep_provenance=True)
    after_swap = _codes_rows(spark, path)
    # the batch retried ACROSS the swap re-encodes under the NEW saved
    # ranges and replaces exactly its own rows — nothing else moves
    append_to_sq8_index(spark, path, _inc(spark), batch_id=0)
    assert _codes_rows(spark, path) == after_swap


def test_compaction_folds_batches_and_serve_is_invariant(spark, tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    before = _serve_rows(spark, path)
    compact_sq8_index(spark, path)
    codes = spark.read.parquet(sq8_codes_path(path))
    assert {r[0] for r in codes.select("ingest_batch").distinct()
            .collect()} == {-1}
    assert _serve_rows(spark, path) == before
    # exclude_batch keeps the in-flight batch's partitions unfolded
    append_to_sq8_index(spark, path, _inc(spark), batch_id=7)
    compact_sq8_index(spark, path, exclude_batch=7)
    codes = spark.read.parquet(sq8_codes_path(path))
    assert {r[0] for r in codes.select("ingest_batch").distinct()
            .collect()} == {-1, 7}


def test_serve_prunes_partitions_and_never_reads_inline_vectors(
        spark, tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    plan = sq8_serve(spark, SF, path) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace(
        "PartitionFilters: [isnotnull(cell", "PartitionFilters: [cell"), plan
    schemas = [ln.split("ReadSchema:", 1)[1]
               for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas
    for s in schemas:
        assert "codes" in s and "vec:" not in s and "n_clip" not in s, s


def test_rebuild_equals_retrain_and_never_scans_source(spark, tmp_path):
    src = tmp_path / "data"
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "embeddings.parquet"),
                src / "embeddings.parquet")
    path = _grown(spark, str(tmp_path / "idx"), sf_dir=str(src))
    n = spark.read.parquet(sq8_codes_path(path)).count()
    spark.catalog.clearCache()  # drop memoized _quantized_vectors
    shutil.rmtree(src)  # the source corpus is GONE

    rebuild_sq8_index(spark, path)  # must train on inline vectors only

    assert os.path.exists(str(tmp_path / "idx" / "_sq8_live.json"))
    codes = spark.read.parquet(sq8_codes_path(path))
    assert codes.count() == n
    assert {r[0] for r in codes.select("ingest_batch").distinct()
            .collect()} == {-1}
    # rebuild ≡ retrain-from-scratch on the artifact's own rows, for
    # the coarse quantizer AND the ranges; clip saturation is gone
    vecs = codes.select(F.col("vec_id").alias("id"), "vec").cache()
    assert load_codebook(spark, sq8_coarse_path(path)) == kmeans_fit(vecs)
    assert load_ranges(spark, sq8_ranges_path(path)) == sq8_fit(vecs)
    assert codes.filter(F.col("n_clip") != 0).count() == 0
    # publish retired the flat generation completely
    assert sorted(os.listdir(str(tmp_path / "idx"))) == \
        ["_sq8_live.json", "v1"]


def test_crash_before_publish_serves_old_and_retry_completes(
        spark, tmp_path, monkeypatch):
    path = _grown(spark, str(tmp_path / "idx"))
    before = _serve_rows(spark, path)
    rng_before = load_ranges(spark, sq8_ranges_path(path))

    def killed(p, meta, name):
        raise RuntimeError("killed before publish")

    with monkeypatch.context() as m:
        m.setattr(sq8m, "publish_generation", killed)
        with pytest.raises(RuntimeError, match="killed before publish"):
            rebuild_sq8_index(spark, path)

    # staged v1 is invisible debris; the flat layout still serves
    assert os.path.exists(str(tmp_path / "idx" / "v1"))
    assert not os.path.exists(str(tmp_path / "idx" / "_sq8_live.json"))
    assert load_ranges(spark, sq8_ranges_path(path)) == rng_before
    assert _serve_rows(spark, path) == before

    rebuild_sq8_index(spark, path)  # retry overwrites debris + publishes
    assert sorted(os.listdir(str(tmp_path / "idx"))) == \
        ["_sq8_live.json", "v1"]


def test_crash_after_publish_then_next_maintenance_reaps(spark, tmp_path,
                                                         monkeypatch):
    path = _grown(spark, str(tmp_path / "idx"))
    with monkeypatch.context() as m:
        m.setattr(sq8m, "_retire_dirs", lambda dirs: None)  # crash here
        rebuild_sq8_index(spark, path, keep_provenance=True)
    assert os.path.exists(str(tmp_path / "idx" / "codes"))  # stranded
    assert sq8_codes_path(path).endswith("/v1/codes")  # pointer wins
    served_with_debris = _serve_rows(spark, path)

    compact_sq8_index(spark, path)  # compaction also reaps
    assert sorted(os.listdir(str(tmp_path / "idx"))) == \
        ["_sq8_live.json", "v1"]
    assert _serve_rows(spark, path) == served_with_debris


def test_clip_hook_fires_on_drift_and_not_in_distribution(spark, tmp_path):
    from demo_cdc_users_airline_spark.streaming.sq8_ingest import (
        StreamingSq8Ingest,
    )

    path = build_sq8_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingSq8Ingest(index_path=path, rebuild_check_every=1)

    # batch 0: rows the ranges were trained on (fresh ids) — in range,
    # zero clips, must NOT fire
    base = (_quantized_vectors(spark, SF)
            .filter(F.col("id") % _DRIFT_MOD != 0).limit(6)
            .select((F.col("id") + 10_000_000).alias("id"), "vec"))
    rows0 = [(int(r["id"]), [x / 1e6 for x in r["vec"]])
             for r in base.collect()]
    pipe.process_batch(
        spark.createDataFrame(rows0, "id long, embedding array<double>"), 0)
    assert not os.path.exists(str(tmp_path / "idx" / "_sq8_live.json"))

    # batch 1: every component shifted way past the trained max —
    # everything clips, the hook must rebuild (pointer published)
    rows1 = [(20_000_000 + i, [x + 10.0 for x in e])
             for i, (_, e) in enumerate(rows0)]
    pipe.process_batch(
        spark.createDataFrame(rows1, "id long, embedding array<double>"), 1)
    assert os.path.exists(str(tmp_path / "idx" / "_sq8_live.json"))
    assert sq8_codes_path(path).endswith("/v1/codes")
    codes = spark.read.parquet(sq8_codes_path(path))
    # post-rebuild: the new ranges cover the drifted rows — zero clips,
    # nothing lost, provenance preserved (the retry-across-swap contract)
    assert codes.filter(F.col("n_clip") != 0).count() == 0
    assert {r[0] for r in codes.select("ingest_batch").distinct()
            .collect()} == {-1, 0, 1}
    before = _codes_rows(spark, path)
    pipe.process_batch(
        spark.createDataFrame(rows1, "id long, embedding array<double>"), 1)
    assert _codes_rows(spark, path) == before
    # serve continuity from the swapped artifact
    assert len(_serve_rows(spark, path)) > 0
