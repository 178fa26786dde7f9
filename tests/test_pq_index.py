"""Persisted PQ index lifecycle (VERDICT r10 #1): the compression tier
as a maintained artifact — build → append (idempotent, even across a
codebook swap) → serve (partition-pruned, column-pruned) → compact
(serve-invariant) → rebuild (≡ retrain, one atomic pointer publish) —
plus the stranded-generation reaper (VERDICT r10 #4) for BOTH the PQ
and IVF versioned-pointer artifacts."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators import kmeans_ivf as ki
from demo_cdc_users_airline_spark.operators import pq as pqm
from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    _SERVE_QBOUND,
    _quantized_vectors,
    kmeans_fit,
    load_codebook,
)
from demo_cdc_users_airline_spark.operators.pq import (
    _subvectors_of,
    append_to_pq_index,
    build_pq_index,
    compact_pq_index,
    load_pq_codebook,
    pq_codebook_path,
    pq_codes_path,
    pq_coarse_path,
    pq_fit,
    pq_serve,
    rebuild_pq_index,
)

SF = "/root/testdata/sf0.001"


def _inc(spark, sf_dir=SF):
    return (_quantized_vectors(spark, sf_dir)
            .filter((F.col("id") % _DRIFT_MOD == 0)
                    & (F.col("id") >= _SERVE_QBOUND)))


def _grown(spark, path, sf_dir=SF):
    build_pq_index(spark, sf_dir, path)
    append_to_pq_index(spark, path, _inc(spark, sf_dir), batch_id=0)
    return path


def _codes_rows(spark, path):
    return sorted(
        (r["vec_id"], r["cell"], r["ingest_batch"], tuple(r["codes"]))
        for r in spark.read.parquet(pq_codes_path(path)).collect())


def _serve_rows(spark, path, sf_dir=SF):
    return sorted(tuple(r) for r in pq_serve(spark, sf_dir, path).collect())


def test_build_layout_and_grown_serve(spark, tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    # both codebooks persisted; codes partitioned (cell, ingest_batch)
    assert load_codebook(spark, pq_coarse_path(path))
    pq_cb = load_pq_codebook(spark, pq_codebook_path(path))
    assert {s for s, _, _ in pq_cb} == set(range(pqm.M_SUB))
    batches = {r[0] for r in spark.read.parquet(pq_codes_path(path))
               .select("ingest_batch").distinct().collect()}
    assert batches == {-1, 0}
    rows = pq_serve(spark, SF, path).collect()
    assert rows
    by_q = {}
    for r in rows:
        # queries are the fresh batch; the index holds base + appended
        assert r["query_id"] % _DRIFT_MOD == 0 and \
            r["query_id"] < _SERVE_QBOUND
        assert not (r["neighbor_id"] % _DRIFT_MOD == 0
                    and r["neighbor_id"] < _SERVE_QBOUND)
        by_q.setdefault(r["query_id"], []).append(
            (r["adc_d2"], r["neighbor_id"]))
    for pairs in by_q.values():
        assert 1 <= len(pairs) <= pqm.ADC_TOPK
        assert pairs == sorted(pairs)
    # the appended increment is actually reachable: with the increment
    # encoded under the SAVED codebooks, at least the increment's own
    # near-twin structure must surface SOME increment neighbor unless
    # the base dominates everywhere — assert the weaker, structural
    # fact instead: every appended vector is present in the code table
    inc_ids = {r["id"] for r in _inc(spark).select("id").collect()}
    idx_ids = {r["vec_id"] for r in spark.read.parquet(pq_codes_path(path))
               .filter(F.col("ingest_batch") == 0).select("vec_id").collect()}
    assert idx_ids == inc_ids


def test_append_retry_is_idempotent(spark, tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    before = _codes_rows(spark, path)
    append_to_pq_index(spark, path, _inc(spark), batch_id=0)  # retry
    assert _codes_rows(spark, path) == before


def test_append_retry_across_rebuild_swap(spark, tmp_path):
    """A batch retried AFTER a rebuild swapped both codebooks must
    still replace its own rows exactly (purge-first contract): the new
    coarse quantizer assigns different cells, so dynamic overwrite
    alone would strand the pre-swap copies."""
    path = _grown(spark, str(tmp_path / "idx"))
    rebuild_pq_index(spark, path, keep_provenance=True)
    n_before = spark.read.parquet(pq_codes_path(path)).count()
    append_to_pq_index(spark, path, _inc(spark), batch_id=0)  # retry
    codes = spark.read.parquet(pq_codes_path(path))
    assert codes.count() == n_before
    # exactly one copy of every appended vector
    dup = (codes.filter(F.col("ingest_batch") == 0)
           .groupBy("vec_id").count().filter("count > 1").count())
    assert dup == 0


def test_compaction_folds_batches_and_serve_is_invariant(spark, tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    before = _serve_rows(spark, path)
    compact_pq_index(spark, path)
    assert {r[0] for r in spark.read.parquet(pq_codes_path(path))
            .select("ingest_batch").distinct().collect()} == {-1}
    assert _serve_rows(spark, path) == before
    # exclude_batch keeps the in-flight batch unfolded (retry contract)
    append_to_pq_index(spark, path, _inc(spark), batch_id=7)
    compact_pq_index(spark, path, exclude_batch=7)
    assert {r[0] for r in spark.read.parquet(pq_codes_path(path))
            .select("ingest_batch").distinct().collect()} == {-1, 7}


def test_serve_prunes_partitions_and_never_reads_inline_vectors(spark,
                                                                tmp_path):
    path = _grown(spark, str(tmp_path / "idx"))
    plan = pq_serve(spark, SF, path) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan, plan
    # the ADC scan projects (vec_id, codes) — the inline full-precision
    # vec column must be pruned out of the codes-table read schema
    scan_lines = [ln for ln in plan.splitlines()
                  if "codes" in ln and "ReadSchema" in ln]
    assert scan_lines and all("vec:" not in ln for ln in scan_lines), plan


def test_rebuild_equals_retrain_and_never_scans_source(spark, tmp_path):
    src = tmp_path / "data"
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "embeddings.parquet"),
                src / "embeddings.parquet")
    path = _grown(spark, str(tmp_path / "idx"), sf_dir=str(src))
    n = spark.read.parquet(pq_codes_path(path)).count()
    spark.catalog.clearCache()  # drop memoized _quantized_vectors
    shutil.rmtree(src)  # the source corpus is GONE

    rebuild_pq_index(spark, path)  # must train on inline vectors only

    assert os.path.exists(str(tmp_path / "idx" / "_pq_live.json"))
    codes = spark.read.parquet(pq_codes_path(path))
    assert codes.count() == n
    assert {r[0] for r in codes.select("ingest_batch").distinct()
            .collect()} == {-1}
    # rebuild ≡ retrain-from-scratch on the artifact's own rows, for
    # BOTH codebooks
    vecs = codes.select(F.col("vec_id").alias("id"), "vec").cache()
    assert load_codebook(spark, pq_coarse_path(path)) == kmeans_fit(vecs)
    assert load_pq_codebook(spark, pq_codebook_path(path)) == \
        pq_fit(_subvectors_of(vecs).cache())
    # publish retired the flat generation completely
    assert sorted(os.listdir(str(tmp_path / "idx"))) == \
        ["_pq_live.json", "v1"]


def test_crash_before_publish_serves_old_and_retry_completes(
        spark, tmp_path, monkeypatch):
    path = _grown(spark, str(tmp_path / "idx"))
    before = _serve_rows(spark, path)
    cb_before = load_pq_codebook(spark, pq_codebook_path(path))

    def killed(p, meta, name):
        raise RuntimeError("killed before publish")

    with monkeypatch.context() as m:
        m.setattr(pqm, "publish_generation", killed)
        with pytest.raises(RuntimeError, match="killed before publish"):
            rebuild_pq_index(spark, path)

    # staged v1 is invisible debris; the flat layout still serves
    assert os.path.exists(str(tmp_path / "idx" / "v1"))
    assert not os.path.exists(str(tmp_path / "idx" / "_pq_live.json"))
    assert load_pq_codebook(spark, pq_codebook_path(path)) == cb_before
    assert _serve_rows(spark, path) == before

    rebuild_pq_index(spark, path)  # retry overwrites debris + publishes
    assert sorted(os.listdir(str(tmp_path / "idx"))) == \
        ["_pq_live.json", "v1"]


def test_crash_after_publish_then_next_rebuild_reaps_debris(
        spark, tmp_path, monkeypatch):
    """Kill window B + the VERDICT r10 #4 reaper: pointer replaced but
    the retired generation NOT removed — the stranded flat tables must
    be inert (pointer wins), and the NEXT successful rebuild must leave
    zero stale generations behind."""
    path = _grown(spark, str(tmp_path / "idx"))

    with monkeypatch.context() as m:
        m.setattr(pqm, "_retire_dirs", lambda dirs: None)  # crash here
        rebuild_pq_index(spark, path)

    # stranded flat generation beside the published v1; pointer wins
    assert os.path.exists(str(tmp_path / "idx" / "codes"))
    assert pq_codes_path(path).endswith("/v1/codes")
    served_with_debris = _serve_rows(spark, path)

    # next successful rebuild reaps EVERYTHING the pointer doesn't name
    rebuild_pq_index(spark, path)
    assert sorted(os.listdir(str(tmp_path / "idx"))) == \
        ["_pq_live.json", "v2"]
    assert _serve_rows(spark, path) == served_with_debris


def test_compaction_also_reaps_stranded_generations(spark, tmp_path,
                                                    monkeypatch):
    path = _grown(spark, str(tmp_path / "idx"))
    with monkeypatch.context() as m:
        m.setattr(pqm, "_retire_dirs", lambda dirs: None)
        rebuild_pq_index(spark, path, keep_provenance=True)
    assert os.path.exists(str(tmp_path / "idx" / "codes"))  # stranded

    compact_pq_index(spark, path)
    assert sorted(os.listdir(str(tmp_path / "idx"))) == \
        ["_pq_live.json", "v1"]


def test_ivf_rebuild_reaps_stranded_generation(spark, tmp_path,
                                               monkeypatch):
    """The same reaper on the IVF artifact: a crash between publish and
    retire strands the old generation; the next successful rebuild (or
    compaction) removes it — the VERDICT r10 #4 crash-injection gate."""
    path = str(tmp_path / "ivf")
    ki.build_ivf_index(spark, SF, path)
    ki.append_to_ivf_index(spark, path, _inc(spark), batch_id=0)

    with monkeypatch.context() as m:
        m.setattr(ki, "_retire_dirs", lambda dirs: None)  # crash
        ki.rebuild_ivf_index(spark, path)
    assert os.path.exists(os.path.join(path, "cells"))  # stranded

    ki.rebuild_ivf_index(spark, path)
    assert sorted(os.listdir(path)) == ["_ivf_live.json", "v2"]

    # and compaction alone also reaps (second crash, then compact)
    with monkeypatch.context() as m:
        m.setattr(ki, "_retire_dirs", lambda dirs: None)
        ki.rebuild_ivf_index(spark, path)
    assert os.path.exists(os.path.join(path, "v2"))  # stranded old gen
    ki.compact_ivf_index(spark, path)
    assert sorted(os.listdir(path)) == ["_ivf_live.json", "v3"]


def test_drift_census_reads_only_pq_err_column(spark):
    """The drift report's artifact scan must project pq_err alone —
    codes and the inline re-rank vectors stay unread (column pruning;
    partition columns come from footers)."""
    from demo_cdc_users_airline_spark.operators.pq import (
        similarity_pq_drift_report,
    )

    plan = similarity_pq_drift_report(spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    schemas = [ln.split("ReadSchema:", 1)[1]
               for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas
    for s in schemas:
        assert "pq_err" in s and "codes" not in s and "vec" not in s, s


def test_rerank_serve_is_artifact_resident_and_shortlist_bounded(
        spark, tmp_path):
    """Two-stage serve from the artifact alone: stage-2 exact scores
    must re-rank WITHIN the ADC shortlist (every final neighbor appears
    in the stage-1 pool), results are exact-distance ordered, and BOTH
    stages' artifact scans are partition-pruned to the probed cells."""
    from pyspark.sql import Window

    from demo_cdc_users_airline_spark.operators.pq import (
        _pq_serve_adc,
        _topk_per_query,
        pq_rerank_serve,
    )
    from demo_cdc_users_airline_spark.operators.pq import RERANK_POOL

    path = _grown(spark, str(tmp_path / "idx"))
    rows = pq_rerank_serve(spark, SF, path).collect()
    assert rows
    adc, _, _ = _pq_serve_adc(spark, SF, path)
    wr = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    pool = {(r["query_id"], r["neighbor_id"]) for r in
            (adc.withColumn("__rn", F.row_number().over(wr))
             .filter(F.col("__rn") <= RERANK_POOL).collect())}
    by_q = {}
    for r in rows:
        assert (r["query_id"], r["neighbor_id"]) in pool
        by_q.setdefault(r["query_id"], []).append(
            (r["exact_d2"], r["neighbor_id"]))
    for pairs in by_q.values():
        assert pairs == sorted(pairs)
    plan = pq_rerank_serve(spark, SF, path) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [cell") >= 2, plan


def test_drift_ppm_is_overflow_free_in_the_giant_sum_regime(spark):
    """Pin the ≥38-digit regime the r11 formula could NOT survive
    (VERDICT r11 #2): with error SUMS around 1e30, the retired
    cross-product ``s_added·n_base·1e6`` exceeds DECIMAL(38,0) /
    HUGEINT — DuckDB raises, Spark silently nulls→0. The shipped
    ratio-of-floored-averages must (a) produce IDENTICAL BIGINTs on
    both engines from the exact production fragments, and (b) keep
    every intermediate bounded by max-per-vector-error × 1e6,
    i.e. never overflow no matter how large the sums grow."""
    import duckdb

    from demo_cdc_users_airline_spark.operators.pq import (
        PQ_DRIFT_PPM_DUCK,
        PQ_DRIFT_PPM_SPARK,
    )

    # (cell, n_base, s_base, n_added, s_added): sums near 1e30 — far
    # past the point where s_added * n_base * 1e6 blows 38 digits —
    # plus the edge cells (no increment, no base, zero base error).
    rows = [
        (0, 10**12, 3 * 10**30, 10**9, 9 * 10**27),   # drifted 3×
        (1, 10**12, 3 * 10**30, 10**9, 3 * 10**27),   # in-distribution
        (2, 10**12, 3 * 10**30, 0, None),             # no increment
        (3, 0, None, 10**9, 9 * 10**27),              # no base
        (4, 10**12, 0, 10**9, 9 * 10**27),            # zero base error
    ]
    from decimal import Decimal

    sdf = spark.createDataFrame(
        [(c, nb, None if sb is None else Decimal(sb),
          na, None if sa is None else Decimal(sa))
         for c, nb, sb, na, sa in rows],
        "cell long, n_base long, s_base decimal(38,0),"
        " n_added long, s_added decimal(38,0)")
    got_spark = {r["cell"]: r["ppm"] for r in
                 sdf.select("cell",
                            F.expr(PQ_DRIFT_PPM_SPARK.format(i="", b=""))
                            .alias("ppm")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(cell BIGINT, n_base BIGINT,"
                " s_base HUGEINT, n_added BIGINT, s_added HUGEINT)")
    # literal text, never bound Python ints: the client binding routes
    # >2^53 ints through a double and silently mangles them
    con.execute("INSERT INTO t VALUES " + ", ".join(
        "(%s)" % ", ".join("NULL" if v is None else str(v) for v in r)
        for r in rows))
    got_duck = {c: p for c, p in con.execute(
        f"SELECT cell, {PQ_DRIFT_PPM_DUCK.format(i='', b='')} FROM t"
    ).fetchall()}
    assert got_spark == got_duck
    # the drifted cell reads 3×, the healthy one 1× — the signal the
    # rebuild gate thresholds on survives the giant regime intact
    assert got_spark[0] == 3_000_000
    assert got_spark[1] == 1_000_000
    assert got_spark[2] == 0 and got_spark[3] == 0 and got_spark[4] == 0
    # and the retired cross-product indeed dies here: DuckDB raises
    # (loud), so any same-shape future regression re-breaks this test
    with pytest.raises(Exception):
        con.execute("SELECT s_added * n_base * 1000000"
                    " // nullif(s_base * n_added, 0) FROM t"
                    " WHERE cell = 0").fetchall()
