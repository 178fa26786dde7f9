"""Persisted near-dup cluster labels (VERDICT r9 item 1): build over
the base corpus → per-batch incremental update (LSH-probe edges +
contracted union-find + flattened merges overlay) → resolved reads —
proven equal to a full CC recompute over the same edge set, idempotent
under batch re-runs, invariant under compaction, and text-free on the
increment path.

The synthetic corpus pins a DETERMINISTIC merge scenario (texts chosen
so the MinHash band+verify rule yields exactly the intended edges —
probed offline with the oracle's own SQL):
  A  = "s167a0..s167a7", B = "s167b0..s167b7":  A vs B — no candidate
  bridge = A + " " + B: verified edge to BOTH A-docs and B-docs (8/16)
"""

import os
import shutil

import pytest

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.dedup import (
    build_cluster_index,
    cluster_labels_of,
    compact_cluster_index,
    connected_components,
    update_cluster_index,
)

A = " ".join(f"s167a{i}" for i in range(8))
B = " ".join(f"s167b{i}" for i in range(8))
BRIDGE = A + " " + B
C, D, E = "c0 c1 c2 c3", "d0 d1 d2 d3", "e0 e1 e2 e3"

# base split is doc_id % 8 != 0 (build_cluster_index's contract);
# batches use ids % 16 == 0 and % 16 == 8 so everything stays disjoint
BASE = {1: A, 9: A, 2: B, 10: B, 3: C, 11: D}
BATCH0 = {0: B, 16: A, 32: E}   # 0 becomes the NEW MIN of B's cluster
BATCH1 = {24: BRIDGE, 40: E}    # 24 MERGES the A- and B-clusters

# ground truth after both batches (component = min id):
#   {0, 1, 2, 9, 10, 16, 24} -> 0    (bridge merged A- and B-clusters)
#   {32, 40} -> 32                    (E-dup found via the appended index)
#   3 -> 3, 11 -> 11                  (singletons)
EXPECTED = {0: 0, 1: 0, 2: 0, 9: 0, 10: 0, 16: 0, 24: 0,
            32: 32, 40: 32, 3: 3, 11: 11}


def _write_corpus(dirpath, docs: dict[int, str]) -> str:
    os.makedirs(dirpath, exist_ok=True)
    ids = sorted(docs)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([docs[i] for i in ids], pa.string())}),
        os.path.join(dirpath, "documents.parquet"))
    return str(dirpath)


def _batch_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(sorted(docs.items()),
                                 "doc_id long, text string")


def _resolved(spark, path) -> dict[int, int]:
    return {int(r["doc_id"]): int(r["cluster_id"]) for r in
            cluster_labels_of(spark, path).collect()}


def _grown(spark, tmp_path):
    sf = _write_corpus(tmp_path / "corpus", BASE)
    path = build_cluster_index(spark, sf, str(tmp_path / "clu"))
    update_cluster_index(spark, path, _batch_df(spark, BATCH0), 0)
    update_cluster_index(spark, path, _batch_df(spark, BATCH1), 1)
    return path


def test_two_batches_match_full_recompute_and_pin(spark, tmp_path):
    path = _grown(spark, tmp_path)
    got = _resolved(spark, path)
    assert got == EXPECTED

    # independent check: the exact CC fixpoint over the artifact's own
    # persisted edge set (build + both batches) and full node universe
    edges = (spark.read.parquet(path + "/edges")
             .select(F.col("u").alias("src"), F.col("v").alias("dst")))
    nodes = spark.createDataFrame(
        [(i,) for i in sorted({**BASE, **BATCH0, **BATCH1})],
        "doc_id long")
    want = {int(r["doc_id"]): int(r["label"]) for r in
            connected_components(edges, nodes).collect()}
    assert got == want

    # the merge history is the flattened overlay, one join deep:
    # cluster 2 lost to 0 in batch 0; cluster 1 lost to 0 in batch 1 —
    # and the batch-0 entry was pointer-jumped, never left chained
    merges = {int(r["old_label"]): int(r["new_label"]) for r in
              spark.read.parquet(path + "/merges").collect()}
    assert merges == {1: 0, 2: 0}


def test_batch_rerun_is_idempotent(spark, tmp_path):
    path = _grown(spark, tmp_path)
    before = _resolved(spark, path)
    n_edges = spark.read.parquet(path + "/edges").count()
    n_labels = spark.read.parquet(path + "/labels").count()
    # a foreachBatch-style retry of the LAST batch re-runs against
    # post-batch state (its own rows self-excluded from the probe)
    update_cluster_index(spark, path, _batch_df(spark, BATCH1), 1)
    assert _resolved(spark, path) == before
    assert spark.read.parquet(path + "/edges").count() == n_edges
    assert spark.read.parquet(path + "/labels").count() == n_labels


def test_compaction_preserves_resolution(spark, tmp_path):
    path = _grown(spark, tmp_path)
    before = _resolved(spark, path)
    compact_cluster_index(spark, path)
    assert _resolved(spark, path) == before
    # overlay folded into labels/: zero join-side rows remain, and
    # batch provenance is retired into the base partition
    assert spark.read.parquet(path + "/merges").count() == 0
    assert {r[0] for r in spark.read.parquet(path + "/labels")
            .select("ingest_batch").distinct().collect()} == {-1}
    # and the NEXT increment still works against the compacted artifact
    update_cluster_index(spark, path,
                         _batch_df(spark, {48: A}), 2)
    after = _resolved(spark, path)
    assert after[48] == 0 and {k: v for k, v in after.items()
                               if k != 48} == before


def test_update_never_scans_base_text(spark, tmp_path):
    """The increment path reads ONLY the batch's text plus the
    artifact (persisted signatures/bands/labels): after the source
    corpus is DELETED, updates still run — any base-text scan would
    fail loudly on the missing file (the rebuild_ivf_index proof
    recipe, ADVICE r9)."""
    sf = _write_corpus(tmp_path / "corpus", BASE)
    path = build_cluster_index(spark, sf, str(tmp_path / "clu"))
    spark.catalog.clearCache()  # drop the memoized tokenization scan
    shutil.rmtree(sf)  # base text is GONE

    update_cluster_index(spark, path, _batch_df(spark, BATCH0), 0)
    update_cluster_index(spark, path, _batch_df(spark, BATCH1), 1)
    assert _resolved(spark, path) == EXPECTED


def test_crash_mid_update_heals_on_retry(spark, tmp_path, monkeypatch):
    """update_cluster_index writes four sinks (edges, labels, overlay,
    LSH append) non-atomically; foreachBatch's contract is that the
    batch RETRIES until the checkpoint commits. Crash in the two
    nastiest windows and prove the retry converges to the exact
    ground truth:
      A) after labels, BEFORE the merges overlay (reads would briefly
         show the batch labeled against unmerged corpus labels);
      B) after the overlay, BEFORE the LSH append (the next batch's
         probe would miss this batch — unless it retries first)."""
    import demo_cdc_users_airline_spark.operators.dedup as dd

    sf = _write_corpus(tmp_path / "corpus", BASE)
    path = build_cluster_index(spark, sf, str(tmp_path / "clu"))
    update_cluster_index(spark, path, _batch_df(spark, BATCH0), 0)

    # window A: kill before the overlay write
    def kill_merges(spark_, p, mapping):
        raise RuntimeError("killed before overlay")
    with monkeypatch.context() as m:
        m.setattr(dd, "_write_merges", kill_merges)
        with pytest.raises(RuntimeError, match="killed before overlay"):
            update_cluster_index(spark, path, _batch_df(spark, BATCH1), 1)
    # retry heals: same batch id, full update
    update_cluster_index(spark, path, _batch_df(spark, BATCH1), 1)
    assert _resolved(spark, path) == EXPECTED

    # window B: kill before the LSH append (fresh artifact)
    sf2 = _write_corpus(tmp_path / "corpus2", BASE)
    path2 = build_cluster_index(spark, sf2, str(tmp_path / "clu2"))
    update_cluster_index(spark, path2, _batch_df(spark, BATCH0), 0)
    def kill_append(spark_, p, docs, batch_id=None):
        raise RuntimeError("killed before lsh append")
    with monkeypatch.context() as m:
        m.setattr(dd, "append_to_lsh_index", kill_append)
        with pytest.raises(RuntimeError, match="killed before lsh append"):
            update_cluster_index(spark, path2, _batch_df(spark, BATCH1), 1)
    update_cluster_index(spark, path2, _batch_df(spark, BATCH1), 1)
    assert _resolved(spark, path2) == EXPECTED


def test_all_dup_batch_contracts_before_the_driver(spark, tmp_path,
                                                   monkeypatch):
    """The crawl-dump pathology (VERDICT r10 hardening): every batch
    doc is the same template, so the within-batch candidate set is
    all-pairs (n²/2 raw edges). The update must contract the batch to
    its COMPONENTS before anything reaches the driver — force the
    in-batch CC onto its distributed star rounds (local finish capped
    at 2 edges) and prove the labels still come out exact."""
    import demo_cdc_users_airline_spark.operators.dedup as dd

    sf = _write_corpus(tmp_path / "corpus", BASE)
    path = build_cluster_index(spark, sf, str(tmp_path / "clu"))

    real_cc = dd.connected_components

    def capped_cc(edges, nodes, local_finish_max_edges=None, **kw):
        return real_cc(edges, nodes, local_finish_max_edges=2, **kw)

    with monkeypatch.context() as m:
        m.setattr(dd, "connected_components", capped_cc)
        batch = {16 * i: B for i in range(1, 9)}  # 8 dups, one template
        update_cluster_index(spark, path, _batch_df(spark, batch), 0)

    got = _resolved(spark, path)
    # every batch doc joined the B cluster (corpus min id 2 wins)
    assert all(got[16 * i] == 2 for i in range(1, 9))
    # and the whole artifact equals the exact CC fixpoint over its own
    # persisted edge set (the first test's independent check)
    edges = (spark.read.parquet(path + "/edges")
             .select(F.col("u").alias("src"), F.col("v").alias("dst")))
    nodes = spark.createDataFrame(
        [(i,) for i in sorted({**BASE, **batch})], "doc_id long")
    want = {int(r["doc_id"]): int(r["label"]) for r in
            connected_components(edges, nodes).collect()}
    assert got == want


def test_compaction_folds_embedded_lsh(spark, tmp_path):
    """compact_cluster_index also folds the artifact's own LSH probe
    index (ADVICE r10): without it, long-running streaming opens one
    sig/bands file set per ever-ingested batch at every probe."""
    path = _grown(spark, tmp_path)
    before = _resolved(spark, path)
    compact_cluster_index(spark, path)
    for sub in ("sig", "bands"):
        assert {r[0] for r in spark.read.parquet(f"{path}/lsh/{sub}")
                .select("ingest_batch").distinct().collect()} == {-1}
    # probes against the folded index still land the next increment
    update_cluster_index(spark, path, _batch_df(spark, {48: A}), 2)
    after = _resolved(spark, path)
    assert after[48] == 0
    assert {k: v for k, v in after.items() if k != 48} == before


def test_oversized_overlay_updates_distributedly_identical_labels(
        spark, tmp_path):
    """VERDICT r11 #5: past ``merges_local_max`` the overlay update
    must run as the distributed broadcast pointer-jump join — never a
    driver collect — and produce labels IDENTICAL to the driver-dict
    path, including a seeded chain entry whose value loses in the
    batch (999 -> 1, then 1 merges into 0: the jump the flatness
    invariant depends on), with the overlay staying flat and
    unique-keyed, idempotent under a batch retry."""
    from demo_cdc_users_airline_spark.operators.dedup import (
        _write_merges_frame,
    )

    sf = _write_corpus(tmp_path / "corpus", BASE)
    p_dict = build_cluster_index(spark, sf, str(tmp_path / "clu_dict"))
    p_dist = build_cluster_index(spark, sf, str(tmp_path / "clu_dist"))
    update_cluster_index(spark, p_dict, _batch_df(spark, BATCH0), 0)
    update_cluster_index(spark, p_dist, _batch_df(spark, BATCH0), 0,
                         merges_local_max=0)

    def seed(path):
        # an overlay that outgrew its compaction cadence: synthetic
        # dead-label history + one chain entry about to need a jump
        existing = {int(r["old_label"]): int(r["new_label"]) for r in
                    spark.read.parquet(path + "/merges").collect()}
        existing[999] = 1
        for i in range(50):
            existing[10_000 + i] = 5_000 + i
        _write_merges_frame(
            spark, path,
            spark.createDataFrame(sorted(existing.items()),
                                  "old_label long, new_label long"))

    seed(p_dict)
    seed(p_dist)
    update_cluster_index(spark, p_dict, _batch_df(spark, BATCH1), 1)
    update_cluster_index(spark, p_dist, _batch_df(spark, BATCH1), 1,
                         merges_local_max=0)
    assert _resolved(spark, p_dict) == EXPECTED
    assert _resolved(spark, p_dist) == EXPECTED
    rows = spark.read.parquet(p_dist + "/merges").collect()
    m = {int(r["old_label"]): int(r["new_label"]) for r in rows}
    assert len(m) == len(rows)                      # unique keys
    assert not (set(m) & set(m.values()))           # flat mapping
    assert m[999] == 0 and m[1] == 0                # chain jumped
    assert all(m[10_000 + i] == 5_000 + i for i in range(50))
    # both paths publish the same resolved mapping
    m2 = {int(r["old_label"]): int(r["new_label"]) for r in
          spark.read.parquet(p_dict + "/merges").collect()}
    assert m2 == m
    # retry under the cap is idempotent
    update_cluster_index(spark, p_dist, _batch_df(spark, BATCH1), 1,
                         merges_local_max=0)
    assert _resolved(spark, p_dist) == EXPECTED
    assert {int(r["old_label"]): int(r["new_label"]) for r in
            spark.read.parquet(p_dist + "/merges").collect()} == m
