"""Incremental dedup against the persisted MinHash-LSH index
(VERDICT r7 item 3): the probe's corpus-side work must be driven by
the increment — index parquet instead of corpus text, partition
pruning on the increment's band-key prefixes, build-once memoization.
"""

import contextlib
import io
import os

from demo_cdc_users_airline_spark.operators.dedup import (
    _INC_MIN_MATCH,
    _N_PERMS,
    _lsh_index_path,
    build_lsh_index,
    dedup_incremental_lsh,
)

SF = "/root/testdata/sf0.001"


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_probe_plan_never_scans_corpus_text(spark):
    plan = plan_text(dedup_incremental_lsh(spark, SF))
    # the base corpus is served from the persisted index...
    assert "lsh_index" in plan, plan
    # ...and every documents scan is increment-filtered: the build-side
    # corpus filter (NOT (doc_id % 8 = 0)) must not appear anywhere in
    # the probe plan — corpus text is touched at build time only
    assert "% 8) = 0" in plan
    assert "NOT ((doc_id" not in plan and "% 8) > 0" not in plan, plan


def test_probe_prunes_index_partitions(spark):
    plan = plan_text(dedup_incremental_lsh(spark, SF))
    # the increment's (<=256) band-key prefixes push into the bands
    # read as a PARTITION filter — a small batch reads only matching
    # index slices, so corpus-side IO scales with the increment
    pruned = [seg for seg in plan.split("PartitionFilters: [")[1:]
              if "pfx" in seg.split("]", 1)[0]]
    assert pruned, plan


def test_index_builds_once_per_session(spark):
    dedup_incremental_lsh(spark, SF).count()
    sig_dir = _lsh_index_path(SF) + "/sig"
    mtime = max(os.path.getmtime(os.path.join(sig_dir, f))
                for f in os.listdir(sig_dir))
    dedup_incremental_lsh(spark, SF).count()
    mtime2 = max(os.path.getmtime(os.path.join(sig_dir, f))
                 for f in os.listdir(sig_dir))
    assert mtime2 == mtime  # memoized: the probe never rebuilds


def test_admission_semantics(spark):
    rows = dedup_incremental_lsh(spark, SF).collect()
    assert len(rows) == 63  # every increment doc gets a verdict
    assert any(r["admitted"] == 0 for r in rows)  # testdata has dups
    for r in rows:
        if r["admitted"]:
            assert r["dup_of"] is None and r["n_match_sig"] < _INC_MIN_MATCH
        else:
            assert r["dup_of"] is not None
            assert r["n_match_sig"] >= _INC_MIN_MATCH
        assert r["est_jaccard_micro"] == \
            r["n_match_sig"] * 1_000_000 // _N_PERMS


def test_explicit_build_path_roundtrip(spark, tmp_path):
    # the artifact lifecycle is callable directly (a daily job would):
    # build to an explicit path, probe frames read back consistently
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    sig = spark.read.parquet(path + "/sig")
    bands = spark.read.parquet(path + "/bands")
    assert sig.count() > 0
    assert bands.select("pfx").distinct().count() <= 256
    assert set(sig.columns) == {"doc_id", *{f"h{i}" for i in range(_N_PERMS)}}
