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
    append_to_lsh_index,
    build_lsh_index,
    dedup_incremental_lsh,
    probe_lsh_index,
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


def test_append_maintains_index(spark, tmp_path):
    # the daily lifecycle: build once, then per batch probe → admit →
    # APPEND — after appending a batch, its documents are LIVE in the
    # index (a re-probe of the same batch finds exact self-matches),
    # so the next day's batch dedups against them without any rebuild
    from demo_cdc_users_airline_spark.sources.loader import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    batch = docs.filter("doc_id % 16 = 0")
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    n_sig_before = spark.read.parquet(path + "/sig").count()
    assert n_sig_before > 0
    append_to_lsh_index(spark, path, batch)
    # appended rows land in the artifact (docs under 3 tokens have no
    # shingles, hence no signature — count those out)
    shingled = {r["doc_id"] for r in batch.filter(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
        .collect()}
    n_sig_after = spark.read.parquet(path + "/sig").count()
    assert n_sig_after == n_sig_before + len(shingled)
    # re-probe the appended batch: every shingled doc now collides at
    # n_match = 16 (its own signature is in the index; an exact twin
    # with a smaller id may win the (n_match, corpus_id) tiebreak, so
    # assert the match strength, not the partner id)
    rows = probe_lsh_index(spark, batch, path).collect()
    assert rows
    for r in rows:
        if r["doc_id"] in shingled:
            assert r["n_match_sig"] == _N_PERMS and r["admitted"] == 0
        else:
            assert r["admitted"] == 1


def test_explicit_build_path_roundtrip(spark, tmp_path):
    # the artifact lifecycle is callable directly (a daily job would):
    # build to an explicit path, probe frames read back consistently
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    sig = spark.read.parquet(path + "/sig")
    bands = spark.read.parquet(path + "/bands")
    assert sig.count() > 0
    assert bands.select("pfx").distinct().count() <= 256
    assert set(sig.columns) == {"doc_id", "ingest_batch",
                                *{f"h{i}" for i in range(_N_PERMS)}}
    # the build owns the base partition; streaming appends own their own
    assert sig.select("ingest_batch").distinct().collect()[0][0] == -1


def test_pfx_width_is_an_artifact_parameter(spark, tmp_path):
    # the width is chosen at BUILD time from the corpus size, persisted
    # in meta.json, and read back by probes/appends — gate-sized corpora
    # get 16 slices (not 256 footer opens per probe), production corpora
    # get wider prefixes that prune harder
    from pyspark.sql import functions as F

    from demo_cdc_users_airline_spark.operators.dedup import (
        _pfx_width_for,
        lsh_pfx_width,
    )

    assert _pfx_width_for(500) == 1
    assert _pfx_width_for(999_999) == 1
    assert _pfx_width_for(1_000_000) == 2
    assert _pfx_width_for(15_999_999) == 2
    assert _pfx_width_for(16_000_000) == 3

    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    assert lsh_pfx_width(path) == 1  # sf0.001 base corpus < 1M docs
    bands = spark.read.parquet(path + "/bands")
    assert bands.select(F.length("pfx")).distinct().collect() == [(1,)]
    assert bands.select("pfx").distinct().count() <= 16


def test_probe_verdicts_invariant_under_pfx_width(spark, tmp_path):
    # pfx is physical layout only: the same corpus indexed at width 1
    # and width 2 serves BIT-IDENTICAL verdicts (and appends slice new
    # band keys with the artifact's own width)
    from demo_cdc_users_airline_spark.operators.dedup import lsh_pfx_width
    from demo_cdc_users_airline_spark.sources.loader import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    inc = docs.filter("doc_id % 8 = 0")

    def verdicts(width):
        p = build_lsh_index(spark, SF, str(tmp_path / f"idx_w{width}"),
                            pfx_width=width)
        assert lsh_pfx_width(p) == width
        append_to_lsh_index(spark, p, inc.filter("doc_id % 16 = 0"),
                            batch_id=1)
        rows = probe_lsh_index(spark, inc, p,
                               exclude_batch=1).collect()
        return sorted(tuple(r) for r in rows)

    assert verdicts(1) == verdicts(2)


def test_rebuild_migrates_width_and_preserves_verdicts(spark, tmp_path):
    # the width-migration lifecycle: appends grow the corpus past a
    # width threshold -> rebuild re-lays the bands from the artifact's
    # OWN signature table at the new width (corpus text never touched),
    # folds batch provenance, and probes keep serving identical
    # verdicts through the swap
    from pyspark.sql import functions as F

    from demo_cdc_users_airline_spark.operators.dedup import (
        lsh_pfx_width,
        rebuild_lsh_index,
    )
    from demo_cdc_users_airline_spark.sources.loader import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    inc = docs.filter("doc_id % 8 = 0")
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    append_to_lsh_index(spark, path,
                        docs.filter("doc_id % 16 = 8"), batch_id=1)
    assert lsh_pfx_width(path) == 1

    before = sorted(tuple(r) for r in
                    probe_lsh_index(spark, inc, path).collect())
    rebuild_lsh_index(spark, path, pfx_width=2)  # simulate growth

    assert lsh_pfx_width(path) == 2
    bands = spark.read.parquet(path + "/bands")
    assert bands.select(F.length("pfx")).distinct().collect() == [(2,)]
    # provenance folded into the new base on both tables
    assert {r[0] for r in bands.select("ingest_batch").distinct()
            .collect()} == {-1}
    assert {r[0] for r in spark.read.parquet(path + "/sig")
            .select("ingest_batch").distinct().collect()} == {-1}
    # probes slice with the artifact's new width and agree bit-for-bit
    after = sorted(tuple(r) for r in
                   probe_lsh_index(spark, inc, path).collect())
    assert after == before
    # no swap debris
    assert not [d for d in os.listdir(str(tmp_path / "idx"))
                if ".rebuild." in d]


def test_compaction_preserves_width_meta(spark, tmp_path):
    from demo_cdc_users_airline_spark.operators.dedup import (
        compact_lsh_index,
        lsh_pfx_width,
    )
    from demo_cdc_users_airline_spark.sources.loader import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"), pfx_width=2)
    append_to_lsh_index(spark, path,
                        docs.filter("doc_id % 16 = 0"), batch_id=1)
    compact_lsh_index(spark, path)
    assert lsh_pfx_width(path) == 2  # the rewrite carried the meta
