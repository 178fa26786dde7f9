"""Background compaction of the persisted indexes: after K streaming
appends the LSH band slices / IVF cells hold K+1 small file sets;
``compact_lsh_index`` / ``compact_ivf_index`` fold them into the base
partition. Probe/serve results must be INVARIANT under compaction (the
row set is unchanged; batch provenance only matters for idempotent
re-runs, which compaction retires)."""

import os

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.dedup import (
    append_to_lsh_index,
    build_lsh_index,
    compact_lsh_index,
    probe_lsh_index,
)
from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    _quantized_vectors,
    append_to_ivf_index,
    build_ivf_index,
    compact_ivf_index,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def parquet_files(root):
    return sorted(os.path.join(d, f)
                  for d, _, fs in os.walk(root)
                  for f in fs if f.endswith(".parquet"))


def sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_lsh_compaction_preserves_probe_verdicts(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    # two streaming-style idempotent appends -> 3 file sets per slice
    append_to_lsh_index(spark, path, docs.filter("doc_id % 16 = 0"),
                        batch_id=3)
    append_to_lsh_index(spark, path, docs.filter("doc_id % 16 = 8"),
                        batch_id=4)

    probe = docs.filter("doc_id % 16 = 4")
    before = sorted_rows(probe_lsh_index(spark, probe, path))
    sig_rows = sorted_rows(
        spark.read.parquet(path + "/sig").drop("ingest_batch"))
    bands_rows = sorted_rows(
        spark.read.parquet(path + "/bands").drop("ingest_batch"))
    n_files = len(parquet_files(path))

    compact_lsh_index(spark, path)

    # row sets unchanged, every row folded into the base partition
    assert sorted_rows(
        spark.read.parquet(path + "/sig").drop("ingest_batch")) == sig_rows
    assert sorted_rows(
        spark.read.parquet(path + "/bands").drop("ingest_batch")) \
        == bands_rows
    for sub in ("/sig", "/bands"):
        tags = {r["ingest_batch"] for r in spark.read.parquet(path + sub)
                .select("ingest_batch").distinct().collect()}
        assert tags == {-1}, (sub, tags)
    # probe verdicts invariant under compaction
    assert sorted_rows(probe_lsh_index(spark, probe, path)) == before
    # the maintenance goal: fewer files (per-batch sets merged)
    assert len(parquet_files(path)) < n_files
    # rename-aside finished cleanly: no tmp/old directories remain
    assert not [d for d in os.listdir(str(tmp_path / "idx"))
                if ".compact." in d]


def test_ivf_compaction_preserves_cells(spark, tmp_path):
    path = build_ivf_index(spark, SF, str(tmp_path / "idx"))
    inc = (_quantized_vectors(spark, SF)
           .filter(F.col("id") % _DRIFT_MOD == 0))
    append_to_ivf_index(spark, path, inc)
    append_to_ivf_index(spark, path, inc)  # second batch: same cells

    cells = spark.read.parquet(path + "/cells")
    before = sorted_rows(cells.select(
        "vec_id", "cell", "q_err", F.col("vec").cast("string")))
    n_files = len(parquet_files(path + "/cells"))

    compact_ivf_index(spark, path)

    after = spark.read.parquet(path + "/cells")
    assert sorted_rows(after.select(
        "vec_id", "cell", "q_err", F.col("vec").cast("string"))) == before
    assert len(parquet_files(path + "/cells")) < n_files
    assert not [d for d in os.listdir(str(tmp_path / "idx"))
                if ".compact." in d]


def test_multiday_lifecycle_with_midstream_compaction(spark, tmp_path):
    """Three 'days' of the production loop — probe → admit → append —
    with a maintenance-window compaction after day 0 on one index and
    never on the control: every day's verdicts and the final row sets
    must be identical (compaction happens BETWEEN batches and changes
    nothing a probe or a later append can observe)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    paths = {tag: build_lsh_index(spark, SF, str(tmp_path / tag))
             for tag in ("compacted", "control")}
    for day, mod in enumerate((0, 4, 8)):
        batch = docs.filter(f"doc_id % 16 = {mod}")
        verdicts = {}
        for tag, path in paths.items():
            v = probe_lsh_index(spark, batch, path)
            verdicts[tag] = sorted_rows(v)
            admitted = (batch.join(
                v.filter(F.col("admitted") == 1).select("doc_id"),
                "doc_id", "left_semi"))
            append_to_lsh_index(spark, path, admitted, batch_id=day)
        assert verdicts["compacted"] == verdicts["control"], f"day {day}"
        if day == 0:
            compact_lsh_index(spark, paths["compacted"])
    for sub in ("/sig", "/bands"):
        assert sorted_rows(
            spark.read.parquet(paths["compacted"] + sub)
            .drop("ingest_batch")) == sorted_rows(
            spark.read.parquet(paths["control"] + sub)
            .drop("ingest_batch"))
