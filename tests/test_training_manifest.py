"""The persisted training-dataset manifest (write_training_dataset):
round-trip exactness, rebuild idempotence, and the loader-facing
partition-pruning plan proof.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from demo_cdc_users_airline_spark.operators.training_dataset import (  # noqa: E402
    corpus_training_dataset,
    read_training_dataset,
    write_training_dataset,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(str(r) for r in df.collect())


@pytest.fixture(scope="module")
def manifest_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("manifest") / "m")
    write_training_dataset(spark, SF, p)
    return p


def test_write_read_roundtrip_is_exact(spark, manifest_path):
    got = _rows(read_training_dataset(spark, manifest_path))
    want = _rows(corpus_training_dataset(spark, SF))
    assert got == want


def test_layout_is_split_shard_partitioned(manifest_path):
    splits = [d for d in os.listdir(manifest_path)
              if d.startswith("split=")]
    assert sorted(splits) == ["split=test", "split=train", "split=val"]
    shards = [d for d in os.listdir(os.path.join(manifest_path,
                                                 "split=train"))
              if d.startswith("shard=")]
    assert shards  # one directory per populated shard stream


def test_rebuild_is_idempotent(spark, manifest_path, tmp_path):
    before = _rows(read_training_dataset(spark, manifest_path))
    write_training_dataset(spark, SF, manifest_path)  # full rewrite
    assert _rows(read_training_dataset(spark, manifest_path)) == before
    # and stale partitions never survive a rebuild: a doctored extra
    # partition dir (an old-layout leftover) is wiped by the STATIC
    # overwrite
    stale = os.path.join(manifest_path, "split=stale", "shard=999")
    os.makedirs(stale, exist_ok=True)
    write_training_dataset(spark, SF, manifest_path)
    assert not os.path.exists(os.path.join(manifest_path, "split=stale"))
    assert _rows(read_training_dataset(spark, manifest_path)) == before


def test_loader_read_partition_prunes(spark, manifest_path):
    """A data loader asking for ONE (split, shard) stream must touch
    exactly that directory — the partition filters reach the scan."""
    df = (spark.read.parquet(manifest_path)
          .filter((F.col("split") == "train") & (F.col("shard") == 0)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "split" in plan.split("PartitionFilters")[1][:200]
    # correctness of the pruned read
    got = {r["doc_id"] for r in df.collect()}
    want = {r["doc_id"] for r in corpus_training_dataset(spark, SF)
            .filter((F.col("split") == "train")
                    & (F.col("shard") == 0)).collect()}
    assert got == want and got
