"""VersionedTable = ReplacingMergeTree semantics (SURVEY §2 S3/D2).

Invariants from the reference: last-writer-wins per key by ENGINE_VER
(updated_at), ties broken by ingestion time (sorting key id,__timestamp
— users_raw.datasource:18); duplicate and out-of-order delivery must
not change the final state; compact() (the background merge) preserves
the latest view.
"""

import random

import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.sources.tables import (
    MergeOnWriteTable,
    VersionedTable,
)

DDL = "id INT, val STRING, updated_at BIGINT, __timestamp TIMESTAMP"


@pytest.fixture(params=[VersionedTable, MergeOnWriteTable],
                ids=["dedup_on_read", "merge_on_write"])
def vt_cls(request):
    """Both RMT backends must satisfy the same LWW invariants."""
    return request.param


def make_rows():
    return [
        (1, "a", 100, "2026-01-01 10:00:00"),
        (1, "b", 200, "2026-01-01 10:00:01"),
        (1, "stale", 150, "2026-01-01 10:00:02"),   # out-of-order version
        (2, "x", 100, "2026-01-01 10:00:00"),
        (2, "tie-old", 300, "2026-01-01 10:00:03"),
        (2, "tie-new", 300, "2026-01-01 10:00:04"),  # equal version: later arrival wins
        (3, "only", 50, "2026-01-01 10:00:00"),
    ]


def df_of(spark, rows):
    return (spark.createDataFrame(rows, "id INT, val STRING, updated_at BIGINT, ts STRING")
            .withColumn("__timestamp", F.col("ts").cast("timestamp")).drop("ts"))


def expected_latest():
    return {1: "b", 2: "tie-new", 3: "only"}


def latest_map(vt):
    return {r["id"]: r["val"] for r in vt.latest().collect()}


def test_latest_last_writer_wins(spark, tmp_path, vt_cls):
    vt = vt_cls(spark, str(tmp_path / "t"), key=["id"],
                version="updated_at", tiebreak=["__timestamp"])
    vt.merge(df_of(spark, make_rows()))
    assert latest_map(vt) == expected_latest()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_out_of_order_and_duplicates_invariant(spark, tmp_path, seed, vt_cls):
    """FIXTURES.md: shuffled-arrival + duplicated-events copies must give
    an identical final state (at-least-once absorption)."""
    rng = random.Random(seed)
    rows = make_rows()
    rng.shuffle(rows)
    dupes = [r for r in rows if rng.random() < 0.4]
    vt = vt_cls(spark, str(tmp_path / "t"), key=["id"],
                version="updated_at", tiebreak=["__timestamp"])
    half = len(rows) // 2
    vt.merge(df_of(spark, rows[:half]))
    vt.merge(df_of(spark, rows[half:] + dupes))
    assert latest_map(vt) == expected_latest()


def test_compact_preserves_latest_and_shrinks(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"), key=["id"],
                        version="updated_at", tiebreak=["__timestamp"])
    vt.merge(df_of(spark, make_rows()))
    before = latest_map(vt)
    assert vt.read().count() == 7
    vt.compact()
    assert vt.read().count() == 3          # one row per key after "merge"
    assert latest_map(vt) == before
    # merging after compaction still works
    vt.merge(df_of(spark, [(1, "c", 300, "2026-01-01 11:00:00")]))
    assert latest_map(vt)[1] == "c"


def test_truncate_and_delete_where(spark, tmp_path, vt_cls):
    from pyspark.sql import functions as F

    vt = vt_cls(spark, str(tmp_path / "t"), key=["id"],
                version="updated_at", tiebreak=["__timestamp"])
    vt.merge(df_of(spark, make_rows()))
    vt.delete_where(F.col("id") == 2)         # batch DELETE analogue
    assert sorted(latest_map(vt)) == [1, 3]
    vt.truncate()
    assert not vt.exists()
    vt.merge(df_of(spark, make_rows()[:1]))   # table usable after truncate
    assert latest_map(vt) == {1: "a"}


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    """DELETE WHERE removes rows where the predicate is TRUE only; rows
    where it evaluates NULL (e.g. NULL = value) must survive."""
    vt = VersionedTable(spark, str(tmp_path / "t"), key=["id"],
                        version="updated_at", tiebreak=["__timestamp"])
    rows = df_of(spark, make_rows()).withColumn(
        "val", F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("val")))
    vt.merge(rows)
    vt.delete_where(F.col("val") == "b")      # NULL = 'b' is NULL, not TRUE
    state = latest_map(vt)
    assert sorted(state) == [1, 2, 3]         # id 3 (NULL val) kept
    assert state[1] == "stale"                # only the TRUE row deleted


def test_dedup_is_pure_view(spark, tmp_path):
    """latest() must not mutate the underlying history (FINAL is read-time)."""
    vt = VersionedTable(spark, str(tmp_path / "t"), key=["id"],
                        version="updated_at", tiebreak=["__timestamp"])
    vt.merge(df_of(spark, make_rows()))
    vt.latest().collect()
    assert vt.read().count() == 7


def test_merge_on_write_keeps_state_compacted(spark, tmp_path):
    """MERGE backend: the stored table is always one row per key (reads
    pay zero dedup); stale and duplicate deliveries still absorb."""
    vt = MergeOnWriteTable(spark, str(tmp_path / "t"), key=["id"],
                           version="updated_at", tiebreak=["__timestamp"])
    rows = make_rows()
    vt.merge(df_of(spark, rows[:4]))
    vt.merge(df_of(spark, rows[4:]))
    assert vt.read().count() == 3              # state, not history
    assert latest_map(vt) == expected_latest()
    # stale replay cannot regress state
    vt.merge(df_of(spark, [(1, "ancient", 10, "2026-01-01 09:00:00")]))
    assert vt.read().count() == 3
    assert latest_map(vt)[1] == "b"
    # compact is a no-op (already compacted) but must stay callable
    vt.compact()
    assert latest_map(vt) == expected_latest()
    # DELETE on the MERGE backend operates on state: the key disappears
    vt.delete_where(F.col("id") == 2)
    assert sorted(latest_map(vt)) == [1, 3]
