"""Table engines, re-expressed Spark-first.

The reference stores data in two ClickHouse engine families:

- ``MergeTree`` — append-only columnar log, partitioned + sorted
  (kits/users/pg/datasources/users_raw.datasource:16-18). Here:
  append-mode parquet with ``partitionBy`` on a derived time column and
  ``sortWithinPartitions`` so parquet row-group min/max stats act like the
  sorting-key index.
- ``ReplacingMergeTree`` — versioned upsert table keeping the max-version
  row per key, deduped eventually at merge time or at read via ``FINAL``
  (users_latest.datasource:16-19). Here: ``VersionedTable`` — all versions
  are appended; ``latest()`` is the FINAL-equivalent dedup-on-read view;
  ``compact()`` plays the role of a background merge, rewriting the table
  to one row per key so the latest view stays cheap (and broadcastable)
  no matter how much history has been ingested.

Scale notes (100 TB): dedup-on-read is one hash-partition shuffle on the
key; after ``compact()`` the state table is ~|keys| rows, so downstream
joins of latest-state dims against big fact/event tables broadcast. The
append path never rewrites history — only ``compact()`` does, and it can
run per time-partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def folded_batch_tag(col: str, exclude_batch: int | None) -> F.Column:
    """The ingest-batch value a compaction rewrite assigns: fold every
    batch partition into the base (-1), EXCEPT the one in-flight batch
    the auto-compaction hooks must leave replaceable (folding a batch
    that foreachBatch may still retry would strand its rows in base —
    the retry's dynamic partition overwrite could no longer replace
    them). Shared by the LSH/IVF/BM25 compactors."""
    if exclude_batch is None:
        return F.lit(-1)
    return (F.when(F.col(col) == int(exclude_batch), F.col(col))
            .otherwise(F.lit(-1)))


class AppendTable:
    """MergeTree-style append-only parquet table."""

    def __init__(self, spark: SparkSession, path: str,
                 partition_cols: list[str] | None = None,
                 sort_cols: list[str] | None = None):
        self.spark = spark
        self.path = path
        self.partition_cols = partition_cols or []
        self.sort_cols = sort_cols or []

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not n.startswith(("_", ".")) for n in os.listdir(self.path)
        )

    def append(self, df: DataFrame) -> None:
        if self.sort_cols:
            df = df.sortWithinPartitions(*self.sort_cols)
        w = df.write.mode("append")
        if self.partition_cols:
            w = w.partitionBy(*self.partition_cols)
        w.parquet(self.path)

    def append_idempotent(self, df: DataFrame, batch_id: int) -> None:
        """Exactly-once append under foreachBatch retries.

        foreachBatch sinks are at-least-once: a crash after the sink
        write but before the checkpoint commit re-runs the batch on
        restart. Here each micro-batch writes its own
        ``ingest_batch_id=<id>`` partition with DYNAMIC partition
        overwrite, so the re-run REPLACES its own rows instead of
        appending duplicates — idempotence by batch id, which upgrades
        the pipeline to effectively-exactly-once. ``read()`` hides the
        bookkeeping column. (The name has no leading underscore because
        Spark's file listing skips ``_``/``.``-prefixed paths.)

        A table written through this path should not also take plain
        ``append()`` writes (partition layouts would differ)."""
        if self.sort_cols:
            df = df.sortWithinPartitions(*self.sort_cols)
        (df.withColumn("ingest_batch_id", F.lit(int(batch_id)))
           .write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy(*(self.partition_cols + ["ingest_batch_id"]))
           .parquet(self.path))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop("ingest_batch_id")

    # -- management ops (SURVEY §2 S8: truncate/delete/create wrappers,
    #    tb_functions.py:137-168) ------------------------------------------

    def truncate(self) -> None:
        """Drop all rows, keep the table (tb_functions truncate)."""
        if self.exists():
            import shutil

            shutil.rmtree(self.path)
            os.makedirs(self.path, exist_ok=True)

    def delete_where(self, condition) -> None:
        """Batch DELETE: rewrite the table without matching rows.

        Parquet is immutable, so DELETE is a filtered rewrite (exactly what
        a managed warehouse does under the hood); at scale run it
        per-partition so only affected partitions rewrite.

        SQL DELETE-WHERE removes only rows where the predicate is TRUE;
        rows where it evaluates NULL are kept (coalesce guard below).
        """
        if not self.exists():
            return
        from pyspark.sql import functions as _F

        kept = self.read().filter(~_F.coalesce(condition, _F.lit(False)))
        self._swap_rewrite(kept, ".delete")

    def _swap_rewrite(self, df: DataFrame, suffix: str) -> None:
        """Atomically replace the table's files with ``df``'s rows.

        Write-to-tmp reads the live files while writing elsewhere (no
        read-your-own-overwrite hazard), then swap via rename-aside:
        path -> path.old, tmp -> path, delete path.old. A crash mid-swap
        leaves either the old or the new directory at a recoverable
        location — the table path is never missing with data stranded
        only in a tmp dir.
        """
        base = self.path.rstrip("/")
        tmp, old = base + suffix + ".tmp", base + suffix + ".old"
        w = df.write.mode("overwrite")
        if self.partition_cols:
            w = w.partitionBy(*self.partition_cols)
        w.parquet(tmp)
        import shutil

        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)


class VersionedTable(AppendTable):
    """ReplacingMergeTree semantics: last-writer-wins per key.

    key/version/tiebreak follow the reference: key = sorting key (``id``),
    version = ``ENGINE_VER`` (``updated_at``), tiebreak = ingestion time
    ``__timestamp`` (users_raw.datasource:18) then arbitrary-but-stable
    extra columns so equal-version duplicates collapse deterministically.
    """

    def __init__(self, spark: SparkSession, path: str,
                 key: list[str], version: str,
                 tiebreak: list[str] | None = None,
                 partition_cols: list[str] | None = None):
        super().__init__(spark, path, partition_cols, sort_cols=list(key))
        self.key = key
        self.version = version
        self.tiebreak = tiebreak or []

    # -- read paths -------------------------------------------------------

    def _order_cols(self):
        return [F.col(self.version).desc_nulls_last()] + [
            F.col(t).desc_nulls_last() for t in self.tiebreak
        ]

    def dedup(self, df: DataFrame) -> DataFrame:
        """FINAL-equivalent: one row per key at max (version, tiebreak)."""
        w = Window.partitionBy(*self.key).orderBy(*self._order_cols())
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .drop("__rn"))

    def latest(self) -> DataFrame:
        """``SELECT * FROM t FINAL`` (users_api_rmt.pipe:6)."""
        return self.dedup(self.read())

    # -- write paths ------------------------------------------------------

    def merge(self, batch: DataFrame) -> None:
        """Idempotent upsert of a micro-batch (at-least-once safe).

        Duplicates and out-of-order arrivals are absorbed because the read
        path always takes max (version, tiebreak); appending the same event
        twice changes nothing after dedup. This is the parquet analogue of
        RMT's "insert now, collapse at merge/FINAL".
        """
        self.append(batch)

    def compact(self) -> None:
        """Background-merge analogue: rewrite to one row per key.

        Keeps latest-state reads O(|keys|) instead of O(|history|), and the
        result small enough to broadcast in joins. Run per time-partition
        on a cluster to bound task memory.
        """
        if not self.exists():
            return
        # no cache: the tmp write streams straight from the live files
        # (they are only removed after the write completes), so caching
        # the full snapshot is pure executor-memory pressure at scale
        self._swap_rewrite(self.latest(), ".compact")


def publish_bucketed_state(vt: VersionedTable, name: str,
                           n_buckets: int, path: str | None = None) -> None:
    """Publish the table's latest-state snapshot as a BUCKETED catalog
    table, bucketed+sorted on the RMT key.

    The repeated-join optimization at 100 TB: downstream pipes that join
    latest state against history/facts on the key do so with NO Exchange
    on either side when both are bucketed the same way (proved by
    tests/test_bucketing.py). Snapshots are immutable publishes — the
    streaming upsert keeps appending to the source VersionedTable, and a
    scheduler republishes on the compaction cadence (the same lifecycle
    as `compact()`, one extra bucketed write).
    """
    w = (vt.latest().write.mode("overwrite")
         .bucketBy(n_buckets, *vt.key).sortBy(*vt.key))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


class MergeOnWriteTable(VersionedTable):
    """MERGE-based upsert backend: state resolves at WRITE time.

    The alternative RMT expression (SURVEY §1.1 S3 option b): instead of
    appending history and deduplicating at read (``VersionedTable``),
    every ``merge(batch)`` resolves last-writer-wins immediately —
    union current state with the batch, keep max (version, tiebreak) per
    key, atomically swap the files. This is exactly what Delta Lake's

        MERGE INTO state USING batch ON state.id = batch.id
        WHEN MATCHED AND batch.version >= state.version THEN UPDATE ...
        WHEN NOT MATCHED THEN INSERT ...

    performs under the hood (rewrite of matched files + append); the
    container has no delta-spark, so the rewrite is expressed directly.
    Same public API and LWW invariants as VersionedTable — the
    parametrized suite in tests/test_versioned_table.py runs both.

    Trade-off (same as ClickHouse RMT-vs-OLTP): reads are O(|keys|) with
    no dedup work (``latest() == read()``), writes pay a full-state
    rewrite per batch. At 100 TB, partition the state (e.g. by key range
    or time) so a merge only rewrites partitions the batch touches —
    which is also precisely Delta MERGE's file-pruning behavior.
    """

    def merge(self, batch: DataFrame) -> None:
        if not self.exists():
            self.append(self.dedup(batch))
            return
        merged = self.dedup(self.read().unionByName(batch))
        self._swap_rewrite(merged, ".merge")

    def latest(self) -> DataFrame:
        """State is already one row per key — no read-time dedup."""
        return self.read()

    def compact(self) -> None:
        """No-op: every merge leaves the table fully compacted."""
