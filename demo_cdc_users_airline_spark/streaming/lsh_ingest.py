"""Streaming MinHash-LSH ingest against the PERSISTED index: each
micro-batch probes the saved band table, admits non-duplicates, and
APPENDS the admitted batch to the index — the production form the
incremental-dedup docstring describes ("a daily job maintains it
incrementally"), run at stream cadence.

This closes the loop between the two dedup serving shapes the repo
already has:

- ``operators.dedup`` owns the ARTIFACT (build_lsh_index /
  probe_lsh_index / append_to_lsh_index — MinHash signatures, banded,
  prefix-partitioned);
- ``streaming.neardup`` owns the STREAM discipline (first-writer-wins
  across batches, idempotent batch re-runs, within-batch policy).

Here the index IS the state: a batch's verdicts come from
``probe_lsh_index`` (corpus text never probes — signature-level
verification against the saved 144-byte rows), within-batch duplicates
resolve greedily on the same band structure, and both sinks — the
admitted-docs table and the index itself — are idempotent by batch id
(dynamic partition overwrite), so a crash-and-rerun after either write
replaces its own rows instead of duplicating them. The probe excludes
the batch's OWN index partition for the same reason the simhash
pipeline excludes its own admitted partition: a failed attempt must
not shadow its re-run.

At 100 TB: per batch, corpus-side IO is the increment's ≤256 band-key
prefix slices (partition-pruned), shingling work is batch-sized, and
the index grows by exactly the admitted rows — O(increment) per batch,
proven structurally in tests/test_incremental_lsh.py and exercised
multi-batch in tests/test_streaming_lsh_ingest.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _INC_MIN_MATCH,
    _band_frame,
    _hashed_shingles_of,
    _pfx_width_for,
    _sig_match_count,
    _signatures_from,
    append_to_lsh_index,
    compact_lsh_index,
    lsh_pfx_width,
    probe_lsh_index,
    rebuild_lsh_index,
)
from ..sources.tables import AppendTable


@dataclass
class StreamingLshIngest:
    """documents stream → (a) append-only table of admitted documents
    with their MinHash signatures, (b) the persisted LSH index kept
    current batch-by-batch.

    Width auto-rebuild (the LSH twin of StreamingIvfIngest's drift
    hook): with ``rebuild_check_every=N`` > 0, every Nth batch the
    maintainer compares the width the `_pfx_width_for` policy wants
    for the CURRENT corpus size (a footer-only count of the sig
    table) against the width the artifact was built with; when
    appends have grown the corpus past a threshold, it fires
    ``rebuild_lsh_index(keep_provenance=True)`` — bands re-lay-out
    from the artifact's own signatures at the new width, batch
    partition tags carried through — inside the quiesced foreachBatch
    window. Probe verdicts are width-invariant (proven in
    tests/test_incremental_lsh.py) and provenance survives the swap,
    so a batch retried across it still self-excludes and replaces its
    own rows."""

    index_path: str
    out_table: AppendTable
    min_match: int = _INC_MIN_MATCH  # signature components (of 16)
    rebuild_check_every: int = 0     # 0 = width hook disabled
    compact_check_every: int = 0     # 0 = compaction hook disabled

    def __post_init__(self) -> None:
        self._batches_since_check = 0
        self._batches_since_compact = 0

    def _maybe_rebuild_width(self, spark) -> bool:
        # parquet row count = footer metadata only, never data pages
        n = spark.read.parquet(self.index_path + "/sig").count()
        want = _pfx_width_for(n)
        if want <= lsh_pfx_width(self.index_path):
            return False
        # keep_provenance: the in-loop rebuild must NOT fold the
        # in-flight batch's partitions into base — a foreachBatch
        # retry self-excludes by ingest_batch, and rows folded into
        # base would collide with their own re-probe (every admitted
        # doc rejected as a duplicate of itself, the batch's admitted
        # output emptied). Same contract as the IVF drift hook's
        # rebuild_ivf_index(keep_provenance=True).
        rebuild_lsh_index(spark, self.index_path, pfx_width=want,
                          keep_provenance=True)
        return True

    def _maybe_compact(self, spark, batch_id: int) -> bool:
        """The compaction policy census acted on in-loop (the decision
        dedup_lsh_compaction_policy gates, >= {_COMPACT_AFTER_BATCHES}
        file sets per slice): fold when a FOLDABLE batch exists — one
        that is neither the base (-1, already folded) nor the batch
        being committed (kept replaceable for foreachBatch retries,
        compact_lsh_index's exclude_batch contract). Without that
        residue check, every batch would trigger a zero-benefit full
        rewrite (census {-1, in-flight} always counts 2)."""
        foldable = (spark.read.parquet(self.index_path + "/bands")
                    .select("ingest_batch").distinct()
                    .filter(~F.col("ingest_batch").isin(
                        -1, int(batch_id))).limit(1).count())
        if not foldable:
            return False
        compact_lsh_index(spark, self.index_path,
                          exclude_batch=int(batch_id))
        return True

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text").localCheckpoint(eager=True)

        # vs the INDEX (base + all prior admitted batches, minus this
        # batch's own failed-attempt partition if re-running)
        verdict = probe_lsh_index(spark, docs, self.index_path,
                                  exclude_batch=int(batch_id))
        vs_index_rejected = (verdict.filter(F.col("admitted") == 0)
                             .select("doc_id"))

        # within-batch greedy (the simhash pipeline's default policy):
        # a doc is rejected iff any LOWER-doc_id batch doc matches ≥
        # min_match signature components — order-free, one joins-pass
        sig = (_signatures_from(_hashed_shingles_of(docs))
               .localCheckpoint(eager=True))
        bands = _band_frame(sig)
        cand = (bands.select(F.col("doc_id").alias("hi"),
                             "band_id", "band_key")
                .join(bands.select(F.col("doc_id").alias("lo"),
                                   "band_id", "band_key"),
                      ["band_id", "band_key"])
                .filter(F.col("lo") < F.col("hi"))
                .select("lo", "hi").distinct())
        in_batch_rejected = (_sig_match_count(cand, sig, sig, "lo", "hi")
                             .filter(F.col("n_match") >= self.min_match)
                             .select(F.col("hi").alias("doc_id")))

        rejected = vs_index_rejected.unionByName(in_batch_rejected)
        admitted = (sig.join(rejected.distinct(), "doc_id", "left_anti")
                    .localCheckpoint(eager=True))

        # both sinks idempotent by batch id: the admitted table via the
        # dynamic-overwrite AppendTable recipe, the index via
        # append_to_lsh_index's ingest_batch partition
        self.out_table.append_idempotent(admitted, batch_id)
        admitted_docs = docs.join(admitted.select("doc_id"), "doc_id",
                                  "left_semi")
        append_to_lsh_index(spark, self.index_path, admitted_docs,
                            batch_id=int(batch_id))

        if self.rebuild_check_every > 0:
            self._batches_since_check += 1
            if self._batches_since_check >= self.rebuild_check_every:
                self._batches_since_check = 0
                self._maybe_rebuild_width(spark)
        if self.compact_check_every > 0:
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_check_every:
                self._batches_since_compact = 0
                self._maybe_compact(spark, int(batch_id))

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
