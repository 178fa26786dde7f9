"""Streaming token-frequency monitor: continuously-maintained
count-min-sketch counters — the streaming twin of
``operators.sketches.corpus_token_cms_topk``, completing the sketch
family's batch/streaming symmetry alongside the HLL monitor
(streaming/cardinality.py).

Unlike HLL registers (MAX-mergeable, hence idempotent for free), CMS
counters merge by SUM — a re-run micro-batch would double-count. The
exactly-once recipe is therefore the BATCH-ID PARTITIONED partial:
each micro-batch reduces its own tokens to a ≤ d·w-row partial counter
table (the CMS partial-aggregation property — bounded regardless of
batch size) and writes it to its own ``ingest_batch_id`` partition with
dynamic overwrite (``AppendTable.append_idempotent``), so a crash-rerun
REPLACES its own partial instead of adding to it. Read-time counters
sum the partials; ``compact()`` folds history into one reserved
partition so state stays O(d·w), not O(batches·d·w).

At 100 TB: per batch the wire carries ≤ d·w = 4096 rows regardless of
token volume (map-side partial aggregation), the state table is a few
thousand rows forever after compaction, and estimates never
underestimate (CMS structural invariant) — the standard streaming
heavy-hitter monitor (top queries, hot keys, trending tokens) at O(1)
state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from ..sources.loader import local_frame
from pyspark.sql import functions as F

from ..operators.sketches import (cms_cell_counts, cms_probe_cells,
                                  cms_token_hashes)
from ..sources.tables import AppendTable

# reserved partition for compacted history: foreachBatch ids are ≥ 0 and
# strictly increasing, so -1 never collides with a live batch re-run
COMPACT_BATCH_ID = -1


@dataclass
class StreamingCmsFrequency:
    """document stream → per-batch partial CMS counters, exactly-once.

    ``counters()`` serves the merged d×w table; ``estimate(tokens)``
    probes it for specific tokens (min over the d row-cells)."""

    state_table: AppendTable

    def process_batch(self, docs_df: DataFrame, batch_id: int) -> None:
        partial = cms_cell_counts(cms_token_hashes(docs_df))
        self.state_table.append_idempotent(partial, batch_id)

    def counters(self) -> DataFrame:
        """(j, cell, c): partials summed across batch partitions."""
        return (self.state_table.read()
                .groupBy("j", "cell")
                .agg(F.sum("c").cast("long").alias("c")))

    def estimate(self, tokens: list[str]) -> DataFrame:
        """(token, cms_estimate) for the given tokens from current
        state; absent cells count zero (an unseen token can still
        collide into nonzero cells — the usual CMS overestimate)."""
        spark = self.state_table.spark
        tw = (local_frame(spark, [(t,) for t in tokens], "w string")
              .select("w", F.expr("CAST(conv(substring(md5(w), 1, 15),"
                                  " 16, 10) AS BIGINT)").alias("h")))
        probes = (tw.select("w", F.explode(cms_probe_cells()).alias("jc"))
                  .select("w", "jc.j", "jc.cell"))
        return (probes.join(F.broadcast(self.counters()), ["j", "cell"],
                            "left")
                .groupBy("w")
                .agg(F.min(F.coalesce("c", F.lit(0))).cast("long")
                     .alias("cms_estimate"))
                .select(F.col("w").alias("token"), "cms_estimate"))

    def compact(self) -> None:
        """Fold all batch partials into the reserved history partition.

        Run ONLY while the stream is stopped on a clean checkpoint: a
        pending batch re-run would re-write its (now folded) partition
        and double-count. The rewrite goes through the rename-aside
        swap, so readers never see a torn table."""
        merged = (self.counters()
                  .withColumn("ingest_batch_id", F.lit(COMPACT_BATCH_ID)))
        # a partition-layout-compatible view of the same path: the swap
        # writes ingest_batch_id as the (single) partition directory,
        # exactly how append_idempotent lays out live batches
        layout = AppendTable(self.state_table.spark, self.state_table.path,
                             partition_cols=["ingest_batch_id"])
        layout._swap_rewrite(merged, ".cms")

    def start(self, stream: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (stream.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
