"""Streaming distinct-count: continuously-maintained HyperLogLog
registers — the streaming twin of ``operators.sketches
.events_hll_distinct``, completing the sketch family's batch/streaming
symmetry (as the dedup and quality families already have).

State = the register TABLE itself (table-as-state, like the streaming
near-dup's admitted set): a bounded (key × m)-row parquet table of
(key, bucket, reg). Each micro-batch computes its own registers with
the SHARED ``hll_registers`` transform and merges them into the state
by per-(key, bucket) MAX — an idempotent, commutative merge, so a
re-run batch (crash between sink write and checkpoint commit), a
duplicated delivery, or any batch re-ordering produces EXACTLY the
same state as a single clean pass; no batch-id bookkeeping is needed
(max absorbs everything). The table rewrite goes through the
rename-aside swap (crash-safe, readers never see a torn table).

At 100 TB: the per-batch register computation collapses map-side to
≤ m rows per key before the wire (the HLL property), and the state
table stays keys×m rows forever — the streaming cardinality monitor
costs O(1) state per key while an exact streaming countDistinct's
state grows with every distinct element seen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import hll_estimate, hll_registers
from ..sources.tables import AppendTable


@dataclass
class StreamingHllDistinct:
    """element stream → continuously-merged register table, with
    ``estimate()`` serving the corrected cardinality per key."""

    state_table: AppendTable
    key: str = "event_type"
    elem: str = "user_id"

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        new = hll_registers(batch_df, self.key, self.elem)
        if self.state_table.exists():
            prior = self.state_table.read()
            merged = (prior.unionByName(new)
                      .groupBy(self.key, "bucket")
                      .agg(F.max("reg").alias("reg")))
        else:
            merged = new
        # rename-aside swap: a crash mid-rewrite leaves the previous
        # state readable; the max-merge re-absorbs the batch on re-run
        if self.state_table.exists():
            self.state_table._swap_rewrite(merged, ".hll")
        else:
            self.state_table.append(merged)

    def estimate(self) -> DataFrame:
        """(key, hll_estimate, n_zero_registers) from the current state."""
        return hll_estimate(self.state_table.read(), self.key)

    def start(self, stream: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (stream.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
