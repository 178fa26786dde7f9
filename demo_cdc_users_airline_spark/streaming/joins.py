"""Watermarked stream-stream join: click→purchase attribution edges,
continuously — the one streaming join shape the repo's CDC loop
(stream⋈static latest-state) does not cover, and the canonical use of
Spark's event-time-bounded stream-stream inner join.

Semantics: every (click, purchase) pair of the same user where the
purchase lands inside the attribution window after the click. This is
the RAW attribution edge table — deliberately all-pairs-in-window,
append-only: last-click (or any weighting) is a downstream batch rank
over the edges, because a streaming "latest per purchase" would have
to retract earlier emissions (update-mode complexity with no
warehouse benefit when the edge table is cheap).

Why both watermarks AND the time-range join condition matter at scale:
the range condition (p.ts between c.ts and c.ts + W) is what lets
Spark BOUND the join state — each side's buffered rows are evicted
once the other side's watermark passes their last possible match; with
watermarks alone state would grow forever, with the range alone late
data would be wrong. State is then O(traffic inside one window +
watermark delay) per side, regardless of stream age — the documented
Structured Streaming inner-join eviction contract.

Delivery: inner-join matches emit as they arrive (no flush batch
needed); the sink is the repo's batch-id idempotent append, so a
crash-rerun replaces its own partition — effectively exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import AppendTable


@dataclass
class StreamingAttributionJoin:
    """clicks stream ⋈ purchases stream → append-only edge table of
    in-window attribution pairs.

    ``join_type="left_outer"`` additionally emits every UNCONVERTED
    click exactly once (NULL purchase columns) — but only after the
    purchase-side watermark proves no match can still arrive, i.e. an
    outer row for a click at t appears once the watermark passes
    t + window (+ delay). Inner matches still emit eagerly; only the
    null rows wait. That deferred emission is the Structured Streaming
    outer-join contract: correctness requires waiting out the window,
    so a conversion-rate dashboard reads complete data exactly
    watermark-delay behind real time — the honest latency/completeness
    trade, made explicit."""

    out_table: AppendTable
    attribution_window: str = "1 hour"
    watermark_delay: str = "10 minutes"
    join_type: str = "inner"

    def plan(self, clicks: DataFrame, purchases: DataFrame) -> DataFrame:
        """Shared by the stream and its batch-parity twin: the same
        join condition on watermarked streams or plain frames."""
        c = clicks.withColumnRenamed("ts", "click_ts") \
                  .withColumnRenamed("event_id", "click_id")
        p = purchases.withColumnRenamed("ts", "purchase_ts") \
                     .withColumnRenamed("event_id", "purchase_id")
        if c.isStreaming:
            c = c.withWatermark("click_ts", self.watermark_delay)
        if p.isStreaming:
            p = p.withWatermark("purchase_ts", self.watermark_delay)
        cond = F.expr(
            f"c.user_id = p.user_id AND"
            f" p.purchase_ts >= c.click_ts AND"
            f" p.purchase_ts <= c.click_ts + INTERVAL {self.attribution_window}")
        return (c.alias("c").join(p.alias("p"), cond, self.join_type)
                .select(F.col("c.user_id").alias("user_id"),
                        "click_id", "click_ts",
                        "purchase_id", "purchase_ts",
                        (F.unix_micros("purchase_ts")
                         - F.unix_micros("click_ts"))
                        .alias("lag_micros")))

    def _sink(self, joined_df: DataFrame, batch_id: int) -> None:
        self.out_table.append_idempotent(joined_df, batch_id)

    def start(self, clicks: DataFrame, purchases: DataFrame,
              checkpoint_dir: str, trigger_once: bool = False):
        writer = (self.plan(clicks, purchases).writeStream
                  .outputMode("append")
                  .foreachBatch(lambda df, bid: self._sink(df, bid))
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
