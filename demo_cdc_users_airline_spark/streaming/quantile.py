"""Streaming quantile monitor: continuously-maintained fixed-range
histogram bins — the streaming twin of ``operators.sketches
.events_value_quantile_sketch``, completing the sketch family's
batch/streaming symmetry (HLL: streaming/cardinality.py, CMS:
streaming/frequency.py).

One deliberate difference from the batch operator: the batch sketch
anchors its bins on the data's own [min, max] (a two-pass luxury —
the range scalar is known before binning). A stream cannot see future
data, so the range is a FIXED OPERATING PARAMETER (lo, hi) declared up
front — exactly how production latency/price histograms work (known
value domain, e.g. 0–10s latency buckets); out-of-range values clamp
into the edge bins, preserving counts and keeping every quantile
estimate within the declared domain.

Bin counts SUM-merge like CMS counters, so exactly-once uses the same
batch-id-partitioned partial recipe: each micro-batch reduces to
≤ keys × bins rows map-side, dynamic-overwrites its own partition
(re-runs replace, never double-count), and ``compact()`` folds history
into the reserved partition. State is O(keys × bins) forever; the
quantile read runs a window over the tiny histogram — never over the
stream's rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.tables import AppendTable
from .frequency import COMPACT_BATCH_ID

QS_BINS = 1024

# rank targets mirror operators.sketches._QS_RANKS (the repo-wide
# order-statistic convention: rank = ceil(p·(n+1)) via integer DIV)
_RANKS = (("p50", "(n + 1) DIV 2"),
          ("p90", "(9 * n + 9) DIV 10"),
          ("p99", "(99 * n + 99) DIV 100"))


@dataclass
class StreamingValueHistogram:
    """value stream → per-(key, bin) counts, exactly-once; quantile
    estimates served from the merged histogram at any time."""

    state_table: AppendTable
    lo: float
    hi: float
    key: str = "event_type"
    val: str = "value"

    def __post_init__(self) -> None:
        # width <= 0 would make floor((v - lo) / width) NULL or inverted,
        # silently corrupting every bin — fail at construction instead.
        if not self.hi > self.lo:
            raise ValueError(
                f"histogram range requires hi > lo, got [{self.lo}, {self.hi}]")

    def _bins(self, df: DataFrame) -> DataFrame:
        """Map rows to fixed-range bins (clamped at the edges) and
        reduce to per-(key, bin) partial counts — ≤ keys × bins rows
        per micro-batch regardless of batch size."""
        width = (self.hi - self.lo) / QS_BINS
        bin_col = F.least(
            F.greatest(
                F.floor((F.col(self.val) - F.lit(self.lo)) / F.lit(width))
                .cast("long"),
                F.lit(0)),
            F.lit(QS_BINS - 1))
        return (df.filter(F.col(self.val).isNotNull())
                .select(F.col(self.key).alias("key"), bin_col.alias("bin"))
                .groupBy("key", "bin")
                .agg(F.count(F.lit(1)).alias("c")))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.state_table.append_idempotent(self._bins(batch_df), batch_id)

    def histogram(self) -> DataFrame:
        """(key, bin, c): partials summed across batch partitions."""
        return (self.state_table.read()
                .groupBy("key", "bin")
                .agg(F.sum("c").cast("long").alias("c")))

    def quantiles(self) -> DataFrame:
        """(key, n, p50_est, p90_est, p99_est): bin-midpoint estimates
        at the shared rank targets — each within one bin width of the
        exact order statistic whenever the value lies in [lo, hi]."""
        hist = self.histogram()
        w = Window.partitionBy("key").orderBy("bin")
        cum = (hist.withColumn("cum", F.sum("c").over(w))
               .withColumn("n", F.sum("c").over(Window.partitionBy("key"))))
        width = (self.hi - self.lo) / QS_BINS
        est = [(F.lit(self.lo)
                + (F.min(F.when(F.col("cum") >= F.expr(rank), F.col("bin")))
                   .cast("double") + F.lit(0.5)) * F.lit(width))
               .alias(f"{name}_est")
               for name, rank in _RANKS]
        return (cum.groupBy("key", "n").agg(*est)
                .select("key", F.col("n").cast("long").alias("n"), *[
                    F.col(f"{name}_est") for name, _ in _RANKS]))

    def compact(self) -> None:
        """Fold all batch partials into the reserved history partition.
        Run only while the stream is stopped on a clean checkpoint
        (see StreamingCmsFrequency.compact)."""
        merged = (self.histogram()
                  .withColumn("ingest_batch_id", F.lit(COMPACT_BATCH_ID)))
        layout = AppendTable(self.state_table.spark, self.state_table.path,
                             partition_cols=["ingest_batch_id"])
        layout._swap_rewrite(merged, ".qhist")

    def start(self, stream: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (stream.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
