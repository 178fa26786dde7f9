"""Streaming quality gate: score documents as they arrive, admit or
reject continuously.

The batch quality operators (operators/text.py) answer "which documents
in this corpus pass the filters"; a training-data INGEST pipeline wants
the decision made ON THE STREAM, so rejected boilerplate never lands in
the staged corpus at all. This gate applies the SAME column transforms
— ``with_quality_score`` and ``with_repetition_flags`` are shared
functions, so streaming and batch can never drift — and routes each
micro-batch into an admitted and a rejected table with the idempotent
batch-id sink.

Scale path: both transforms are pure per-row maps (zero shuffle, no
state store — the decision depends only on the document itself), so a
micro-batch costs one codegen pass; throughput is bounded by the sink
write, not the scoring. Restart safety: no state to lose, and
``append_idempotent`` makes a re-run of a half-committed batch replace
its own rows (the same effectively-exactly-once contract as the
streaming dedups).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import with_quality_score, with_repetition_flags
from ..sources.tables import AppendTable

@dataclass
class StreamingQualityGate:
    """documents stream → admitted + rejected tables, scored per batch."""

    admitted: AppendTable
    rejected: AppendTable

    @staticmethod
    def score(docs: DataFrame) -> DataFrame:
        """The shared batch transforms + the admit verdict (map-only).

        Admit iff quality_score ≥ 2/3 (integer compare — the score is
        k/3) and the repetition filters pass; the same rule the batch
        corpus_curation_pipeline applies (its _QUALITY_MIN = 0.6 sits
        between 1/3 and 2/3)."""
        scored = with_repetition_flags(
            with_quality_score(docs).drop("n_chars", "n_tokens"))
        keep = (F.col("quality_score") * 3 >= 2) & ~F.col("is_repetitive")
        return scored.withColumn("admit", keep)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        scored = self.score(batch_df).localCheckpoint(eager=True)
        self.admitted.append_idempotent(
            scored.filter(F.col("admit")).drop("admit"), batch_id)
        self.rejected.append_idempotent(
            scored.filter(~F.col("admit")).drop("admit"), batch_id)

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
