"""One CDC ingest stream fanned out to EVERY maintainer (the six
index artifact families, the tokenizer drift monitor, and the
training-manifest maintainer) — the production topology the
per-family maintainers compose into.

Reference parity: the demo wires ONE Kafka CDC topic into several
materialized views that stay queryable within the same convergence
budget (modules/cc_functions.py:93-156 — one topic, many consumers;
modules/utils.py:48-49 — the 15 s wait_for() bound). Here the one
stream is a (doc_id, text, embedding) feed — the shape a training-data
CDC loop emits, one row per document with its vector — and the "views"
are the maintained artifacts:

  docs leg    → LSH admission (dedup-at-ingest), BM25 postings,
                near-dup cluster labels, tokenizer census/retrain,
                training-manifest tail packs
  vectors leg → IVF cells, PQ codes, SQ8 codes (optional tier)

Why ONE foreachBatch instead of independent streams:
foreachBatch serializes batches per query, so fanning out inside a
single handler gives every artifact's maintenance hook (compaction,
drift/width rebuild) the quiesced single-writer window the artifacts'
GC contract requires (see stale_generation_dirs — a staged ``v<N>``
generation must never coexist with another writer's reap pass on the
SAME artifact). The artifacts are DISJOINT directory trees, so
the fan-out runs the legs CONCURRENTLY (one thread per artifact
— Spark's scheduler interleaves their jobs): per-artifact maintenance
stays strictly single-writer (each artifact has exactly one thread,
and batches stay serialized by the stream), while the batch's wall
time is max(leg), not sum(legs) — the same overlap a production
cluster gets, and what keeps the whole multi-artifact loop inside the
reference's 15 s ingest→serveable budget. Cross-family interleaving
(an IVF codebook swap mid-batch while PQ appends next door under its
own independently-saved codebooks) is exactly the window
tests/test_streaming_pipeline_soak.py soaks.

Idempotence composes: every leg keys its writes by the SAME batch_id
(its own ingest_batch partitions, dynamic overwrite / purge-first),
so a foreachBatch retry of the whole fan-out replaces exactly its own
rows in all the artifacts — soaked end-to-end in the test above.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25_ingest import StreamingBm25Ingest
from .cluster_ingest import StreamingClusterIngest
from .ivf_ingest import StreamingIvfIngest
from .lsh_ingest import StreamingLshIngest
from .manifest_ingest import StreamingManifestIngest
from .pq_ingest import StreamingPqIngest
from .sq8_ingest import StreamingSq8Ingest
from .tokenizer_ingest import StreamingTokenizerIngest


@dataclass
class StreamingIndexPipeline:
    """Fan one (doc_id, text, embedding) CDC batch out to the index
    maintainers, inside ONE foreachBatch window. The SQ8 leg is
    optional (None skips it) — deployments choose their compression
    tier. The tokenizer drift monitor (census + retrain gate against
    the persisted tokenizer artifact) and the training-manifest
    maintainer (frozen-state re-curation of the streams the batch
    touches) are further optional docs-side legs; the soak runs every
    leg."""

    lsh: StreamingLshIngest
    bm25: StreamingBm25Ingest
    clusters: StreamingClusterIngest
    ivf: StreamingIvfIngest
    pq: StreamingPqIngest
    sq8: StreamingSq8Ingest | None = None
    tokenizer: StreamingTokenizerIngest | None = None
    manifest: StreamingManifestIngest | None = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # one materialization of the source batch; each leg projects
        # from it (the legs re-checkpoint their own projections, so
        # the file source is read once, not once per maintainer)
        batch = batch_df.localCheckpoint(eager=True)
        if batch.isEmpty():
            return  # empty micro-batch: every artifact untouched
        docs = batch.select("doc_id", "text")
        vecs = batch.select(F.col("doc_id").cast("long").alias("id"),
                            F.col("embedding").cast("array<double>")
                            .alias("embedding"))
        legs = [(self.lsh.process_batch, docs),
                (self.bm25.process_batch, docs),
                (self.clusters.process_batch, docs),
                (self.ivf.process_batch, vecs),
                (self.pq.process_batch, vecs)]
        if self.sq8 is not None:
            legs.append((self.sq8.process_batch, vecs))
        if self.tokenizer is not None:
            legs.append((self.tokenizer.process_batch, docs))
        if self.manifest is not None:
            legs.append((self.manifest.process_batch, batch.select(
                "doc_id", "text")))
        # one thread PER ARTIFACT (never more): writes inside one
        # artifact stay serialized, independent artifacts overlap.
        # Any leg failure fails the whole batch — foreachBatch then
        # retries every leg, each idempotent by its own batch_id
        # partitions (purge-first / dynamic overwrite).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(legs)) as pool:
            futures = [pool.submit(fn, df, batch_id) for fn, df in legs]
            for f in futures:
                f.result()

    def start(self, rows: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (rows.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
