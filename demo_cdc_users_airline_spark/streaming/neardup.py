"""Streaming NEAR-dup dedup: first-writer-wins per simhash band bucket,
with exact Hamming verification — the streaming twin of
``dedup_simhash_pairs``, completing the batch/streaming symmetry the CDC
core already has (every batch dedup family member whose state is a
per-key identity set gets a streaming form).

Semantics (two within-batch policies; across batches both are exact
first-writer-wins because only admitted docs enter the state):

- ``greedy`` (default): a doc is REJECTED iff within Hamming ≤ 3 of any
  previously admitted doc OR any lower-doc_id doc of the same batch —
  order-free, one joins-pass; a within-batch REJECTED doc can still
  shadow a later same-batch doc (conservative).
- ``sequential``: exactly what a serial one-doc-at-a-time writer would
  produce — docs resolve in doc_id order and a REJECTED doc shadows
  nobody. Along a within-batch chain a~b~c (c near b but not a): greedy
  rejects b and c; sequential rejects b, admits c. Resolved by a
  bounded fixpoint over the batch's candidate edges (rounds = chain
  depth, batch-sized data — the same BSP discipline as
  ``operators.dedup.connected_components``).

State = the admitted table ITSELF: each batch probes the admitted docs'
band index (4×15-bit bands — pigeonhole-complete for Hamming ≤ 3, the
same banding as the batch operator), verifies band collisions with an
exact int64 Hamming check, and appends survivors via the idempotent
batch-id sink. That makes restart safety structural: the checkpoint
owns source offsets, the parquet table owns the state, and a batch
re-run replaces its own partition (its earlier attempt is excluded from
the probe by batch id, so it never shadows itself).

At 100 TB: the probe is a join of the batch's 4·|batch| band rows
against the admitted band index on (band, band_key) — at scale keep
the admitted index as a compacted (band, band_key, simhash, doc_id)
table partitioned by band_key range so the probe prunes; signatures are
int64s end-to-end, text never joins. (An
``applyInPandasWithState``/RocksDB formulation would co-locate state
with the stream; the table-as-state form is preferred here because the
admitted set must be queryable as a corpus anyway.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _SH_MAX_HAMMING,
    band_key_structs,
    simhash_from_hashes_expr,
    token_hash_expr,
)
from ..sources.tables import AppendTable


@dataclass
class StreamingNearDupDedup:
    """documents stream → append-only table of admitted (non-near-dup)
    documents with their simhash signatures."""

    out_table: AppendTable
    max_hamming: int = _SH_MAX_HAMMING
    policy: str = "greedy"  # "greedy" | "sequential" (see module docstring)

    def _with_sig(self, docs: DataFrame) -> DataFrame:
        # bind toks, then the token hashes, in prior projections (see
        # simhash_from_hashes_expr — lambda inputs must be bound columns)
        return (docs
                .withColumn("toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
                .withColumn("__th", F.expr(token_hash_expr("toks")))
                .withColumn("simhash", F.expr(simhash_from_hashes_expr("__th")))
                .drop("toks", "__th"))

    def _bands(self, sig: DataFrame, id_col: str) -> DataFrame:
        return (sig.select(F.col("doc_id").alias(id_col), "simhash",
                           F.explode(band_key_structs()).alias("bd"))
                .select(id_col, F.col("simhash").alias(f"{id_col}_sh"),
                        "bd.band", "bd.band_key"))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        sig = self._with_sig(batch_df).localCheckpoint(eager=True)
        new_bands = self._bands(sig, "new_id")
        ham = F.bit_count(F.expr("new_id_sh ^ old_sh"))

        rejected = None
        spark = batch_df.sparkSession
        if self.out_table.exists():
            # admitted state, EXCLUDING this batch's own partition (a
            # re-run after a crash-before-checkpoint-commit must not be
            # shadowed by its failed attempt's rows)
            prior = (spark.read.parquet(self.out_table.path)
                     .filter(F.col("ingest_batch_id") < F.lit(int(batch_id)))
                     .select("doc_id", "simhash"))
            prior_bands = (self._bands(prior, "old_id")
                           .withColumnRenamed("old_id_sh", "old_sh"))
            rejected = (new_bands.join(prior_bands, ["band", "band_key"])
                        .filter(ham <= self.max_hamming)
                        .select(F.col("new_id").alias("doc_id")))
        # within-batch candidate edges: (lo, hi) batch pairs in the radius
        lower = (new_bands.select(F.col("new_id").alias("old_id"),
                                  F.col("new_id_sh").alias("old_sh"),
                                  "band", "band_key"))
        edges = (new_bands.join(lower, ["band", "band_key"])
                 .filter((F.col("old_id") < F.col("new_id"))
                         & (ham <= self.max_hamming))
                 .select(F.col("old_id").alias("lo"),
                         F.col("new_id").alias("hi"))
                 .distinct())
        if self.policy == "sequential":
            admitted_ids = self._sequential_admit(
                sig.select("doc_id"),
                None if rejected is None else rejected.distinct(), edges)
            admitted = sig.join(admitted_ids, "doc_id", "left_semi")
        else:
            in_batch = edges.select(F.col("hi").alias("doc_id"))
            rejected = (in_batch if rejected is None
                        else rejected.unionByName(in_batch))
            admitted = sig.join(rejected.distinct(), "doc_id", "left_anti")
        self.out_table.append_idempotent(admitted, batch_id)

    @staticmethod
    def _sequential_admit(doc_ids: DataFrame, prior_rejected: DataFrame | None,
                          edges: DataFrame) -> DataFrame:
        """Serial-writer admission over the batch's candidate edges:
        resolve docs in id order; a doc is rejected iff some ADMITTED
        lower-id neighbor shadows it (rejected docs shadow nobody).

        BSP fixpoint: status ∈ {unknown 0, admitted 1, rejected -1};
        each round settles every unknown doc whose lower neighbors are
        all settled. Rounds = the longest within-batch near-dup CHAIN
        (almost always ≤ 2); data is micro-batch-sized throughout."""
        st = doc_ids.select("doc_id", F.lit(0).alias("st"))
        if prior_rejected is not None:
            st = st.join(prior_rejected.select("doc_id")
                         .withColumn("__rej", F.lit(1)), "doc_id", "left")
            st = st.select(
                "doc_id",
                F.when(F.col("__rej") == 1, F.lit(-1)).otherwise(0).alias("st"))
        st = st.coalesce(2).localCheckpoint(eager=True)
        e = edges.coalesce(2).localCheckpoint(eager=True)
        for _ in range(10_000):  # bounded by the longest chain ≤ batch size
            if st.filter(F.col("st") == 0).isEmpty():
                break
            nbr = (e.join(st.select(F.col("doc_id").alias("lo"),
                                    F.col("st").alias("lo_st")), "lo")
                   .groupBy(F.col("hi").alias("doc_id"))
                   .agg(F.max(F.when(F.col("lo_st") == 1, 1).otherwise(0))
                        .alias("any_adm"),
                        F.max(F.when(F.col("lo_st") == 0, 1).otherwise(0))
                        .alias("any_unk")))
            st = (st.join(nbr, "doc_id", "left")
                  .select("doc_id", F.when(F.col("st") != 0, F.col("st"))
                          .when(F.coalesce("any_adm", F.lit(0)) == 1, -1)
                          .when(F.coalesce("any_unk", F.lit(0)) == 1, 0)
                          .otherwise(1).alias("st"))
                  .coalesce(2).localCheckpoint(eager=True))
        else:
            raise RuntimeError("sequential_admit: no fixpoint (cycle?)")
        return st.filter(F.col("st") == 1).select("doc_id")

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
