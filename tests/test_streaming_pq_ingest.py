"""StreamingPqIngest: the PQ index's foreachBatch maintainer — the
fifth artifact family joins the streaming symmetry. Appends are
idempotent by batch id (purge-first + dynamic overwrite, even across a
rebuild's codebook swap); the in-loop compaction hook folds older
batches while the in-flight batch stays replaceable; serving is
invariant across the fold."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    _SERVE_QBOUND,
    _quantized_vectors,
)
from demo_cdc_users_airline_spark.operators.pq import (
    build_pq_index,
    pq_codes_path,
    pq_serve,
    rebuild_pq_index,
)
from demo_cdc_users_airline_spark.sources.loader import load_table
from demo_cdc_users_airline_spark.streaming.pq_ingest import StreamingPqIngest

SF = "/root/testdata/sf0.001"

VEC_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])


def _inc_rows(spark, lo, hi):
    return (load_table(spark, SF, "embeddings")
            .filter((F.col("vec_id") % _DRIFT_MOD == 0)
                    & (F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").cast("array<double>")
                    .alias("embedding")))


def _batches(spark, path):
    return {r[0] for r in spark.read.parquet(pq_codes_path(path))
            .select("ingest_batch").distinct().collect()}


def _serve(spark, path):
    return sorted(tuple(r) for r in pq_serve(spark, SF, path).collect())


def test_stream_appends_and_autocompact(spark, tmp_path):
    path = build_pq_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingPqIngest(index_path=path, compact_check_every=1)
    b0 = spark.createDataFrame(
        _inc_rows(spark, _SERVE_QBOUND, _SERVE_QBOUND + 64).collect(),
        VEC_SCHEMA)
    b1 = spark.createDataFrame(
        _inc_rows(spark, _SERVE_QBOUND + 64, 10 ** 9).collect(),
        VEC_SCHEMA)
    pipe.process_batch(b0, 0)
    served_mid = _serve(spark, path)
    pipe.process_batch(b1, 1)
    # batch 0 folded into base; the in-flight batch 1 kept replaceable
    assert _batches(spark, path) == {-1, 1}
    # every appended vector present exactly once
    n_inc = _inc_rows(spark, _SERVE_QBOUND, 10 ** 9).count()
    codes = spark.read.parquet(pq_codes_path(path))
    base_n = (_quantized_vectors(spark, SF)
              .filter(F.col("id") % _DRIFT_MOD != 0).count())
    assert codes.count() == base_n + n_inc
    # retry of the in-flight batch across the fold: idempotent
    pipe.process_batch(b1, 1)
    assert spark.read.parquet(pq_codes_path(path)).count() \
        == base_n + n_inc
    # serving reflects growth (batch-0 arrivals were already reachable
    # mid-stream) and survives the fold unchanged for those rows
    assert served_mid  # non-empty mid-stream serve
    assert _serve(spark, path)  # and after the fold + batch 1


def test_stream_retry_across_rebuild_swap(spark, tmp_path):
    path = build_pq_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingPqIngest(index_path=path)
    b0 = spark.createDataFrame(
        _inc_rows(spark, _SERVE_QBOUND, 10 ** 9).collect(), VEC_SCHEMA)
    pipe.process_batch(b0, 0)
    n = spark.read.parquet(pq_codes_path(path)).count()
    rebuild_pq_index(spark, path, keep_provenance=True)
    # foreachBatch re-delivers batch 0 AFTER the swap: the purge-first
    # append must replace its rows under the NEW codebooks exactly
    pipe.process_batch(b0, 0)
    codes = spark.read.parquet(pq_codes_path(path))
    assert codes.count() == n
    dup = (codes.groupBy("vec_id").count().filter("count > 1").count())
    assert dup == 0


def test_real_stream_wiring(spark, tmp_path):
    """One availableNow micro-batch through the actual writeStream →
    foreachBatch path (checkpointed), proving the wiring end to end."""
    path = build_pq_index(spark, SF, str(tmp_path / "idx"))
    src = str(tmp_path / "src")
    _inc_rows(spark, _SERVE_QBOUND, 10 ** 9).write.parquet(src)
    stream = spark.readStream.schema(VEC_SCHEMA).parquet(src)
    pipe = StreamingPqIngest(index_path=path)
    q = pipe.start(stream, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)
    assert os.path.exists(pq_codes_path(path))
    batches = _batches(spark, path)
    assert -1 in batches and len(batches) == 2
    assert _serve(spark, path)


def test_auto_rebuild_fires_on_pq_drift_and_not_in_distribution(
        spark, tmp_path):
    """The PQ-space drift gate: an in-distribution batch must NOT fire;
    a drifted batch (scaled vectors — reconstruction error blows up
    under the saved sub-codebooks) must fire, and the published
    codebooks must equal a fresh fit on everything the index then
    holds (rebuild ≡ retrain through the auto path)."""
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        kmeans_fit,
        load_codebook,
    )
    from demo_cdc_users_airline_spark.operators.pq import (
        _subvectors_of,
        pq_coarse_path,
        pq_fit,
    )

    path = build_pq_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingPqIngest(index_path=path, rebuild_check_every=1)

    # batch 0: in-distribution increment → no fire (flat layout stays)
    b0 = spark.createDataFrame(
        _inc_rows(spark, _SERVE_QBOUND, 10 ** 9).collect(), VEC_SCHEMA)
    pipe.process_batch(b0, 0)
    assert not os.path.exists(str(tmp_path / "idx" / "_pq_live.json"))

    # batch 1: the same vectors scaled 3x — PQ reconstruction error
    # under the saved sub-codebooks explodes → the hook must fire
    drifted = (spark.createDataFrame(b0.collect(), VEC_SCHEMA)
               .select("id",
                       F.expr("transform(embedding, x -> x * 3.0D)")
                       .alias("embedding"))
               .select((F.col("id") + 10_000).alias("id"), "embedding"))
    b1 = spark.createDataFrame(drifted.collect(), VEC_SCHEMA)
    pipe.process_batch(b1, 1)
    assert os.path.exists(str(tmp_path / "idx" / "_pq_live.json"))

    # rebuild ≡ retrain on everything the index now holds
    vecs = (spark.read.parquet(pq_codes_path(path))
            .select(F.col("vec_id").alias("id"), "vec").cache())
    assert load_codebook(spark, pq_coarse_path(path)) == kmeans_fit(vecs)
    from demo_cdc_users_airline_spark.operators.pq import (
        load_pq_codebook,
        pq_codebook_path,
    )
    assert load_pq_codebook(spark, pq_codebook_path(path)) == \
        pq_fit(_subvectors_of(vecs).cache())

    # provenance survived the auto-swap, and a retry of the firing
    # batch is still idempotent under the NEW codebooks
    n = spark.read.parquet(pq_codes_path(path)).count()
    pipe.process_batch(b1, 1)
    codes = spark.read.parquet(pq_codes_path(path))
    assert codes.count() == n
    assert (codes.groupBy("vec_id").count()
            .filter("count > 1").count()) == 0
