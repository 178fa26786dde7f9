"""In-loop auto-compaction for the three streaming index maintainers:
the merge-due census (the gated *_compaction_policy decision) acted on
inside the quiesced foreachBatch window, ALWAYS excluding the batch
being committed — so provenance folds to {base, in-flight batch},
serve results are invariant, and a retry of the in-flight batch stays
idempotent across the fold."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.dedup import (
    build_lsh_index,
    probe_lsh_index,
)
from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
    _DRIFT_MOD,
    build_ivf_index,
    ivf_cells_path,
)
from demo_cdc_users_airline_spark.operators.retrieval import (
    bm25_serve,
    build_bm25_index,
)
from demo_cdc_users_airline_spark.sources.loader import load_table
from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.bm25_ingest import (
    StreamingBm25Ingest,
)
from demo_cdc_users_airline_spark.streaming.ivf_ingest import (
    StreamingIvfIngest,
)
from demo_cdc_users_airline_spark.streaming.lsh_ingest import (
    StreamingLshIngest,
)

SF = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
VEC_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])

NOVEL_1 = ("zebra xylophone quantum harmonica sediment glacier aurora "
           "borealis cantilever mezzanine theodolite sprocket bandolier")
NOVEL_2 = ("completely different administrative spreadsheet quarterly "
           "revenue overhead projector stapler bulldozer metronome")


def _batches(path, spark):
    return {r[0] for r in spark.read.parquet(path)
            .select("ingest_batch").distinct().collect()}


def test_lsh_autocompact_folds_older_batches(spark, tmp_path):
    path = build_lsh_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingLshIngest(
        index_path=path,
        out_table=AppendTable(spark, str(tmp_path / "adm")),
        compact_check_every=1)
    b0 = spark.createDataFrame([(1_000_001, NOVEL_1)], DOC_SCHEMA)
    b1 = spark.createDataFrame([(1_000_002, NOVEL_2)], DOC_SCHEMA)
    pipe.process_batch(b0, 0)
    pipe.process_batch(b1, 1)
    # batch 0 folded into base; the in-flight batch 1 kept replaceable
    assert _batches(path + "/bands", spark) == {-1, 1}
    assert _batches(path + "/sig", spark) == {-1, 1}
    # verdicts invariant across the fold: a copy of the FOLDED batch's
    # doc is still rejected against it
    copy = spark.createDataFrame([(1_000_003, NOVEL_1)], DOC_SCHEMA)
    v = probe_lsh_index(spark, copy, path).collect()[0]
    assert v["admitted"] == 0 and v["dup_of"] == 1_000_001
    # retry of the in-flight batch across the fold: idempotent
    n = spark.read.parquet(path + "/sig").count()
    pipe.process_batch(b1, 1)
    assert spark.read.parquet(path + "/sig").count() == n


def test_ivf_autocompact_folds_older_batches(spark, tmp_path):
    path = build_ivf_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingIvfIngest(
        index_path=path,
        report_table=AppendTable(spark, str(tmp_path / "rep")),
        compact_check_every=1)
    rows = (load_table(spark, SF, "embeddings")
            .filter(F.col("vec_id") % _DRIFT_MOD == 0)
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").cast("array<double>")
                    .alias("embedding"))
            .orderBy("id").limit(4).collect())
    vecs = [(int(r["id"]), list(r["embedding"])) for r in rows]
    b0 = spark.createDataFrame(vecs[:2], VEC_SCHEMA)
    b1 = spark.createDataFrame(vecs[2:], VEC_SCHEMA)
    pipe.process_batch(b0, 0)
    pipe.process_batch(b1, 1)
    cells = ivf_cells_path(path)
    assert _batches(cells, spark) == {-1, 1}
    n = spark.read.parquet(cells).count()
    # retry of the in-flight batch across the fold: idempotent
    pipe.process_batch(b1, 1)
    assert spark.read.parquet(cells).count() == n
    assert _batches(cells, spark) == {-1, 1}


def test_bm25_autocompact_folds_older_batches(spark, tmp_path):
    path = build_bm25_index(spark, SF, str(tmp_path / "idx"))
    pipe = StreamingBm25Ingest(index_path=path, compact_check_every=1)
    b0 = spark.createDataFrame(
        [(1_000_001, "zebraterm zebraterm unique")], DOC_SCHEMA)
    b1 = spark.createDataFrame(
        [(1_000_002, "othernovel words entirely")], DOC_SCHEMA)
    pipe.process_batch(b0, 0)
    pipe.process_batch(b1, 1)
    assert _batches(path + "/postings", spark) == {-1, 1}
    assert _batches(path + "/stats", spark) == {-1, 1}
    # serve invariant across the fold: the FOLDED batch's unique term
    # still ranks its doc, with stats summing base partial + batch row
    rows = bm25_serve(spark, path, terms=("zebraterm",)).collect()
    assert [r["doc_id"] for r in rows] == [1_000_001]
    # retry of the in-flight batch across the fold: idempotent
    n = spark.read.parquet(path + "/postings").count()
    pipe.process_batch(b1, 1)
    assert spark.read.parquet(path + "/postings").count() == n
