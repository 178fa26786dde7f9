"""Streaming simhash near-dup dedup: band-bucketed first-writer-wins
with exact Hamming verify, across micro-batches, restarts, and batch
re-runs."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.operators.dedup import (
    simhash_from_hashes_expr,
    token_hash_expr,
)
from demo_cdc_users_airline_spark.sources.tables import AppendTable
from demo_cdc_users_airline_spark.streaming.neardup import StreamingNearDupDedup

SCHEMA = T.StructType([T.StructField("doc_id", T.LongType()),
                       T.StructField("text", T.StringType())])

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "sailors watch from the harbor wall at dawn every single morning")
OTHER = ("completely different subject matter entirely numerical "
         "spreadsheets quarterly revenue administrative overhead "
         "zebra xylophone quantum")
THIRD = ("mountain glacier erosion sediment basalt columnar jointing "
         "volcanic uplift tectonic subduction ridge abyssal plain")


def sig_of(spark, text):
    return (spark.createDataFrame([(text,)], "text string")
            .withColumn("toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
            .select(F.expr(token_hash_expr("toks")).alias("th"))
            .select(F.expr(simhash_from_hashes_expr("th")).alias("s"))
            .first()["s"])


def hamming(a, b):
    return bin(a ^ b).count("1")


def write_docs(path, docs):
    path.write_text("\n".join(json.dumps({"doc_id": i, "text": t})
                              for i, t in docs) + "\n")


def source(spark, directory):
    return (spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(str(directory))
            .select(F.from_json(F.col("value"), SCHEMA).alias("j"))
            .select("j.doc_id", "j.text"))


def run_once(spark, dedup, src_dir, ckpt):
    q = dedup.start(source(spark, src_dir), str(ckpt), trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive


def test_distinct_texts_are_far_apart(spark):
    # guard: the "unrelated" fixtures really are outside the radius
    sigs = [sig_of(spark, t) for t in (BASE, OTHER, THIRD)]
    for i in range(3):
        for j in range(i + 1, 3):
            assert hamming(sigs[i], sigs[j]) > 3


def test_neardup_first_writer_wins_across_batches_and_restart(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out = AppendTable(spark, str(tmp_path / "admitted"))
    dedup = StreamingNearDupDedup(out_table=out)

    # batch a: 1 admitted; 2 identical to 1 (hamming 0 → in-batch reject);
    # 3 unrelated → admitted
    write_docs(src / "a.json", [(1, BASE), (2, BASE), (3, OTHER)])
    # batch b: 11 re-sends doc 1's text (cross-batch reject); 12 new
    write_docs(src / "b.json", [(11, BASE), (12, THIRD)])
    run_once(spark, dedup, src, tmp_path / "ckpt")

    rows = {r["doc_id"]: r for r in out.read().collect()}
    assert set(rows) == {1, 3, 12}

    # restart with a new file: state (the table) still remembers BASE
    write_docs(src / "c.json", [(21, OTHER), (22, "totally novel words "
                                                  "about sailing regatta "
                                                  "spinnaker halyard jib")])
    run_once(spark, dedup, src, tmp_path / "ckpt")
    rows2 = {r["doc_id"] for r in out.read().collect()}
    assert rows2 == {1, 3, 12, 22}

    # batch-replay parity: admitted set == greedy-by-id batch rule over
    # the whole doctored stream (no within-radius chains in the fixture)
    all_docs = [(1, BASE), (2, BASE), (3, OTHER), (11, BASE), (12, THIRD),
                (21, OTHER), (22, "totally novel words about sailing "
                                  "regatta spinnaker halyard jib")]
    sigs = {i: sig_of(spark, t) for i, t in all_docs}
    expect = set()
    for i, _ in sorted(all_docs):
        if all(hamming(sigs[i], sigs[j]) > 3 for j in expect):
            expect.add(i)
    assert rows2 == expect


def test_neardup_batch_rerun_does_not_self_shadow(spark, tmp_path):
    """Re-running a batch id (the foreachBatch at-least-once case) must
    not reject docs against their own failed attempt's rows, and must
    not duplicate admitted rows."""
    out = AppendTable(spark, str(tmp_path / "admitted"))
    dedup = StreamingNearDupDedup(out_table=out)
    b0 = spark.createDataFrame([(1, BASE), (2, OTHER)], "doc_id long, text string")
    dedup.process_batch(b0, 0)
    dedup.process_batch(b0, 0)          # the retry
    assert {r["doc_id"] for r in out.read().collect()} == {1, 2}
    assert out.read().count() == 2
    b1 = spark.createDataFrame([(3, BASE), (4, THIRD)], "doc_id long, text string")
    dedup.process_batch(b1, 1)
    assert {r["doc_id"] for r in out.read().collect()} == {1, 2, 4}


# a within-batch near-dup CHAIN: h(A,B)=3, h(B,C)=3, h(A,C)=4 (verified
# by the guard test below) — the case where the two policies diverge
CHAIN_B = BASE.replace("the quick", "new quick", 1)
CHAIN_C = BASE.replace("the quick", "red quick", 1)


def test_chain_fixture_distances(spark):
    sa, sb, sc = (sig_of(spark, t) for t in (BASE, CHAIN_B, CHAIN_C))
    assert hamming(sa, sb) <= 3 and hamming(sb, sc) <= 3
    assert hamming(sa, sc) > 3


def test_sequential_policy_admits_chain_tail(spark, tmp_path):
    """Serial-writer semantics: B (dup of A) is rejected; C (dup only of
    the REJECTED B) is admitted — exactly what one-at-a-time processing
    would do. The greedy policy rejects both."""
    for policy, expect in (("sequential", {1, 3}), ("greedy", {1})):
        out = AppendTable(spark, str(tmp_path / f"admitted_{policy}"))
        dedup = StreamingNearDupDedup(out_table=out, policy=policy)
        b0 = spark.createDataFrame(
            [(1, BASE), (2, CHAIN_B), (3, CHAIN_C)], "doc_id long, text string")
        dedup.process_batch(b0, 0)
        assert {r["doc_id"] for r in out.read().collect()} == expect, policy


def test_sequential_matches_serial_replay(spark, tmp_path):
    """Parity oracle: the streaming result over doctored batches equals
    a strict one-doc-at-a-time serial replay of the same stream."""
    batches = [
        [(1, BASE), (2, CHAIN_B), (3, CHAIN_C)],
        [(11, CHAIN_B), (12, OTHER)],      # 11 dups admitted A across batches
        [(21, THIRD), (22, CHAIN_C)],      # 22 dups admitted C across batches
    ]
    out = AppendTable(spark, str(tmp_path / "admitted_seq"))
    dedup = StreamingNearDupDedup(out_table=out, policy="sequential")
    for bid, docs in enumerate(batches):
        dedup.process_batch(
            spark.createDataFrame(docs, "doc_id long, text string"), bid)
    got = {r["doc_id"] for r in out.read().collect()}

    sigs = {i: sig_of(spark, t) for b in batches for i, t in b}
    admitted = set()
    for i in sorted(sigs):
        if all(hamming(sigs[i], sigs[j]) > 3 for j in admitted):
            admitted.add(i)
    assert got == admitted


def test_sequential_rerun_idempotent(spark, tmp_path):
    out = AppendTable(spark, str(tmp_path / "admitted_rerun"))
    dedup = StreamingNearDupDedup(out_table=out, policy="sequential")
    b0 = spark.createDataFrame([(1, BASE), (2, CHAIN_B), (3, CHAIN_C)],
                               "doc_id long, text string")
    dedup.process_batch(b0, 0)
    dedup.process_batch(b0, 0)   # retry must not self-shadow or duplicate
    assert sorted(r["doc_id"] for r in out.read().collect()) == [1, 3]
