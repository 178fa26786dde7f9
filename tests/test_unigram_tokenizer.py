"""Unigram-LM tokenizer (VERDICT r9 item 8): the integer Viterbi spec
exercised where the GATE CORPUS can't reach it — words longer than
U_MAX_WORD (truncation binds; the gate corpus tops out at 8 chars) and
deep DP levels — with the Spark higher-order fold and the DuckDB
position-unrolled oracle required to agree bit-for-bit on the same
synthetic parquet. Plus hand-checked DP pins on adversarial words
(greedy-longest-piece is suboptimal; the DP must beat it)."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.tokenizer import (
    U_MAX_WORD,
    _unigram_encode_oracle_sql,
    _unigram_vocab_oracle_sql,
    learn_unigram_vocab,
    text_unigram_encode,
    text_unigram_vocab,
)

# words chosen so that:
#   - "abab abab ..." makes "ab"/"abab" high-weight multi-char pieces;
#   - "ababababababababababababab" (26 chars) exercises TRUNCATION to
#     U_MAX_WORD and every DP level 1..16;
#   - "abac": greedy longest-piece ("aba"? no — "ab"+"ac"|"a"+"c") vs
#     DP tie-breaking through -score is pinned by the oracle equality;
#   - "zq" contains alphabet-only chars (weight still > 0 via subs).
DOCS = {
    1: "abab abab abab ababab",
    2: "abac abab zq",
    3: "ababababababababababababab",   # 26 chars -> truncates to 16
    4: "ab a b",
    5: "",                              # empty doc: all-zero row
}


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("unigram_sf")
    ids = sorted(DOCS)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([DOCS[i] for i in ids], pa.string())}),
        os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS"
                f" SELECT * FROM '{sf_dir}/documents.parquet'")
    return con


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_vocab_matches_oracle_on_synthetic(spark, duck, sf_dir):
    got = _norm(text_unigram_vocab(spark, sf_dir).collect())
    want = _norm(duck.execute(_unigram_vocab_oracle_sql()).fetchall())
    assert got == want


def test_encode_matches_oracle_incl_truncation(spark, duck, sf_dir):
    got = _norm(text_unigram_encode(spark, sf_dir).collect())
    want = _norm(duck.execute(_unigram_encode_oracle_sql()).fetchall())
    assert got == want
    by_id = {r[0]: r for r in got}
    # truncation bound: doc 3's single 26-char word counts exactly
    # U_MAX_WORD chars
    assert by_id[3][2] == U_MAX_WORD
    # empty doc: all-zero row, present
    assert by_id[5] == (5, 0, 0, 0, 0, 0)


def test_dp_is_optimal_not_greedy(spark, sf_dir):
    """The per-word DP minimizes (tokens, -score) exactly: for the
    truncated 16-char 'abababab...' the optimal cover uses 4-char
    pieces ('abab' × 4), and every word's token count is a true lower
    bound over ANY segmentation by vocab pieces (checked against a
    brute-force DP in Python over the same piece table)."""
    vocab = dict(learn_unigram_vocab(spark, sf_dir))
    enc = {r["w"]: (r["nt"], r["sc"]) for r in (
        spark.createDataFrame([(w,) for w in
                               {w for t in DOCS.values()
                                for w in t.lower().split() if w}],
                              "w string")
        .select(F.substring("w", 1, U_MAX_WORD).alias("w")).distinct()
        .crossJoin(F.broadcast(spark.createDataFrame(
            [(vocab,)], "__vmap map<string,bigint>")))
        .select("w", F.expr(
            __import__("demo_cdc_users_airline_spark.operators.tokenizer",
                       fromlist=["_U_DP_EXPR"])._U_DP_EXPR).alias("c"))
        .select("w", F.col("c.t").alias("nt"),
                (-F.col("c.ns")).alias("sc")).collect())}

    def brute(w):
        best = {0: (0, 0)}  # pos -> (tokens, -score)
        for i in range(1, len(w) + 1):
            cands = []
            for j in range(1, min(i, 4) + 1):
                p = w[i - j:i]
                if p in vocab and (i - j) in best:
                    t, ns = best[i - j]
                    cands.append((t + 1, ns - vocab[p]))
            if cands:
                best[i] = min(cands)
        return best[len(w)]

    for w, (nt, sc) in enc.items():
        bt, bns = brute(w)
        assert (nt, -sc) == (bt, bns), w
    # the 16-char truncated run segments into 4 × 'abab' (the DP finds
    # the 4-token cover; greedy-by-frequency orderings can do worse)
    assert enc["ab" * 8][0] == 4


def test_prune_matches_oracle_and_brute_backtrace(spark, duck, sf_dir):
    from demo_cdc_users_airline_spark.operators.tokenizer import (
        _unigram_prune_oracle_sql,
        text_unigram_prune,
    )
    got = _norm(text_unigram_prune(spark, sf_dir).collect())
    want = _norm(duck.execute(_unigram_prune_oracle_sql()).fetchall())
    assert got == want

    # the prune is REAL on this corpus: some multi-char seed piece
    # earns zero usage (kept = 0) while chars always survive
    by_piece = {r[0]: r for r in got}
    assert any(r[3] == 0 for r in got if len(r[0]) > 1)
    assert all(by_piece[p][3] == 1 for p in by_piece if len(p) == 1)

    # usage equals a brute-force Python replay of the SAME unique-
    # segmentation rule (min (tokens, -score, piece_len) Viterbi +
    # backtrace) over the capped word table
    vocab = dict(learn_unigram_vocab(spark, sf_dir))
    words = {}
    for t in DOCS.values():
        for w in t.lower().split():
            if w:
                w = w[:U_MAX_WORD]
                words[w] = words.get(w, 0) + 1

    def segment(w):
        best = {0: (0, 0, 0)}  # pos -> (t, ns, j of the chosen step)
        for i in range(1, len(w) + 1):
            cands = []
            for j in range(1, min(i, 4) + 1):
                p = w[i - j:i]
                if p in vocab and (i - j) in best:
                    t, ns, _ = best[i - j]
                    cands.append((t + 1, ns - vocab[p], j))
            if cands:
                best[i] = min(cands)
        pieces, pos = [], len(w)
        while pos > 0:
            j = best[pos][2]
            pieces.append(w[pos - j:pos])
            pos -= j
        return pieces

    usage = {}
    for w, n in words.items():
        for p in segment(w):
            usage[p] = usage.get(p, 0) + n
    for piece, _score, u, _kept in got:
        assert u == usage.get(piece, 0), piece


def test_pruned_encode_matches_oracle_and_unpruned_on_train_set(
        spark, duck, sf_dir):
    from demo_cdc_users_airline_spark.operators.tokenizer import (
        _unigram_pruned_encode_oracle_sql,
        text_unigram_encode_pruned,
    )
    got = _norm(text_unigram_encode_pruned(spark, sf_dir).collect())
    want = _norm(duck.execute(
        _unigram_pruned_encode_oracle_sql()).fetchall())
    assert got == want
    # when the encode universe and the training table coincide (as
    # here), dropping zero-usage pieces cannot change any optimal
    # segmentation: the pruned encode must equal the full encode
    assert got == _norm(text_unigram_encode(spark, sf_dir).collect())
