"""Semantics tests for the round-6 late additions: hard-negative
mining (contrastive pair selection), the token frequency spectrum, and
sliding-window retrieval chunking."""

import math

import numpy as np

from demo_cdc_users_airline_spark.operators.curation import (
    _CH_SIZE,
    _CH_STRIDE,
    corpus_chunk_overlap,
)
from demo_cdc_users_airline_spark.operators.sampling import (
    corpus_token_spectrum,
)
from demo_cdc_users_airline_spark.operators.similarity import (
    HN_K,
    HN_N_ANCHORS,
    QUANT_SCALE,
    similarity_hard_negatives,
)

SF = "/root/testdata/sf0.001"


def test_hard_negatives_match_numpy_replay(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    q = {r["vec_id"]: np.floor(np.array(r["embedding"], dtype=np.float64)
                               * QUANT_SCALE).astype(np.int64)
         for r in rows}
    lab = {r["vec_id"]: r["label"] for r in rows}

    got = similarity_hard_negatives(spark, SF).collect()
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r["query_id"], []).append(r)

    assert set(by_anchor) == {a for a in q if a < HN_N_ANCHORS}
    for a, neigh in by_anchor.items():
        # exactly k negatives, every one from a different class
        assert len(neigh) == HN_K
        assert all(r["query_label"] == lab[a] for r in neigh)
        assert all(r["neighbor_label"] != lab[a] for r in neigh)
        assert all(r["neighbor_label"] == lab[r["neighbor_id"]]
                   for r in neigh)
        # replay: the k highest quantized cosines among other-label rows
        cand = [(int(q[v] @ q[a]) / math.sqrt(float(int(q[v] @ q[v]))
                                              * float(int(q[a] @ q[a]))), v)
                for v in q if lab[v] != lab[a]]
        want = sorted(cand, key=lambda t: (-t[0], t[1]))[:HN_K]
        got_pairs = [(r["cosine"], r["neighbor_id"]) for r in
                     sorted(neigh, key=lambda r: (-r["cosine"],
                                                  r["neighbor_id"]))]
        assert got_pairs == want


def test_token_spectrum_accounts_for_every_token(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import Counter
    counts = Counter()
    for r in docs:
        counts.update(r["text"].strip().lower().split())
    spec = {r["freq"]: r for r in corpus_token_spectrum(spark, SF).collect()}

    spectrum = Counter(counts.values())          # freq -> n_types
    assert {f: r["n_types"] for f, r in spec.items()} == dict(spectrum)
    # mass identities: sum(freq*n_types) = corpus tokens, shares sum to 1
    total = sum(counts.values())
    assert sum(r["token_mass"] for r in spec.values()) == total
    assert all(r["token_mass"] == f * r["n_types"] for f, r in spec.items())
    assert abs(sum(r["mass_share"] for r in spec.values()) - 1.0) < 1e-12
    # the hapax row is the count of once-occurring types (the synthetic
    # corpus draws from a tiny vocabulary, so it may legitimately be 0
    # and absent from the spectrum)
    n_hapax = sum(1 for c in counts.values() if c == 1)
    assert (spec[1]["n_types"] if 1 in spec else 0) == n_hapax


def test_chunk_overlap_reconstructs_documents(spark):
    docs = {r["doc_id"]: r["text"].strip().lower().split()
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    chunks = {}
    for r in corpus_chunk_overlap(spark, SF).collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_id"]] = r

    assert set(chunks) == set(docs)
    for doc_id, toks in docs.items():
        n = len(toks)
        ch = chunks[doc_id]
        assert set(ch) == set(range(math.ceil(n / _CH_STRIDE)))
        for cid, r in ch.items():
            start = cid * _CH_STRIDE
            want = toks[start:start + _CH_SIZE]
            assert r["start_tok"] == start
            assert r["chunk_tokens"] == len(want)
            assert r["chunk_text"] == " ".join(want)
        # consecutive chunks overlap by size - stride tokens
        for cid in range(len(ch) - 1):
            a = ch[cid]["chunk_text"].split()
            b = ch[cid + 1]["chunk_text"].split()
            k = _CH_SIZE - _CH_STRIDE
            assert a[_CH_STRIDE:_CH_STRIDE + k] == b[:len(a) - _CH_STRIDE]
        # stride-aligned reconstruction: heads of every chunk + the tail
        rebuilt = []
        for cid in sorted(ch):
            rebuilt.extend(ch[cid]["chunk_text"].split()[:_CH_STRIDE])
        last = ch[max(ch)]["chunk_text"].split()
        rebuilt.extend(last[_CH_STRIDE:])
        assert rebuilt == toks
