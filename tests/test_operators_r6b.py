"""Semantics tests for the round-6 continuation wave: PageRank over the
near-dup graph, TF-IDF ranked retrieval, Matryoshka truncation recall,
temperature-resampled corpus materialization, and the column profiler.

Each test replays the operator's exact integer contract in plain
Python/numpy — the same proof style the oracle gate applies cross-engine.
"""

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np

from demo_cdc_users_airline_spark.operators.graph import (
    BASE_MICRO,
    DAMP_DEN,
    DAMP_NUM,
    N_ROUNDS,
    dedup_graph_pagerank,
)
from demo_cdc_users_airline_spark.operators.dedup import dedup_simhash_pairs
from demo_cdc_users_airline_spark.operators.importance import (
    corpus_temperature_sample,
)
from demo_cdc_users_airline_spark.operators.profiling import (
    orders_table_profile,
)
from demo_cdc_users_airline_spark.operators.retrieval import (
    QUERY_TERMS,
    TOP_K,
    retrieval_tfidf_topk,
)
from demo_cdc_users_airline_spark.operators.similarity import (
    _MRL_DIMS,
    _MRL_K,
    QUANT_SCALE,
    similarity_matryoshka_recall,
)

SF = "/root/testdata/sf0.001"


def _salted(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


def test_pagerank_matches_integer_replay(spark):
    edges = [(r["doc1"], r["doc2"])
             for r in dedup_simhash_pairs(spark, SF).collect()]
    assert edges, "fixture should produce a non-empty near-dup graph"
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    deg = {n: len(vs) for n, vs in adj.items()}
    pr = {n: 1_000_000 for n in adj}
    for _ in range(N_ROUNDS):
        nxt = defaultdict(int)
        for u, vs in adj.items():
            c = pr[u] // deg[u]
            for v in vs:
                nxt[v] += c
        pr = {n: BASE_MICRO + (DAMP_NUM * s) // DAMP_DEN
              for n, s in nxt.items()}
    got = {r["doc_id"]: (r["degree"], r["pagerank_micro"], r["pagerank"])
           for r in dedup_graph_pagerank(spark, SF).collect()}
    assert set(got) == set(adj)
    for n in adj:
        d, micro, dbl = got[n]
        assert d == deg[n]
        assert micro == pr[n], f"node {n}: {micro} != {pr[n]}"
        assert dbl == micro / 1_000_000.0
    # centrality sanity: some node beats the base-mass floor
    assert max(m for _, m, _ in got.values()) > BASE_MICRO


def test_tfidf_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    toks = {r["doc_id"]: r["text"].strip().lower().split()
            for r in docs}
    n_docs = len(docs)
    df = {t: sum(1 for ws in toks.values() if t in ws) for t in QUERY_TERMS}
    scored = []
    for d, ws in toks.items():
        cnt = Counter(ws)
        s = 0
        for t in QUERY_TERMS:
            tf = cnt.get(t, 0)
            if tf > 0:
                s += math.floor(1_000_000.0 * (
                    (1.0 + math.log(float(tf)))
                    * math.log((1.0 + n_docs) / (1.0 + df[t]))))
        scored.append((d, len(ws), s))
    want = sorted(scored, key=lambda r: (-r[2], r[0]))[:TOP_K]
    got = [(r["doc_id"], r["n_tokens"], r["score_micro"])
           for r in retrieval_tfidf_topk(spark, SF).collect()]
    assert got == want
    # absent-term smoothing: a doc containing none of the terms scores 0
    assert all(s >= 0 for _, _, s in scored)


def test_matryoshka_recall_curve(spark):
    rows = {r["dims"]: r for r in
            similarity_matryoshka_recall(spark, SF).collect()}
    assert set(rows) == set(_MRL_DIMS)
    full = rows[_MRL_DIMS[-1]]
    assert full["recall_at_5"] == 1.0  # full dim vs itself
    emb = {r["vec_id"]: np.floor(np.array(r["embedding"], np.float64)
                                 * QUANT_SCALE).astype(np.int64)
           for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    queries = [v for v in emb if v < 8]

    def topk(d):
        out = {}
        for a in queries:
            qa = emb[a][:d]
            cand = []
            for b, vb in emb.items():
                if b == a:
                    continue
                cb = vb[:d]
                cos = int(qa @ cb) / math.sqrt(float(int(qa @ qa))
                                               * float(int(cb @ cb)))
                cand.append((cos, b))
            cand.sort(key=lambda t: (-t[0], t[1]))
            out[a] = {b for _, b in cand[:_MRL_K]}
        return out

    truth = topk(_MRL_DIMS[-1])
    for d in _MRL_DIMS:
        t = topk(d)
        hits = sum(len(t[a] & truth[a]) for a in queries)
        retrieved = _MRL_K * len(queries)
        assert rows[d]["hits"] == hits
        assert rows[d]["retrieved"] == retrieved
        assert rows[d]["recall_at_5"] == hits / retrieved


def test_temperature_sample_matches_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    masses = defaultdict(int)
    ntok = {}
    for r in docs:
        n = len(r["text"].strip().lower().split())
        ntok[r["doc_id"]] = (r["source"], n)
        masses[r["source"]] += n
    s_micro = {s: math.floor(1_000_000.0 * math.sqrt(float(m)))
               for s, m in masses.items()}
    tok_tot, s_tot = sum(masses.values()), sum(s_micro.values())
    rf_ppm = {s: math.floor(1_000_000.0
                            * (s_micro[s] / s_tot) / (masses[s] / tok_tot))
              for s in masses}
    want = []
    for d, (src, n) in ntok.items():
        rf = rf_ppm[src]
        copies = rf // 1_000_000 + (
            1 if _salted("temp_", d) % 1_000_000 < rf % 1_000_000 else 0)
        for i in range(1, copies + 1):
            want.append((d, src, n, rf, i))
    got = [(r["doc_id"], r["source"], r["n_tokens"], r["rf_ppm"], r["copy"])
           for r in corpus_temperature_sample(spark, SF).collect()]
    assert sorted(got) == sorted(want)
    # the realized mixture flattens: every repeat factor is near 1 on a
    # balanced corpus, and at least one source moves each direction
    assert any(rf > 1_000_000 for rf in rf_ppm.values())
    assert any(rf < 1_000_000 for rf in rf_ppm.values())


def test_orders_profile_matches_pandas(spark):
    pdf = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    got = {r["column_name"]: r for r in
           orders_table_profile(spark, SF).collect()}
    assert set(got) == {"o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate", "o_orderpriority"}
    for c, r in got.items():
        assert r["n_rows"] == len(pdf)
        assert r["n_nulls"] == int(pdf[c].isna().sum())
        assert r["n_distinct"] == int(pdf[c].dropna().nunique())
    assert got["o_orderkey"]["min_num"] == float(pdf["o_orderkey"].min())
    assert got["o_totalprice"]["max_num"] == float(pdf["o_totalprice"].max())
    ts = pdf["o_orderdate"]
    assert got["o_orderdate"]["min_num"] == ts.min().timestamp()
    assert got["o_orderstatus"]["min_num"] is None
