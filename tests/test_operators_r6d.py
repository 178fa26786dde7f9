"""Semantics tests for the round-6 fourth wave: triangle census on the
near-dup graph, bigram next-word accuracy, per-stratum reservoir
sampling, full-outer reconciliation, and RAKE keyword extraction.

Each test replays the operator's exact integer contract in plain
Python — the same proof style the oracle gate applies cross-engine.
"""

import hashlib
from collections import Counter, defaultdict
from itertools import combinations

from demo_cdc_users_airline_spark.operators.dedup import dedup_simhash_pairs
from demo_cdc_users_airline_spark.operators.graph import dedup_graph_triangles
from demo_cdc_users_airline_spark.operators.importance import (
    corpus_bigram_next_word,
    score_bigram_accuracy,
)
from demo_cdc_users_airline_spark.operators.sampling import (
    RESERVOIR_K,
    events_reservoir_sample,
)
from demo_cdc_users_airline_spark.operators.text import (
    RAKE_MAX_PHRASE,
    RAKE_TOP_K,
    _STOPWORDS,
    text_rake_keywords,
)
from demo_cdc_users_airline_spark.plans.analytics import (
    users_customer_reconciliation,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def test_triangles_match_brute_force(spark):
    edges = {(r["doc1"], r["doc2"])
             for r in dedup_simhash_pairs(spark, SF).collect()}
    assert edges
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(1 for u, v in edges for w in (adj[u] & adj[v]) if v < w)
    # brute triple-loop cross-check (tiny graph)
    nodes = sorted(adj)
    tri2 = sum(1 for a, b, c in combinations(nodes, 3)
               if b in adj[a] and c in adj[a] and c in adj[b])
    assert tri == tri2
    wedges = sum(d * (d - 1) // 2 for d in (len(s) for s in adj.values()))
    row = dedup_graph_triangles(spark, SF).collect()[0]
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri2
    want_cc = 3 * tri2 * 1_000_000 // wedges if wedges else None
    assert row["global_cc_micro"] == want_cc


def test_bigram_accuracy_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    big = Counter()
    pos_by_lang = defaultdict(list)
    for r in docs:
        t = r["text"].strip().lower().split()
        big.update(zip(t, t[1:]))
        pos_by_lang[r["lang"]].extend(zip(t, t[1:]))
    best = {}
    for (w1, w2), c in big.items():
        cur = best.get(w1)
        if cur is None or (-c, w2) < (-cur[1], cur[0]):
            best[w1] = (w2, c)
    got = {r["lang"]: (r["n_positions"], r["n_correct"],
                       r["accuracy_micro"])
           for r in score_bigram_accuracy(spark, SF).collect()}
    assert set(got) == set(pos_by_lang)
    for lang, pairs in pos_by_lang.items():
        n = len(pairs)
        correct = sum(1 for w1, w2 in pairs if best[w1][0] == w2)
        assert got[lang] == (n, correct, correct * 1_000_000 // n)
    # the mode predictor must beat chance on a 40-word vocabulary
    assert all(v[2] > 25_000 for v in got.values())
    # serving table consistency with the next-word query
    nw = {r["w1"]: r["next_word"]
          for r in corpus_bigram_next_word(spark, SF).collect()}
    assert nw == {w: bw[0] for w, bw in best.items()}


def _hash32(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


def test_reservoir_sample_matches_hash_order(spark):
    e = load_table(spark, SF, "events") \
        .select("event_type", "event_id").collect()
    by_type = defaultdict(list)
    for r in e:
        by_type[r["event_type"]].append(
            (_hash32("resv_", r["event_id"]), r["event_id"]))
    rows = events_reservoir_sample(spark, SF).collect()
    got = defaultdict(dict)
    for r in rows:
        got[r["event_type"]][r["sample_rank"]] = r["event_id"]
    assert set(got) == set(by_type)
    for t, hs in by_type.items():
        want = [eid for _h, eid in sorted(hs)[:RESERVOIR_K]]
        assert [got[t][i + 1] for i in range(len(want))] == want


def test_reconciliation_covers_both_sides(spark):
    ev = Counter(r["user_id"] for r in
                 load_table(spark, SF, "events")
                 .select("user_id").collect())
    cust = {r["c_custkey"]: r["c_acctbal"] for r in
            spark.read.parquet(f"{SF}/customer.parquet").collect()}
    rows = {r["entity_id"]: r for r in
            users_customer_reconciliation(spark, SF).collect()}
    assert set(rows) == set(ev) | set(cust)
    for eid, r in rows.items():
        assert r["in_events"] == (1 if eid in ev else 0)
        assert r["in_customers"] == (1 if eid in cust else 0)
        assert r["n_events"] == ev.get(eid, 0)
        assert r["acctbal"] == cust.get(eid)
    # both unmatched classes must actually occur in the fixture
    assert any(r["in_events"] == 0 for r in rows.values())
    assert any(r["in_events"] == 1 and r["in_customers"] == 1
               for r in rows.values())


def test_rake_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    stop = set(_STOPWORDS)
    phrases = []  # (doc_id, grp, tuple(words))
    for r in docs:
        toks = r["text"].strip().lower().split()
        grp, cur = 0, []
        for w in toks:
            if w in stop:
                if cur:
                    phrases.append((r["doc_id"], grp, tuple(cur)))
                grp += 1
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append((r["doc_id"], grp, tuple(cur)))
    phrases = [p for p in phrases if len(p[2]) <= RAKE_MAX_PHRASE]
    freq = Counter()
    deg = Counter()
    for _d, _g, ws in phrases:
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    wscore = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    by_phrase = defaultdict(list)
    for _d, _g, ws in phrases:
        by_phrase[" ".join(ws)].append(sum(wscore[w] for w in ws))
    scored = sorted(((-max(ss), p, len(ss)) for p, ss in by_phrase.items()))
    want = [(p, n, -negs) for negs, p, n in scored[:RAKE_TOP_K]]
    got = [(r["phrase"], r["n_occurrences"], r["score_micro"])
           for r in text_rake_keywords(spark, SF).collect()]
    assert got == want
    assert len(got) == RAKE_TOP_K
