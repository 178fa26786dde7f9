"""Round-7 regression tests: graph local-finish/distributed parity
(the VERDICT r6 plan fix — per-round localCheckpoint + CC-style driver
local finish must be bit-identical to the distributed rounds), the
classifier's O(const) labeled-set bound, and the funnel's division
zero-guard (ADVICE r6).
"""

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.classifier import (
    QC_MOD,
    QC_TRAIN_CAP,
)
from demo_cdc_users_airline_spark.operators.graph import (
    _pagerank_local,
    _triangles_local,
    dedup_graph_pagerank,
    dedup_graph_triangles,
)

SF = "/root/testdata/sf0.001"


def test_pagerank_local_vs_distributed_parity(spark):
    """The driver local finish and the checkpointed distributed rounds
    must produce bit-identical ranks on the same graph (the CC parity
    contract, extended to PageRank)."""
    local = {r["doc_id"]: (r["degree"], r["pagerank_micro"], r["pagerank"])
             for r in dedup_graph_pagerank(spark, SF).collect()}
    dist = {r["doc_id"]: (r["degree"], r["pagerank_micro"], r["pagerank"])
            for r in dedup_graph_pagerank(
                spark, SF, local_finish_max_edges=0).collect()}
    assert local, "fixture should produce a non-empty near-dup graph"
    assert local == dist


def test_triangles_local_vs_distributed_parity(spark):
    local = dedup_graph_triangles(spark, SF).collect()[0].asDict()
    dist = dedup_graph_triangles(
        spark, SF, local_finish_max_edges=0).collect()[0].asDict()
    assert local == dist
    assert local["n_edges"] > 0


def test_pagerank_local_finish_plan_is_flat(spark):
    """The default (local-finish) path must not grow a per-round plan:
    no Exchange at all — the result is a driver-built local relation."""
    df = dedup_graph_pagerank(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_triangles_local_replay_on_doctored_graph():
    """Known-answer census: K4 plus a pendant vertex — 4 triangles,
    every wedge formula term checked by hand."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    n_nodes, n_edges, n_wedges, n_tri, cc = _triangles_local(k4)
    assert (n_nodes, n_edges, n_tri) == (5, 7, 4)
    # degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 1
    assert n_wedges == 3 * 3 + 6 + 0
    assert cc == (3 * 4 * 1_000_000) // n_wedges


def test_pagerank_local_replay_star_graph():
    """Hand-checkable star: the hub collects every leaf's full rank
    share, leaves split the hub's. One round from uniform start."""
    edges = [(1, 2), (1, 3), (1, 4)]
    rows = {n: (d, pr) for n, d, pr in _pagerank_local(edges)}
    assert rows[1][0] == 3 and rows[2][0] == 1
    # round-by-round replay for 6 rounds in plain ints
    pr = {n: 1_000_000 for n in (1, 2, 3, 4)}
    deg = {1: 3, 2: 1, 3: 1, 4: 1}
    for _ in range(6):
        nxt = {n: 0 for n in pr}
        for u, vs in {1: [2, 3, 4], 2: [1], 3: [1], 4: [1]}.items():
            c = pr[u] // deg[u]
            for v in vs:
                nxt[v] += c
        pr = {n: 150_000 + (85 * s) // 100 for n, s in nxt.items()}
    for n in pr:
        assert rows[n][1] == pr[n]


def test_classifier_labeled_set_is_bounded():
    """The labeled-subset predicate admits at most 512 docs no matter
    how large the id space grows (the VERDICT r6 driver-killer fix)."""
    huge_corpus = range(0, QC_TRAIN_CAP * 1000, QC_MOD)
    labeled = [i for i in huge_corpus if i < QC_TRAIN_CAP]
    assert len(labeled) == 512
    # and the cap is a no-op at gate SFs (all testdata ids are tiny)
    assert QC_TRAIN_CAP > 5000


def test_funnel_retention_null_guard(spark):
    """A zero denominator must yield NULL (not Inf/NaN) so the Spark
    and DuckDB engines agree on degenerate corpora (ADVICE r6)."""
    row = (spark.createDataFrame([(5, 0, 0)], "n_in long, n_out long, z long")
           .select((F.col("n_out").cast("double")
                    / F.nullif(F.col("z"), F.lit(0)).cast("double"))
                   .alias("retention")).collect()[0])
    assert row["retention"] is None


# ---------------------------------------------------------------------------
# round-7 operator wave: exact replays / cross-query consistency
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_python_replay(spark):
    import hashlib
    import re

    from demo_cdc_users_airline_spark.operators.dedup import (
        _P,
        corpus_ngram_novelty,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    first: dict = {}
    per_doc: dict = {}
    hashed = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        toks = re.split(r"\s+", r["text"].strip().lower())
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)} \
            if len(toks) >= 3 else set()
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _P
              for s in sh]
        hashed[r["doc_id"]] = hs
        for h in hs:
            first.setdefault(h, r["doc_id"])
    for d, hs in hashed.items():
        n = len(hs)
        novel = sum(1 for h in hs if first[h] == d)
        per_doc[d] = (n, novel,
                      (novel * 1_000_000) // n if n else None)
    got = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_micro"])
           for r in corpus_ngram_novelty(spark, SF).collect()}
    assert got == per_doc
    # the FIRST document's shingles are all novel by definition
    d0 = min(d for d, (n, _, _) in per_doc.items() if n)
    assert got[d0][0] == got[d0][1]


def test_ivf_cell_balance_consistent_with_kmeans(spark):
    from demo_cdc_users_airline_spark.operators.kmeans_ivf import (
        similarity_ivf_cell_balance,
        similarity_kmeans_ivf,
    )

    cells = {r["cell"]: r["n_vectors"]
             for r in similarity_kmeans_ivf(spark, SF).collect()}
    row = similarity_ivf_cell_balance(spark, SF).collect()[0]
    ns = list(cells.values())
    total = sum(ns)
    assert row["n_cells"] == len(ns)
    assert row["n_vectors"] == total
    assert row["max_cell"] == max(ns)
    assert row["min_cell"] == min(ns)
    assert row["imbalance_micro"] == max(ns) * len(ns) * 1_000_000 // total
    assert row["expected_scan_ppm"] == \
        sum(n * n for n in ns) * 1_000_000 // (total * total)
    # sanity: a perfectly balanced index would score exactly 1e6 / k
    assert row["imbalance_micro"] >= 1_000_000


def test_large_volume_topk_matches_python_replay(spark):
    from collections import defaultdict
    from decimal import Decimal

    from demo_cdc_users_airline_spark.plans.analytics import (
        orders_large_volume_topk,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_quantity").collect()
    sums = defaultdict(Decimal)
    for r in li:
        sums[r["l_orderkey"]] += Decimal(str(r["l_quantity"]))
    big = {k: float(v) for k, v in sums.items() if v > 300}
    got = orders_large_volume_topk(spark, SF).collect()
    assert {r["o_orderkey"] for r in got} <= set(big)
    assert len(got) == min(100, len(big))
    # ordered by total_qty DESC with orderkey tiebreak; qty matches
    keys = [(-r["total_qty"], r["o_orderkey"]) for r in got]
    assert keys == sorted(keys)
    for r in got:
        assert r["total_qty"] == big[r["o_orderkey"]]


def test_anomaly_days_matches_python_replay(spark):
    from collections import Counter, defaultdict

    from demo_cdc_users_airline_spark.plans.analytics import (
        events_user_anomaly_days,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    per_user = defaultdict(Counter)
    for r in ev:
        # parquet nanos -> micros, then day truncation (loader semantics)
        day = r["ts"].date()
        per_user[r["user_id"]][day] += 1
    want = set()
    for u, days in per_user.items():
        cs = sorted(days.values())
        med = cs[(len(cs) + 1) // 2 - 1]
        for d, n in days.items():
            if n > 2 * med:
                want.add((u, d, n, med, len(cs), n * 1_000_000 // med))
    got = {(r["user_id"], r["day"].date(), r["n_events"],
            r["median_daily"], r["n_active_days"], r["lift_micro"])
           for r in events_user_anomaly_days(spark, SF).collect()}
    assert got == want
    assert want, "fixture should contain anomalous days"


def test_budget_selection_is_importance_prefix(spark):
    from demo_cdc_users_airline_spark.operators.importance import (
        BUDGET_DENOM,
        corpus_budget_selection,
        score_dsir_importance,
    )

    scored = sorted(
        ((r["weight_micro"], r["doc_id"], r["n_tokens"], r["lang"])
         for r in score_dsir_importance(spark, SF).collect()),
        key=lambda t: (-t[0], t[1]))
    budget = sum(t[2] for t in scored) // BUDGET_DENOM
    want, cum = [], 0
    for rank, (w, d, n, lang) in enumerate(scored, start=1):
        cum += n
        if cum > budget:
            break
        want.append((d, lang, n, w, rank, cum))
    got = sorted(
        ((r["doc_id"], r["lang"], r["n_tokens"], r["weight_micro"],
          r["sel_rank"], r["cum_tokens"])
         for r in corpus_budget_selection(spark, SF).collect()),
        key=lambda t: t[4])
    assert got == want
    assert want and len(want) < len(scored)  # a real prefix, not everything


def test_q5_revenue_matches_python_replay(spark):
    from collections import defaultdict
    from decimal import Decimal

    from demo_cdc_users_airline_spark.plans.analytics import (
        regional_supplier_revenue,
    )

    base = SF
    nation = {r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
              for r in spark.read.parquet(f"{base}/nation.parquet").collect()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in spark.read.parquet(f"{base}/region.parquet").collect()}
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in spark.read.parquet(f"{base}/customer.parquet").collect()}
    supp = {r["s_suppkey"]: r["s_nationkey"]
            for r in spark.read.parquet(f"{base}/supplier.parquet").collect()}
    orders = {r["o_orderkey"]: (r["o_custkey"], r["o_orderdate"])
              for r in spark.read.parquet(f"{base}/orders.parquet").collect()}
    want = defaultdict(lambda: [Decimal(0), 0])
    import datetime
    lo, hi = datetime.datetime(1995, 1, 1), datetime.datetime(1997, 1, 1)
    for r in spark.read.parquet(f"{base}/lineitem.parquet").collect():
        o = orders.get(r["l_orderkey"])
        if not o or not (lo <= o[1] < hi):
            continue
        cn = cust[o[0]]
        if supp.get(r["l_suppkey"]) != cn:
            continue
        n_name, rk = nation[cn]
        if region[rk] != "ASIA":
            continue
        amt = (Decimal(str(r["l_extendedprice"]))
               * (1 - Decimal(str(r["l_discount"]))))
        want[n_name][0] += amt.quantize(Decimal("0.000001"))
        want[n_name][1] += 1
    got = {r["nation"]: (r["revenue"], r["n_lineitems"])
           for r in regional_supplier_revenue(spark, SF).collect()}
    assert set(got) == set(want)
    for n, (rev, cnt) in want.items():
        assert got[n][1] == cnt
        assert abs(got[n][0] - float(rev)) < 1e-6 * max(1.0, float(rev))


def test_q13_histogram_masses(spark):
    from demo_cdc_users_airline_spark.plans.analytics import (
        orders_per_customer_histogram,
    )

    rows = orders_per_customer_histogram(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    n_cust_with = (spark.read.parquet(f"{SF}/orders.parquet")
                   .select("o_custkey").distinct().count())
    hist = {r["n_orders"]: r["n_customers"] for r in rows}
    assert sum(hist.values()) == n_cust
    assert hist.get(0, 0) == n_cust - n_cust_with  # the zero bucket
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(k * v for k, v in hist.items()) == n_orders


def test_prefix_containment_doctored(spark, tmp_path):
    """A doc, its truncation, an equal copy, and a same-opening
    non-prefix doc: the bucket finds all pairs, the verify separates
    true prefixes from same-head divergers."""
    from demo_cdc_users_airline_spark.operators.dedup import (
        dedup_prefix_containment,
    )

    w = "tok"
    base = " ".join(f"{w}{i}" for i in range(20))
    trunc = " ".join(f"{w}{i}" for i in range(12))
    diverge = " ".join(f"{w}{i}" for i in range(10)) + " OTHER TAIL"
    short = " ".join(f"{w}{i}" for i in range(5))  # < 8 toks: excluded
    rows = [(1, base, "en", "s", len(base)),
            (2, trunc, "en", "s", len(trunc)),
            (3, base, "en", "s", len(base)),       # exact copy
            (4, diverge, "en", "s", len(diverge)),
            (5, short, "en", "s", len(short))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    d = str(tmp_path / "pfx")
    df.write.parquet(f"{d}/documents.parquet")
    got = {(r["doc1"], r["doc2"]): r["is_prefix"]
           for r in dedup_prefix_containment(spark, d).collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1,
                   (1, 4): 0, (2, 4): 0, (3, 4): 0}
