"""Semantics tests for the round-6 third wave: edit-distance candidate
verification, PMI collocation mining, cumulative-distinct-user growth,
the shuffle-key skew report, the Z-order layout report, the mergeable
partial-aggregate rollup, TPC-H Q3 shipping priority, windowless
percent_rank normalization, cosine range search, and the bigram
next-word argmax table.

Each test replays the operator's exact integer contract in plain
Python — the same proof style the oracle gate applies cross-engine.
"""

import math
from collections import Counter, defaultdict
from datetime import datetime

from demo_cdc_users_airline_spark.operators.dedup import (
    dedup_edit_distance,
    dedup_simhash_pairs,
)
from demo_cdc_users_airline_spark.operators.importance import (
    PMI_MIN_COUNT,
    PMI_TOP_K,
    corpus_pmi_collocations,
)
from demo_cdc_users_airline_spark.operators.profiling import (
    SKEW_TOP_K,
    _Z_BITS,
    _Z_BUCKET_SHIFT,
    events_agg_state_rollup,
    events_key_skew_report,
    orders_zorder_layout,
)
from demo_cdc_users_airline_spark.operators.temporal import (
    events_cumulative_users,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_matches_python_replay(spark):
    pairs = {(r["doc1"], r["doc2"])
             for r in dedup_simhash_pairs(spark, SF).collect()}
    assert pairs, "fixture should produce simhash near-dup pairs"
    txt = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    got = {(r["doc1"], r["doc2"]): (r["edit_dist"], r["max_len"],
                                    r["sim_micro"])
           for r in dedup_edit_distance(spark, SF).collect()}
    assert set(got) == pairs
    for (d1, d2), (ed, ml, sm) in got.items():
        want_ed = _levenshtein(txt[d1], txt[d2])
        want_ml = max(len(txt[d1]), len(txt[d2]))
        assert ed == want_ed, f"pair ({d1},{d2}): {ed} != {want_ed}"
        assert ml == want_ml
        assert sm == math.floor(1_000_000.0 * (1.0 - ed / ml))
        assert 0 <= sm <= 1_000_000


def test_pmi_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    big = Counter()
    for r in docs:
        t = r["text"].strip().lower().split()
        big.update(zip(t, t[1:]))
    left = Counter()
    right = Counter()
    for (w1, w2), c in big.items():
        left[w1] += c
        right[w2] += c
    total = sum(big.values())
    scored = []
    for (w1, w2), c in big.items():
        if c < PMI_MIN_COUNT:
            continue
        pmi = math.floor(1_000_000.0 * math.log(
            (float(c) * float(total)) / (float(left[w1]) * float(right[w2]))))
        scored.append((-pmi, w1, w2, c))
    scored.sort()
    want = scored[:PMI_TOP_K]
    rows = corpus_pmi_collocations(spark, SF).collect()
    assert len(rows) == len(want)
    got = sorted((-r["pmi_micro"], r["w1"], r["w2"], r["pair_count"])
                 for r in rows)
    assert got == want
    for r in rows:
        assert r["left_count"] == left[r["w1"]]
        assert r["right_count"] == right[r["w2"]]


def test_cumulative_users_matches_python_replay(spark):
    e = load_table(spark, SF, "events").select("user_id", "ts").collect()
    day_users = defaultdict(set)
    first = {}
    for r in e:
        d = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        day_users[d].add(r["user_id"])
        if r["user_id"] not in first or d < first[r["user_id"]]:
            first[r["user_id"]] = d
    new = Counter(first.values())
    days = sorted(day_users)
    cum = 0
    want = {}
    for d in days:
        cum += new.get(d, 0)
        want[d] = (len(day_users[d]), new.get(d, 0), cum)
    got = {r["day"]: (r["active_users"], r["new_users"], r["cum_users"])
           for r in events_cumulative_users(spark, SF).collect()}
    assert got == want
    # the final cumulative count IS the total distinct-user count
    assert got[days[-1]][2] == len(first)


def test_key_skew_report_matches_python_replay(spark):
    e = load_table(spark, SF, "events").select("user_id").collect()
    cnt = Counter(r["user_id"] for r in e)
    total = sum(cnt.values())
    n_keys = len(cnt)
    mx = max(cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:SKEW_TOP_K]
    rows = sorted(events_key_skew_report(spark, SF).collect(),
                  key=lambda r: r["rnk"])
    assert len(rows) == min(SKEW_TOP_K, n_keys)
    for i, r in enumerate(rows):
        u, c = top[i]
        assert (r["rnk"], r["user_id"], r["cnt"]) == (i + 1, u, c)
        assert r["share_micro"] == c * 1_000_000 // total
        assert (r["total_rows"], r["n_keys"], r["max_key_rows"]) == \
            (total, n_keys, mx)
        assert r["skew_factor_micro"] == \
            mx * 1_000_000 // max(total // n_keys, 1)


def _interleave(x: int, y: int) -> int:
    z = 0
    for i in range(_Z_BITS):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_layout_matches_python_replay(spark):
    o = load_table(spark, SF, "orders") \
        .select("o_custkey", "o_orderdate").collect()
    epoch = datetime(1970, 1, 1)
    buckets = defaultdict(list)
    for r in o:
        x = r["o_custkey"] % (1 << _Z_BITS)
        y = (r["o_orderdate"] - epoch).days % (1 << _Z_BITS)
        buckets[_interleave(x, y) >> _Z_BUCKET_SHIFT].append((x, y))
    rows = orders_zorder_layout(spark, SF).collect()
    assert {r["zbucket"] for r in rows} == set(buckets)
    for r in rows:
        pts = buckets[r["zbucket"]]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert r["n_rows"] == len(pts)
        assert (r["x_min"], r["x_max"]) == (min(xs), max(xs))
        assert (r["y_min"], r["y_max"]) == (min(ys), max(ys))
        assert r["x_span"] == max(xs) - min(xs)
        assert r["y_span"] == max(ys) - min(ys)
    # the layout claim: every bucket's envelope is a bounded rectangle,
    # strictly tighter than the full-range envelope a 1-D sort leaves
    # on its secondary column (x_span covers at most half the x domain
    # whenever the bucket splits on a high x bit)
    assert all(r["x_span"] <= (1 << _Z_BITS) and r["y_span"] <= (1 << _Z_BITS)
               for r in rows)


def test_agg_state_rollup_merges_exactly(spark):
    from decimal import ROUND_HALF_UP, Decimal

    e = load_table(spark, SF, "events") \
        .select("user_id", "ts", "event_type", "value").collect()
    st = defaultdict(lambda: [0, Decimal(0), None, None, set()])
    for r in e:
        d = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        s = st[(r["user_id"], d)]
        s[0] += 1
        # Spark's double→DECIMAL(38,6) cast is HALF_UP over the exact
        # binary value — Decimal(float) reproduces it bit-for-bit
        s[1] += Decimal(r["value"]).quantize(Decimal("0.000001"),
                                             rounding=ROUND_HALF_UP)
        s[2] = r["ts"] if s[2] is None else min(s[2], r["ts"])
        s[3] = r["ts"] if s[3] is None else max(s[3], r["ts"])
        s[4].add(r["event_type"])
    per_user = defaultdict(lambda: [0, Decimal(0), None, None, 0, 0])
    for (u, _d), (n, v, mn, mx, types) in st.items():
        p = per_user[u]
        p[0] += n
        p[1] += v
        p[2] = mn if p[2] is None else min(p[2], mn)
        p[3] = mx if p[3] is None else max(p[3], mx)
        p[4] += 1
        p[5] = max(p[5], len(types))
    rows = events_agg_state_rollup(spark, SF).collect()
    assert len(rows) == len(per_user)
    for r in rows:
        n, v, mn, mx, days, mdt = per_user[r["user_id"]]
        assert r["n_events"] == n
        assert r["total_value"] == float(v)
        assert (r["first_ts"], r["last_ts"]) == (mn, mx)
        assert r["n_active_days"] == days
        assert r["max_daily_types"] == mdt


def test_shipping_priority_matches_python_replay(spark):
    from decimal import ROUND_HALF_UP, Decimal

    cutoff = datetime(1996, 1, 1)
    seg = {r["c_custkey"]
           for r in spark.read.parquet(f"{SF}/customer.parquet")
           .filter("c_mktsegment = 'BUILDING'").collect()}
    orders = {r["o_orderkey"]: r
              for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
              if r["o_custkey"] in seg and r["o_orderdate"] < cutoff}
    rev = defaultdict(Decimal)
    for r in load_table(spark, SF, "lineitem").collect():
        if r["l_orderkey"] in orders and r["l_shipdate"] > cutoff:
            rev[r["l_orderkey"]] += Decimal(
                r["l_extendedprice"] * (1 - r["l_discount"])
            ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    want = sorted(
        ((float(v), k, orders[k]["o_orderdate"],
          orders[k]["o_orderpriority"]) for k, v in rev.items()),
        key=lambda t: (-t[0], t[2], t[1]))[:10]
    rows = [(r["revenue"], r["l_orderkey"], r["o_orderdate"],
             r["o_orderpriority"])
            for r in __import__(
                "demo_cdc_users_airline_spark.plans.analytics",
                fromlist=["shipping_priority_topk"])
            .shipping_priority_topk(spark, SF).collect()]
    assert rows == [(v, k, d, p) for v, k, d, p in want]


def test_quality_percentile_matches_python_replay(spark):
    from demo_cdc_users_airline_spark.operators.text import (
        corpus_quality_percentile,
        text_quality_score,
    )

    base = [(r["doc_id"], r["lang"], r["quality_score"])
            for r in text_quality_score(spark, SF).collect()]
    by_lang = defaultdict(list)
    for _d, lang, s in base:
        by_lang[lang].append(s)
    got = {r["doc_id"]: (r["lang"], r["quality_score"], r["pct_rank"],
                         r["decile"]) for r in
           corpus_quality_percentile(spark, SF).collect()}
    assert len(got) == len(base)
    for d, lang, s in base:
        scores = by_lang[lang]
        lesser = sum(1 for x in scores if x < s)
        n = len(scores)
        pct = lesser / (n - 1) if n > 1 else 0.0
        want_dec = min(int(math.floor(10.0 * pct)), 9)
        gl, gs, gp, gd = got[d]
        assert (gl, gs) == (lang, s)
        assert gp == pct
        assert gd == want_dec
    # percentiles actually spread (several deciles occupied)
    assert len({v[3] for v in got.values()}) >= 2


def test_range_search_matches_brute_force(spark):
    import numpy as np

    from demo_cdc_users_airline_spark.operators.similarity import (
        RANGE_TAU,
        similarity_range_search,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in rows}
    want = set()
    for q in (v for v in vecs if v < 8):
        for n, vn in vecs.items():
            if n == q:
                continue
            c = float(vecs[q] @ vn / (math.sqrt(vecs[q] @ vecs[q])
                                      * math.sqrt(vn @ vn)))
            if c >= RANGE_TAU:
                want.add((q, n))
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"]
           for r in similarity_range_search(spark, SF).collect()}
    assert set(got) == want
    assert all(c >= RANGE_TAU for c in got.values())
    assert want, "tau should admit at least one neighbor at sf0.001"


def test_bigram_next_word_matches_python_replay(spark):
    from demo_cdc_users_airline_spark.operators.importance import (
        corpus_bigram_next_word,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    big = Counter()
    for r in docs:
        t = r["text"].strip().lower().split()
        big.update(zip(t, t[1:]))
    left = defaultdict(int)
    for (w1, _w2), c in big.items():
        left[w1] += c
    best = {}
    for (w1, w2), c in big.items():
        cur = best.get(w1)
        if cur is None or (-c, w2) < (-cur[1], cur[0]):
            best[w1] = (w2, c)
    rows = corpus_bigram_next_word(spark, SF).collect()
    assert {r["w1"] for r in rows} == set(best)
    for r in rows:
        w2, c = best[r["w1"]]
        assert (r["next_word"], r["pair_count"]) == (w2, c)
        assert r["left_count"] == left[r["w1"]]
        assert r["prob_micro"] == c * 1_000_000 // left[r["w1"]]
