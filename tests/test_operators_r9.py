"""Exact-replay test for the r9 TPC-H addition: the Q2-shape
minimum-cost supplier (correlated scalar subquery decorrelated to an
ordered-struct argmin on the fact's own key)."""

from decimal import Decimal

from demo_cdc_users_airline_spark.plans.analytics import (
    part_min_cost_supplier,
)

SF = "/root/testdata/sf0.001"


def test_q2_shape_matches_python_replay(spark):
    nations = {r["n_nationkey"]: r for r in
               spark.read.parquet(f"{SF}/nation.parquet").collect()}
    europe = {r["r_regionkey"] for r in
              spark.read.parquet(f"{SF}/region.parquet").collect()
              if r["r_name"] == "EUROPE"}
    supp = {r["s_suppkey"]: r for r in
            spark.read.parquet(f"{SF}/supplier.parquet").collect()
            if nations[r["s_nationkey"]]["n_regionkey"] in europe}
    parts = {r["p_partkey"]: r for r in
             spark.read.parquet(f"{SF}/part.parquet").collect()
             if r["p_size"] == 15}

    # the correlated subquery, replayed literally: per part, scan every
    # eligible offer and keep min (cost, suppkey)
    best: dict = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if r["l_partkey"] not in parts or r["l_suppkey"] not in supp:
            continue
        cost = Decimal(str(
            r["l_extendedprice"] * (1 - r["l_discount"]))).quantize(
                Decimal("0.000001"))
        key = (cost, r["l_suppkey"])
        if r["l_partkey"] not in best or key < best[r["l_partkey"]]:
            best[r["l_partkey"]] = key

    got = part_min_cost_supplier(spark, SF).collect()
    assert len(got) == min(100, len(best))
    order = [(r["min_cost"], r["p_partkey"]) for r in got]
    assert order == sorted(order)  # total order (min_cost, p_partkey)
    for r in got:
        cost, sk = best[r["p_partkey"]]
        assert r["min_cost"] == float(cost)
        assert r["supplier_name"] == supp[sk]["s_name"]
        assert r["acctbal"] == supp[sk]["s_acctbal"]
        assert r["nation"] == nations[supp[sk]["s_nationkey"]]["n_name"]
        assert r["p_name"] == parts[r["p_partkey"]]["p_name"]


def test_q2_shape_single_fact_scan_and_pushdown(spark):
    # the decorrelation must not scan the fact twice (the join-back
    # form does); the dim filters must reach their scans
    plan = part_min_cost_supplier(spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1, plan
    assert "EqualTo(p_size,15)" in plan
    assert "EqualTo(r_name,EUROPE)" in plan


def test_q15_matches_python_replay_and_emits_ties(spark):
    import datetime

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 4, 1)
    from collections import defaultdict

    from demo_cdc_users_airline_spark.plans.analytics import (
        top_supplier_by_revenue,
    )

    rev = defaultdict(Decimal)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if lo <= r["l_shipdate"] < hi:
            rev[r["l_suppkey"]] += Decimal(str(
                r["l_extendedprice"] * (1 - r["l_discount"]))).quantize(
                    Decimal("0.000001"))
    mx = max(rev.values())
    want = sorted(k for k, v in rev.items() if v == mx)

    got = top_supplier_by_revenue(spark, SF).collect()
    assert [r["s_suppkey"] for r in got] == want  # every tie, in order
    assert all(r["total_revenue"] == float(mx) for r in got)


def test_q17_matches_python_replay(spark):
    from collections import defaultdict

    from demo_cdc_users_airline_spark.plans.analytics import (
        small_quantity_order_revenue,
    )

    brand = {r["p_partkey"] for r in
             spark.read.parquet(f"{SF}/part.parquet").collect()
             if r["p_brand"] == "Brand#13"}
    qsum = defaultdict(Decimal)
    qcnt = defaultdict(int)
    lines = [r for r in
             spark.read.parquet(f"{SF}/lineitem.parquet").collect()
             if r["l_partkey"] in brand]
    for r in lines:
        qsum[r["l_partkey"]] += Decimal(str(r["l_quantity"])).quantize(
            Decimal("0.000001"))
        qcnt[r["l_partkey"]] += 1
    tot, n = Decimal(0), 0
    for r in lines:
        thr = 0.2 * (float(qsum[r["l_partkey"]]) / qcnt[r["l_partkey"]])
        if r["l_quantity"] < thr:
            tot += Decimal(str(r["l_extendedprice"])).quantize(
                Decimal("0.000001"))
            n += 1
    got = small_quantity_order_revenue(spark, SF).collect()
    assert len(got) == 1
    assert got[0]["n_small_lines"] == n
    assert got[0]["avg_yearly"] == float(tot) / 7.0


def test_q19_shape_pushes_disjunction_conjuncts_to_both_scans(spark):
    from demo_cdc_users_airline_spark.plans.analytics import (
        discounted_brand_revenue,
    )

    plan = discounted_brand_revenue(spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    li_scan = [seg for seg in plan.split("FileScan parquet")
               if "lineitem.parquet" in seg][0]
    p_scan = [seg for seg in plan.split("FileScan parquet")
              if "part.parquet" in seg][0]
    # each scan receives its own side's derivable disjunction (the
    # toString view truncates long filter lists, so match the prefix)
    assert "LessThanOrEqual(l_quantity" in li_scan
    assert "Or(Or(And(EqualTo(p_brand" in p_scan


def test_q11_shape_matches_python_replay(spark):
    from collections import defaultdict

    from demo_cdc_users_airline_spark.plans.analytics import (
        important_part_value,
    )

    pv = defaultdict(Decimal)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        pv[r["l_partkey"]] += Decimal(str(r["l_extendedprice"])).quantize(
            Decimal("0.000001"))
    total, n = sum(pv.values()), len(pv)
    want = sorted(((v, k) for k, v in pv.items()
                   if v * 2 * n > 3 * total),
                  key=lambda t: (-t[0], t[1]))

    got = important_part_value(spark, SF).collect()
    assert [(r["p_partkey"]) for r in got] == [k for _, k in want]
    assert [r["total_value"] for r in got] == [float(v) for v, _ in want]
    assert len(got) > 0  # the threshold must select rows at gate SF


def test_q21_shape_matches_python_replay(spark):
    from collections import defaultdict

    from demo_cdc_users_airline_spark.plans.analytics import (
        sole_returner_suppliers,
    )

    by_order = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        by_order[r["l_orderkey"]].append(
            (r["l_suppkey"], r["l_returnflag"]))
    sname = {r["s_suppkey"]: r["s_name"] for r in
             spark.read.parquet(f"{SF}/supplier.parquet").collect()}
    counts = defaultdict(set)
    for ok, lines in by_order.items():
        for sk, rf in lines:
            if rf != "R":
                continue
            others = [(s, r) for s, r in lines if s != sk]
            if others and not any(r == "R" for _, r in others):
                counts[sname[sk]].add(ok)
    want = sorted(((len(v), k) for k, v in counts.items()),
                  key=lambda t: (-t[0], t[1]))[:10]

    got = sole_returner_suppliers(spark, SF).collect()
    assert [(r["n_orders"], r["s_name"]) for r in got] == want


def test_q22_shape_matches_python_replay(spark):
    import datetime
    from collections import defaultdict

    from demo_cdc_users_airline_spark.plans.analytics import (
        dormant_valuable_customers,
    )

    custs = spark.read.parquet(f"{SF}/customer.parquet").collect()
    pos = [Decimal(str(r["c_acctbal"])).quantize(Decimal("0.000001"))
           for r in custs if r["c_acctbal"] > 0.0]
    threshold = float(sum(pos)) / len(pos)
    cutoff = datetime.datetime(2000, 1, 1)
    recent = {r["o_custkey"] for r in
              spark.read.parquet(f"{SF}/orders.parquet").collect()
              if r["o_orderdate"] >= cutoff}
    nname = {r["n_nationkey"]: r["n_name"] for r in
             spark.read.parquet(f"{SF}/nation.parquet").collect()}
    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in custs:
        if r["c_acctbal"] > threshold and r["c_custkey"] not in recent:
            a = agg[nname[r["c_nationkey"]]]
            a[0] += 1
            a[1] += Decimal(str(r["c_acctbal"])).quantize(
                Decimal("0.000001"))

    got = dormant_valuable_customers(spark, SF).collect()
    assert len(got) > 0
    assert {r["nation"]: (r["n_custs"], r["total_acctbal"])
            for r in got} == {k: (c, float(s))
                              for k, (c, s) in agg.items()}
    assert [r["nation"] for r in got] == sorted(agg)


def test_q20_shape_matches_python_replay(spark):
    import datetime
    from collections import defaultdict

    from demo_cdc_users_airline_spark.plans.analytics import (
        dominant_part_suppliers,
    )

    promo = {r["p_partkey"] for r in
             spark.read.parquet(f"{SF}/part.parquet").collect()
             if r["p_type"] == "PROMO"}
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    ps = defaultdict(Decimal)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if lo <= r["l_shipdate"] < hi and r["l_partkey"] in promo:
            ps[(r["l_partkey"], r["l_suppkey"])] += Decimal(
                str(r["l_quantity"])).quantize(Decimal("0.000001"))
    pt = defaultdict(Decimal)
    for (pk, _), q in ps.items():
        pt[pk] += q
    dominant = sorted({sk for (pk, sk), q in ps.items()
                       if q * 2 > pt[pk]})

    got = dominant_part_suppliers(spark, SF).collect()
    assert [r["s_suppkey"] for r in got] == dominant
    assert len(got) > 0
