"""Exact-replay tests for the late-r8 TPC-H additions: Q10
(returned-item revenue top-k) and the Q4-shape semi-join priority
counts."""

import datetime
from collections import defaultdict
from decimal import Decimal

from demo_cdc_users_airline_spark.plans.analytics import (
    orders_with_returns_by_priority,
    returned_item_revenue_topk,
)

SF = "/root/testdata/sf0.001"

Q_START = datetime.datetime(1996, 1, 1)
Q_END = datetime.datetime(1996, 4, 1)
Y_END = datetime.datetime(1997, 1, 1)


def test_q10_matches_python_replay(spark):
    orders = {r["o_orderkey"]: r for r in
              spark.read.parquet(f"{SF}/orders.parquet").collect()
              if Q_START <= r["o_orderdate"] < Q_END}
    cust = {r["c_custkey"]: r for r in
            spark.read.parquet(f"{SF}/customer.parquet").collect()}
    nation = {r["n_nationkey"]: r["n_name"] for r in
              spark.read.parquet(f"{SF}/nation.parquet").collect()}
    rev = defaultdict(Decimal)
    n_items = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        o = orders.get(r["l_orderkey"])
        if o is None or r["l_returnflag"] != "R":
            continue
        rev[o["o_custkey"]] += Decimal(str(
            r["l_extendedprice"] * (1 - r["l_discount"]))).quantize(
                Decimal("0.000001"))
        n_items[o["o_custkey"]] += 1

    got = returned_item_revenue_topk(spark, SF).collect()
    assert len(got) == min(20, len(rev))
    keys = [(-r["revenue"], r["c_custkey"]) for r in got]
    assert keys == sorted(keys)  # total order (revenue DESC, custkey)
    for r in got:
        assert r["revenue"] == float(rev[r["c_custkey"]])
        assert r["n_returned_items"] == n_items[r["c_custkey"]]
        assert r["c_name"] == cust[r["c_custkey"]]["c_name"]
        assert r["acctbal"] == cust[r["c_custkey"]]["c_acctbal"]
        assert r["nation"] == nation[cust[r["c_custkey"]]["c_nationkey"]]


def test_q4_shape_matches_python_replay(spark):
    returned = {r["l_orderkey"] for r in
                spark.read.parquet(f"{SF}/lineitem.parquet").collect()
                if r["l_returnflag"] == "R"}
    want = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        if Q_START <= r["o_orderdate"] < Y_END \
                and r["o_orderkey"] in returned:
            want[r["o_orderpriority"]] += 1

    got = orders_with_returns_by_priority(spark, SF).collect()
    assert {r["priority"]: r["n_orders"] for r in got} == dict(want)
    # an order with MANY returned lines still counts once (semi join)
    assert [r["priority"] for r in got] == sorted(want)


def test_q14_matches_python_replay(spark):
    from decimal import Decimal

    ptype = {r["p_partkey"]: r["p_type"] for r in
             spark.read.parquet(f"{SF}/part.parquet").collect()}
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 7, 1)
    promo = total = Decimal(0)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if not (lo <= r["l_shipdate"] < hi):
            continue
        rev = Decimal(str(
            r["l_extendedprice"] * (1 - r["l_discount"]))).quantize(
                Decimal("0.000001"))
        total += rev
        if ptype[r["l_partkey"]] == "PROMO":
            promo += rev

    from demo_cdc_users_airline_spark.plans.analytics import (
        promo_revenue_share,
    )

    got = promo_revenue_share(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    assert r["promo_revenue"] == float(promo)
    assert r["total_revenue"] == float(total)
    assert r["promo_pct"] == 100.0 * float(promo) / float(total)
    assert 0.0 < r["promo_pct"] < 100.0


def test_q6_matches_python_replay_and_pushes_filters(spark):
    import contextlib
    import io

    from decimal import Decimal

    from demo_cdc_users_airline_spark.plans.analytics import (
        forecast_revenue_change,
    )

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    delta = Decimal(0)
    n = 0
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if (lo <= r["l_shipdate"] < hi
                and 0.05 <= r["l_discount"] <= 0.07
                and r["l_quantity"] < 24):
            delta += Decimal(str(
                r["l_extendedprice"] * r["l_discount"])).quantize(
                    Decimal("0.000001"))
            n += 1

    got = forecast_revenue_change(spark, SF).collect()
    assert len(got) == 1
    assert got[0]["revenue_delta"] == float(delta)
    assert got[0]["n_lineitems"] == n

    # every predicate must reach the parquet scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        forecast_revenue_change(spark, SF).explain("formatted")
    pushed = buf.getvalue().split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, pushed
