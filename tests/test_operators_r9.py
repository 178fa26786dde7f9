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
