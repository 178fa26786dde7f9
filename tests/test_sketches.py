"""HLL distinct-count sketch: register-state bounds, estimate accuracy
on real data, and exactness of the integer harmonic-sum construction."""

import math

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.operators.sketches import (
    _HLL_ALPHA,
    _HLL_M,
    events_hll_distinct,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_hll_report_shape_and_accuracy(spark):
    rows = events_hll_distinct(spark, SF).collect()
    types = {r["event_type"] for r in rows}
    ev = load_table(spark, SF, "events")
    assert types == {r[0] for r in ev.select("event_type").distinct().collect()}
    for r in rows:
        assert 0 <= r["n_zero_registers"] <= _HLL_M
        assert r["hll_estimate"] > 0
        # raw-HLL standard error is 1.04/sqrt(m) ≈ 6.5%; allow 5σ plus
        # the documented small-range bias (no linear-counting correction)
        rel = abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 0.40, (r["event_type"], rel)
        assert r["err_micro"] == math.floor(
            abs(r["hll_estimate"] - float(r["n_exact"]))
            * 1000000.0 / float(r["n_exact"]))


def test_hll_registers_are_partial_aggregatable(spark):
    """The sketch state must be identical whether built from the whole
    table or merged from per-half sketches (max is associative) — the
    property that makes the shuffle O(m) per group."""
    ev = load_table(spark, SF, "events").select("event_type", "user_id")
    hh = F.expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT)")

    def regs(df):
        return {(r["event_type"], r["bucket"]): r["reg"]
                for r in (df.select("event_type", hh.alias("hh"))
                          .select("event_type",
                                  (F.col("hh") % _HLL_M).alias("bucket"),
                                  F.expr("CASE WHEN (hh >> 8) = 0 THEN 53"
                                         " ELSE 53 - length(bin(hh >> 8)) END")
                                  .alias("r"))
                          .groupBy("event_type", "bucket")
                          .agg(F.max("r").alias("reg")).collect())}

    whole = regs(ev)
    lo = regs(ev.filter(F.col("user_id") % 2 == 0))
    hi = regs(ev.filter(F.col("user_id") % 2 == 1))
    merged: dict = {}
    for part in (lo, hi):
        for k, v in part.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == whole


def test_hll_alpha_constant():
    # the documented alpha_m for m=256 (Flajolet et al. 2007)
    assert abs(_HLL_ALPHA - 0.7213 / (1 + 1.079 / 256)) < 1e-15


def test_cms_never_underestimates_and_is_tight(spark):
    """CMS structural invariant: estimate ≥ exact always; and with
    d=4 rows of w=1024 cells the expected overestimate is ≤ e/w of the
    total occurrence mass per row-min — tiny for this corpus."""
    from demo_cdc_users_airline_spark.operators.sketches import (
        _CMS_TOPK,
        corpus_token_cms_topk,
    )

    rows = corpus_token_cms_topk(spark, SF).collect()
    assert len(rows) == _CMS_TOPK
    mass = sum(r["n_exact"] for r in rows)  # lower bound on total mass
    for r in rows:
        assert r["cms_estimate"] >= r["n_exact"]
        assert r["overestimate"] == r["cms_estimate"] - r["n_exact"]
    # the selected rows are genuinely the exact top-k: no token outside
    # the selection has a higher exact count than the selection minimum
    from demo_cdc_users_airline_spark.operators.text import tokens as _tokens
    from pyspark.sql import functions as F
    d = load_table(spark, SF, "documents")
    full = (d.select(F.explode(_tokens("text")).alias("w"))
            .filter(F.length("w") > 0)
            .groupBy("w").agg(F.count(F.lit(1)).alias("n")))
    kth = min(r["n_exact"] for r in rows)
    selected = {r["token"] for r in rows}
    better = full.filter((F.col("n") > kth) & ~F.col("w").isin(selected))
    assert better.count() == 0
    assert mass > 0


def test_quantile_sketch_within_one_bin(spark):
    """Histogram estimate must land within one bin width of the exact
    order statistic (the sketch's structural error bound), for every
    type and every percentile."""
    from demo_cdc_users_airline_spark.operators.sketches import (
        _QS_BINS,
        events_value_quantile_sketch,
    )
    from demo_cdc_users_airline_spark.sources.loader import load_table as lt

    rows = events_value_quantile_sketch(spark, SF).collect()
    vals = [r["value"] for r in lt(spark, SF, "events")
            .select("value").collect() if r["value"] is not None]
    width = (max(vals) - min(vals)) / _QS_BINS
    assert rows
    for r in rows:
        for p in ("p50", "p90", "p99"):
            assert abs(r[p] - r[f"{p}_est"]) <= width, (r["event_type"], p)
        assert r["p50"] <= r["p90"] <= r["p99"]
