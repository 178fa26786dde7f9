"""As-of join + sessionization invariants."""

from demo_cdc_users_airline_spark.operators.temporal import (
    SESSION_GAP_MICROS,
    events_asof_last_purchase,
    events_sessionization,
)
from demo_cdc_users_airline_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"


def test_asof_semantics(spark):
    rows = events_asof_last_purchase(spark, SF).collect()
    events = load_table(spark, SF, "events").collect()
    n_events = len(events)
    assert len(rows) == n_events               # left semantics: every event kept
    purchases = {(r["user_id"], r["ts"], r["event_id"])
                 for r in events if r["event_type"] == "purchase"}
    by_user_purchases = {}
    for u, ts, eid in purchases:
        by_user_purchases.setdefault(u, []).append((ts, eid))
    for r in rows:
        expect = max(((ts, eid) for ts, eid in by_user_purchases.get(r["user_id"], [])
                      if ts <= r["ts"]), default=None)
        got = (None if r["last_purchase_ts"] is None
               else (r["last_purchase_ts"], r["last_purchase_id"]))
        assert got == expect                   # replay-model equivalence
        if got is not None:
            assert r["micros_since_purchase"] >= 0


def test_asof_partition_independent(spark):
    a = {r["event_id"]: r["last_purchase_id"]
         for r in events_asof_last_purchase(spark, SF).collect()}
    e = load_table(spark, SF, "events")
    # same result regardless of input partitioning (window is keyed)
    from demo_cdc_users_airline_spark.operators import temporal

    withm = temporal.asof_last_marker(
        e.repartition(13).select("event_id", "user_id", "ts", "event_type"),
        key="user_id", time="ts", uid="event_id",
        marker=__import__("pyspark.sql.functions", fromlist=["col"]).col("event_type") == "purchase")
    b = {r["event_id"]: r["__last_marker"]["mid"] if r["__last_marker"] else None
         for r in withm.collect()}
    assert a == b


def test_sessionization_invariants(spark):
    sessions = events_sessionization(spark, SF).collect()
    events = load_table(spark, SF, "events").collect()
    assert sum(r["n_events"] for r in sessions) == len(events)  # partition of events
    by_user = {}
    for s in sessions:
        by_user.setdefault(s["user_id"], []).append(s)
    for u, ss in by_user.items():
        ss.sort(key=lambda s: s["session_seq"])
        for a, b in zip(ss, ss[1:]):
            # consecutive sessions are separated by more than the gap
            delta = (b["session_start"] - a["session_end"]).total_seconds() * 1e6
            assert delta > SESSION_GAP_MICROS
        for s in ss:
            assert s["session_start"] <= s["session_end"]
            assert s["duration_micros"] >= 0


def test_asof_tie_semantics_lexicographic(spark):
    """Same-timestamp ties resolve by the (ts, event_id) lexicographic
    order on BOTH engines: a same-ts purchase is visible to an event only
    if its event_id sorts at-or-before the event's. The testdata has no
    per-user ts ties, so the oracle gate can't pin this — this synthetic
    case cross-checks the Spark window against the DuckDB oracle
    (ADVICE r2)."""
    import datetime as dt

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from demo_cdc_users_airline_spark.operators import temporal

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    t1 = t0 + dt.timedelta(minutes=5)
    rows = [  # (event_id, user_id, ts, event_type)
        (10, 1, t0, "view"),      # tie with purchases 5 (before) and 20 (after)
        (5, 1, t0, "purchase"),
        (20, 1, t0, "purchase"),
        (30, 1, t1, "view"),
    ]
    sdf = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    withm = temporal.asof_last_marker(
        sdf, key="user_id", time="ts", uid="event_id",
        marker=F.col("event_type") == "purchase")
    got = {r["event_id"]: (r["__last_marker"]["mid"]
                           if r["__last_marker"] else None)
           for r in withm.collect()}
    assert got == {10: 5, 5: 5, 20: 20, 30: 20}

    con = duckdb.connect()
    con.register("events", pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type"]))
    oracle = {int(eid): (None if pd.isna(pid) else int(pid))
              for eid, pid in con.execute(
                  temporal.ORACLE["events_asof_last_purchase"]
              ).df()[["event_id", "last_purchase_id"]].itertuples(index=False)}
    assert oracle == got


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def test_funnel_semantics(spark, tmp_path_factory):
    """Doctored event log with known funnel outcomes (strictly-later
    stage matching, per-user earliest qualification)."""
    import datetime as dt

    from demo_cdc_users_airline_spark.operators.temporal import (
        events_funnel_conversion,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    sec = dt.timedelta(seconds=1)
    rows, eid = [], 0

    def ev(user, typ, at):
        nonlocal eid
        eid += 1
        rows.append((eid, at, user, typ, 1.0, "{}"))

    # user 1: full ordered funnel
    for i, typ in enumerate(("signup", "view", "click", "purchase")):
        ev(1, typ, t0 + i * sec)
    # user 2: signup, view, purchase but NO click → stops at view
    ev(2, "signup", t0)
    ev(2, "view", t0 + sec)
    ev(2, "purchase", t0 + 2 * sec)
    # user 3: only view BEFORE signup → signup never converts
    ev(3, "view", t0)
    ev(3, "signup", t0 + sec)
    # user 4: signup and view at the SAME timestamp → strict `<` rejects
    ev(4, "signup", t0)
    ev(4, "view", t0)
    # user 5: full chain but never signed up → not in the funnel at all
    ev(5, "view", t0)
    ev(5, "click", t0 + sec)
    ev(5, "purchase", t0 + 2 * sec)

    d = tmp_path_factory.mktemp("funnelevents")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    out = {r["stage"]: r
           for r in events_funnel_conversion(spark, str(d)).collect()}
    assert [out[s]["n_users"] for s in ("signup", "view", "click", "purchase")] \
        == [4, 2, 1, 1]
    assert out["signup"]["conv_from_prev"] is None
    assert out["view"]["conv_from_prev"] == 0.5
    assert out["click"]["conv_from_prev"] == 0.5
    assert out["purchase"]["conv_from_prev"] == 1.0
    assert out["purchase"]["conv_from_first"] == 0.25


def test_funnel_is_monotone_on_gate_data(spark):
    from demo_cdc_users_airline_spark.operators.temporal import (
        events_funnel_conversion,
    )

    rows = sorted(events_funnel_conversion(spark, SF).collect(),
                  key=lambda r: r["stage_idx"])
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # funnels only narrow
    assert rows[0]["conv_from_first"] == 1.0


def test_scd2_intervals_partition_timeline(spark):
    from demo_cdc_users_airline_spark.operators.temporal import events_scd2_history

    rows = events_scd2_history(spark, SF).collect()
    events = load_table(spark, SF, "events").collect()
    assert len(rows) == len(events)            # every change row versioned
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, hist in by_user.items():
        hist.sort(key=lambda r: r["version"])
        # versions are contiguous 1..n
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        # exactly one open (current) interval per key, and it is the last
        assert [r["is_current"] for r in hist] == [0] * (len(hist) - 1) + [1]
        for prev, nxt in zip(hist, hist[1:]):
            # intervals chain with no gaps or overlaps
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["valid_from"] <= prev["valid_to"]
        assert hist[-1]["valid_to"] is None
        assert hist[-1]["valid_micros"] is None


def test_scd2_latest_matches_argmax_state(spark):
    """The SCD2 current rows must equal the latest-per-key compaction."""
    from demo_cdc_users_airline_spark.operators.temporal import events_scd2_history

    cur = {r["user_id"]: r["event_id"]
           for r in events_scd2_history(spark, SF).collect()
           if r["is_current"] == 1}
    events = load_table(spark, SF, "events").collect()
    latest = {}
    for e in events:
        key = (e["ts"], e["event_id"])
        if e["user_id"] not in latest or key > latest[e["user_id"]][0]:
            latest[e["user_id"]] = (key, e["event_id"])
    assert cur == {u: eid for u, ((_, _), eid) in latest.items()}


def test_scd2_property_random_streams(spark):
    """Hypothesis: for ANY event stream, SCD2 intervals equal a serial
    Python replay (versions by (ts, id) order, valid_to = successor)."""
    from hypothesis import given, settings, strategies as st

    import pyspark.sql.functions as F

    @settings(max_examples=10, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 3),              # user
                  st.integers(0, 5),              # coarse ts (collisions!)
                  st.integers(0, 99)),            # event id
        min_size=1, max_size=40, unique_by=lambda t: t[2]))
    def run(rows):
        df = spark.createDataFrame(
            [(u, 1_700_000_000 + t * 60, e) for u, t, e in rows],
            "user_id long, epoch long, event_id long"
        ).select("user_id", F.timestamp_seconds("epoch").alias("ts"),
                 "event_id", F.lit("t").alias("event_type"),
                 F.lit(0.0).alias("value"))
        # run the operator's window construction on the in-memory frame
        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        nxt = F.lead("ts").over(w)
        got = {(r["user_id"], r["event_id"]): (r["version"], r["valid_to"])
               for r in df.select(
                   "user_id", "event_id",
                   F.row_number().over(w).cast("long").alias("version"),
                   nxt.alias("valid_to")).collect()}
        # serial replay
        by_user = {}
        ts_of = {}
        for u, t, e in rows:
            by_user.setdefault(u, []).append((t, e))
        for u, evs in by_user.items():
            evs.sort()
            for i, (t, e) in enumerate(evs):
                v_expected = i + 1
                nxt_t = evs[i + 1][0] if i + 1 < len(evs) else None
                version, valid_to = got[(u, e)]
                assert version == v_expected
                # compare in epoch seconds to avoid tz ambiguity
                exp_sec = (None if nxt_t is None
                           else 1_700_000_000 + nxt_t * 60)
                got_sec = (None if valid_to is None
                           else int(valid_to.timestamp()))
                assert got_sec == exp_sec

    run()
