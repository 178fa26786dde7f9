"""Airport pipe suite over deterministic fixture event logs (frozen clock).

Checks the distinctive semantics of each pipe from SURVEY §2: LIMIT 1 BY
dedup, left joins with conditional aggregation, CASE ordering, the
departed_at exclusion branches, per-minute buckets, and the 61-minute
gap-filled series.
"""

import datetime

import pytest

from demo_cdc_users_airline_spark.core.clock import Clock
from demo_cdc_users_airline_spark.plans.airport import register_airport_pipes
from demo_cdc_users_airline_spark.plans.framework import Registry

from fixtures import (
    BAGGAGE_DDL,
    FLIGHTS_DDL,
    PASSENGERS_DDL,
    gen_airport_events,
)

NOW = datetime.datetime(2026, 1, 2, 12, 0, 0)


@pytest.fixture(scope="module")
def registry(spark):
    flights, passengers, baggage = gen_airport_events(NOW)
    reg = Registry(spark)
    reg.add_datasource("flights_raw", spark.createDataFrame(flights, FLIGHTS_DDL))
    reg.add_datasource("passengers_raw", spark.createDataFrame(passengers, PASSENGERS_DDL))
    reg.add_datasource("baggage_raw", spark.createDataFrame(baggage, BAGGAGE_DDL))
    return register_airport_pipes(reg)


@pytest.fixture(scope="module")
def clock():
    return Clock.fixed(NOW)


def test_latest_flight_info_is_last_event_per_id(registry, clock):
    rows = {r["id"]: r for r in registry.endpoint("latest_flight_info", clock).collect()}
    assert len(rows) == 6                      # one row per flight, not per event
    assert rows[1]["status"] == "departed"
    assert rows[6]["status"] == "open"
    assert rows[6]["departed_at"] is None
    assert rows[5]["status"] == "closed" and rows[5]["closed_at"] is not None


def test_latest_passenger_unique_and_terminal(registry, clock):
    rows = registry.endpoint("latest_passenger_info", clock).collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))
    statuses = {r["status"] for r in rows}
    assert statuses <= {"idle", "checkedin", "onboarded", "notboarded"}


def test_passengers_by_flight_status_excludes_old_departures(registry, clock):
    rows = registry.endpoint("passengers_by_flight_status", clock).collect()
    numbers = [r["flight_number"] for r in rows]
    assert "AA100" not in numbers              # departed 120 s ago → excluded
    assert "BB200" in numbers                  # departed 10 s ago → included
    by_num = {r["flight_number"]: r for r in rows}
    for r in rows:
        assert (r["checkedin"] + r["boarding"] + r["onboarded"]
                + r["notboarded"] + r["notcheckedin"]) == r["booked"]
    # boarded flight CC300: 1 notboarded (k==0), rest onboarded
    cc = by_num["CC300"]
    assert cc["notboarded"] == 1 and cc["onboarded"] == 2
    # CASE ordering: status rank descending order per the reference
    rank = {"departed": 5, "boarded": 4, "boarding": 3, "closed": 2, "open": 1}
    ranks = [rank[r["flight_status"]] for r in rows]
    assert ranks == sorted(ranks)


def test_baggage_by_flight_status_weight_buckets(registry, clock, spark):
    rows = registry.endpoint("baggage_by_flight_status", clock).collect()
    by_num = {r["flight_number"]: r for r in rows}
    assert "AA100" not in by_num               # 30 s departed_at cutoff
    # open/closed flights have only checked-in bags
    for num in ("EE500", "FF600"):
        if num in by_num:
            assert by_num[num]["baggage_loaded"] == 0.0
            assert by_num[num]["baggage_offloaded"] == 0.0
    # boarded flight: loaded + offloaded bags, no checkedin left
    cc = by_num["CC300"]
    assert cc["baggage_loaded"] > 0 or cc["baggage_offloaded"] > 0


def test_active_flights_past_hour_minute_buckets(registry, clock):
    rows = registry.endpoint("active_flights_past_hour", clock).collect()
    assert rows, "expected at least one minute bucket"
    ts = [r["time_interval"] for r in rows]
    assert ts == sorted(ts)
    assert all(t.second == 0 for t in ts)
    assert all(r["active_flights"] >= 1 for r in rows)


def test_flights_missed_pct_minute_gapfill_61(registry, clock):
    rows = registry.endpoint("flights_missed_pct_minute", clock).collect()
    assert len(rows) == 61                     # numbers(61) series, gap-filled
    ts = [r["time_interval"] for r in rows]
    assert ts[0] == NOW.replace(second=0) - datetime.timedelta(hours=1)
    assert ts[-1] == NOW.replace(second=0)
    assert all(b - a == datetime.timedelta(minutes=1) for a, b in zip(ts, ts[1:]))
    pcts = [r["flights_missed_pct"] for r in rows]
    assert any(p == 0.0 for p in pcts)         # gap minutes zero-filled
    assert any(p > 0.0 for p in pcts)          # notboarded pax produce a pct
    assert all(0.0 <= p <= 100.0 for p in pcts)


def test_flights_missed_pct_minute_param_window(registry, clock):
    """Template params start/end (typed DateTime with defaults —
    flights_missed_pct_minute.pipe:31-32)."""
    narrow = registry.endpoint(
        "flights_missed_pct_minute", clock,
        start=NOW - datetime.timedelta(minutes=5), end=NOW)
    pcts = {r["time_interval"]: r["flights_missed_pct"] for r in narrow.collect()}
    # outside the param window everything is zero-filled
    cutoff = NOW - datetime.timedelta(minutes=5)
    assert all(v == 0.0 for t, v in pcts.items() if t < cutoff.replace(second=0))


def test_active_vs_missed_pipe_on_pipe_join(registry, clock):
    rows = registry.endpoint("active_vs_missed_flights", clock).collect()
    active = {r["time_interval"] for r in
              registry.endpoint("active_flights_past_hour", clock).collect()}
    series = {r["time_interval"] for r in
              registry.endpoint("flights_missed_pct_minute", clock).collect()}
    assert {r["time_interval"] for r in rows} == active & series


def test_passenger_activity_counts(registry, clock):
    rows = registry.endpoint("passenger_activity", clock).collect()
    assert rows
    for r in rows:
        assert r["passengers_checkedin"] >= 1
        assert r["passengers_completed"] >= 1
    ts = [r["interval"] for r in rows]
    assert ts == sorted(ts)
