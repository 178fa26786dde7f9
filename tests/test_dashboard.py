"""Dashboard-consumer parity: the chart-series shapes built from live
fixture endpoint payloads must match the reference consumer's layout
(dash_airport.py:85-332) — trace names/order/colors, padding, labels,
axis ranges — and the pure formatting must honor the documented
missing-data semantics."""

import datetime

from demo_cdc_users_airline_spark.core.clock import Clock
from demo_cdc_users_airline_spark.plans import dashboard as dash
from demo_cdc_users_airline_spark.plans.airport import register_airport_pipes
from demo_cdc_users_airline_spark.plans.framework import Registry

from fixtures import BAGGAGE_DDL, FLIGHTS_DDL, PASSENGERS_DDL, gen_airport_events

NOW = datetime.datetime(2026, 1, 2, 12, 0, 0)


def _registry(spark):
    flights, passengers, baggage = gen_airport_events(NOW)
    reg = Registry(spark)
    reg.add_datasource("flights_raw",
                       spark.createDataFrame(flights, FLIGHTS_DDL).cache())
    reg.add_datasource("passengers_raw",
                       spark.createDataFrame(passengers, PASSENGERS_DDL).cache())
    reg.add_datasource("baggage_raw",
                       spark.createDataFrame(baggage, BAGGAGE_DDL).cache())
    return register_airport_pipes(reg)


def test_refresh_cycle_series_shapes(spark):
    figs = dash.refresh_cycle(_registry(spark), Clock.fixed(NOW))
    assert set(figs) == set(dash.DASHBOARD_ENDPOINTS)

    # line charts: trace identity + equal-length vectors + fixed ranges
    avm = figs["active_vs_missed_flights"]
    assert [t["name"] for t in avm["traces"]] == [
        "Active Flights", "Missed Passengers (%)"]
    assert [t["color"] for t in avm["traces"]] == ["blue", "red"]
    assert avm["y_range"] == [0, dash.MAX_FLIGHTS_Y]
    assert all(len(t["y"]) == len(avm["x"]) for t in avm["traces"])

    pa = figs["passenger_activity"]
    assert [t["name"] for t in pa["traces"]] == [
        "Passengers Checked-In", "Passengers Completed"]
    assert pa["y_range"] == [0, dash.MAX_PASSENGER_VOLUME_Y]
    assert len(pa["x"]) >= 1

    # stacked passenger states: exactly 30 rows after padding, the
    # reference's trace order, per-row notcheckedin colors
    ps = figs["passengers_by_flight_status"]
    assert [t["name"] for t in ps["traces"]] == [
        "Not Checked-In", "Checked-In Passengers", "Boarding Passengers",
        "Onboarded Passengers", "Not Boarded"]
    assert len(ps["y_axis_labels"]) == dash.PASSENGER_CHART_ROWS
    assert all(len(t["x"]) == dash.PASSENGER_CHART_ROWS for t in ps["traces"])
    assert ps["barmode"] == "stack" and ps["y_reversed"]
    assert ps["x_range"] == [0, 350]
    ncolors = ps["traces"][0]["color"]
    assert isinstance(ncolors, list) and set(ncolors) <= {"#d3d3d3", "#a3a3a3"}
    # real rows are "<flight> - <status>"; padding rows collapse to " - "
    # (the reference recomputes labels after padding, dash_airport.py:200)
    assert all(" - " in lbl for lbl in ps["y_axis_labels"])

    bg = figs["baggage_by_flight_status"]
    assert [t["name"] for t in bg["traces"]] == [
        "Checked-In Baggage", "Loaded Baggage", "Offloaded Baggage"]
    assert [t["color"] for t in bg["traces"]] == [
        "#1f77b4", "#2ca02c", "#d62728"]
    assert all(len(t["x"]) == len(bg["y_axis_labels"]) for t in bg["traces"])


def test_formatting_semantics_pure():
    # padding + label + color rules on a hand-built payload
    payload = {"data": [
        {"flight_number": "AA1", "flight_status": "open", "checkedin": 3,
         "boarding": None, "onboarded": 1, "notboarded": 0, "notcheckedin": 2},
        {"flight_number": "AA2", "flight_status": "boarding", "checkedin": 5,
         "boarding": 2, "onboarded": 0, "notboarded": 0, "notcheckedin": 0},
    ]}
    fig = dash.passenger_states_chart(payload)
    assert fig["y_axis_labels"][:2] == ["AA1 - open", "AA2 - boarding"]
    assert fig["y_axis_labels"][2] == " - "          # padded row label
    assert fig["traces"][0]["color"][:3] == ["#d3d3d3", "#a3a3a3", "#a3a3a3"]
    assert fig["traces"][2]["x"][:2] == [0, 2]       # None -> fillna(0)
    assert sum(len([v for v in t["x"] if v]) for t in fig["traces"]) == 5

    # head-limit: 31 input rows truncate to PASSENGER_CHART_ROWS
    many = {"data": [dict(payload["data"][0], flight_number=f"F{i}")
                     for i in range(31)]}
    assert len(dash.passenger_states_chart(many)["y_axis_labels"]) == 30

    # empty envelope -> the No Data figures with preserved ranges
    assert dash.flights_vs_missed_series({})["title"] == "No Data Available"
    assert dash.flights_vs_missed_series({})["y_range"] == [0, 35]
    assert dash.passenger_activity_series({"data": []})["y_range"] == [0, 2500]
    assert dash.baggage_chart({})["title"] == "No Data Available"
