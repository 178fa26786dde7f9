"""Dashboard-consumer parity: the chart-series shapes the reference's
Dash app derives from the four polled endpoints, reproduced as plain
data structures (no plotting library — the SERIES LAYOUT is the consumer
contract; rendering is cosmetic).

Reference: dash_airport.py
- constants + refresh cadence: dash_airport.py:12-16
- fetch envelope handling: dash_airport.py:26-37 (resp['data'] → frame)
- active-vs-missed line chart: dash_airport.py:95-127
- passenger-activity line chart: dash_airport.py:129-167
- passenger-states stacked bars (head-30, pad, per-row colors, labels):
  dash_airport.py:170-268
- baggage stacked bars: dash_airport.py:271-330

Each ``*_series`` function takes the endpoint's API envelope (the
``to_api_json`` dict — same shape as the reference's ``endpoint_fetch``
response) and returns the figure's data contract: trace names, colors,
x/y vectors, axis ranges, and stacking order, exactly as the reference
builds them. ``refresh_cycle`` polls all four endpoints once — the body
of the reference's 2-second interval callback (dash_airport.py:85-93).
"""

from __future__ import annotations

from ..core.clock import Clock
from .endpoints import to_api_json
from .framework import Registry

# dash_airport.py:12-16
MAX_FLIGHTS_Y = 35
MAX_PASSENGER_VOLUME_Y = 2500
REFRESH_INTERVAL_SECONDS = 2
PASSENGER_CHART_ROWS = 30

# the four endpoints one refresh cycle polls (dash_airport.py:93,129,170,271)
DASHBOARD_ENDPOINTS = (
    "active_vs_missed_flights",
    "passenger_activity",
    "passengers_by_flight_status",
    "baggage_by_flight_status",
)

_NO_DATA = {"title": "No Data Available"}  # dash_airport.py:122-126


def _rows(payload: dict) -> list[dict]:
    """resp['data'] handling (dash_airport.py:28-31): missing key or an
    empty list is the 'No Data' path."""
    return payload.get("data") or []


def _num(row: dict, col: str):
    """fillna(0) for the numeric state columns (dash_airport.py:178,275)."""
    v = row.get(col)
    return 0 if v is None else v


def _notcheckedin_color(flight_status: str) -> str:
    """dash_airport.py:73-78: grey while check-in is open, darker after."""
    return "#d3d3d3" if flight_status == "open" else "#a3a3a3"


def _y_axis_label(row: dict) -> str:
    """dash_airport.py:200-202 — note the padding rows' labels come out
    as ' - ' because the reference recomputes labels AFTER padding."""
    return f"{row.get('flight_number', '')} - {row.get('flight_status', '')}"


def flights_vs_missed_series(payload: dict) -> dict:
    """dash_airport.py:95-127: two line traces over time_interval with a
    fixed y range."""
    rows = _rows(payload)
    if not rows:
        return dict(_NO_DATA, y_range=[0, MAX_FLIGHTS_Y])
    return {
        "x": [r["time_interval"] for r in rows],
        "traces": [
            {"name": "Active Flights", "color": "blue",
             "y": [r["active_flights"] for r in rows]},
            {"name": "Missed Passengers (%)", "color": "red",
             "y": [r["flights_missed_pct"] for r in rows]},
        ],
        "y_range": [0, MAX_FLIGHTS_Y],
    }


def passenger_activity_series(payload: dict) -> dict:
    """dash_airport.py:129-167: check-in starts vs completions per minute."""
    rows = _rows(payload)
    if not rows:
        return dict(_NO_DATA, y_range=[0, MAX_PASSENGER_VOLUME_Y])
    return {
        "x": [r["interval"] for r in rows],
        "traces": [
            {"name": "Passengers Checked-In", "color": "blue",
             "y": [r["passengers_checkedin"] for r in rows]},
            {"name": "Passengers Completed", "color": "lime",
             "y": [r["passengers_completed"] for r in rows]},
        ],
        "y_range": [0, MAX_PASSENGER_VOLUME_Y],
    }


# stacked trace order + colors, dash_airport.py:205-240 (notcheckedin's
# color is per-row via _notcheckedin_color)
_PASSENGER_TRACES = (
    ("Not Checked-In", "notcheckedin", None),
    ("Checked-In Passengers", "checkedin", "#1f77b4"),
    ("Boarding Passengers", "boarding", "#17becf"),
    ("Onboarded Passengers", "onboarded", "green"),
    ("Not Boarded", "notboarded", "red"),
)

_BAGGAGE_TRACES = (  # dash_airport.py:285-306
    ("Checked-In Baggage", "baggage_checkedin", "#1f77b4"),
    ("Loaded Baggage", "baggage_loaded", "#2ca02c"),
    ("Offloaded Baggage", "baggage_offloaded", "#d62728"),
)


def passenger_states_chart(payload: dict) -> dict:
    """dash_airport.py:170-268: head(PASSENGER_CHART_ROWS), fill missing
    numerics with 0, pad to exactly PASSENGER_CHART_ROWS rows (padding
    rows carry empty flight fields → label ' - ', dark-grey color),
    per-row notcheckedin colors, horizontal stacked bars in fixed trace
    order, x range [0, 350], y categorical reversed."""
    rows = _rows(payload)
    if not rows:
        return dict(_NO_DATA)
    rows = rows[:PASSENGER_CHART_ROWS]
    pad = PASSENGER_CHART_ROWS - len(rows)
    rows = rows + [{"flight_number": "", "flight_status": "",
                    "checkedin": 0, "boarding": 0, "onboarded": 0,
                    "notboarded": 0, "notcheckedin": 0}] * pad
    labels = [_y_axis_label(r) for r in rows]
    traces = []
    for name, col, color in _PASSENGER_TRACES:
        traces.append({
            "name": name,
            "x": [_num(r, col) for r in rows],
            "color": ([_notcheckedin_color(r.get("flight_status", ""))
                       for r in rows] if color is None else color),
        })
    return {
        "y_axis_labels": labels,
        "traces": traces,
        "barmode": "stack",
        "orientation": "h",
        "x_range": [0, 350],
        "y_reversed": True,
    }


def baggage_chart(payload: dict) -> dict:
    """dash_airport.py:271-330: per-flight stacked baggage weights —
    no head limit, no padding; same label rule, reversed category axis."""
    rows = _rows(payload)
    if not rows:
        return dict(_NO_DATA)
    return {
        "y_axis_labels": [_y_axis_label(r) for r in rows],
        "traces": [{"name": name, "color": color,
                    "x": [_num(r, col) for r in rows]}
                   for name, col, color in _BAGGAGE_TRACES],
        "barmode": "stack",
        "orientation": "h",
        "y_reversed": True,
    }


def refresh_cycle(registry: Registry, clock: Clock) -> dict[str, dict]:
    """One dashboard refresh (the reference's interval callback body,
    dash_airport.py:85-93): poll the four endpoints, format each into
    its figure contract. Returns {endpoint: figure-dict}."""
    payloads = {ep: to_api_json(registry.endpoint(ep, clock))
                for ep in DASHBOARD_ENDPOINTS}
    return {
        "active_vs_missed_flights":
            flights_vs_missed_series(payloads["active_vs_missed_flights"]),
        "passenger_activity":
            passenger_activity_series(payloads["passenger_activity"]),
        "passengers_by_flight_status":
            passenger_states_chart(payloads["passengers_by_flight_status"]),
        "baggage_by_flight_status":
            baggage_chart(payloads["baggage_by_flight_status"]),
    }
