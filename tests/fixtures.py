"""Deterministic CDC event fixtures mirroring the reference generators.

``gen_users_events`` reproduces demo_users.py:64-150 semantics (event mix
30/60/10 insert/update/soft-delete, monotone flag progression, soft
deletes never target deleted rows, updated_at strictly increasing) while
maintaining the ground-truth current state in a plain dict — the replay
oracle of demo_users.py:167-204.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta

BASE_TS = datetime(2026, 1, 1, 12, 0, 0)


def _us(dt: datetime) -> int:
    return int((dt - datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def gen_users_events(n: int = 200, seed: int = 42,
                     null_probability: float = 0.05):
    """Returns (events, truth): events are PG-connector-shaped dicts in
    arrival order; truth maps id → current row (the OLTP table state)."""
    rng = random.Random(seed)
    truth: dict[int, dict] = {}
    events: list[dict] = []
    next_id = 1
    langs = ["EN", "ES", "FR", "DE", "IT"]
    t = BASE_TS

    def emit(row: dict, op: str):
        ev = {k: v for k, v in row.items()}
        ev["created_at"] = _us(row["created_at"])
        ev["updated_at"] = _us(row["updated_at"])
        ev["__deleted"] = "false"  # soft delete: row image with deleted=1
        if op != "insert" and rng.random() < null_probability:
            ev["name"] = None  # PG shape nullable column coverage
        events.append(ev)

    for i in range(n):
        t += timedelta(seconds=rng.randint(1, 5))
        live = [k for k, v in truth.items() if not v["deleted"]]
        op = ("insert" if not live
              else rng.choices(["insert", "update", "delete"], [30, 60, 10])[0])
        if op == "insert":
            uid = next_id
            next_id += 1
            row = {
                "id": uid,
                "name": f"user-{uid}",
                "email": f"user{uid}@example.com",
                "address": f"{uid} Main St",
                "phone_number": f"+1-555-{uid:04d}",
                "email_verified": 0,
                "onboarded": 0,
                "deleted": 0,
                "lang": rng.choice(langs)[:2].lower(),
                "created_at": t,
                "updated_at": t,
            }
            truth[uid] = dict(row)
            emit(row, "insert")
        elif op == "update":
            uid = rng.choice(live)
            row = dict(truth[uid])
            row["updated_at"] = t
            if rng.random() < 0.1:
                row["address"] = f"{uid} New Ave #{i}"
                row["phone_number"] = f"+1-666-{i:04d}"
            elif not row["email_verified"]:
                row["email_verified"] = 1
            elif not row["onboarded"]:
                row["onboarded"] = 1
            truth[uid] = dict(row)
            emit(row, "update")
        else:
            uid = rng.choice(live)
            row = dict(truth[uid])
            row["updated_at"] = t
            row["deleted"] = 1
            truth[uid] = dict(row)
            emit(row, "delete")
    return events, truth


def users_events_to_rows(events: list[dict], ingest_start: datetime | None = None):
    """PG-shape Spark rows (+ monotone __timestamp ingestion time)."""
    t0 = ingest_start or (BASE_TS + timedelta(hours=1))
    rows = []
    for i, ev in enumerate(events):
        rows.append({**ev, "__timestamp": t0 + timedelta(milliseconds=i)})
    return rows


def users_events_to_json_lines(events: list[dict]) -> list[str]:
    return [json.dumps(ev) for ev in events]


USERS_RAW_PG_DDL = (
    "id SMALLINT, name STRING, email STRING, address STRING, "
    "phone_number STRING, email_verified SMALLINT, onboarded SMALLINT, "
    "deleted SMALLINT, lang STRING, created_at BIGINT, updated_at BIGINT, "
    "__deleted STRING, __timestamp TIMESTAMP"
)


# ---------------------------------------------------------------------------
# airport fixtures: small correlated flight/passenger/baggage event logs
# ---------------------------------------------------------------------------

FLIGHTS_DDL = ("created_at TIMESTAMP, flight_number STRING, id SMALLINT, "
               "passenger_count SMALLINT, status STRING, updated_at TIMESTAMP, "
               "boarding_at TIMESTAMP, boarded_at TIMESTAMP, departed_at TIMESTAMP, "
               "closed_at TIMESTAMP, __timestamp TIMESTAMP")
PASSENGERS_DDL = ("created_at TIMESTAMP, flight_id SMALLINT, id INT, name STRING, "
                  "status STRING, updated_at TIMESTAMP, notboarded_at TIMESTAMP, "
                  "checkedin_at TIMESTAMP, onboarded_at TIMESTAMP, __timestamp TIMESTAMP")
BAGGAGE_DDL = ("created_at TIMESTAMP, flight_id SMALLINT, id INT, passenger_id INT, "
               "status STRING, updated_at TIMESTAMP, weight DOUBLE, "
               "offloaded_at TIMESTAMP, loaded_at TIMESTAMP, checkedin_at TIMESTAMP, "
               "__timestamp TIMESTAMP")


def gen_airport_events(now: datetime, seed: int = 42):
    """Three correlated event logs within the hour before ``now``.

    Flight lifecycles follow demo_airport.py's state machine (open →
    closed → boarding → boarded → departed), passengers check in and
    end onboarded/notboarded, bags follow passengers. One flight stays
    'open', one departs >30 s before now (exercising the departed_at
    exclusion branches), minutes with no events exist for gap-fill.
    """
    rng = random.Random(seed)
    flights, passengers, baggage = [], [], []
    ingest = [now - timedelta(minutes=70)]

    def stamp() -> datetime:
        ingest[0] += timedelta(milliseconds=7)
        return ingest[0]

    def fev(fid, number, pax, status, created, updated, **stamps):
        flights.append({
            "created_at": created, "flight_number": number, "id": fid,
            "passenger_count": pax, "status": status, "updated_at": updated,
            "boarding_at": stamps.get("boarding_at"),
            "boarded_at": stamps.get("boarded_at"),
            "departed_at": stamps.get("departed_at"),
            "closed_at": stamps.get("closed_at"),
            "__timestamp": stamp(),
        })

    def pev(pid, fid, status, created, updated, **stamps):
        passengers.append({
            "created_at": created, "flight_id": fid, "id": pid,
            "name": f"pax-{pid}", "status": status, "updated_at": updated,
            "notboarded_at": stamps.get("notboarded_at"),
            "checkedin_at": stamps.get("checkedin_at"),
            "onboarded_at": stamps.get("onboarded_at"),
            "__timestamp": stamp(),
        })

    def bev(bid, pid, fid, status, created, updated, weight, **stamps):
        baggage.append({
            "created_at": created, "flight_id": fid, "id": bid,
            "passenger_id": pid, "status": status, "updated_at": updated,
            "weight": weight,
            "offloaded_at": stamps.get("offloaded_at"),
            "loaded_at": stamps.get("loaded_at"),
            "checkedin_at": stamps.get("checkedin_at"),
            "__timestamp": stamp(),
        })

    pid_seq, bid_seq = iter(range(1000, 9999)), iter(range(5000, 9999))
    plans = [
        # (fid, number, pax_count, final_status, minutes_ago_created, departed_secs_ago)
        (1, "AA100", 4, "departed", 55, 120),   # departed >30s ago → excluded
        (2, "BB200", 4, "departed", 50, 10),    # departed 10s ago → included
        (3, "CC300", 3, "boarded", 45, None),
        (4, "DD400", 3, "boarding", 40, None),
        (5, "EE500", 2, "closed", 35, None),
        (6, "FF600", 2, "open", 20, None),
    ]
    for fid, number, pax_n, final, created_min_ago, dep_ago in plans:
        created = now - timedelta(minutes=created_min_ago)
        t = created
        fev(fid, number, pax_n, "open", created, t)
        stages = ["closed", "boarding", "boarded", "departed"]
        upto = stages.index(final) + 1 if final != "open" else 0
        stamps: dict = {}
        for s in stages[:upto]:
            t = t + timedelta(minutes=2, seconds=rng.randint(0, 30))
            if s == "departed" and dep_ago is not None:
                t = now - timedelta(seconds=dep_ago)
            stamps[f"{s}_at"] = t
            fev(fid, number, pax_n, s, created, t, **stamps)
        # passengers: check in after flight opens; minute gaps arise from
        # the per-flight offsets
        for k in range(pax_n):
            pid = next(pid_seq)
            pc = created + timedelta(minutes=1, seconds=13 * k)
            pev(pid, 0, "idle", pc - timedelta(hours=3), pc - timedelta(hours=3))
            if final == "open" and k >= pax_n - 1:
                continue  # one idle passenger never checks in
            ci = pc + timedelta(seconds=30)
            pev(pid, fid, "checkedin", pc, ci, checkedin_at=ci)
            nbags = rng.randint(0, 2)
            bag_ids = []
            bag_weights = {}
            for _ in range(nbags):
                bid = next(bid_seq)
                bag_ids.append(bid)
                w = round(min(32.0, max(5.0, rng.gauss(15.0, 3.0))), 2)
                bag_weights[bid] = w
                bev(bid, pid, fid, "checkedin", ci, ci, w, checkedin_at=ci)
            if upto >= 3:  # boarded or departed: terminal pax state
                if k == 0 and pax_n > 2:
                    nb = stamps["boarded_at"]
                    pev(pid, fid, "notboarded", pc, nb, checkedin_at=ci,
                        notboarded_at=nb)
                    for bid in bag_ids:
                        bev(bid, pid, fid, "offloaded", ci, nb, bag_weights[bid],
                            checkedin_at=ci, offloaded_at=nb)
                else:
                    ob = stamps["boarding_at"] + timedelta(seconds=20 + k)
                    pev(pid, fid, "onboarded", pc, ob, checkedin_at=ci,
                        onboarded_at=ob)
                    for bid in bag_ids:
                        bev(bid, pid, fid, "loaded", ci, ob, bag_weights[bid],
                            checkedin_at=ci, loaded_at=ob)
    return flights, passengers, baggage
