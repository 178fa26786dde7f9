"""MySQL-connector users kit: DateTime payload shape end-to-end
(kits/users/mysql — users_mv.pipe + users_api.pipe)."""

import datetime
import json

from pyspark.sql import functions as F

from demo_cdc_users_airline_spark.plans.users import users_mv_mysql
from demo_cdc_users_airline_spark.sources.cdc import (
    USERS_RAW_MYSQL_SCHEMA,
    parse_cdc_json,
)
from demo_cdc_users_airline_spark.sources.tables import VersionedTable

from fixtures import gen_users_events


def mysql_payloads(events):
    """Re-shape the PG fixture events into the MySQL connector shape
    (non-null columns, second-precision DateTime strings)."""
    out = []
    for e in events:
        dt = lambda us: (datetime.datetime(1970, 1, 1)
                         + datetime.timedelta(microseconds=us)).strftime(
                             "%Y-%m-%dT%H:%M:%S")
        out.append(json.dumps({
            "address": e["address"] or "", "created_at": dt(e["created_at"]),
            "deleted": e["deleted"] or 0, "email": e["email"] or "",
            "email_verified": e["email_verified"] or 0, "id": e["id"],
            "lang": e["lang"] or "", "name": e["name"] or "",
            "onboarded": e["onboarded"] or 0, "phone_number": e["phone_number"] or "",
            "updated_at": dt(e["updated_at"]),
        }))
    return out


def test_mysql_kit_end_to_end(spark, tmp_path):
    events, truth = gen_users_events(n=200, seed=13, null_probability=0.0)
    raw = spark.createDataFrame([(ln,) for ln in mysql_payloads(events)], "value STRING")
    good, quarantine = parse_cdc_json(raw, USERS_RAW_MYSQL_SCHEMA,
                                      store_raw_value=True)
    assert quarantine.count() == 0
    assert good.schema["__value"].dataType.simpleString() == "string"

    latest = VersionedTable(spark, str(tmp_path / "latest"), key=["id"],
                            version="updated_at", tiebreak=["__timestamp"])
    latest.merge(users_mv_mysql(good))
    # users_api.pipe:4-6 — SELECT * FROM users_latest FINAL order by id
    out = latest.latest().orderBy("id").collect()
    assert len(out) == len(truth)
    for r in out:
        t = truth[r["id"]]
        assert int(r["deleted"]) == t["deleted"]
        assert r["lang"] == t["lang"][:2]
        # DateTime shape is second-precision (vs PG µs) — compare truncated
        assert r["updated_at"] == t["updated_at"].replace(microsecond=0)
