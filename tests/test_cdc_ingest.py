"""CDC JSON parsing + quarantine (SURVEY §2 S1/S7, both payload shapes)."""

import json


from demo_cdc_users_airline_spark.sources.cdc import (
    USERS_RAW_MYSQL_SCHEMA,
    USERS_RAW_PG_SCHEMA,
    parse_cdc_json,
)

from fixtures import gen_users_events, users_events_to_json_lines


def to_value_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value STRING")


def test_pg_shape_parsing(spark):
    events, _ = gen_users_events(n=50, seed=1)
    df = to_value_df(spark, users_events_to_json_lines(events))
    good, quarantine = parse_cdc_json(df, USERS_RAW_PG_SCHEMA, store_raw_value=True)
    rows = good.collect()
    assert len(rows) == 50 and quarantine.count() == 0
    r = rows[0]
    assert isinstance(r["created_at"], int)       # epoch-µs Int64 stays long
    assert r["__value"] is not None               # KAFKA_STORE_RAW_VALUE
    assert r["__timestamp"] is not None
    assert r["__deleted"] == "false"


def test_malformed_and_null_key_rows_quarantined(spark):
    events, _ = gen_users_events(n=10, seed=2)
    lines = users_events_to_json_lines(events)
    lines.insert(3, "{ not json at all")
    missing_id = dict(events[0])
    missing_id.pop("id")
    lines.insert(5, json.dumps(missing_id))
    good, quarantine = parse_cdc_json(to_value_df(spark, lines), USERS_RAW_PG_SCHEMA)
    assert good.count() == 10
    bad = quarantine.collect()
    assert len(bad) == 2
    assert all(b["__value"] is not None for b in bad)
    errs = {tuple(b["__errors"]) for b in bad}
    assert ("__malformed",) in errs          # unparseable JSON


def test_quarantine_reports_coercion_error_columns(spark):
    import json as _json
    ev, _ = gen_users_events(n=3, seed=9)
    rows = [dict(e) for e in ev]
    rows[1]["id"] = "not-a-number"           # key coercion failure
    lines = [_json.dumps(r) for r in rows]
    good, quarantine = parse_cdc_json(to_value_df(spark, lines), USERS_RAW_PG_SCHEMA)
    assert good.count() == 2
    bad = quarantine.collect()
    assert len(bad) == 1
    assert "id" in bad[0]["__errors"]        # the offending column is named


def test_mysql_shape_parsing(spark):
    payload = {
        "address": "1 Road", "created_at": "2026-01-01T10:00:00",
        "deleted": 0, "email": "a@b.c", "email_verified": 1, "id": 7,
        "lang": "en", "name": "n", "onboarded": 0, "phone_number": "555",
        "updated_at": "2026-01-01T10:00:05",
    }
    good, quarantine = parse_cdc_json(
        to_value_df(spark, [json.dumps(payload)]), USERS_RAW_MYSQL_SCHEMA)
    r = good.collect()[0]
    assert quarantine.count() == 0
    assert r["updated_at"].isoformat() == "2026-01-01T10:00:05"  # DateTime shape
    assert r["deleted"] == 0 and r["id"] == 7
