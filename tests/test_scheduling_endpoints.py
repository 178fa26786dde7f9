"""COPY_SCHEDULE cron hook + API JSON envelope (SURVEY §2 S5/S6)."""

import datetime

import pytest

from demo_cdc_users_airline_spark.core.scheduling import CronSchedule, Scheduler
from demo_cdc_users_airline_spark.plans.endpoints import to_api_json


def test_hourly_copy_schedule():
    # users_batch_copy.pipe:70 — COPY_SCHEDULE "0 * * * *"
    s = CronSchedule("0 * * * *")
    t = datetime.datetime(2026, 1, 1, 10, 30)
    assert s.next_fire(t) == datetime.datetime(2026, 1, 1, 11, 0)
    assert s.matches(datetime.datetime(2026, 1, 1, 11, 0))
    assert not s.matches(datetime.datetime(2026, 1, 1, 11, 1))


def test_cron_fields():
    s = CronSchedule("*/15 2,14 * * *")
    assert s.minutes == {0, 15, 30, 45}
    assert s.hours == {2, 14}
    with pytest.raises(ValueError):
        CronSchedule("* * *")


def test_scheduler_fires_once_per_minute():
    fired = []
    sch = Scheduler()
    sch.add("copy", "0 * * * *", lambda: fired.append("copy"))
    now = datetime.datetime(2026, 1, 1, 11, 0, 5)
    assert sch.run_due(now) == ["copy"]
    assert sch.run_due(now + datetime.timedelta(seconds=20)) == []   # same minute
    assert sch.run_due(now + datetime.timedelta(hours=1)) == ["copy"]
    assert fired == ["copy", "copy"]


def test_api_json_envelope(spark):
    df = spark.createDataFrame(
        [(1, "a", datetime.datetime(2026, 1, 1, 10, 0, 0, 123456))],
        "id SMALLINT, name STRING, ts TIMESTAMP")
    out = to_api_json(df)
    assert out["rows"] == 1
    assert {"name": "id", "type": "Int16"} in out["meta"]
    assert out["data"][0]["ts"] == "2026-01-01 10:00:00.123456"
    assert "elapsed" in out["statistics"]
