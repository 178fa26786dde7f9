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


def test_cron_range_step_anchors_at_range_start():
    # standard cron: "11-30/5" fires at 11,16,21,26 (not 15,20,25,30)
    s = CronSchedule("11-30/5 * * * *")
    assert s.minutes == {11, 16, 21, 26}
    assert CronSchedule("10-40/15 * * * *").minutes == {10, 25, 40}
    assert CronSchedule("*/15 * * * *").minutes == {0, 15, 30, 45}


def test_cron_dow_sunday_convention():
    # cron DOW: 0 and 7 are both Sunday; 2026-01-04 is a Sunday
    sun = datetime.datetime(2026, 1, 4, 0, 0)
    mon = datetime.datetime(2026, 1, 5, 0, 0)
    assert CronSchedule("0 0 * * 0").matches(sun)
    assert not CronSchedule("0 0 * * 0").matches(mon)
    assert CronSchedule("0 0 * * 7").matches(sun)
    assert CronSchedule("0 0 * * 1").matches(mon)
    assert CronSchedule("0 0 * * 1-5").matches(mon)
    assert not CronSchedule("0 0 * * 1-5").matches(sun)


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
    assert "rows_before_limit_at_least" not in out   # under the cap


def test_api_json_caps_driver_collect(spark):
    df = spark.range(1000).orderBy("id")
    out = to_api_json(df, max_rows=10)
    assert out["rows"] == 10
    assert len(out["data"]) == 10
    assert out["rows_before_limit_at_least"] == 11   # truncation floor
    full = to_api_json(df, max_rows=None)            # explicit opt-out
    assert full["rows"] == 1000
