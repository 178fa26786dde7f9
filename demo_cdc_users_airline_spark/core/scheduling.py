"""Scheduling hook for copy pipes (COPY_SCHEDULE cron analogue).

The reference schedules its batch copy hourly via
``COPY_SCHEDULE "0 * * * *"`` (users_batch_copy.pipe:70). This module
parses that 5-field cron vocabulary and computes fire times so a host
scheduler (or the simple ``run_due`` loop) can drive
``run_users_batch_copy`` and ``VersionedTable.compact`` jobs.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Callable


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*":
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        else:
            rng = range(int(part), int(part) + 1)
        # steps anchor at the range start (cron: "11-30/5" -> 11,16,21,26)
        out.update(v for v in rng if (v - rng.start) % step == 0)
    return out


@dataclass
class CronSchedule:
    """5-field cron: minute hour day-of-month month day-of-week."""

    expr: str

    def __post_init__(self):
        f = self.expr.split()
        if len(f) != 5:
            raise ValueError(f"need 5 cron fields, got {self.expr!r}")
        self.minutes = _parse_field(f[0], 0, 59)
        self.hours = _parse_field(f[1], 0, 23)
        self.dom = _parse_field(f[2], 1, 31)
        self.months = _parse_field(f[3], 1, 12)
        # cron convention: 0 and 7 are both Sunday; map onto python
        # weekday (0 = Monday) once at parse time
        self.dow = {(d - 1) % 7 for d in _parse_field(f[4], 0, 7)}

    def matches(self, t: _dt.datetime) -> bool:
        return (t.minute in self.minutes and t.hour in self.hours
                and t.day in self.dom and t.month in self.months
                and t.weekday() in self.dow)

    def next_fire(self, after: _dt.datetime) -> _dt.datetime:
        t = after.replace(second=0, microsecond=0) + _dt.timedelta(minutes=1)
        for _ in range(366 * 24 * 60):  # bounded scan, minute resolution
            if self.matches(t):
                return t
            t += _dt.timedelta(minutes=1)
        raise ValueError(f"no fire time within a year for {self.expr!r}")


@dataclass
class ScheduledJob:
    name: str
    schedule: CronSchedule
    fn: Callable[[], None]
    last_run: _dt.datetime | None = None


@dataclass
class Scheduler:
    """Minimal pull-based scheduler: call ``run_due(now)`` from any host
    loop/cron/Airflow tick; jobs fire at most once per matching minute."""

    jobs: list[ScheduledJob] = field(default_factory=list)

    def add(self, name: str, cron_expr: str, fn: Callable[[], None]) -> ScheduledJob:
        job = ScheduledJob(name, CronSchedule(cron_expr), fn)
        self.jobs.append(job)
        return job

    def run_due(self, now: _dt.datetime) -> list[str]:
        fired = []
        for job in self.jobs:
            due = job.schedule.matches(now.replace(second=0, microsecond=0))
            already = (job.last_run is not None
                       and job.last_run.replace(second=0, microsecond=0)
                       == now.replace(second=0, microsecond=0))
            if due and not already:
                job.fn()
                job.last_run = now
                fired.append(job.name)
        return fired
