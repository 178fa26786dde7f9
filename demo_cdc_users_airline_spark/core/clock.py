"""Injectable clock.

The reference's read pipes filter relative to the wall clock
(``now()`` / ``now64()`` — e.g. kits/airport/mysql/pipes/
active_flights_past_hour.pipe:10). For deterministic tests and
oracle comparison every query takes a ``Clock`` whose ``now`` can be
frozen; production uses ``Clock.system()``.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


class Clock:
    def __init__(self, frozen: _dt.datetime | None = None):
        self.frozen = frozen

    @classmethod
    def system(cls) -> "Clock":
        return cls(None)

    @classmethod
    def fixed(cls, ts: _dt.datetime) -> "Clock":
        return cls(ts)

    def now_col(self) -> Column:
        """``now()`` as a Spark column (frozen → literal, else current_timestamp)."""
        if self.frozen is not None:
            return F.lit(self.frozen).cast("timestamp")
        return F.current_timestamp()

    def now(self) -> _dt.datetime:
        return self.frozen or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
