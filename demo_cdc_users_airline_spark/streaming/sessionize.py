"""Streaming sessionization: the custom stateful operator form of
`events_sessionization` (operators/temporal.py), built on
``applyInPandasWithState`` — the escape hatch for stateful semantics the
built-in streaming operators can't express (dropDuplicates state covers
identity sets, windowed aggs cover fixed windows; gap-based sessions
need per-key custom state with event-time timeouts).

Semantics (matching the batch twin): a user's events belong to one
session while consecutive gaps are ≤ the inactivity gap; a session
CLOSES when the event-time watermark passes ``last_event + gap`` (the
timeout), at which point exactly one summary row (user_id,
session_start, session_end, n_events, duration_micros) is emitted —
append semantics, each session once. A gap observed INSIDE a batch
closes the earlier session immediately.

State per active user: (start_us, last_us, n) — three int64s. The
event-time timeout doubles as state eviction, so state size is bounded
by ACTIVE sessions (users seen within the last gap+watermark), not by
history — the distinction that keeps this runnable against an unbounded
stream, and exactly what `GroupStateTimeout.EventTimeTimeout` exists
for.

At 100 TB/day: one shuffle per micro-batch on user_id (the groupBy key)
with Arrow-batched transfer into the Python workers; state lives in the
executor state store (RocksDB backend at production sizes), partitioned
by the same key, so no executor holds more than its key range. Late
events beyond the watermark are dropped by the engine before they reach
the operator (the documented trade bounding both state and results).

Reference basis: sessionization is a standard event-analytics derivation
of the reference's per-minute event endpoints (kits/users' events flow);
the streaming form materializes it continuously instead of re-scanning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

from ..sources.tables import AppendTable

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("duration_micros", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def _session_fn(gap_micros: int):
    """The per-key stateful function (closed over the gap so the operator
    is configurable while staying serializable)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        def close(start_us: int, last_us: int, n: int) -> None:
            closed.append((user_id,
                           pd.Timestamp(start_us, unit="us"),
                           pd.Timestamp(last_us, unit="us"),
                           n, last_us - start_us))

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            close(start_us, last_us, n)
            state.remove()
        else:
            cur = state.get if state.exists else None
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(pdf["ts"].astype("datetime64[us]")
                             .astype("int64").tolist())
            for t in sorted(ts_us):
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_micros:
                    close(*cur)          # in-batch gap: close immediately
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # fire when the watermark passes last + gap (must be
                # strictly beyond the current watermark)
                timeout_ms = (cur[1] + gap_micros) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in OUTPUT_SCHEMA])

    return fn


@dataclass
class StreamingSessionize:
    """events(user_id, ts) stream → append-only closed-sessions table."""

    out_table: AppendTable
    gap_micros: int = 6 * 3600 * 1_000_000   # = the batch twin's gap
    watermark_delay: str = "10 minutes"

    def plan(self, events: DataFrame) -> DataFrame:
        return (events
                .withWatermark("ts", self.watermark_delay)
                .groupBy("user_id")
                .applyInPandasWithState(
                    _session_fn(self.gap_micros),
                    outputStructType=OUTPUT_SCHEMA,
                    stateStructType=STATE_SCHEMA,
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.EventTimeTimeout))

    def start(self, events: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (self.plan(events).writeStream
                  .outputMode("append")
                  # idempotent by batchId (see AppendTable.append_idempotent)
                  .foreachBatch(lambda df, bid:
                                self.out_table.append_idempotent(df, bid))
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
