"""Spark equivalents of every scalar/aggregate function the reference uses.

Complete inventory from SURVEY.md §2.7 (reference sites cited per
function). All of these are thin wrappers over built-in
``pyspark.sql.functions`` so they stay inside whole-stage codegen —
no Python UDFs on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def to_start_of_minute(ts: ColumnOrName) -> Column:
    """ClickHouse ``toStartOfMinute`` (active_flights_past_hour.pipe:7)."""
    return F.date_trunc("minute", _col(ts))


def to_yyyymm(ts: ColumnOrName) -> Column:
    """ClickHouse ``toYYYYMM`` partition key (users_raw.datasource:17)."""
    return F.date_format(_col(ts), "yyyyMM")


def from_unix_ts64_micro(c: ColumnOrName) -> Column:
    """ClickHouse ``fromUnixTimestamp64Micro`` (users_mv.pipe:15-16)."""
    return F.timestamp_micros(_col(c).cast("long"))


def to_fixed_string(c: ColumnOrName, n: int) -> Column:
    """ClickHouse ``toFixedString(s, n)`` (users_mv.pipe:14).

    ClickHouse truncates to n bytes and NUL-pads short values; we pad with
    spaces-stripped-on-read being unfriendly, we keep '' semantics: truncate
    to n chars, no pad (documented deviation — SURVEY §1.2 FixedString note).
    """
    return F.substring(_col(c), 1, n)


def arg_max(value: ColumnOrName, version: ColumnOrName, *tiebreak: ColumnOrName) -> Column:
    """ClickHouse ``argMax(value, version)`` (users_api_batch.pipe:9-18).

    The CDC dedup workhorse: value of `value` at the maximum `version`.
    Implemented as ``max_by`` over a struct so extra tiebreak columns give
    a total order (ClickHouse argMax is nondeterministic on ties; CDC use
    sites tiebreak on ingestion time, users_raw.datasource:18).
    Partial-aggregatable → map-side combine, single shuffle at scale.
    """
    if tiebreak:
        key = F.struct(_col(version), *[_col(t) for t in tiebreak])
    else:
        key = _col(version)
    return F.max_by(_col(value), key)


def dec_sum(c: ColumnOrName, scale: int = 6) -> Column:
    """Order-independent exact sum of a double column.

    Summing IEEE doubles is order-dependent, so a shuffle-parallel sum can
    differ run-to-run (and engine-to-engine) in the last bits. Casting to
    DECIMAL(38,scale) makes the sum exact and associative — bit-identical
    across partitionings and vs the DuckDB oracle. Cast back to double at
    the end for a stable, comparable result.
    """
    return F.sum(_col(c).cast(f"decimal(38,{scale})")).cast("double")


def dec_avg(c: ColumnOrName, scale: int = 6) -> Column:
    """Order-independent average (exact decimal sum / count, in double)."""
    return (F.sum(_col(c).cast(f"decimal(38,{scale})")).cast("double")
            / F.count(_col(c)))
