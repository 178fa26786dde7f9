"""normalize_ntz: TIMESTAMP_NTZ columns must become the same UTC instant
regardless of the session timezone (ADVICE r3: the plain cast silently
shifts instants when configure() failed to force UTC)."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampNTZType

from demo_cdc_users_airline_spark.sources.loader import normalize_ntz

NAIVE = datetime.datetime(2024, 3, 15, 12, 0, 0)  # wall-clock, no tz
WANT_MICROS = int(NAIVE.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)


def _ntz_df(spark):
    schema = StructType([StructField("ts.dotted", TimestampNTZType())])
    return spark.createDataFrame([(NAIVE,)], schema)


def _instant_micros(df):
    # unix_micros reads the underlying instant, independent of render tz
    return df.select(
        F.unix_micros(F.col("`ts.dotted`")).alias("us")).collect()[0]["us"]


def test_ntz_utc_session(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    out = normalize_ntz(spark, _ntz_df(spark))
    assert dict(out.dtypes)["ts.dotted"] == "timestamp"
    assert _instant_micros(out) == WANT_MICROS


def test_ntz_non_utc_session(spark):
    """Same naive value, session tz shifted — instant must not move.
    Also exercises the dotted column name (ADVICE r3 quoting item)."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        out = normalize_ntz(spark, _ntz_df(spark))
        assert _instant_micros(out) == WANT_MICROS
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


# DST edges of America/New_York in 2024 (ADVICE r4): 02:30 on Mar 10 is a
# NONEXISTENT local time (spring-forward gap), 01:30 on Nov 3 is an
# AMBIGUOUS one (fall-back repeat). A cast/from_utc round trip evaluates
# the offset at two different instants and shifts these; the arithmetic
# path must recover the exact UTC instant for both, sub-second included.
DST_EDGES = [
    datetime.datetime(2024, 3, 10, 2, 30, 0, 123456),
    datetime.datetime(2024, 11, 3, 1, 30, 0, 999999),
    datetime.datetime(1969, 12, 31, 23, 59, 59, 500000),  # pre-epoch
]


def test_ntz_dst_edges_non_utc_session(spark):
    schema = StructType([StructField("ts.dotted", TimestampNTZType())])
    df = spark.createDataFrame([(v,) for v in DST_EDGES], schema)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = sorted(
            r["us"] for r in normalize_ntz(spark, df)
            .select(F.unix_micros(F.col("`ts.dotted`")).alias("us"))
            .collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # integer epoch math (float .timestamp()*1e6 can round the µs digit)
    import calendar
    want = sorted(
        calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
        for v in DST_EDGES)
    assert got == want
