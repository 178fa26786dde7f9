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
