"""CDC ingestion: JSON change events → typed rows (+ quarantine).

Reproduces the reference's Kafka-datasource ingestion declaratively
(kits/users/pg/datasources/users_raw.datasource:2-27): each column is a
JSONPath extraction with a declared target type; rows that fail coercion
land in a ``<name>_quarantine`` side output (modules/tb_functions.py:137-154)
instead of failing the stream.

Two payload shapes must both work (SURVEY §1.3):
- **PG connector**: epoch-microsecond Int64 timestamps, nullable columns,
  extra ``__deleted`` flag (users_raw.datasource:12-14);
- **MySQL connector**: DateTime timestamps, non-null columns, raw message
  retained as ``__value`` (kits/users/mysql/datasources/users_raw.datasource).

All parsing is ``from_json`` with an explicit StructType — JVM-side,
vectorized, no schema inference (the reference never infers either).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# users_raw, PG connector shape — users_raw.datasource:3-14
USERS_RAW_PG_SCHEMA = T.StructType([
    T.StructField("id", T.ShortType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("email", T.StringType(), True),
    T.StructField("address", T.StringType(), True),
    T.StructField("phone_number", T.StringType(), True),
    T.StructField("email_verified", T.ShortType(), True),
    T.StructField("onboarded", T.ShortType(), True),
    T.StructField("deleted", T.ShortType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("created_at", T.LongType(), True),   # epoch µs
    T.StructField("updated_at", T.LongType(), True),   # epoch µs
    T.StructField("__deleted", T.StringType(), True),
])

# users_raw, MySQL connector shape — kits/users/mysql/datasources/users_raw.datasource:2-18
USERS_RAW_MYSQL_SCHEMA = T.StructType([
    T.StructField("address", T.StringType(), True),
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("deleted", T.ByteType(), True),
    T.StructField("email", T.StringType(), True),
    T.StructField("email_verified", T.ByteType(), True),
    T.StructField("id", T.ShortType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("onboarded", T.ByteType(), True),
    T.StructField("phone_number", T.StringType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
])

# airport raw shapes — kits/airport/mysql/datasources/*_raw.datasource
FLIGHTS_RAW_SCHEMA = T.StructType([
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("flight_number", T.StringType(), True),
    T.StructField("id", T.ShortType(), False),
    T.StructField("passenger_count", T.ShortType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
    T.StructField("boarding_at", T.TimestampType(), True),
    T.StructField("boarded_at", T.TimestampType(), True),
    T.StructField("departed_at", T.TimestampType(), True),
    T.StructField("closed_at", T.TimestampType(), True),
])

PASSENGERS_RAW_SCHEMA = T.StructType([
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("flight_id", T.ShortType(), True),
    T.StructField("id", T.IntegerType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
    T.StructField("notboarded_at", T.TimestampType(), True),
    T.StructField("checkedin_at", T.TimestampType(), True),
    T.StructField("onboarded_at", T.TimestampType(), True),
])

BAGGAGE_RAW_SCHEMA = T.StructType([
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("flight_id", T.ShortType(), True),
    T.StructField("id", T.IntegerType(), False),
    T.StructField("passenger_id", T.IntegerType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
    T.StructField("weight", T.DoubleType(), True),
    T.StructField("offloaded_at", T.TimestampType(), True),
    T.StructField("loaded_at", T.TimestampType(), True),
    T.StructField("checkedin_at", T.TimestampType(), True),
])


def parse_cdc_json(raw: DataFrame, schema: T.StructType,
                   value_col: str = "value",
                   ingest_ts: Column | None = None,
                   store_raw_value: bool = False) -> tuple[DataFrame, DataFrame]:
    """Parse a stream/batch of JSON CDC messages into typed rows.

    Returns ``(good, quarantine)``:
    - good: one typed column per schema field, plus ``__timestamp``
      (ingestion time — the reference's Kafka meta column, used as dedup
      tiebreak per users_raw.datasource:18) and optionally ``__value``
      (KAFKA_STORE_RAW_VALUE 'True', users_raw.datasource:24);
    - quarantine: rows whose JSON failed to parse or whose key field
      coerced to NULL (tb_functions.py:137-154 semantics).

    Works identically on a batch DataFrame and a streaming DataFrame —
    the streaming path wraps this in ``readStream`` (streaming.upsert).
    """
    if ingest_ts is None:
        ingest_ts = F.current_timestamp()
    key_field = schema.fields[0].name if schema.fields else None
    parsed = raw.withColumn("__parsed", F.from_json(F.col(value_col), schema))
    # untyped re-parse: detects per-column coercion failures (field present
    # in the raw JSON but NULL after typed extraction) — Tinybird-style
    # quarantine error detail (tb_functions.py:137-154). A corrupt-record
    # column flags unparseable JSON (from_json yields an all-null struct,
    # not a NULL struct, so struct-nullness can't detect it).
    raw_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
        + [T.StructField("__corrupt", T.StringType(), True)])
    parsed = parsed.withColumn(
        "__raw", F.from_json(F.col(value_col), raw_schema,
                             {"columnNameOfCorruptRecord": "__corrupt"}))
    parsed = parsed.withColumn("__timestamp", ingest_ts)

    err_entries = [
        F.when(F.col(f"__parsed.{f.name}").isNull()
               & F.col(f"__raw.{f.name}").isNotNull(), F.lit(f.name))
        for f in schema.fields
    ]
    errors = F.when(F.col("__parsed").isNull() | F.col("__raw.__corrupt").isNotNull(),
                    F.array(F.lit("__malformed"))) \
              .otherwise(F.filter(F.array(*err_entries), lambda c: c.isNotNull()))
    parsed = parsed.withColumn("__errors", errors)

    cols = [F.col(f"__parsed.{f.name}").alias(f.name) for f in schema.fields]
    cols.append(F.col("__timestamp"))
    if store_raw_value:
        cols.append(F.col(value_col).alias("__value"))

    # from_json yields NULL struct on malformed input; a NULL key after
    # coercion is likewise uningestable into the non-null raw table.
    bad_cond = F.col("__parsed").isNull()
    if key_field is not None:
        bad_cond = bad_cond | F.col(f"__parsed.{key_field}").isNull()

    good = parsed.filter(~bad_cond).select(*cols)
    quarantine = (parsed.filter(bad_cond)
                  .select(F.col(value_col).alias("__value"),
                          F.col("__errors"),
                          F.col("__timestamp")))
    return good, quarantine
