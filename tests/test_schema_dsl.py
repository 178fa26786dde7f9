"""Schema DSL: reference SCHEMA > blocks → StructType (SURVEY §1.2)."""

import pytest
from pyspark.sql import types as T

from demo_cdc_users_airline_spark.core.schema import parse_schema, parse_type


def test_users_raw_pg_block():
    # kits/users/pg/datasources/users_raw.datasource:2-18 verbatim shape
    schema = parse_schema("""
        `id` Int16 `json:$.id`,
        `name` Nullable(String) `json:$.name`,
        `email_verified` Nullable(UInt8) `json:$.email_verified`,
        `created_at` Nullable(Int64) `json:$.created_at`,
        `__deleted` String `json:$.__deleted`
    """)
    assert [f.name for f in schema] == ["id", "name", "email_verified",
                                        "created_at", "__deleted"]
    assert schema["id"].dataType == T.ShortType() and not schema["id"].nullable
    assert schema["name"].nullable
    assert schema["email_verified"].dataType == T.ShortType()  # UInt8 widens
    assert schema["created_at"].dataType == T.LongType()       # epoch-µs
    assert schema["id"].metadata["jsonpath"] == "$.id"


def test_type_inventory():
    cases = {
        "Int8": T.ByteType(), "DateTime": T.TimestampType(),
        "DateTime64(6)": T.TimestampType(), "Float64": T.DoubleType(),
        "FixedString(2)": T.StringType(),
        "LowCardinality(FixedString(2))": T.StringType(),
        "Array(Float32)": T.ArrayType(T.FloatType(), False),
        "Decimal(18,6)": T.DecimalType(18, 6),
    }
    for src, expect in cases.items():
        assert parse_type(src)[0] == expect, src


def test_unknown_type_rejected():
    with pytest.raises(ValueError):
        parse_type("AggregateFunction(sum, UInt64)")
