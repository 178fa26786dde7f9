"""Schema DSL: reference type names → Spark StructType.

The reference declares every datasource schema explicitly in a
``SCHEMA >`` block of ClickHouse types with optional JSONPath bindings
(kits/users/pg/datasources/users_raw.datasource:2-18). This module
parses that vocabulary (complete type inventory: SURVEY.md §1.2) so a
datasource definition is one readable string, with the same
no-inference rule the reference enforces.

Example
-------
>>> schema = parse_schema('''
...     `id` Int16,
...     `name` Nullable(String),
...     `lang` LowCardinality(FixedString(2)),
...     `created_at` Nullable(Int64),
... ''')
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Complete mapping from SURVEY §1.2 (ClickHouse → Spark). Unsigned ints
# widen one step (no unsigned types in Spark).
_SIMPLE = {
    "Int8": T.ByteType,
    "Int16": T.ShortType,
    "Int32": T.IntegerType,
    "Int64": T.LongType,
    "UInt8": T.ShortType,
    "UInt16": T.IntegerType,
    "UInt32": T.LongType,
    "UInt64": T.LongType,
    "Float32": T.FloatType,
    "Float64": T.DoubleType,
    "String": T.StringType,
    "Bool": T.BooleanType,
    "Date": T.DateType,
    "DateTime": T.TimestampType,
    "UUID": T.StringType,
}


def parse_type(s: str) -> tuple[T.DataType, bool]:
    """Returns (spark_type, nullable). Non-Nullable ClickHouse columns are
    NOT nullable (the reference coalesces to defaults before insert —
    users_mv.pipe:6-12)."""
    s = s.strip()
    m = re.fullmatch(r"Nullable\((.*)\)", s)
    if m:
        inner, _ = parse_type(m.group(1))
        return inner, True
    m = re.fullmatch(r"LowCardinality\((.*)\)", s)
    if m:
        # dictionary-encoding hint only; parquet does this automatically
        return parse_type(m.group(1))
    m = re.fullmatch(r"FixedString\((\d+)\)", s)
    if m:
        # width enforced at write time via to_fixed_string (SURVEY §1.2)
        return T.StringType(), False
    m = re.fullmatch(r"DateTime64\((\d+)\)", s)
    if m:
        return T.TimestampType(), False  # Spark timestamps are already µs
    m = re.fullmatch(r"Decimal\((\d+),\s*(\d+)\)", s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2))), False
    m = re.fullmatch(r"Array\((.*)\)", s)
    if m:
        inner, inner_null = parse_type(m.group(1))
        return T.ArrayType(inner, inner_null), False
    if s in _SIMPLE:
        return _SIMPLE[s](), False
    raise ValueError(f"unsupported reference type: {s!r}")


_FIELD_RE = re.compile(
    r"`(?P<name>[^`]+)`\s+(?P<type>[^,`]+?)(?:\s+`json:(?P<jsonpath>[^`]+)`)?\s*(?:,|$)")


def parse_schema(schema_block: str) -> T.StructType:
    """Parse a reference ``SCHEMA >`` block into a StructType.

    JSONPath bindings are preserved in field metadata (key ``jsonpath``)
    for the ingest layer's projection step (S1)."""
    fields = []
    body = " ".join(line.strip() for line in schema_block.strip().splitlines())
    for m in _FIELD_RE.finditer(body):
        dtype, nullable = parse_type(m.group("type"))
        meta = {"jsonpath": m.group("jsonpath")} if m.group("jsonpath") else {}
        fields.append(T.StructField(m.group("name"), dtype, nullable, meta))
    if not fields:
        raise ValueError("no fields parsed from schema block")
    return T.StructType(fields)
