"""API endpoint serialization: the reference's JSON envelope.

A published pipe returns ``{meta, data, rows, statistics}`` over HTTP
(fetched at modules/tb_functions.py:264-273, consumed by
dash_airport.py:28-31). ``to_api_json`` renders any endpoint DataFrame
in that envelope so a thin HTTP wrapper (Flask/FastAPI — out of
analytic scope) can serve it unchanged.
"""

from __future__ import annotations

import datetime as _dt
import time
from typing import Any

from pyspark.sql import DataFrame

_TYPE_NAMES = {
    "smallint": "Int16", "int": "Int32", "bigint": "Int64",
    "tinyint": "Int8", "double": "Float64", "float": "Float32",
    "string": "String", "boolean": "Bool", "timestamp": "DateTime64(6)",
    "timestamp_ntz": "DateTime64(6)", "date": "Date",
}


def _json_value(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


DEFAULT_MAX_ROWS = 10_000


def to_api_json(df: DataFrame, max_rows: int | None = DEFAULT_MAX_ROWS) -> dict:
    """Render an endpoint result as the reference's response envelope.

    ``max_rows`` defaults to a cap so an endpoint over a large table never
    collects unbounded data to the driver (pass ``None`` to opt out
    explicitly). When the cap truncates, ``rows_before_limit_at_least``
    reports the floor without paying a full count over the table.
    """
    t0 = time.perf_counter()
    if max_rows is not None:
        # fetch cap+1 so truncation is detectable without a count() job
        rows = df.limit(max_rows + 1).collect()
        truncated = len(rows) > max_rows
        rows = rows[:max_rows]
    else:
        rows = df.collect()
        truncated = False
    elapsed = time.perf_counter() - t0
    meta = [{"name": f.name,
             "type": _TYPE_NAMES.get(f.dataType.simpleString(),
                                     f.dataType.simpleString())}
            for f in df.schema.fields]
    data = [{f["name"]: _json_value(row[f["name"]]) for f in meta} for row in rows]
    out = {
        "meta": meta,
        "data": data,
        "rows": len(data),
        "statistics": {"elapsed": round(elapsed, 6),
                       "rows_read": len(data),
                       "bytes_read": sum(len(str(r)) for r in data)},
    }
    if truncated:
        out["rows_before_limit_at_least"] = max_rows + 1
    return out
