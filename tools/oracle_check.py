"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet views), then compares
row count, column names, and order-insensitive values (exact — floats
must be bit-identical, which the engine guarantees via decimal sums).

Usage: python tools/oracle_check.py [sf_dir] [query ...]

Partition-independence sweep: set SPARK_GRAFT_CHECK_CPUS /
SPARK_GRAFT_CHECK_SHUFFLE to hostile values (odd, small) and re-run —
every hash must be identical at ANY parallelism, which is what the
decimal-sum / int64-micro / total-order rules exist to guarantee.
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: float(v) if isinstance(v, __import__("decimal").Decimal) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            mism = [
                i for i in range(len(av))
                if not (av[i] == bv[i] or (math.isnan(av[i]) and math.isnan(bv[i])))
            ]
        else:
            mism = [i for i in range(len(av)) if not (
                (av[i] == bv[i]) or (pd.isna(av[i]) and pd.isna(bv[i])))]
        if mism:
            i = mism[0]
            problems.append(
                f"col {c}: {len(mism)} mismatches, first at row {i}: "
                f"spark={a[c][i]!r} duck={b[c][i]!r}")
    return problems


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from demo_cdc_users_airline_spark.core.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import os

    cpus = int(os.environ.get("SPARK_GRAFT_CHECK_CPUS", "0") or 0) or None
    shuf = int(os.environ.get("SPARK_GRAFT_CHECK_SHUFFLE", "0") or 0) or None
    spark = get_spark("oracle_check", cpus=cpus, shuffle_partitions=shuf)
    con = duck_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} spark rows / {len(ddf)} duck rows)")
            for p in problems[:5]:
                print(f"     {p}")
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
    print(f"\n{failures} failures / {len(queries)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
