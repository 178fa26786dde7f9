"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (see README.md coverage table); ``oracle_sql()`` gives the
DuckDB-equivalent SQL with identical column aliases. ``entry`` runs the
flagship CDC query (latest-state reconstruction) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_cdc_users_airline_spark.catalog import ORACLE, QUERIES  # noqa: E402
from demo_cdc_users_airline_spark.core.session import configure  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    CDC latest-state reconstruction (ReplacingMergeTree/argMax semantics,
    the reference's core computation) over the events table.
    """
    configure(spark)
    return QUERIES["cdc_latest_state_argmax"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
