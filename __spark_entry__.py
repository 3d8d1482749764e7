"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``stripe_sync_engine_spark.plans`` (one registry
entry per implemented operator family from SURVEY.md §2 plus the
training-data-pipeline operators); this module just adapts the
registry to the driver's shape.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stripe_sync_engine_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue-per-customer (SURVEY §2.11 Q2): fact-fact shuffle join +
    broadcast dimension join + exact-decimal hash aggregation.
    """
    return REGISTRY["q02_revenue_per_customer"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: textwrap.dedent(q.oracle).strip()
        for name, q in sorted(REGISTRY.items())
        if q.oracle is not None
    }
