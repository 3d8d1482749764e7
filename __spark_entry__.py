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

# The driver's correctness gate evaluates at most 50 queries (observed in
# round 11: a 51st registry entry silently pushed the alphabetically-last
# name, txt_pii_redact, out of CORRECTNESS_r11.json — no error anywhere).
# Every registry row MUST get a driver correctness row, so fail LOUDLY at
# import if the registry outgrows the window: fold the new query into an
# existing same-scan row (the established pattern — see bench.py's
# cross-round name map) instead of raising this cap.
DRIVER_QUERY_CAP = 50
if len(REGISTRY) > DRIVER_QUERY_CAP:
    raise AssertionError(
        f"registry has {len(REGISTRY)} queries but the driver correctness "
        f"window is {DRIVER_QUERY_CAP}; fold queries sharing a scan into one "
        "row (see bench.py name map) so no entry silently loses its gate"
    )


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
