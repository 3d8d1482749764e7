"""Registry of engine queries and their DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) needs, per query name, a
``(spark, sf_dir) -> DataFrame`` callable and an equivalent ANSI-SQL string
for DuckDB. Column names must match exactly between the two (the driver
sorts columns by name before value-hashing), so every computed column is
aliased identically on both sides.

Float discipline: DuckDB and Spark sum doubles in different orders, so any
aggregate over a double column is computed in DECIMAL (exact) on both sides
and cast to DOUBLE only at the end — the exact decimal converts to the same
IEEE double in both engines, making value hashes stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class EngineQuery:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    operators: str  # SURVEY.md §2 operator ids this query exercises
    doc: str = ""


REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None = None, operators: str = "", doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = EngineQuery(name=name, spark=fn, oracle=oracle, operators=operators, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
