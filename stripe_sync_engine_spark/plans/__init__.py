"""Query plans: the declared analytics surface (SURVEY.md §2.11) plus the
training-data-pipeline operators (dedup / similarity / text analysis).

Every query registers itself in ``REGISTRY`` with an optional DuckDB oracle
SQL string; ``__spark_entry__.py`` exposes the registry to the driver.
"""

from stripe_sync_engine_spark.plans.registry import REGISTRY, EngineQuery, register

# Import for registration side effects.
from stripe_sync_engine_spark.plans import analytics  # noqa: E402,F401
from stripe_sync_engine_spark.plans import textops  # noqa: E402,F401
from stripe_sync_engine_spark.plans import dedup  # noqa: E402,F401
from stripe_sync_engine_spark.plans import similarity  # noqa: E402,F401
from stripe_sync_engine_spark.plans import multimodal  # noqa: E402,F401
from stripe_sync_engine_spark.plans import skewops  # noqa: E402,F401

__all__ = ["REGISTRY", "EngineQuery", "register"]
