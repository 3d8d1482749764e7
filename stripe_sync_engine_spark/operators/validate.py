"""Enum-as-text validation at write time (SURVEY §1.2, §2 notes).

The reference's Postgres schema enforces Stripe enums with real enum
types (``migrations/0005_invoices.sql:2-8``, ``0004_subscriptions.sql:
2-16``, ``0003_prices.sql:1-9``, ``0024_subscription_schedules.sql:1-7``,
``0039``, ``0023``) — an invalid value errors the INSERT. Spark has no
enum type, so the declared value sets (``schemas/entities.py
ENUM_VALUES``) are enforced with ``isin`` checks stitched INTO the merge
plan: no separate validation job, no extra pass over the data.

Policies (``SyncConfig.enum_policy``):

* ``"error"``  (default, reference parity) — ``raise_error`` fires
  executor-side the moment an invalid value is evaluated, failing the
  batch exactly like Postgres fails the statement. Expressed as
  ``when(invalid, raise_error(...)).otherwise(col)`` on the column itself
  so Catalyst cannot prune the check away.
* ``"null"``   — invalid values become NULL (quarantine-lite), the batch
  proceeds.
* ``"ignore"`` — checks disabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stripe_sync_engine_spark.schemas.entities import ENUM_VALUES


def validate_enums(entity: str, df: DataFrame, policy: str = "error") -> DataFrame:
    """Apply the entity's declared enum checks to ``df`` (see module doc)."""
    if policy == "ignore":
        return df
    if policy not in ("error", "null"):
        raise ValueError(f"unknown enum_policy {policy!r}; expected error|null|ignore")
    for (ent, colname), values in ENUM_VALUES.items():
        if ent != entity or colname not in df.columns:
            continue
        col = F.col(colname)
        invalid = col.isNotNull() & ~col.isin(*values)
        if policy == "error":
            msg = F.concat(
                F.lit(f"enum violation: {ent}.{colname} = '"),
                col,
                F.lit(f"' not in {sorted(values)}"),
            )
            replacement = F.when(invalid, F.raise_error(msg)).otherwise(col)
        else:
            replacement = F.when(invalid, F.lit(None).cast("string")).otherwise(col)
        df = df.withColumn(colname, replacement)
    return df
