"""Entity schemas (StructTypes) for the 23 actively-synced Stripe entities
plus the webhook event envelope."""

from stripe_sync_engine_spark.schemas.entities import (
    ENTITY_PROPS,
    entity_schema,
    entity_tables,
)

__all__ = ["ENTITY_PROPS", "entity_schema", "entity_tables"]
