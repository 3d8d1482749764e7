"""Sync/ETL layer: webhook-event processing, dependency backfill, and
entity lifecycle semantics (SURVEY.md §2.1, §2.2, §3)."""

from stripe_sync_engine_spark.sync.engine import StripeSparkSync, SyncConfig
from stripe_sync_engine_spark.sync.transforms import (
    apply_transforms,
    clear_transforms,
    register_transform,
)

__all__ = [
    "StripeSparkSync",
    "SyncConfig",
    "register_transform",
    "apply_transforms",
    "clear_transforms",
]
