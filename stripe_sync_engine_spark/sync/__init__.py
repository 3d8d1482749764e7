"""Sync/ETL layer: webhook-event processing, dependency backfill, and
entity lifecycle semantics (SURVEY.md §2.1, §2.2, §3)."""

from stripe_sync_engine_spark.sync.engine import StripeSparkSync, SyncConfig

__all__ = ["StripeSparkSync", "SyncConfig"]
