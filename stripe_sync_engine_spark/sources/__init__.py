"""Sources: the Stripe API abstraction (paginated list scans, point
retrieves) — with in-memory and HTTP/REST implementations — and
webhook-event parsing/verification."""

from stripe_sync_engine_spark.sources.stripe_api import InMemoryStripeAPI, StripeAPI
from stripe_sync_engine_spark.sources.stripe_http import HTTPStripeAPI, StripeHTTPError

__all__ = ["HTTPStripeAPI", "InMemoryStripeAPI", "StripeAPI", "StripeHTTPError"]
