from stripe_sync_engine_spark.api.app import Router, api_key_matches, serve

__all__ = ["Router", "api_key_matches", "serve"]
