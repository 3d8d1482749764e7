from stripe_sync_engine_spark.sinks.jdbc import PostgresJdbcSink

__all__ = ["PostgresJdbcSink"]
