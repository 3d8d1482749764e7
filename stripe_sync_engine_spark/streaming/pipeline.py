"""Streaming webhook ingestion.

The reference consumes webhooks one HTTP POST at a time
(routes/webhooks.ts:5-21); the Spark-native shape is a landing zone
(files/Kafka) consumed by Structured Streaming with ``foreachBatch``
applying the same set-oriented batch pipeline as the batch path — one
code path for both (SURVEY §3.1 "Spark shape").

Exactly-once effect (T2): webhooks are at-least-once and unordered; the
merge is idempotent (keyed, timestamp-protected) so replays and
out-of-order batches converge to the same table state. Checkpointing
makes the stream restartable; re-processing a micro-batch after a crash
is harmless by construction — this is effectively exactly-once without
transactional sinks.

Late data (T1): deliberately NO watermark. A watermark would *drop* late
events; the reference's semantics are keyed last-write-wins with
unbounded lateness — arbitrarily late events still apply when the row
hasn't advanced past them. The merge condition enforces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StringType, StructField, StructType

from stripe_sync_engine_spark.sync.engine import StripeSparkSync

LANDING_SCHEMA = StructType([StructField("value", StringType())])


def start_webhook_stream(
    engine: StripeSparkSync,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream of JSON-lines Stripe events → foreachBatch.

    ``available_now=True`` drains everything currently in the landing zone
    then stops (the scheduled-sync T4 shape); ``False`` runs continuously
    (the webhook hot path).
    """
    spark: SparkSession = engine.spark
    raw = (
        spark.readStream.schema(LANDING_SCHEMA)
        .text(landing_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.process_webhook_events(batch_df)

    writer = raw.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
