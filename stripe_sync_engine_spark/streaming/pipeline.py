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
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StringType, StructField, StructType

from stripe_sync_engine_spark.sources.webhook import with_signature_verified
from stripe_sync_engine_spark.sync.engine import StripeSparkSync

LANDING_SCHEMA = StructType([StructField("value", StringType())])

# Signed landing format: one JSON object per line wrapping the RAW request
# body with its Stripe-Signature header (the HTTP edge writes these —
# api/http.py). Verification must run on the exact raw body bytes, so the
# body travels as an opaque string, never re-serialized.
ENVELOPE_TYPE = "struct<payload string, signature string>"

REJECTED_TABLE = "_rejected_webhooks"


def start_webhook_stream(
    engine: StripeSparkSync,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    secret: str | None = None,
) -> StreamingQuery:
    """File-source stream of JSON-lines Stripe events → foreachBatch.

    ``available_now=True`` drains everything currently in the landing zone
    then stops (the scheduled-sync T4 shape); ``False`` runs continuously
    (the webhook hot path).

    With ``secret`` set, each line is a signed envelope (``ENVELOPE_TYPE``)
    and the batch is HMAC-verified BEFORE any parse — the reference's
    order of operations (stripeSync.ts:97-105: constructEvent throws before
    processEvent sees the body). Rows failing verification never reach the
    merge pipeline; they are appended to ``_rejected_webhooks`` for audit
    (the batch analog of the reference's 401 response).
    """
    spark: SparkSession = engine.spark
    raw = (
        spark.readStream.schema(LANDING_SCHEMA)
        .text(landing_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        events = batch_df
        if secret is not None:
            env = F.from_json(F.col("value"), ENVELOPE_TYPE)
            unwrapped = batch_df.select(
                env["payload"].alias("payload"), env["signature"].alias("signature")
            )
            checked = with_signature_verified(
                unwrapped, secret, payload_col="payload", header_col="signature"
            ).persist()
            try:
                rejected = checked.where(~F.col("signature_valid")).select(
                    F.col("payload").alias("value"),
                    F.col("signature"),
                    F.lit(batch_id).alias("batch_id"),
                    F.current_timestamp().alias("rejected_at"),
                )
                if not rejected.isEmpty():
                    # bucket-pruned append: only buckets receiving new
                    # rejected rows are rewritten. A crash-replayed
                    # micro-batch (foreachBatch is at-least-once; the file
                    # source re-delivers the same batch_id with identical
                    # content) appends NOTHING the second time: incoming
                    # rows anti-join against rows ALREADY STORED for the
                    # same (value, signature, batch_id). Within one batch,
                    # genuine duplicate rejections (the same bad body
                    # posted twice) are preserved — the dedup is against
                    # the store, never within the batch. The commit is a
                    # single atomic manifest swap, so a crash can't leave
                    # a batch half-appended and defeat the anti-join.
                    dedup_keys = ["value", "signature", "batch_id"]
                    if engine.store.exists(REJECTED_TABLE):
                        touched = engine.store.buckets_of(
                            rejected, "value", table=REJECTED_TABLE
                        )
                        prior = engine.store.read_buckets(REJECTED_TABLE, touched)
                        fresh = rejected.join(
                            prior.select(*dedup_keys), dedup_keys, "left_anti"
                        )
                        engine.store.write_buckets(
                            REJECTED_TABLE,
                            prior.unionByName(fresh),
                            touched,
                            key="value",
                        )
                    else:
                        engine.store.write(REJECTED_TABLE, rejected, key="value")
                events = checked.where(F.col("signature_valid")).select(
                    F.col("payload").alias("value")
                )
                engine.process_webhook_events(events)
            finally:
                checked.unpersist()
            return
        engine.process_webhook_events(events)

    writer = raw.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
