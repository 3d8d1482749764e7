"""Continuous derived-index maintenance — the Structured Streaming twin
of ``engine.maintain_corpus_indexes``.

The cron form polls one change window per call; this form subscribes the
index fan-out to the corpus's change-feed STREAM
(``engine.read_changes_stream``: offsets are store commits, Spark's
checkpoint is the cursor), so the retrieval and dedup layers track a
mutating corpus continuously — each micro-batch is one net change window
applied to every target before the checkpoint advances.

Crash-safety is the same argument as the cron form's, inherited from the
targets: foreachBatch is at-least-once, and every target's
``apply_changes`` is replay-idempotent (their own tests pin it), so a
crash anywhere inside a batch re-delivers that window and converges.
Batch ids are namespaced ``<run_id>:<spark_batch_id>`` with the
checkpoint-lifetime run id (``documents._checkpoint_run_id`` — Spark
batch ids are only unique per checkpoint), which is the epoch convention:
the postings fold ledger stays O(runs) over unbounded micro-batches
(``incremental_dedup.sub_batch_id``).

Reference analog: none (training-data-pipeline extension; the reference's
consumers poll Postgres).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from stripe_sync_engine_spark.streaming.documents import _checkpoint_run_id


def start_index_maintenance_stream(
    engine,
    entity: str,
    checkpoint_dir: str,
    gates=(),
    postings=None,
    ann=None,
    emit_update_preimages: bool = False,
    available_now: bool = True,
    starting_commit_ms: int = 0,
) -> StreamingQuery:
    """Subscribe the index fan-out to ``entity``'s change feed: every
    micro-batch applies to ``gates`` (objects with ``apply_changes(feed)``
    — the exact/near/embedding gates), ``postings``
    (``PersistedPostingsIndex``), and ``ann`` (``PersistedIVFPQ``), via
    the SAME fan-out body as the cron form
    (``engine._apply_change_window``).

    ``starting_commit_ms`` is part of the correctness contract, not a
    convenience: a fresh checkpoint's first batch is the table AS OF
    that offset delivered as inserts. Default 0 means the initial load
    BUILDS the indexes — correct only when they start EMPTY. Subscribing
    to indexes that already exist (e.g. built by
    ``maintain_corpus_indexes``) must pass the commit they are current
    to (``engine.store.commits(entity)[-1]``), or the re-delivered
    initial load double-counts the postings corpus stats (postings rows
    dedupe on (term_h, doc_id), but the N/avgdl increment is per
    batch_id — a second whole-table row under the new run's id would
    silently corrupt every later BM25 score). Same rule when wiping a
    checkpoint: wipe or re-baseline the indexes with it.

    ``emit_update_preimages=True`` lets the content-keyed gates retire
    updated-away state incrementally (id-keyed targets ignore the extra
    rows). Pass ``available_now=False`` for a continuously-running
    query."""
    run_id = _checkpoint_run_id(checkpoint_dir)
    feed = engine.read_changes_stream(
        entity,
        starting_commit_ms=starting_commit_ms,
        emit_update_preimages=emit_update_preimages,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        engine._apply_change_window(
            batch_df, f"{run_id}:{batch_id}", gates, postings, ann
        )

    writer = feed.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
