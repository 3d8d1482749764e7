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

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

# _local_checkpoint_path: the SHARED normalizer for every stream with
# local side-car state (documents.py defines it; both streams apply it
# at entry). Without it, os.listdir('file:/ckpt/offsets') raises
# FileNotFoundError and a legitimately RESUMED checkpoint is misread as
# fresh, making the initial-load guard below spuriously raise.
from stripe_sync_engine_spark.streaming.documents import (
    _checkpoint_run_id,
    _local_checkpoint_path,
)


def _checkpoint_is_fresh(checkpoint_dir: str) -> bool:
    """True when no micro-batch has ever committed an offset under this
    checkpoint — the only situation where ``starting_commit_ms`` decides
    what the first batch contains (a resumed checkpoint replays its own
    recorded offsets and ignores the parameter)."""
    offsets = os.path.join(checkpoint_dir, "offsets")
    try:
        return not os.listdir(offsets)
    except FileNotFoundError:
        return True


def _existing_target_state(gates, postings, ann) -> list[str]:
    """Names of every target state table that already exists — the
    evidence that an initial load would re-deliver rows these indexes
    already absorbed."""
    existing: list[str] = []
    for target in (*gates, postings, ann):
        if target is None:
            continue
        for attr in ("table", "stats_table", "forward_table"):
            name = getattr(target, attr, None)
            if name and target.store.exists(name):
                existing.append(name)
    return existing


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
    allow_initial_load_over_existing: bool = False,
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

    The contract is ENFORCED, not just documented: a fresh checkpoint
    whose first batch would be an initial load (``starting_commit_ms=0``)
    raises at start when any target already has state, naming the tables
    — the same loud-failure standard as the packer's params pin and the
    fold-horizon refusal. ``allow_initial_load_over_existing=True`` is
    the explicit override for the one legitimate shape (targets known to
    be behind commit 0 — e.g. manually truncated stats after a forensic
    rebuild); by default the misuse path cannot silently corrupt.

    ``emit_update_preimages=True`` lets the content-keyed gates retire
    updated-away state incrementally (id-keyed targets ignore the extra
    rows). Pass ``available_now=False`` for a continuously-running
    query. Each applied micro-batch is appended to the store's durable
    ``_maintenance_log.jsonl`` with its window id and net row count.

    Mixture folds (``operators/mixing._MaintainedFold``) are
    deliberately CRON-FORM-ONLY (``maintain_corpus_indexes(
    mixture_folds=...)``): their replay idempotence is cursor-aligned —
    a window is skipped exactly when it ends at or below the fold's
    committed commit-ms cursor — and a foreachBatch micro-batch carries
    no commit-ms bounds (batch ids renumber on a checkpoint wipe, which
    is precisely the overlap a batch-id key cannot detect). A standing
    mixture next to a continuous stream keeps its own ``poll()``; the
    gates/postings/ANN targets stay shared across both surfaces via
    ``engine._apply_change_window``."""
    gates = tuple(gates)
    checkpoint_dir = _local_checkpoint_path(checkpoint_dir)
    if (
        starting_commit_ms == 0
        and not allow_initial_load_over_existing
        and _checkpoint_is_fresh(checkpoint_dir)
    ):
        existing = _existing_target_state(gates, postings, ann)
        if existing:
            raise RuntimeError(
                "fresh checkpoint with starting_commit_ms=0 would deliver "
                "the whole table as an initial load, but these target "
                f"state tables already exist: {sorted(set(existing))} — "
                "the re-delivered rows would double-count batch-id-keyed "
                "state (postings N/avgdl). Pass starting_commit_ms="
                "engine.store.commits(entity)[-1] (the commit the indexes "
                "are current to), or allow_initial_load_over_existing=True "
                "if the initial load is genuinely intended"
            )
    run_id = _checkpoint_run_id(checkpoint_dir)
    feed = engine.read_changes_stream(
        entity,
        starting_commit_ms=starting_commit_ms,
        emit_update_preimages=emit_update_preimages,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        window = f"{run_id}:{batch_id}"
        n, applied = engine._apply_change_window(
            batch_df, window, gates, postings, ann
        )
        record = {
            "op": "corpus_cdc_fanout_stream",
            "entity": entity,
            "window": window,
            "applied": bool(n),
            "rows": n,
            "targets": {
                "gates": len(gates),
                "postings": postings is not None,
                "ann": ann is not None,
            },
        }
        if n and ann is not None and hasattr(ann, "measure_codebook_drift"):
            # parity with the cron form: the window's post-image vectors
            # vs the pinned baseline, O(window); observability only, so a
            # failure lands in the record rather than killing the stream
            try:
                post = applied.where(F.col("_change_type").isin("insert", "update"))
                record["ann_drift"] = ann.measure_codebook_drift(post)
            except Exception as e:  # noqa: BLE001 — reported, never silent
                record["ann_drift"] = {"error": f"{type(e).__name__}: {e}"}
        engine._log_maintenance(record)

    writer = feed.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
