"""Persisted inverted index with incremental maintenance — BM25 retrieval
over a growing corpus without rescanning it per query.

``plans/textops.bm25_topk`` scans the corpus once per query: right for
ad-hoc questions, wrong for a retrieval endpoint. This is the lexical
sibling of the engine's other persisted indexes (exact fingerprints,
MinHash bands, embedding LSH, IVF-PQ codes): postings live in a store
table BUCKETED BY TERM HASH, so a query reads only the buckets its own
terms occupy — O(query terms ∩ buckets) IO per query, never O(corpus).

Honest scale note (measured): at the local test sizes (≤5k docs) the
indexed path is SLOWER than the scan — its several small jobs (bucket
probe, pruned read, stats read) each pay fixed scheduler latency while
the "avoided" corpus scan costs under a second. The crossover is where
scanning+tokenizing the corpus exceeds that fixed overhead, i.e. from
low-GB corpora upward; at 100 TB the scan is hours and the pruned read
stays proportional to the query's buckets.

Tables:

* ``_postings`` (term_h, term, doc_id, tf, dl, batch_id), bucketed by
  ``term_h``. One row per (document, distinct term). Term TEXT rides
  along (hash-collision safety at the exact-filter step + debuggability);
  the 8-byte hash is the bucket key, so shuffle/bucket routing never
  touches strings.
* ``_postings_stats`` (batch_id, n_docs, n_dl_docs, total_dl), bucketed
  by batch_id. BM25's corpus-level N and avgdl as per-batch increments,
  summed at query time. One row per batch BETWEEN FOLDS — a long-lived
  deployment runs ``fold_stats`` once its replay horizon passes, which
  collapses history to one ``_folded`` row and durably refuses replays
  of the folded batch ids (``incremental_dedup.FoldLedger``). ``n_dl_docs`` counts docs with non-NULL text so
  avgdl = total_dl/n_dl_docs matches the one-shot scan's ``avg(dl)``
  exactly (count(*)/avg treat NULL text differently, and the parity
  contract mirrors that).

* ``_postings_docs`` (doc_id, term_h, dl, batch_id), bucketed by
  ``doc_id`` — the FORWARD index (r8): a document's term hashes and
  length, the structure that makes ``unregister``/``apply_changes``
  bucket-pruned (without it, deleting a doc means scanning every
  postings bucket for its id). Token-less docs keep a NULL-term sentinel
  row so their stats contribution stays reversible.

Idempotence follows the span gate's per-batch design
(``operators/span_dedup``): postings anti-probe on (term_h, doc_id) —
a replayed batch, or a half-committed crash, commits only what is
missing; stats anti-probe on batch_id. Feed each document ONCE per
registration (the document stream's exact-dedup gate upstream
guarantees it); re-feeding the same doc under a new batch_id would
inflate stats while the postings dedupe. To CHANGE or REMOVE a
document, use ``unregister`` / ``apply_changes`` (r8) — the CDC-driven
maintenance path that keeps the index tracking a mutating corpus
without rescans.

Reference analog: none (training-data-pipeline extension; the ranking
math is ``plans/textops``' BM25, parity pytest-pinned against the
one-shot scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stripe_sync_engine_spark.operators.incremental_dedup import (
    FoldLedger,
    anti_probe,
    checkpoint_parallel,
    commit_fresh,
    fold_batch_rows,
    run_parallel,
    with_occ_retry,
)
from stripe_sync_engine_spark.plans.textops import BM25_B, BM25_K1, tokens_nonempty


class PersistedPostingsIndex:
    def __init__(
        self,
        store,
        table: str = "_postings",
        stats_table: str = "_postings_stats",
        id_col: str = "doc_id",
        text_col: str = "text",
        forward_table: str = "_postings_docs",
    ):
        self.store = store
        self.table = table
        self.stats_table = stats_table
        self.id_col = id_col
        self.text_col = text_col
        # Forward index (doc_id → its term hashes + dl), bucketed by
        # doc_id: the structure that makes DELETE/UPDATE bucket-pruned —
        # without it, removing a document means scanning every postings
        # bucket for its doc_id. One row per (doc, distinct term), plus a
        # NULL-term sentinel row for docs with no tokens so their n_docs
        # contribution remains reversible.
        self.forward_table = forward_table

    def _tokenized(self, batch: DataFrame) -> DataFrame:
        """``(doc_id, dl, _toks)`` — the ONE tokenization of a batch that
        registration's three derivations (postings rows, forward rows,
        stats increment) all share, so an expensive upstream lineage runs
        once, not three times. Caller localCheckpoints it."""
        toks = tokens_nonempty(self.text_col)
        return batch.select(
            F.col(self.id_col).alias("doc_id"),
            F.size(toks).cast("long").alias("dl"),
            toks.alias("_toks"),
        )

    def _rows(self, base: DataFrame, batch_id: str) -> DataFrame:
        return (
            base.select("doc_id", "dl", F.explode("_toks").alias("term"))
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .select(
                F.xxhash64("term").alias("term_h"),
                "term",
                "doc_id",
                "tf",
                "dl",
                F.lit(batch_id).alias("batch_id"),
            )
        )

    def register(self, batch: DataFrame, batch_id: str) -> None:
        """Durably add the batch's postings + stats increment. Idempotent
        per (term_h, doc_id) and per stats batch_id — replays and
        half-committed crashes heal. Raises if ``batch_id`` was already
        absorbed by ``fold_stats`` (the enforced replay horizon: a folded
        batch's stats row is gone, so the anti-probe would re-admit its
        increment and inflate N/avgdl silently)."""
        FoldLedger(self.store, self.stats_table).check_replayable(batch_id)
        with_occ_retry(lambda: self._register_once(batch, batch_id))

    def fold_stats(self, into_batch_id: str = "_folded") -> dict | None:
        """Collapse the per-batch stats rows into ONE ``into_batch_id``
        row — ``_postings_stats`` otherwise grows a row per registered
        batch forever (reads are whole-table, so millions of micro-batches
        would eventually hurt). The postings rows themselves never need
        folding: they are keyed (term_h, doc_id), not per-batch.

        Horizon contract, enforced like the span gate's ``fold_history``:
        folded batch ids are committed to a durable ledger BEFORE the
        rewrite and ``register`` refuses them afterwards; a crash between
        ledger and fold is conservative (ids refused, rows still
        per-batch — query-time SUM is unchanged; re-running heals).
        Returns the fold-stats record (``fold_batch_rows``) or None."""
        return fold_batch_rows(
            self.store,
            self.stats_table,
            key="batch_id",
            collapse=lambda rows: self._stats_with_schema(rows)
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("n_dl_docs").cast("long").alias("n_dl_docs"),
                F.sum("total_dl").cast("long").alias("total_dl"),
            )
            .select(
                F.lit(into_batch_id).alias("batch_id"), "n_docs", "n_dl_docs", "total_dl"
            ),
            into_batch_id=into_batch_id,
        )

    def _stats_with_schema(self, df: DataFrame) -> DataFrame:
        """Upgrade a legacy stats frame in place: tables written before
        ``n_dl_docs`` existed assume every registered doc had text (the
        old accounting), so the column backfills as n_docs."""
        if "n_dl_docs" not in df.columns:
            df = df.withColumn("n_dl_docs", F.col("n_docs"))
        return df.select("batch_id", "n_docs", "n_dl_docs", "total_dl")

    def _forward_rows(self, base: DataFrame, batch_id: str) -> DataFrame:
        # explode_outer keeps token-less docs (empty or NULL text) as one
        # NULL-term sentinel row, so unregister can reverse their n_docs
        # (and, for empty-text, n_dl_docs) contribution.
        return base.select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(F.transform("_toks", lambda t: F.xxhash64(t)))
            ).alias("term_h"),
            "dl",
            F.lit(batch_id).alias("batch_id"),
        )

    def _register_once(self, batch: DataFrame, batch_id: str) -> None:
        store = self.store
        # ONE eager tokenization feeds all three derivations (postings
        # rows, forward rows, stats increment) — the batch's possibly
        # expensive upstream lineage executes once; the postings rows are
        # additionally checkpointed because the bucket probe and the
        # anti-probe both reuse them.
        base = self._tokenized(batch).localCheckpoint(eager=True)
        rows = self._rows(base, batch_id).localCheckpoint(eager=True)
        if not store.exists(self.table):
            store.write(self.table, rows, key="term_h")
        else:
            manifest = store._read_manifest(self.table)
            touched = store.buckets_of(rows, key="term_h", table=self.table)
            known = store._scan_manifest(self.table, manifest, touched)
            fresh = anti_probe(rows, known, ["term_h", "doc_id"]).localCheckpoint(
                eager=True
            )
            if not fresh.isEmpty():
                commit_fresh(store, self.table, fresh, "term_h", manifest)
        # Forward index between postings and stats (each step idempotent,
        # so any crash ordering heals on replay): doc_id → term hashes +
        # dl, the structure unregister() prunes by.
        fwd = self._forward_rows(base, batch_id).localCheckpoint(eager=True)
        if not store.exists(self.forward_table):
            store.write(self.forward_table, fwd, key="doc_id")
        else:
            manifest = store._read_manifest(self.forward_table)
            touched = store.buckets_of(fwd, key="doc_id", table=self.forward_table)
            known = store._scan_manifest(self.forward_table, manifest, touched)
            # NULL-safe probe key: the sentinel rows carry term_h NULL,
            # which equality joins never match — a replay would duplicate
            # them. Coalesce to a reserved long (an xxhash64 collision
            # with a real term is a 2^-64 event whose only consequence is
            # one skipped forward row).
            th = F.coalesce(F.col("term_h"), F.lit(-(1 << 62)).cast("long"))
            fresh = anti_probe(
                fwd.withColumn("_th", th),
                known.withColumn("_th", th),
                ["doc_id", "_th"],
            ).drop("_th").localCheckpoint(eager=True)
            if not fresh.isEmpty():
                commit_fresh(store, self.forward_table, fresh, "doc_id", manifest)
        # Stats LAST: a crash before this point replays into no-ops above
        # and a stats heal here. Increments derive from the tokenized
        # batch itself (not from `fresh`), so a replay of a partially
        # committed batch records the SAME totals it would have.
        # NULL-text docs count in n_docs but not n_dl_docs/total_dl —
        # exactly how the one-shot scan's count(*)/avg(dl) treat them,
        # which the parity contract depends on.
        inc = base.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("dl").cast("long").alias("n_dl_docs"),
            F.coalesce(F.sum("dl"), F.lit(0).cast("long")).alias("total_dl"),
        ).select(F.lit(batch_id).alias("batch_id"), "n_docs", "n_dl_docs", "total_dl")
        self._commit_stats(inc)

    def _commit_stats(self, inc: DataFrame) -> None:
        """Idempotently append stats rows (anti-probed on batch_id) —
        shared by register (positive increments), unregister (negative
        deltas) and the merged window apply (both at once); query-time
        SUM nets them out.

        ``inc`` is a HANDFUL of agg rows by construction (one per
        sub-batch), so the ENTIRE commit runs driver-side (r16, guide
        §1.2 — the window's cost is per-commit overhead, not compute):
        ONE Spark job collects the rows plus their bucket ids; the
        freshness probe reads the touched buckets' few rows with pyarrow,
        and the partial write lands via the store's driver-side
        tiny-commit path (``write_rows_buckets`` — same manifest swap,
        OCC precondition, and footer-stat harvest as a Spark write).
        This replaced a probe scan job + a write job per window (r15's
        form itself replaced the generic anti-probe machinery, ~1s of
        jobs to commit two 4-column rows)."""
        from pyspark.sql.types import StructType

        store = self.store
        if not store.exists(self.stats_table):
            store.write(self.stats_table, inc, key="batch_id")
            return
        manifest = store._read_manifest(self.stats_table)
        nb = int(manifest["n_buckets"])
        rows = inc.withColumn("_b", store.bucket_expr("batch_id", nb)).collect()
        if not rows:
            return
        touched = sorted({int(r["_b"]) for r in rows})
        base_by_bucket = store.read_rows_driver(self.stats_table, touched, manifest)
        known_ids = {
            r["batch_id"] for rs in base_by_bucket.values() for r in rs
        }
        fresh_rows = [r for r in rows if r["batch_id"] not in known_ids]
        if not fresh_rows:
            return
        # the base rows union with fresh, so a legacy 3-column base must
        # be upgraded before the union (the write also migrates the
        # touched buckets to the new schema as a side effect).
        def up(r: dict) -> dict:
            return {
                "batch_id": r["batch_id"],
                "n_docs": int(r["n_docs"]),
                "n_dl_docs": int(r.get("n_dl_docs", r["n_docs"])),
                "total_dl": int(r["total_dl"]),
            }

        write_set = sorted({int(r["_b"]) for r in fresh_rows})
        by_bucket = {b: [up(r) for r in base_by_bucket[b]] for b in write_set}
        for r in fresh_rows:
            by_bucket[int(r["_b"])].append(
                {
                    "batch_id": r["batch_id"],
                    "n_docs": int(r["n_docs"]),
                    "n_dl_docs": int(r["n_dl_docs"]),
                    "total_dl": int(r["total_dl"]),
                }
            )
        schema = StructType.fromDDL(
            "batch_id string, n_docs long, n_dl_docs long, total_dl long"
        )
        store.write_rows_buckets(
            self.stats_table,
            by_bucket,
            schema,
            key="batch_id",
            planned_versions=dict(manifest["buckets"]),
        )

    def unregister(
        self, doc_ids: DataFrame, batch_id: str, _keep_batch_id: str | None = None
    ) -> None:
        """Remove documents from the index: forward-index bucket-pruned
        (O(batch) probes, never a postings scan), with a NEGATIVE stats
        delta row so query-time N/avgdl net out. Idempotent per
        ``batch_id``; crash anywhere replays to the same state, because
        the stats delta is derived from the forward rows and committed
        BEFORE they (or the postings rows) are deleted — a replay still
        sees enough to recompute, and the anti-probe skips the dupe.
        ``_keep_batch_id`` (``apply_changes``): forward rows registered
        under that id survive, making unregister-then-register replays of
        an UPDATE stable (the new version's rows are never torn down).
        Raises on indexes built before the forward table existed —
        rebuild to enable deletes.

        Scale note: a doc's postings spread across its DISTINCT TERMS'
        buckets, so a delete's write set fans out wider than any other
        operation in this engine (a 100-doc window can touch thousands
        of term buckets), each rewritten whole — the touched-bucket
        write amplification every bucketed-store mutation here pays, at
        postings' fan-out. The costs amortize per WINDOW, not per doc
        (the union of a window's pairs rewrites each touched bucket
        once), so batch deletes through the change feed rather than
        issuing them one document at a time; the eager rewrite is what
        keeps ``topk`` free of any tombstone filtering."""
        from stripe_sync_engine_spark.operators.incremental_dedup import FoldLedger

        FoldLedger(self.store, self.stats_table).check_replayable(batch_id)
        with_occ_retry(lambda: self._unregister_once(doc_ids, batch_id, _keep_batch_id))

    def _unregister_once(
        self, doc_ids: DataFrame, batch_id: str, keep_batch_id: str | None
    ) -> None:
        store = self.store
        ids = (
            doc_ids.select(F.col(self.id_col).alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if ids.isEmpty():
            # Nothing to delete. Checked BEFORE the forward-table probe:
            # apply_changes' first poll on a brand-new store is a birth
            # window of pure inserts — no tables exist yet, and raising
            # "predates delete support" here would wedge the documented
            # CDC path at its very first batch.
            return
        if not store.exists(self.forward_table):
            if not store.exists(self.table):
                return  # brand-new index: nothing is registered at all
            raise RuntimeError(
                f"postings index {self.table!r} has no forward table "
                f"({self.forward_table!r}) — it predates delete support; "
                "rebuild the index to enable unregister/apply_changes"
            )
        fm = store._read_manifest(self.forward_table)
        fwd_touched = store.buckets_of(ids, key="doc_id", table=self.forward_table)
        fwd_known = store._scan_manifest(self.forward_table, fm, fwd_touched)
        targets = fwd_known.join(F.broadcast(ids), "doc_id", "left_semi")
        if keep_batch_id is not None:
            targets = targets.where(F.col("batch_id") != keep_batch_id)
        targets = targets.localCheckpoint(eager=True)
        if targets.isEmpty():
            # nothing of these docs is registered (insert-only window, or
            # a replay past completion): writing a (0,0,0) stats row would
            # only grow the stats table and burn the batch id in the fold
            # ledger. Skipping is replay-safe — a real first delivery's
            # non-empty delta is anti-probed on batch_id anyway.
            return
        # 1. stats delta FIRST, derived from the forward rows alone (dl
        # rides on them) — replays recompute it while they still exist,
        # and the batch_id anti-probe keeps the first value afterwards.
        per_doc = targets.groupBy("doc_id").agg(F.max("dl").alias("dl"))
        dec = per_doc.agg(
            (-F.count(F.lit(1))).cast("long").alias("n_docs"),
            (-F.count("dl")).cast("long").alias("n_dl_docs"),
            (-F.coalesce(F.sum("dl"), F.lit(0))).cast("long").alias("total_dl"),
        ).select(F.lit(batch_id).alias("batch_id"), "n_docs", "n_dl_docs", "total_dl")
        self._commit_stats(dec)
        # 2. delete the postings rows for the targets' (term_h, doc_id)
        # pairs — write set bounded by the docs' own term buckets.
        pairs = (
            targets.where(F.col("term_h").isNotNull())
            .select("term_h", "doc_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
        pm = store._read_manifest(self.table)
        write_set = store.buckets_of(pairs, key="term_h", table=self.table)
        if write_set:
            # uncheckpointed: the write consumes this lineage exactly
            # once (see delete_matching_rows) — materializing the kept
            # postings first would double-scan the table's biggest frame
            base = store._scan_manifest(self.table, pm, write_set)
            keep = base.join(F.broadcast(pairs), ["term_h", "doc_id"], "left_anti")
            store.write_buckets(
                self.table,
                keep,
                write_set,
                key="term_h",
                planned_versions=dict(pm["buckets"]),
            )
        # 3. forward rows LAST (they are the replay's memory);
        # uncheckpointed like the postings rewrite above.
        if fwd_touched:
            fwd_keep = fwd_known.join(F.broadcast(ids), "doc_id", "left_anti")
            if keep_batch_id is not None:
                fwd_keep = fwd_keep.unionByName(
                    fwd_known.where(F.col("batch_id") == keep_batch_id).join(
                        F.broadcast(ids), "doc_id", "left_semi"
                    )
                )
            store.write_buckets(
                self.forward_table,
                fwd_keep,
                fwd_touched,
                key="doc_id",
                planned_versions=dict(fm["buckets"]),
            )

    def apply_changes(self, feed: DataFrame, batch_id: str) -> None:
        """Maintain the index from one corpus change-feed window
        (``engine.changes`` / ``consume_changes`` output: table columns +
        ``_change_type``): deletes and updates unregister the old
        postings (forward-index pruned), inserts and updates register the
        post-images — the CDC-driven steady state where the retrieval
        index tracks a mutating corpus without ever rescanning it.
        Idempotent per ``batch_id`` (sub-batches via ``sub_batch_id`` —
        epoch-convention window ids stay epoch-convention in the fold
        ledger, so a long-lived CDC consumer's ledger stays O(consumers),
        not O(windows)): a replay of a completed window tears nothing
        down (the update's new rows are registered under the kept ins
        id) and a crash at any point heals.
        ``update_preimage`` rows (a pre-image feed) are ignored here —
        postings deletes are id-keyed via the forward table.

        Steady state (all three tables exist) commits ONE merged
        delete+insert version per table — stats, postings, forward — in
        that order, instead of the six sequential unregister-then-
        register commits (r15, guide §6: the window's cost was dominated
        by per-commit overhead, not compute; see ``_apply_window_once``
        for the replay matrix). Birth and legacy-upgrade windows (a
        missing postings/forward table) keep the sequential protocol,
        which owns table creation and the predates-delete-support
        diagnostics."""
        from stripe_sync_engine_spark.operators.incremental_dedup import (
            ensure_local_checkpoint,
            sub_batch_id,
        )

        changed = ensure_local_checkpoint(feed)
        old_ids = changed.where(
            F.col("_change_type").isin("delete", "update")
        ).select(self.id_col)
        new_docs = changed.where(
            F.col("_change_type").isin("insert", "update")
        ).drop("_change_type")
        del_id = sub_batch_id(batch_id, "del")
        ins_id = sub_batch_id(batch_id, "ins")
        if not (
            self.store.exists(self.table)
            and self.store.exists(self.forward_table)
            and self.store.exists(self.stats_table)
        ):
            self.unregister(old_ids, del_id, _keep_batch_id=ins_id)
            self.register(new_docs, ins_id)
            return
        ledger = FoldLedger(self.store, self.stats_table)
        ledger.check_replayable(del_id)
        ledger.check_replayable(ins_id)
        with_occ_retry(
            lambda: self._apply_window_once(old_ids, new_docs, del_id, ins_id)
        )

    def _apply_window_once(
        self, old_ids: DataFrame, new_docs: DataFrame, del_id: str, ins_id: str
    ) -> None:
        """One CDC window as ONE merged delete+insert commit per table —
        stats (dec+inc rows together), postings, forward, in that order.
        Equivalent by construction to unregister-then-register: every
        freshness probe runs against the table VIEW AFTER the window's
        deletes (``known ∖ pairs``), so an update that keeps a term still
        lands its new (tf, dl) row exactly as it does when the delete
        commits first.

        Replay matrix (crash after any prefix of the three commits, then
        re-apply): [none] full redo. [stats] dec recomputed from the
        still-present forward rows and skipped by the batch_id
        anti-probe; inc likewise; postings/forward proceed. [stats,
        postings] targets still non-empty (forward rows are the replay's
        memory, deleted LAST), so the postings rewrite re-lands
        byte-identically (delete hits nothing, freshness re-admits
        nothing — the merged write degrades to a no-op rewrite of the
        touched buckets); forward proceeds. [all three] targets is empty
        (old rows gone, the update's rows carry the kept ins id), every
        freshness probe is empty, and both merged writes degrade to
        no-op rewrites of the window's touched buckets (r16: write sets
        are the probed buckets, not re-probed from materialized
        survivors — the replay's wasted IO is bounded by the window's
        own bucket fan-out). A crash between the ledger check and any
        commit is a plain retry.

        Job shape (r16, guide §1.2/§2.6 — the window's cost is fixed
        per-job latency, not compute; r16 traced 58 jobs per bench
        window before this form): the freshness anti-probes are FOLDED
        INTO the two table rewrites (each rewrite's one job scans its
        write-set buckets, drops the window's delete pairs, anti-probes
        the new rows against that post-delete view map-side, and writes
        — no separate survivor materialization, no second write-set
        probe), the write sets are the already-probed bucket sets, the
        forward rows derive lazily from the checkpointed tokenization
        (consumed exactly once, by the forward rewrite), and the two
        driver waits that remain per phase overlap read-only work
        (tokenized-rows materialization ∥ forward bucket probe; stats
        collect+driver-commit ∥ postings bucket probe)."""
        store = self.store
        # ONE eager tokenization feeds all three new-side derivations,
        # exactly as in _register_once; the delete-id set shares no
        # lineage with it, so the two materialize concurrently.
        base, ids = checkpoint_parallel(
            self._tokenized(new_docs),
            old_ids.select(F.col(self.id_col).alias("doc_id")).distinct(),
        )
        fm = store._read_manifest(self.forward_table)
        pm = store._read_manifest(self.table)
        # ONE forward bucket probe serves the delete-target lookup, the
        # forward freshness view, and the forward write set. Its key set
        # (the window's doc_ids) derives from base+ids alone, so it
        # overlaps the postings-rows materialization.
        rows, fwd_probe = run_parallel(
            lambda: self._rows(base, ins_id).localCheckpoint(eager=True),
            lambda: store.buckets_of(
                ids.unionByName(base.select("doc_id")),
                key="doc_id",
                table=self.forward_table,
            ),
        )
        fwd_known = store._scan_manifest(self.forward_table, fm, fwd_probe)
        targets = (
            fwd_known.join(F.broadcast(ids), "doc_id", "left_semi")
            .where(F.col("batch_id") != ins_id)
            .localCheckpoint(eager=True)
        )
        has_del = not targets.isEmpty()
        # --- 1. stats: dec (from the forward rows, which outlive this
        # commit) + inc (from the batch itself) in ONE anti-probed
        # commit. Same skip rule as _unregister_once: no zero :del row.
        # The stats job and the postings bucket probe are both read-only,
        # so they overlap; the COMMIT order stays stats → postings →
        # forward (the stats commit itself is driver-side and completes
        # before either table rewrite starts).
        inc = base.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("dl").cast("long").alias("n_dl_docs"),
            F.coalesce(F.sum("dl"), F.lit(0).cast("long")).alias("total_dl"),
        ).select(F.lit(ins_id).alias("batch_id"), "n_docs", "n_dl_docs", "total_dl")
        pairs = None
        if has_del:
            per_doc = targets.groupBy("doc_id").agg(F.max("dl").alias("dl"))
            dec = per_doc.agg(
                (-F.count(F.lit(1))).cast("long").alias("n_docs"),
                (-F.count("dl")).cast("long").alias("n_dl_docs"),
                (-F.coalesce(F.sum("dl"), F.lit(0))).cast("long").alias("total_dl"),
            ).select(
                F.lit(del_id).alias("batch_id"), "n_docs", "n_dl_docs", "total_dl"
            )
            inc = dec.unionByName(inc)
            # lazy over the checkpointed targets — each consumer's
            # re-derivation is a filter+distinct over materialized rows
            pairs = (
                targets.where(F.col("term_h").isNotNull())
                .select("term_h", "doc_id")
                .distinct()
            )
        probe_keys = (
            rows.select("term_h")
            if pairs is None
            else rows.select("term_h").unionByName(pairs.select("term_h"))
        )

        # --- 2+3. postings and forward: each rewrite is ONE job that
        # scans its write-set buckets (buckets losing ∪ buckets gaining
        # rows), drops the window's delete pairs, anti-probes the new
        # rows against that post-delete view, and writes the merged
        # contents into a PRIVATE version dir. The two Spark write jobs
        # (plus their footer harvests) run CONCURRENTLY with each other
        # and with the stats commit (prepare_buckets — version dirs are
        # unreferenced until committed, guide §2.6); the COMMITS stay
        # strictly sequential, stats → postings → forward, so the replay
        # matrix is unchanged. Rewrite lineages stay uncheckpointed: each
        # write consumes its lineage exactly once while the old version
        # files still exist (delete_matching_rows has the rationale).
        # NULL-term sentinels never reach the postings table; on the
        # forward side they probe via the reserved-long coalesce
        # (_register_once has the collision note).
        def prep_postings():
            write_set = store.buckets_of(probe_keys, key="term_h", table=self.table)
            if not write_set:
                return None
            base_w = store._scan_manifest(self.table, pm, write_set)
            keep = (
                base_w
                if pairs is None
                else base_w.join(F.broadcast(pairs), ["term_h", "doc_id"], "left_anti")
            )
            fresh = anti_probe(rows, keep, ["term_h", "doc_id"])
            return store.prepare_buckets(
                self.table, keep.unionByName(fresh), write_set, key="term_h"
            )

        def prep_forward():
            if not fwd_probe:
                return None
            th = F.coalesce(F.col("term_h"), F.lit(-(1 << 62)).cast("long"))
            base_w = store._scan_manifest(self.forward_table, fm, fwd_probe)
            if has_del:
                keep = base_w.join(F.broadcast(ids), "doc_id", "left_anti").unionByName(
                    base_w.where(F.col("batch_id") == ins_id).join(
                        F.broadcast(ids), "doc_id", "left_semi"
                    )
                )
            else:
                keep = base_w
            # the new forward rows derive lazily from the checkpointed
            # tokenization (this is their only consumer)
            fwd = self._forward_rows(base, ins_id)
            fresh_fwd = anti_probe(
                fwd.withColumn("_th", th),
                keep.withColumn("_th", th),
                ["doc_id", "_th"],
            ).drop("_th")
            return store.prepare_buckets(
                self.forward_table, keep.unionByName(fresh_fwd), fwd_probe, key="doc_id"
            )

        _, prep_p, prep_f = run_parallel(
            lambda: self._commit_stats(inc), prep_postings, prep_forward
        )
        if prep_p is not None:
            store.commit_prepared(prep_p, planned_versions=dict(pm["buckets"]))
        if prep_f is not None:
            store.commit_prepared(prep_f, planned_versions=dict(fm["buckets"]))

    def topk(self, query_terms: list[str], k: int = 20) -> DataFrame:
        """``(doc_id, score)`` — BM25 top-k from the index: reads ONLY
        the buckets the query's term hashes land in, plus the (tiny)
        stats table.

        Query-time job shape (r16, guide §1.2): the bucket probe runs
        driver-side (the terms are driver-known strings —
        ``buckets_of_values``), and the corpus-level N/avgdl come from a
        driver-side pyarrow read of the stats table's few rows injected
        as literals — two Spark jobs' fixed latency removed from every
        query; the scored scan itself is unchanged."""
        if not query_terms:
            raise ValueError("query_terms must be non-empty")
        store, spark = self.store, self.store.spark
        if not store.exists(self.table) or not store.exists(self.stats_table):
            raise RuntimeError(
                f"postings index {self.table!r} is empty — register() at least "
                "one batch before querying"
            )
        terms = sorted(set(query_terms))
        probe = spark.createDataFrame(
            [(t,) for t in terms], "term string"
        ).select(F.xxhash64("term").alias("term_h"), "term")
        # the table is bucketed by term_h (the signed xxhash64 of the
        # term), so the driver-side probe hashes twice: term → term_h,
        # then the store's bucket hash over term_h's decimal rendering
        from stripe_sync_engine_spark.functions.xxh64 import spark_xxhash64_str

        touched = store.buckets_of_values(
            [spark_xxhash64_str(t) for t in terms], table=self.table
        )
        hits = (
            store.read_buckets(self.table, touched)
            .join(F.broadcast(probe), ["term_h", "term"], "left_semi")
        )
        sm = store._read_manifest(self.stats_table)
        srows = [
            r
            for rs in store.read_rows_driver(
                self.stats_table, [int(b) for b in sm["buckets"]], sm
            ).values()
            for r in rs
        ]
        n_docs = sum(int(r["n_docs"]) for r in srows)
        n_dl = sum(int(r.get("n_dl_docs", r["n_docs"])) for r in srows)
        total_dl = sum(int(r["total_dl"]) for r in srows)
        # same IEEE double division the Spark agg performed; an all-empty
        # corpus (n_dl == 0) has no postings rows, so avgdl is never read
        avgdl = (float(total_dl) / float(n_dl)) if n_dl else float("nan")
        stats = spark.createDataFrame(
            [(n_docs, avgdl)], "n_docs long, avgdl double"
        )
        dfreq = hits.groupBy("term").agg(
            F.count_distinct(F.col("doc_id")).cast("double").alias("df")
        )
        scored = (
            hits.join(F.broadcast(dfreq), "term")
            .join(F.broadcast(stats))
            .withColumn(
                "idf",
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
            )
            .withColumn(
                "part",
                F.col("idf")
                * (F.col("tf").cast("double") * (BM25_K1 + 1))
                / (
                    F.col("tf").cast("double")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                ),
            )
            .groupBy("doc_id")
            .agg(F.sum("part").alias("score"))
        )
        return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
