"""Incremental corpus dedup: new batches against a persisted fingerprint
store — the 100 TB shape of exact dedup.

``plans/dedup.py`` runs GLOBAL dedup over a static corpus (the driver-
gated dd_* family). A production training-data pipeline doesn't re-run a
global pass per arriving batch: it keeps a FINGERPRINT TABLE and asks,
per batch, "which of these documents has the corpus never seen?" This
operator is that question expressed on the bucketed store:

* fingerprints (md5 of the content column — same formula as ``dd_exact``,
  JVM-side) live in a store table BUCKETED BY FINGERPRINT, so a batch's
  membership probe prunes to the buckets its own hashes touch —
  O(batch ∩ buckets) IO per batch, never O(corpus), exactly like the
  engine's CDC merges;
* the probe is a broadcast-friendly left-anti join of the batch against
  ONLY those buckets (Catalyst broadcasts the batch side when small);
* registering the survivors' fingerprints is the store's idempotent
  partial commit: replaying a batch after a crash re-registers nothing
  and returns zero new documents — at-least-once delivery degrades to
  exactly-once effects, the same argument as the webhook merge
  (storage.py write_buckets; SURVEY §2.9 T2).

Within-batch duplicates are also collapsed (keep the smallest doc_id,
deterministic) so a batch containing the same text twice yields one
survivor, matching ``dd_exact``'s keep-min-id convention.

At 100 TB: the fingerprint table is 16-byte hashes + ids — a ~0.1% shadow
of the corpus — bucketed into thousands of buckets; each arriving batch
touches only its hash-prefix buckets and the anti-join ships only those.
Reference analog: none (the reference has no dedup layer); this is the
training-data-pipeline extension the engine exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FINGERPRINT_COL = "fingerprint"


class IncrementalDeduper:
    """Exact-dedup gate over a persisted fingerprint table.

    ``filter_new(batch)`` returns the batch rows whose content the corpus
    has not seen (within-batch duplicates collapsed to the min-id row)
    and durably registers their fingerprints, so a later batch — or a
    replay of this one — treats them as seen.
    """

    def __init__(
        self,
        store,
        table: str = "_document_fingerprints",
        content_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.store = store
        self.table = table
        self.content_col = content_col
        self.id_col = id_col

    def _fingerprints(self, batch: DataFrame) -> DataFrame:
        # the id keeps its native type, so min() keeps dd_exact's
        # keep-smallest-id semantics (casting to string would make the
        # min lexicographic)
        return batch.select(
            F.col(self.id_col).alias("doc_id"),
            F.md5(F.col(self.content_col)).alias(FINGERPRINT_COL),
        )

    def filter_new(self, batch: DataFrame) -> DataFrame:
        """Rows of ``batch`` with never-seen content, original schema.

        One bounded probe job (bucket ids of the batch's hashes), one
        anti-join over only those buckets, one partial commit. The commit
        records (fingerprint, doc_id of the first registrant) — the
        provenance a curation pipeline needs to answer "which document
        made this one a duplicate"."""
        fps = self._fingerprints(batch)
        store, table = self.store, self.table
        if not store.exists(table):
            # first batch: collapse within-batch dups, register, done
            fresh_fps = fps.groupBy(FINGERPRINT_COL).agg(F.min("doc_id").alias("doc_id"))
            store.write(table, fresh_fps, key=FINGERPRINT_COL)
            return self._originals(batch, fresh_fps)
        # plan, read, and commit against ONE manifest; the version map is
        # the commit's OCC precondition, so a concurrent deduper racing on
        # the same buckets fails loudly instead of losing registrations
        # (serialize concurrent dedupers externally; batches are the unit)
        manifest = store._read_manifest(table)
        touched = store.buckets_of(fps, key=FINGERPRINT_COL, table=table)
        known = store._scan_manifest(table, manifest, touched)
        fresh_fps = (
            fps.join(known.select(FINGERPRINT_COL), FINGERPRINT_COL, "left_anti")
            .groupBy(FINGERPRINT_COL)
            .agg(F.min("doc_id").alias("doc_id"))
            # materialize BEFORE the commit: the lineage reads the
            # pre-commit bucket files, which the commit's vacuum deletes
            # (retain=0) — re-evaluating it afterwards in _originals
            # would scan vanished paths
            .localCheckpoint(eager=True)
        )
        # register survivors: union into ONLY the touched buckets. An
        # empty survivor set (pure replay) skips the commit entirely.
        if fresh_fps.isEmpty():
            return self._originals(batch, fresh_fps)
        store.write_buckets(
            table,
            known.unionByName(fresh_fps),
            touched,
            key=FINGERPRINT_COL,
            planned_versions=dict(manifest["buckets"]),
        )
        return self._originals(batch, fresh_fps)

    def _originals(self, batch: DataFrame, fresh_fps: DataFrame) -> DataFrame:
        """Survivor rows in the batch's ORIGINAL schema (semi-join on the
        registered (fingerprint, doc_id) pairs, so within-batch duplicate
        rows beyond the min-id registrant are excluded too)."""
        keyed = batch.withColumn(FINGERPRINT_COL, F.md5(F.col(self.content_col)))
        registered = fresh_fps.withColumnRenamed("doc_id", self.id_col)
        return keyed.join(
            registered, [FINGERPRINT_COL, self.id_col], "left_semi"
        ).drop(FINGERPRINT_COL)

    def seen_count(self) -> int:
        """Registered distinct-content count (corpus cardinality)."""
        df = self.store.read(self.table)
        return 0 if df is None else df.count()


class IncrementalNearDeduper:
    """NEAR-dup gate over a persisted MinHash-LSH band index — the
    incremental counterpart of ``plans/dedup.dd_minhash_lsh_pairs``.

    The store table holds one row per (document, band): the LSH band key
    plus the full 12-component signature, BUCKETED BY BAND KEY. An
    arriving batch computes its own signatures (the exact column pipeline
    the corpus plans use — ``plans/dedup.minhash_sigs_for``), probes ONLY
    the buckets its band keys hash into, and joins on (band, band_key) to
    find corpus candidates; each candidate's Jaccard is ESTIMATED as the
    fraction of agreeing signature components (the standard MinHash
    estimator — the corpus text is not stored, its 96-byte sketch is).
    Batch docs with any candidate at or above the threshold are dropped;
    survivors' band rows are registered in one OCC-guarded partial
    commit.

    Replay idempotence: a replayed batch finds its own registered rows as
    estimate-1.0 candidates, so it yields zero survivors and commits
    nothing. Intra-batch near-dups are admitted TOGETHER by design (the
    gate compares batch vs corpus; batch-internal pairs are the one-shot
    ``dd_minhash_lsh_pairs``'s job, and once registered the next batch is
    gated against both) — a periodic corpus re-cluster catches residuals,
    matching how production pipelines stage exact-gate → near-gate →
    offline re-cluster.

    At 100 TB: the index is ~4 rows × ~130 bytes per document (a <0.1%
    shadow), and a batch's IO is bounded by its own band keys' buckets —
    never a corpus scan. Docs too short to shingle (< SHINGLE_W words)
    have no bands: they bypass the near gate (compose with
    ``IncrementalDeduper`` for the exact gate first, which is also what
    keeps identical texts from ever reaching this index twice)."""

    def __init__(
        self,
        store,
        table: str = "_band_index",
        content_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
    ):
        self.store = store
        self.table = table
        self.content_col = content_col
        self.id_col = id_col
        self.threshold = threshold

    def _band_rows(self, batch: DataFrame) -> DataFrame:
        from stripe_sync_engine_spark.plans.dedup import band_rows_of_sigs, minhash_sigs_for

        return band_rows_of_sigs(
            minhash_sigs_for(batch, id_col=self.id_col, text_col=self.content_col)
        )

    def candidates(self, batch: DataFrame) -> DataFrame:
        """(doc_id, seen_doc_id, est_jaccard) — corpus near-candidates of
        the batch, est_jaccard = mean signature-component agreement.
        Bucket-pruned: only the batch's own band-key buckets are read."""
        rows = self._band_rows(batch)
        store, table = self.store, self.table
        if not store.exists(table):
            return rows.select(
                F.col("doc_id"),
                F.col("doc_id").alias("seen_doc_id"),
                F.lit(0.0).alias("est_jaccard"),
            ).limit(0)
        touched = store.buckets_of(rows, key="band_key", table=table)
        return self._candidates_against(rows, store.read_buckets(table, touched))

    def filter_new(self, batch: DataFrame) -> DataFrame:
        """Batch rows with NO corpus near-candidate at ``threshold``
        (original schema); survivors' band rows are durably registered."""
        rows = self._band_rows(batch)
        store, table = self.store, self.table
        if not store.exists(table):
            store.write(table, rows, key="band_key")
            return batch
        # plan, read, and commit against ONE manifest (OCC precondition,
        # same contract as IncrementalDeduper.filter_new)
        manifest = store._read_manifest(table)
        touched = store.buckets_of(rows, key="band_key", table=table)
        index = store._scan_manifest(table, manifest, touched)
        dup_ids = (
            self._candidates_against(rows, index)
            .where(F.col("est_jaccard") >= self.threshold)
            .select("doc_id")
            .distinct()
        )
        survivors = batch.join(
            dup_ids.withColumnRenamed("doc_id", self.id_col), self.id_col, "left_anti"
        )
        fresh_rows = rows.join(
            dup_ids, "doc_id", "left_anti"
        ).localCheckpoint(eager=True)  # pre-commit lineage cut (vacuum)
        if not fresh_rows.isEmpty():
            store.write_buckets(
                table,
                index.unionByName(fresh_rows),
                touched,
                key="band_key",
                planned_versions=dict(manifest["buckets"]),
            )
        return survivors

    def _candidates_against(self, rows: DataFrame, index: DataFrame) -> DataFrame:
        from stripe_sync_engine_spark.plans.dedup import MINHASH_SEEDS

        agree = sum(
            F.when(F.col(f"m{s}") == F.col(f"i_m{s}"), 1).otherwise(0)
            for s in range(MINHASH_SEEDS)
        )
        renamed = index.select(
            F.col("band"),
            F.col("band_key"),
            F.col("doc_id").alias("seen_doc_id"),
            *[F.col(f"m{s}").alias(f"i_m{s}") for s in range(MINHASH_SEEDS)],
        )
        return (
            rows.join(renamed, ["band", "band_key"])
            .groupBy("doc_id", "seen_doc_id")
            .agg((F.max(agree) / F.lit(float(MINHASH_SEEDS))).alias("est_jaccard"))
        )
