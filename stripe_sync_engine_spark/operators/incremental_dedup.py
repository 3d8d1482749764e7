"""Incremental corpus dedup: new batches against persisted gate state —
the 100 TB shape of dedup.

``plans/dedup.py`` runs GLOBAL dedup over a static corpus (the driver-
gated dd_* family). A production training-data pipeline doesn't re-run a
global pass per arriving batch: it keeps gate state and asks, per batch,
"which of these documents has the corpus never seen?" Two gates, both on
the bucketed store:

* **Exact** (``IncrementalDeduper``): md5 content fingerprints (the
  ``dd_exact`` formula, JVM-side) in a table BUCKETED BY FINGERPRINT —
  a batch's membership probe prunes to the buckets its own hashes touch,
  O(batch ∩ buckets) IO per batch, never O(corpus), exactly like the
  engine's CDC merges. The probe is a broadcast-friendly left-anti join
  over only those buckets.
* **Near** (``IncrementalNearDeduper``): a MinHash-LSH band index —
  one row per (document, band) holding the band key + the full
  12-component signature, BUCKETED BY BAND KEY. Batch signatures come
  from the exact column pipeline the corpus plans use
  (``plans/dedup.minhash_sigs_for``); candidates join on (band,
  band_key) and Jaccard is ESTIMATED as the fraction of agreeing
  signature components (the standard MinHash estimator — corpus text is
  not stored, its ~96-byte sketch is).

Both gates are TWO-PHASE so callers control crash ordering:

* ``select_new(batch)`` is PURE — survivors in the batch's original
  schema, no state mutated;
* ``register(docs)`` durably records fingerprints / band rows,
  idempotently (already-recorded content registers nothing) and
  OCC-guarded (a concurrent writer racing the commit fails loudly);
* ``filter_new(batch)`` = select_new then register(survivors) — the
  one-call form when the caller's sink is the registration itself.

The streaming pipeline (``streaming/documents.py``) orders sink-merge
BETWEEN select and register, so an at-least-once replay after any crash
converges: unregistered survivors pass the gate again and the keyed sink
merge drops them; registered ones never re-pass.

Intra-batch semantics: the exact gate collapses within-batch duplicates
to the min-id row (``dd_exact``'s convention); the near gate admits
intra-batch near-dups TOGETHER by design (batch-internal pairs are the
one-shot ``dd_minhash_lsh_pairs``'s job; once registered, the next batch
is gated against all of them) — production pipelines stage exact-gate →
near-gate → periodic offline re-cluster. Docs too short to shingle
(< SHINGLE_W words) have no bands and bypass the near gate by contract.

At 100 TB: the fingerprint table is 16-byte hashes + ids and the band
index ~4 rows × ~130 bytes per document — together a <0.2% shadow of the
corpus, bucketed into thousands of buckets; each arriving batch touches
only its own hash-prefix buckets. Reference analog: none (the reference
has no dedup layer); this is the training-data-pipeline extension the
engine exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FINGERPRINT_COL = "fingerprint"

# FoldLedger: free-form batch ids (no ``:<int>`` epoch suffix) are kept
# VERBATIM in the ledger — the O(runs) compaction only applies to the
# run:epoch convention — so a manual caller minting unique free-form ids
# per batch grows the ledger file linearly forever. Warn once the list
# passes this size; the fix is adopting the epoch convention.
FREEFORM_IDS_WARN = 10_000


def ensure_local_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` unless ``df`` IS already a bare
    checkpoint (its analyzed plan is a single ``LogicalRDD`` scan — no
    operators on top), in which case return it unchanged.

    Why (r15, measured): every fan-out target defensively checkpoints the
    change window it receives, but ``engine._apply_change_window``
    checkpoints the window ONCE before fanning it out — so a 3-target
    poll re-materialized the identical RDD three more times (~0.3–1s per
    re-checkpoint of a window at sf0.1; at scale each is a full extra
    pass over the window). The plan-root check is exact and conservative:
    anything other than a lone LogicalRDD (a filter, a projection, a real
    lineage) checkpoints as before, so standalone callers keep the
    defensive materialization."""
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        if analyzed.getClass().getSimpleName() == "LogicalRDD":
            return df
    except Exception:
        pass  # any introspection hiccup: fall through to the safe path
    return df.localCheckpoint(eager=True)


def run_parallel(*thunks):
    """Run zero-arg callables concurrently on driver threads, returning
    their results in argument order (first raised exception propagates).

    ONE implementation of the window paths' overlap-two-independent-jobs
    blocks (guide §2.6 — postings/pq ``_apply_window_once`` each had a
    verbatim copy). Worker count is CAPPED at 8: under PySpark's pinned
    thread mode (default since 3.2) each fresh Python thread maps to its
    own JVM thread, so an unbounded per-call pool in a long-lived
    streaming driver churns JVM threads for no scheduling benefit — the
    overlapped jobs are few and short. Thunks must be INDEPENDENT (no
    thunk may wait on another's result) and must not themselves call
    ``run_parallel``-based helpers reentrantly in a way that blocks —
    every current call site submits leaf work (a localCheckpoint, a
    bucket probe, a prepare/commit) and waits in the CALLER, never
    inside a pooled task."""
    if len(thunks) == 1:
        return (thunks[0](),)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(thunks), 8)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return tuple(f.result() for f in futures)


def checkpoint_parallel(*dfs: DataFrame) -> tuple[DataFrame, ...]:
    """``localCheckpoint(eager=True)`` several INDEPENDENT frames
    concurrently, returned in argument order.

    Why (r15, guide §2.6 — overlap independent jobs): a merged CDC window
    materializes a handful of frames whose lineages do not depend on each
    other (the tokenized batch and the delete-id set; the postings rows
    and the forward rows; the two tables' freshness survivors), but a
    sequential ``df.localCheckpoint()`` chain makes the driver wait out
    each job's fixed scheduler latency one at a time. Submitting them
    from a thread pool lets one job's tasks back-fill the others' idle
    scheduler time — wall per phase becomes ~max(job), not sum. Spark's
    scheduler supports concurrent driver-thread submission (the engine
    already relies on this in ``_run_handler_chains`` and
    ``_apply_change_window``); checkpoints are pure materializations
    with no commit-order semantics, so overlap is semantically
    invisible. Callers must only group frames with NO mutual lineage
    dependency (a frame derived from another's checkpoint belongs in a
    later phase)."""
    if len(dfs) <= 1:
        return tuple(df.localCheckpoint(eager=True) for df in dfs)
    return run_parallel(*[lambda d=d: d.localCheckpoint(eager=True) for d in dfs])


def anti_probe(batch: DataFrame, indexed: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``batch`` whose keys are absent from ``indexed``, with the
    indexed side never shuffled OR broadcast.

    A plain ``batch.join(indexed, keys, "left_anti")`` can only build its
    hash table from ``indexed`` (the anti's right side) — fine while a
    batch's touched buckets fit the broadcast threshold, but past it the
    plan collapses to a sort-merge that shuffles the whole bucket-pruned
    store scan PER BATCH. Flipping the probe keeps both joins broadcast
    at any store size: scan ``indexed`` once map-side against the
    broadcast batch keys (left-semi, build right), then anti-join the
    ≤|batch| matches back into ``batch``. The gates' contract is that
    batches are micro-batch sized (bulk loads belong to the one-shot
    corpus plans), so both broadcasts are bounded by the batch."""
    probe = F.broadcast(batch.select(*keys).distinct())
    seen = indexed.join(probe, keys, "left_semi").select(*keys).distinct()
    return batch.join(F.broadcast(seen), keys, "left_anti")


def with_occ_retry(body, attempts: int = 3):
    """Run a re-plannable read-modify-write ``body`` (a zero-arg callable
    that re-reads the manifest itself), re-planning on an OCC abort.

    The gates' registers and the document sink merge are idempotent and
    plan against the manifest they read, so losing an optimistic-
    concurrency race to an out-of-band writer — ``engine.maintain()``
    compacting a gate table is the expected one — is not an error, just a
    stale plan: re-running the body re-reads the manifest and converges.
    Without this, a cron ``maintain()`` landing between a live stream's
    plan and its commit would kill the streaming query. Deterministic
    conflicts (e.g. an actual lost-update bug) still surface: retries are
    bounded and the final failure propagates."""
    for i in range(attempts):
        try:
            return body()
        except RuntimeError as e:
            msg = str(e)
            if i == attempts - 1 or not (
                "concurrent commit" in msg or "rebucketed" in msg
            ):
                raise


def commit_fresh(store, table: str, fresh: DataFrame, key: str, manifest: dict) -> None:
    """Commit ``fresh`` (materialized, non-empty) rows into ONLY the
    buckets they land in. The membership probe touches every bucket the
    BATCH hashes into, but replay-heavy batches leave most of those
    unchanged — rewriting them is pure wasted IO, and at thousands of
    buckets the write set shrinks to ~|fresh| buckets. OCC over the write
    set alone is sufficient: a key's freshness verdict can only be
    invalidated by a concurrent commit to that key's OWN bucket (keys hash
    to exactly one), which is in the write set whenever the key is
    written."""
    write_set = store.buckets_of(fresh, key=key, table=table)
    base = store._scan_manifest(table, manifest, write_set)
    store.write_buckets(
        table,
        base.unionByName(fresh),
        write_set,
        key=key,
        planned_versions=dict(manifest["buckets"]),
    )


class FoldLedger:
    """Durable registry of batch ids already folded into history — the
    ENFORCED replay horizon for the foldable gate tables (span-dedup gram
    counts, postings stats). ``fold_history`` commits the folded ids here
    BEFORE rewriting the table, and ``register`` refuses ids the ledger
    contains: a batch replayed after its per-batch rows were absorbed
    into the ``_folded`` row would otherwise re-register and double-count
    silently. A crash between the ledger commit and the fold is
    conservative — the ids are refused for replay but their rows are
    still per-batch (queries sum correctly); re-running the fold heals.

    Id convention (ENFORCED, not just descriptive): any id of the form
    ``<prefix>:<int>`` is treated as a run + epoch, and epochs MUST be
    assigned monotonically per prefix — folding epoch N commits a per-run
    horizon that refuses EVERY epoch <= N of that prefix, including ones
    never registered (that is what keeps the ledger O(runs) instead of
    O(batches); the streaming scheme ``<run_id>:<spark_batch_id>``
    satisfies monotonicity by construction). A manual caller who wants
    out-of-order ids must avoid the ``:<int>`` suffix — such free-form
    ids are kept verbatim and refused individually. One JSON file beside
    the table, atomic replace, single-writer (folds serialize with their
    table's maintenance, per the gates' external-serialization contract).
    """

    def __init__(self, store, table: str):
        import os

        self._path = os.path.join(store.root, table, "_folded_batches.json")

    @staticmethod
    def _split(batch_id: str) -> tuple[str, int] | None:
        run, sep, epoch = batch_id.rpartition(":")
        if sep and epoch.isdigit():
            return run, int(epoch)
        return None

    def _load(self) -> dict:
        import json

        try:
            with open(self._path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"runs": {}, "ids": []}

    def contains(self, batch_id: str) -> bool:
        led = self._load()
        parts = self._split(batch_id)
        if parts is not None:
            run, epoch = parts
            horizon = led["runs"].get(run)
            if horizon is not None and epoch <= horizon:
                return True
        return batch_id in led["ids"]

    def check_replayable(self, batch_id: str) -> None:
        """Raise if ``batch_id`` lies behind the fold horizon."""
        if self.contains(batch_id):
            raise RuntimeError(
                f"batch id {batch_id!r} was already folded into history "
                f"({self._path}); re-registering it would double-count. "
                "Replays are only valid within the fold horizon — drain "
                "consumers past a batch before folding it. Note ids of "
                "the form <prefix>:<int> are monotone epochs per prefix: "
                "folding epoch N refuses every epoch <= N of that prefix, "
                "so new batches must use higher epochs (or a different "
                "prefix)."
            )

    def add_all(self, batch_ids) -> None:
        from stripe_sync_engine_spark.commitio import atomic_write_json

        led = self._load()
        ids = set(led["ids"])
        for b in batch_ids:
            parts = self._split(b)
            if parts is not None:
                run, epoch = parts
                led["runs"][run] = max(epoch, led["runs"].get(run, -1))
            else:
                ids.add(b)
        led["ids"] = sorted(ids)
        if len(led["ids"]) > FREEFORM_IDS_WARN:
            import warnings

            warnings.warn(
                f"fold ledger {self._path} holds {len(led['ids'])} FREE-FORM "
                f"batch ids (> {FREEFORM_IDS_WARN}); free-form ids never "
                "compact, so the ledger grows per batch forever. Adopt the "
                "<prefix>:<int> epoch convention, which folds to one horizon "
                "per run (O(runs) ledger).",
                RuntimeWarning,
                stacklevel=2,
            )
        atomic_write_json(self._path, led)


def apply_feed_changes(gate, feed: DataFrame) -> None:
    """ONE implementation of the gates' change-window protocol (the
    exact, near, and embedding gates' ``apply_changes`` all delegate
    here — a fix to the split or the ordering fixes every gate, the
    ``fold_batch_rows`` discipline): delete and ``update_preimage``
    rows unregister their pre-images; insert/update post-images
    register. Unregister FIRST so an in-window content swap (doc A
    deletes 'x' while doc B inserts 'x') lands registered, not erased.
    The checkpoint is idempotent: a feed the engine's fan-out already
    materialized is not re-materialized (``ensure_local_checkpoint``)."""
    changed = ensure_local_checkpoint(feed)
    dels = changed.where(
        F.col("_change_type").isin("delete", "update_preimage")
    ).drop("_change_type")
    ups = changed.where(
        F.col("_change_type").isin("insert", "update")
    ).drop("_change_type")
    gate.unregister(dels)
    if not ups.isEmpty():
        gate.register(ups)


def delete_matching_rows(
    store, table: str, pairs: DataFrame, keys: list[str], bucket_key: str
) -> None:
    """ONE implementation of the gates' bucket-pruned delete (the
    unregister dance the three gates share): probe only the buckets the
    ``pairs`` hash into, no-op when nothing matches (replays), and
    rewrite ONLY the buckets actually losing rows — anti-joined on ALL
    of ``keys``, so a partial match never deletes a bystander row.
    ``pairs`` must be materialized (callers localCheckpoint — the
    commit's vacuum deletes files its lineage could re-read)."""
    if pairs.isEmpty():
        return
    manifest = store._read_manifest(table)
    touched = store.buckets_of(pairs, key=bucket_key, table=table)
    base = store._scan_manifest(table, manifest, touched)
    hit = base.join(F.broadcast(pairs), keys, "left_semi").localCheckpoint(eager=True)
    if hit.isEmpty():
        return
    write_set = store.buckets_of(hit, key=bucket_key, table=table)
    # `keep` feeds the write directly, UNCHECKPOINTED: the commit
    # consumes the lineage exactly once while the old version files it
    # reads still exist, and an OCC retry re-derives everything from a
    # fresh manifest — eagerly materializing the survivors here would
    # double-scan the table's biggest frame for nothing.
    keep = store._scan_manifest(table, manifest, write_set).join(
        F.broadcast(pairs), keys, "left_anti"
    )
    store.write_buckets(
        table,
        keep,
        write_set,
        key=bucket_key,
        planned_versions=dict(manifest["buckets"]),
    )


def sub_batch_id(batch_id: str, kind: str) -> str:
    """Namespace a CDC window's sub-batches (postings/ANN apply_changes
    split a window into a delete and an insert half) WITHOUT breaking
    the FoldLedger's O(runs) compaction: an epoch-convention window id
    keeps the convention — ``'gates:7'`` → ``'gates:del:7'`` (prefix
    ``gates:del``, epoch 7, still one ledger horizon per consumer) —
    while a free-form id keeps the verbatim ``'<id>:del'`` suffix. A
    naive ``f"{batch_id}:{kind}"`` would turn EVERY epoch id free-form
    (the suffix is not an int), growing the ledger per window forever."""
    parts = FoldLedger._split(batch_id)
    if parts is not None:
        run, epoch = parts
        return f"{run}:{kind}:{epoch}"
    return f"{batch_id}:{kind}"


def fold_batch_rows(
    store, table: str, key: str, collapse, into_batch_id: str = "_folded"
) -> dict | None:
    """ONE implementation of the fold protocol the gates share
    (span-gate gram counts, postings stats, packer progress): scan the
    whole table, commit the distinct batch ids to the FoldLedger BEFORE
    the rewrite (a crash in between is conservative — ids refused, rows
    still per-batch, re-running heals), collapse via the gate-specific
    ``collapse(rows) -> folded_rows_with_batch_id``, and rewrite under
    OCC. The write set is the present buckets PLUS the folded rows' own
    (a folded row keyed by ``into_batch_id`` need not hash into a
    present bucket — write_buckets only persists the buckets it is
    given). Keeping the ledger-before-rewrite ordering in one place
    means a fix to the crash-window reasoning fixes every gate.

    Returns a fold-stats record — ``{"table", "rows_before",
    "rows_after", "batches_absorbed", "into_batch_id"}`` — or None when
    there was nothing to fold, so maintenance can surface state-table
    health (``engine.maintain`` logs it durably). ``rows_before`` is one
    extra lazy pass over the pre-fold state, taken BEFORE the rewrite
    (the commit's vacuum may delete the files that lineage reads);
    ``rows_after`` rides the already-checkpointed folded frame. The raw
    rows are never materialized — at scale the state table is the thing
    the fold exists to bound, but it can still be large right before the
    fold runs.

    Retention contract (the engine-wide read-modify-write rule, stated
    here because folds span several jobs over one lazy scan): when live
    registrars share the table, run folds under NONZERO
    ``vacuum_retain_s`` — at retain=0 a concurrent commit's vacuum can
    delete version files this scan's lineage still pins mid-fold (a
    FileNotFound, not a clean OCC retry). With retention, the race
    resolves at ``write_buckets``' planned_versions precondition and
    ``with_occ_retry`` re-plans. Same rule every compaction and
    read-modify-write maintenance path here already lives by."""
    if not store.exists(table):
        return None
    ledger = FoldLedger(store, table)

    def body():
        manifest = store._read_manifest(table)
        all_buckets = sorted(int(b) for b in manifest["buckets"])
        if not all_buckets:
            return None
        rows = store._scan_manifest(table, manifest, all_buckets)
        folded_ids = [
            r["batch_id"]
            for r in rows.select("batch_id").distinct().collect()
            if r["batch_id"] != into_batch_id
        ]
        if not folded_ids:
            return None
        rows_before = rows.count()
        ledger.add_all(folded_ids)
        folded = collapse(rows).localCheckpoint(eager=True)
        write_set = sorted(
            set(all_buckets) | set(store.buckets_of(folded, key=key, table=table))
        )
        store.write_buckets(
            table,
            folded,
            write_set,
            key=key,
            planned_versions=dict(manifest["buckets"]),
        )
        return {
            "table": table,
            "rows_before": rows_before,
            "rows_after": folded.count(),
            "batches_absorbed": len(folded_ids),
            "into_batch_id": into_batch_id,
        }

    return with_occ_retry(body)


class IncrementalDeduper:
    """Exact-dedup gate over a persisted fingerprint table."""

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

    def _fresh_fps(self, batch: DataFrame) -> DataFrame:
        """(fingerprint, min doc_id) of batch content the store has not
        seen — the pure core of both phases. Probes only the buckets the
        batch's hashes touch."""
        fps = self._fingerprints(batch)
        store, table = self.store, self.table
        if store.exists(table):
            touched = store.buckets_of(fps, key=FINGERPRINT_COL, table=table)
            known = store.read_buckets(table, touched)
            fps = anti_probe(fps, known, [FINGERPRINT_COL])
        return fps.groupBy(FINGERPRINT_COL).agg(F.min("doc_id").alias("doc_id"))

    def select_new(self, batch: DataFrame) -> DataFrame:
        """PURE: rows of ``batch`` with never-seen content (within-batch
        duplicates collapsed to the min-id row), original schema. No
        state is mutated — pair with ``register`` for durability."""
        return self._originals(batch, self._fresh_fps(batch))

    def register(self, docs: DataFrame) -> None:
        """Durably record ``docs``' fingerprints. Idempotent: content the
        table already holds registers nothing (so replays are no-ops and
        calling it with a superset of earlier registrations is safe). One
        OCC-guarded partial commit into only the touched buckets; a pure
        replay skips the commit entirely. The committed (fingerprint,
        first registrant id) rows are the provenance a curation pipeline
        needs to answer "which document made this one a duplicate".

        Out-of-band writers (``engine.maintain()`` compacting the gate
        table under a live stream) are tolerated by re-planning on the
        OCC abort (``with_occ_retry``); concurrent REGISTRARS still
        serialize externally — batches are the unit."""
        with_occ_retry(lambda: self._register_once(docs))

    def _register_once(self, docs: DataFrame) -> None:
        store, table = self.store, self.table
        if not store.exists(table):
            store.write(table, self._fresh_fps(docs), key=FINGERPRINT_COL)
            return
        fps = self._fingerprints(docs)
        # plan, read, and commit against ONE manifest; the version map is
        # the commit's OCC precondition, so a concurrent writer racing on
        # the same buckets fails loudly instead of losing registrations
        # (serialize concurrent registrars externally; batches are the unit)
        manifest = store._read_manifest(table)
        touched = store.buckets_of(fps, key=FINGERPRINT_COL, table=table)
        known = store._scan_manifest(table, manifest, touched)
        fresh = (
            anti_probe(fps, known, [FINGERPRINT_COL])
            .groupBy(FINGERPRINT_COL)
            .agg(F.min("doc_id").alias("doc_id"))
            # materialize BEFORE the commit: the lineage reads the
            # pre-commit bucket files, which the commit's vacuum deletes
            # (retain=0) — later re-evaluation would scan vanished paths
            .localCheckpoint(eager=True)
        )
        if fresh.isEmpty():
            return
        commit_fresh(store, table, fresh, FINGERPRINT_COL, manifest)

    def filter_new(self, batch: DataFrame) -> DataFrame:
        """select_new + register in one call: survivors (original schema),
        durably registered so a later batch — or a replay of this one —
        treats them as seen.

        Fused (r16, guide §1.2): the two-call form scans and anti-probes
        the touched buckets TWICE — once inside select (to find fresh
        content) and again inside register (to re-derive the same fresh
        set from the survivors) — because each phase plans against its own
        manifest read. Here both phases share ONE manifest, ONE bucket
        probe and ONE touched-bucket scan: for the EXACT gate the
        survivors' (fingerprint, min doc_id) pairs ARE the select phase's
        fresh frame (identical content gates replays, so a survivor is
        fresh by construction — unlike the near/embedding gates, whose
        registers keep their own freshness anti-probe because self-matches
        deliberately never gate there). Concurrency is unchanged: the
        commit carries the planned manifest's version map, and an OCC
        abort (out-of-band compaction) re-plans the WHOLE body against a
        fresh manifest, exactly like register. Crash ordering is the
        two-call form's: nothing is registered until the single commit."""
        store, table = self.store, self.table
        if not store.exists(table):
            fresh = self._fresh_fps(batch).localCheckpoint(eager=True)
            survivors = self._originals(batch, fresh).localCheckpoint(eager=True)
            if not fresh.isEmpty():
                store.write(table, fresh, key=FINGERPRINT_COL)
            return survivors

        def body() -> DataFrame:
            manifest = store._read_manifest(table)
            fps = self._fingerprints(batch)
            touched = store.buckets_of(fps, key=FINGERPRINT_COL, table=table)
            known = store._scan_manifest(table, manifest, touched)
            fresh = (
                anti_probe(fps, known, [FINGERPRINT_COL])
                .groupBy(FINGERPRINT_COL)
                .agg(F.min("doc_id").alias("doc_id"))
                # materialized BEFORE the commit (vacuum deletes the bucket
                # files this lineage reads), and the survivors join reads it
                .localCheckpoint(eager=True)
            )
            survivors = self._originals(batch, fresh).localCheckpoint(eager=True)
            if not fresh.isEmpty():
                commit_fresh(store, table, fresh, FINGERPRINT_COL, manifest)
            return survivors

        return with_occ_retry(body)

    def unregister(self, docs: DataFrame) -> None:
        """Remove ``docs``' content fingerprints — the TAKEDOWN path: a
        document deleted from the corpus (licensing, right-to-erasure)
        must stop suppressing future near-identical text, or a revised
        resubmission is rejected forever by a ghost. ``docs`` carries the
        PRE-IMAGE content (exactly what a change feed's delete rows hold);
        only rows whose (fingerprint, registrant id) BOTH match are
        removed, so taking down a never-registered duplicate leaves the
        surviving keeper's fingerprint — and the gate — intact.
        Bucket-pruned by fingerprint, idempotent (a replay matches
        nothing), OCC-guarded like register.

        Known non-refcounted edge: the gate stores ONE registrant per
        fingerprint, so if identical content entered the corpus OUTSIDE
        the gate (e.g. an out-of-band UPDATE rewrote another doc to the
        keeper's exact text) and the keeper is then taken down, the
        fingerprint is removed even though a copy survives — future
        identical submissions re-admit. Content-level refcounting is
        deliberately out of scope (gate-composed ingestion never admits
        the second copy in the first place); corpora mutated out-of-band
        should re-register the surviving corpus after takedowns — and
        the drift this edge leaves is exactly what the sampled audit
        detects and ``index_audit.repair_from_audit`` re-registers
        (detect → repair → clean re-audit, the operational loop)."""
        with_occ_retry(lambda: self._unregister_once(docs))

    def _unregister_once(self, docs: DataFrame) -> None:
        if not self.store.exists(self.table):
            return
        pairs = (
            self._fingerprints(docs)
            .select(FINGERPRINT_COL, "doc_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
        delete_matching_rows(
            self.store, self.table, pairs, [FINGERPRINT_COL, "doc_id"], FINGERPRINT_COL
        )

    def apply_changes(self, feed: DataFrame) -> None:
        """Keep the gate tracking a mutating corpus from one change-feed
        window (``read_changes`` output: table columns + ``_change_type``):
        DELETE rows carry pre-images and unregister; insert/update
        post-images register (idempotent — already-seen content adds
        nothing). With the DEFAULT feed, UPDATE pre-images are absent
        (``read_changes`` emits post-images for updates) and their
        fingerprints stay by contract: the corpus genuinely contained
        that content, and for a dedup gate "seen once, ever" is the
        semantics — full erasure of updated-away content then needs the
        rebuild path. A feed read with ``emit_update_preimages=True``
        upgrades the contract: its ``update_preimage`` rows unregister
        like deletes, so updated-away content retires incrementally
        too."""
        apply_feed_changes(self, feed)

    def _originals(self, batch: DataFrame, fresh_fps: DataFrame) -> DataFrame:
        """Survivor rows in the batch's ORIGINAL schema (semi-join on the
        surviving (fingerprint, doc_id) pairs, so within-batch duplicate
        rows beyond the min-id keeper are excluded too)."""
        keyed = batch.withColumn(FINGERPRINT_COL, F.md5(F.col(self.content_col)))
        keepers = fresh_fps.withColumnRenamed("doc_id", self.id_col)
        return keyed.join(
            # keepers ≤ |batch| behind a join+agg: hint the broadcast
            F.broadcast(keepers), [FINGERPRINT_COL, self.id_col], "left_semi"
        ).drop(FINGERPRINT_COL)

    def seen_count(self) -> int:
        """Registered distinct-content count (corpus cardinality)."""
        df = self.store.read(self.table)
        return 0 if df is None else df.count()


class IncrementalNearDeduper:
    """Near-dup gate over a persisted MinHash-LSH band index (module
    docstring has the design; same two-phase contract as the exact
    gate). Self-matches never gate (see ``select_new``) — replay
    suppression is the exact gate's job; ``register`` replays are
    no-ops either way."""

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

    def candidates(self, batch: DataFrame, _rows: DataFrame | None = None) -> DataFrame:
        """(doc_id, seen_doc_id, est_jaccard) — corpus near-candidates of
        the batch, est_jaccard = mean signature-component agreement.
        Bucket-pruned: only the batch's own band-key buckets are read.
        ``_rows``: precomputed ``_band_rows(batch)`` (signature compute is
        the batch-side cost — ``filter_new`` shares ONE materialization
        between select and register instead of shingling twice)."""
        rows = _rows if _rows is not None else self._band_rows(batch)
        store, table = self.store, self.table
        if not store.exists(table):
            return rows.select(
                F.col("doc_id"),
                F.col("doc_id").alias("seen_doc_id"),
                F.lit(0.0).alias("est_jaccard"),
            ).limit(0)
        touched = store.buckets_of(rows, key="band_key", table=table)
        return self._candidates_against(rows, store.read_buckets(table, touched))

    def select_new(self, batch: DataFrame, _rows: DataFrame | None = None) -> DataFrame:
        """PURE: batch rows with no corpus near-candidate at
        ``threshold`` (original schema). No state is mutated.

        SELF-matches (an index row with the same doc id) never gate: a
        document is not a near-dup of itself — it is a REPLAY, and replay
        suppression belongs to the exact gate / the caller's keyed sink,
        not here. This is what makes the streaming pipeline's
        sink → near.register → exact.register ordering fully convergent
        across a crash between the two registrations (module docstring).
        Consequence: the near gate ALONE does not suppress identical-id
        replays — compose it behind the exact gate (which also keeps
        identical text from reaching this index twice)."""
        dup_ids = (
            self.candidates(batch, _rows)
            .where(
                (F.col("est_jaccard") >= self.threshold)
                & (F.col("seen_doc_id") != F.col("doc_id"))
            )
            .select("doc_id")
            .distinct()
            .withColumnRenamed("doc_id", self.id_col)
        )
        # dup_ids is ≤|batch| but sits behind a join+agg whose size Spark
        # can't estimate — hint the broadcast rather than risk a sort-merge
        return batch.join(F.broadcast(dup_ids), self.id_col, "left_anti")

    def register(self, docs: DataFrame, _rows: DataFrame | None = None) -> None:
        """Durably record ``docs``' band rows, idempotently per
        (doc_id, band_key, sig) — replays register nothing, and an
        UPDATED doc's rows commit whenever ANY of its signature changed,
        even for band keys the update left intact (the embedding gate's
        freshness design, widened by the signature digest; superseded
        old rows stay keep-seen ghosts until a pre-image feed retires
        them) — with the same OCC-guarded single partial commit and the
        same out-of-band re-plan tolerance as the exact gate. ``_rows``:
        precomputed band rows for exactly ``docs`` (must be re-derivable
        WITHOUT reading store files — materialized, or a pure projection
        over materialized frames — because a retry re-reads them after
        the aborted plan's vacuum)."""
        with_occ_retry(lambda: self._register_once(docs, _rows))

    @staticmethod
    def _with_sig_key(rows: DataFrame) -> DataFrame:
        """Band rows plus ``_sig_key``, an md5 over the FULL signature
        columns — the freshness probe's third key component."""
        from stripe_sync_engine_spark.plans.dedup import MINHASH_SEEDS

        return rows.withColumn(
            "_sig_key",
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"m{s}").cast("string") for s in range(MINHASH_SEEDS)]
                )
            ),
        )

    def _register_once(self, docs: DataFrame, _rows: DataFrame | None = None) -> None:
        rows = _rows if _rows is not None else self._band_rows(docs)
        store, table = self.store, self.table
        if not store.exists(table):
            store.write(table, rows, key="band_key")
            return
        manifest = store._read_manifest(table)
        touched = store.buckets_of(rows, key="band_key", table=table)
        index = store._scan_manifest(table, manifest, touched)
        # Freshness key (doc_id, band_key, sig_digest). (doc_id, band_key)
        # is the embedding gate's (bucket, vec_id) design — an UPDATED
        # doc shares some band keys with its old rows, and a doc_id-only
        # probe would see the doc in one shared bucket and drop ALL its
        # new rows, permanently missing the new content's bands (a
        # recall hole). The sig digest closes the REMAINING staleness:
        # band rows carry the doc's FULL m0..m11 signature, so an update
        # that keeps a band's own slice (same band_key) but changes other
        # components would otherwise leave that row's sig columns frozen
        # at the OLD content, and candidates()'s est_jaccard against it
        # would score the doc's old text. With the digest in the key,
        # any signature change re-registers every band row; superseded
        # same-key rows become keep-seen ghosts (conservative — they
        # still gate, and max-agreement in candidates() means the fresh
        # row dominates for current content) until a pre-image feed
        # retires them (apply_changes unregisters on the (band,
        # band_key, doc_id) triple, which sweeps every generation).
        # Replays still register nothing.
        fresh = (
            anti_probe(
                self._with_sig_key(rows),
                self._with_sig_key(index),
                ["doc_id", "band_key", "_sig_key"],
            )
            .drop("_sig_key")
            .localCheckpoint(eager=True)
        )  # pre-commit lineage cut (vacuum)
        if fresh.isEmpty():
            return
        commit_fresh(store, table, fresh, "band_key", manifest)

    def filter_new(self, batch: DataFrame) -> DataFrame:
        """select_new + register in one call — sharing ONE band-row
        materialization: signatures (shingling + MINHASH_SEEDS mins per
        doc) are the batch-side cost, and computing them once instead of
        twice is ~30% off the steady-state gate (bench
        dd_incremental_near_batch)."""
        rows = self._band_rows(batch).localCheckpoint(eager=True)
        survivors = self.select_new(batch, _rows=rows).localCheckpoint(eager=True)
        surv_ids = survivors.select(F.col(self.id_col).alias("doc_id"))
        # LAZY (r16): both parents are checkpointed, so this projection is
        # re-derivable without reading any store file — register's OCC
        # retry re-evaluates it safely, and the eager materialization was
        # one whole extra driver-waited job per batch. (register's
        # freshness anti-probe stays: self-matches never gate here, so a
        # replayed batch's rows reach register and must be dropped by it.)
        surv_rows = rows.join(F.broadcast(surv_ids), "doc_id", "left_semi")
        self.register(survivors, _rows=surv_rows)
        return survivors

    def unregister(self, docs: DataFrame) -> None:
        """Remove ``docs``' band rows — the near gate's takedown path
        (mirrors the exact gate's ``unregister``). ``docs`` carries the
        PRE-IMAGE content AS REGISTERED: band keys are recomputed from it
        and pruned to their own buckets, so deletion is O(batch), never an
        index scan. Rows are matched on (band, band_key, doc_id) — all
        three — so a hash-coincident other document is never touched.
        Idempotent, OCC-guarded."""
        with_occ_retry(lambda: self._unregister_once_near(docs))

    def _unregister_once_near(self, docs: DataFrame) -> None:
        if not self.store.exists(self.table):
            return
        # pairs may be empty when every deleted doc was too short to
        # shingle — delete_matching_rows no-ops on that
        pairs = (
            self._band_rows(docs)
            .select("band", "band_key", "doc_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
        delete_matching_rows(
            self.store, self.table, pairs, ["band", "band_key", "doc_id"], "band_key"
        )

    def apply_changes(self, feed: DataFrame) -> None:
        """Same change-feed contract as the exact gate's ``apply_changes``
        (see it for the update-pre-image pin and the
        ``emit_update_preimages`` upgrade): deletes — and, when present,
        ``update_preimage`` rows — unregister their pre-image band rows,
        insert/update post-images register."""
        apply_feed_changes(self, feed)

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
            # batch band rows are the broadcastable side; the index scan
            # stays map-side at any store size
            F.broadcast(rows)
            .join(renamed, ["band", "band_key"])
            .groupBy("doc_id", "seen_doc_id")
            .agg((F.max(agree) / F.lit(float(MINHASH_SEEDS))).alias("est_jaccard"))
        )


class ContaminationGate:
    """Benchmark-decontamination gate over a persisted eval-gram table.

    ``register_benchmark`` stores the DISTINCT word n-grams of the eval
    suites (idempotent keyed merge — registering the same suite twice
    adds nothing); ``select_clean`` then PURELY filters a batch to docs
    whose contaminated-gram fraction stays at or below ``max_frac``.
    Unlike the dedup gates there is no per-batch registration: the
    benchmark set only changes when new eval suites ship, so the gate
    composes anywhere in a stream's gate order and replays trivially.

    100 TB shape: benchmark suites are MBs while batches are arbitrary,
    so the GRAM TABLE side broadcasts (the inverse of the dedup gates,
    where the persisted side is the big one) and the batch side never
    shuffles for the membership probe — one groupBy(doc_id) exchange,
    map-side partial-agged, carries the hit counts (mirrors
    plans/textops.txt_contamination, which shares the gram core)."""

    TABLE = "_benchmark_grams"

    def __init__(self, store, n: int | None = None, max_frac: float = 0.2, table: str = TABLE):
        from stripe_sync_engine_spark.plans.textops import CONTAM_N

        self.store = store
        self.n = CONTAM_N if n is None else n
        self.max_frac = max_frac
        self.table = table

    def _grams_of(self, docs: DataFrame) -> DataFrame:
        from stripe_sync_engine_spark.plans.textops import contam_grams_for

        return contam_grams_for(docs, self.n)

    def register_benchmark(self, texts: DataFrame) -> int:
        """Add the distinct n-grams of ``texts`` (any DataFrame with
        doc_id + text columns) to the persisted benchmark set. Returns
        grams added; re-registering a suite adds zero."""
        grams = (
            self._grams_of(texts).select(F.explode("grams").alias("gram")).distinct()
        )
        store, table = self.store, self.table
        if not store.exists(table):
            store.write(table, grams, key="gram")
            return store.read(table).count()

        def attempt() -> int:
            manifest = store._read_manifest(table)
            touched = store.buckets_of(grams, key="gram", table=table)
            known = store._scan_manifest(table, manifest, touched)
            fresh = anti_probe(grams, known, ["gram"]).localCheckpoint(eager=True)
            n = fresh.count()
            if n:
                commit_fresh(store, table, fresh, "gram", manifest)
            return n

        return with_occ_retry(attempt)

    def contamination_of(self, docs: DataFrame) -> DataFrame:
        """(doc_id, n_grams, n_contaminated) per batch doc — the pure
        measurement, same columns as the corpus plan."""
        per_doc = self._grams_of(docs)
        bench = self.store.read(self.table)
        if bench is None:
            return per_doc.select(
                "doc_id",
                F.size("grams").cast("long").alias("n_grams"),
                F.lit(0).cast("long").alias("n_contaminated"),
            )
        exploded = per_doc.select(
            "doc_id", F.size("grams").alias("n_grams"), F.explode_outer("grams").alias("gram")
        )
        joined = exploded.join(
            F.broadcast(bench.withColumn("hit", F.lit(1))), "gram", "left"
        )
        return joined.groupBy("doc_id").agg(
            F.max("n_grams").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_contaminated"),
        )

    def select_clean(self, batch: DataFrame) -> DataFrame:
        """PURE: batch rows whose contaminated fraction ≤ max_frac
        (docs too short to form a gram pass — nothing to match on),
        original schema."""
        contam = self.contamination_of(batch)
        clean = contam.where(
            (F.col("n_grams") == 0)
            | (F.col("n_contaminated") <= F.col("n_grams") * F.lit(self.max_frac))
        ).select("doc_id")
        return batch.join(F.broadcast(clean), "doc_id", "left_semi")
