"""Sampled drift audit of the derived indexes (operators/index_audit):
clean maintained indexes pass; injected out-of-band drift — a
hand-deleted fingerprint, a hand-removed band row, a hand-moved ANN
code row, an unmaintained corpus write — is caught and named. The
audit is verify_export for the retrieval/dedup layer."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from stripe_sync_engine_spark.storage import TableStore
from stripe_sync_engine_spark.sync.engine import StripeSparkSync


def _docs(spark, n=10):
    return spark.createDataFrame(
        [(i, f"alpha audit doc {i} has body words {i % 3}") for i in range(n)],
        "doc_id long, text string",
    )


def test_audit_text_targets_clean_then_drifted(spark, tmp_path):
    from stripe_sync_engine_spark.operators.incremental_dedup import (
        FINGERPRINT_COL,
        IncrementalDeduper,
        IncrementalNearDeduper,
    )
    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex

    store = TableStore(spark, str(tmp_path / "wh_audit"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    store.write("corpus", _docs(spark), key="doc_id")
    exact = IncrementalDeduper(store)
    near = IncrementalNearDeduper(store)
    idx = PersistedPostingsIndex(store)
    eng.maintain_corpus_indexes("a", "corpus", gates=[exact, near], postings=idx)

    rep = eng.audit_corpus_indexes("corpus", gates=[exact, near], postings=idx)
    assert rep["ok"], rep
    by_kind = {t["kind"]: t for t in rep["targets"]}
    assert set(by_kind) == {"exact_gate", "near_gate", "postings"}
    assert all(t["checked"] == 10 for t in rep["targets"])
    assert by_kind["postings"]["stats_ok"] and by_kind["postings"]["forward_ok"]
    assert by_kind["postings"]["stats_n_docs"] == 10
    # the report landed durably
    audits = [r for r in eng.read_maintenance_log() if r.get("op") == "index_audit"]
    assert audits and audits[-1]["ok"] is True and audits[-1]["entity"] == "corpus"

    # drift 1: hand-delete doc 3's fingerprint (the takedown edge's shape)
    fp3 = exact._fingerprints(_docs(spark).where("doc_id = 3")).first()[FINGERPRINT_COL]
    tbl = store.read(exact.table)
    store.write(exact.table, tbl.where(F.col(FINGERPRINT_COL) != fp3), key=FINGERPRINT_COL)
    # drift 2: hand-remove ONE of doc 5's band rows
    bands = store.read(near.table)
    victim = bands.where("doc_id = 5").first()
    store.write(
        near.table,
        bands.where(
            ~((F.col("doc_id") == 5) & (F.col("band_key") == victim["band_key"]))
        ),
        key="band_key",
    )

    rep2 = eng.audit_corpus_indexes("corpus", gates=[exact, near], postings=idx)
    assert not rep2["ok"]
    by_kind = {t["kind"]: t for t in rep2["targets"]}
    assert by_kind["exact_gate"]["drift_ids"] == [3]
    assert by_kind["near_gate"]["drift_ids"] == [5]
    assert by_kind["postings"]["ok"]  # untouched target still clean

    # drift 3: an out-of-band corpus write nobody maintained — the stats
    # cardinality check and the per-doc probes both flag it
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(99, "unmaintained straggler")],
                                  "doc_id long, text string")
        ),
        key="doc_id",
    )
    rep3 = eng.audit_corpus_indexes("corpus", gates=[exact], postings=idx)
    by_kind = {t["kind"]: t for t in rep3["targets"]}
    assert 99 in by_kind["exact_gate"]["drift_ids"]
    p = by_kind["postings"]
    assert not p["stats_ok"] and p["stats_n_docs"] == 10 and p["corpus_rows"] == 11
    assert 99 in p["drift_ids"] and not p["forward_ok"]


def test_audit_vector_targets_clean_then_moved_code_row(spark, tmp_path):
    from stripe_sync_engine_spark.operators.embedding_index import (
        IncrementalEmbeddingIndex,
    )
    from stripe_sync_engine_spark.operators.pq_index import PersistedIVFPQ, train_ivf_pq

    rng = [[(0.01 * ((i * 7 + d * 3) % 50) - 0.25) for d in range(64)] for i in range(64)]
    store = TableStore(spark, str(tmp_path / "wh_audit_v"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    vecs = spark.createDataFrame(
        [(i, rng[i]) for i in range(32)], "vec_id long, embedding array<double>"
    )
    store.write("vectors", vecs, key="vec_id")
    idx = train_ivf_pq(vecs, n_cells=4, m=8, k=8)
    gate = IncrementalEmbeddingIndex(store, id_col="vec_id")
    ann = PersistedIVFPQ(store, idx)
    eng.maintain_corpus_indexes("v", "vectors", gates=[gate], ann=ann)

    rep = eng.audit_corpus_indexes("vectors", gates=[gate], ann=ann)
    assert rep["ok"], rep
    by_kind = {t["kind"]: t for t in rep["targets"]}
    assert set(by_kind) == {"embedding_index", "ivfpq"}
    assert by_kind["ivfpq"]["checked"] == 32

    # hand-move vec 9's code row to another cell — unregister would later
    # prune the wrong bucket; the audit catches it from both sides
    codes = store.read(ann.table)
    moved = codes.withColumn(
        "cell",
        F.when(F.col("vec_id") == 9, (F.col("cell") + 1) % 4).otherwise(F.col("cell")),
    )
    store.write(ann.table, moved, key="cell")
    fwd = store.read(ann.forward_table)
    store.write(
        ann.forward_table,
        fwd.withColumn(
            "cell",
            F.when(F.col("vec_id") == 9, (F.col("cell") + 1) % 4).otherwise(
                F.col("cell")
            ),
        ),
        key="vec_id",
    )
    rep2 = eng.audit_corpus_indexes("vectors", gates=[gate], ann=ann)
    by_kind = {t["kind"]: t for t in rep2["targets"]}
    assert not rep2["ok"]
    assert by_kind["ivfpq"]["drift_ids"] == [9]
    assert by_kind["embedding_index"]["ok"]  # LSH gate untouched


def test_repair_text_targets_closes_drift_and_replay_is_noop(spark, tmp_path):
    """The loop: injected drift → audit → repair → CLEAN audit. The
    repairer recomputes the full drifted set with the audit's own probe
    (drift_ids in the report are a capped preview), re-registers exactly
    those docs through the gates, re-audits each target before
    returning, and logs durably. Replaying the repair against the same
    (now stale) report finds no drift and registers nothing."""
    from stripe_sync_engine_spark.operators.incremental_dedup import (
        FINGERPRINT_COL,
        IncrementalDeduper,
        IncrementalNearDeduper,
    )

    store = TableStore(spark, str(tmp_path / "wh_repair"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    store.write("corpus", _docs(spark), key="doc_id")
    exact = IncrementalDeduper(store)
    near = IncrementalNearDeduper(store)
    eng.maintain_corpus_indexes("a", "corpus", gates=[exact, near])

    # inject the two content-keyed drift shapes
    fp3 = exact._fingerprints(_docs(spark).where("doc_id = 3")).first()[FINGERPRINT_COL]
    store.write(
        exact.table,
        store.read(exact.table).where(F.col(FINGERPRINT_COL) != fp3),
        key=FINGERPRINT_COL,
    )
    bands = store.read(near.table)
    victim = bands.where("doc_id = 5").first()
    store.write(
        near.table,
        bands.where(
            ~((F.col("doc_id") == 5) & (F.col("band_key") == victim["band_key"]))
        ),
        key="band_key",
    )

    rep = eng.audit_corpus_indexes("corpus", gates=[exact, near])
    assert not rep["ok"]
    fix = eng.repair_corpus_indexes("corpus", rep, gates=[exact, near])
    assert fix["ok"] and not fix["refused"]
    by_kind = {r["kind"]: r for r in fix["repaired"]}
    assert by_kind["exact_gate"]["drifted_docs"] == 1
    assert by_kind["near_gate"]["drifted_docs"] == 1
    assert all(r["post_ok"] for r in fix["repaired"])
    assert eng.audit_corpus_indexes("corpus", gates=[exact, near])["ok"]

    # replayed repair (same stale report): no drift found, nothing written
    v_exact = store._read_manifest(exact.table)["buckets"]
    v_near = store._read_manifest(near.table)["buckets"]
    fix2 = eng.repair_corpus_indexes("corpus", rep, gates=[exact, near])
    assert fix2["ok"]
    assert all(r["drifted_docs"] == 0 for r in fix2["repaired"])
    assert store._read_manifest(exact.table)["buckets"] == v_exact
    assert store._read_manifest(near.table)["buckets"] == v_near

    # both outcomes landed durably beside their audits
    ops = [r["op"] for r in eng.read_maintenance_log()]
    assert ops.count("index_repair") == 2


def test_repair_embedding_replaces_stale_qv(spark, tmp_path):
    """A stale quantization at an UNCHANGED bucket is the case plain
    re-register cannot fix (its (bucket, vec_id) freshness skips the
    row) — the repairer unregisters-then-registers the drifted vectors
    so the current qv lands."""
    from stripe_sync_engine_spark.operators.embedding_index import (
        IncrementalEmbeddingIndex,
    )

    rng = [[(0.01 * ((i * 7 + d * 3) % 50) - 0.25) for d in range(64)] for i in range(24)]
    store = TableStore(spark, str(tmp_path / "wh_repair_v"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    vecs = spark.createDataFrame(
        [(i, rng[i]) for i in range(24)], "vec_id long, embedding array<double>"
    )
    store.write("vectors", vecs, key="vec_id")
    gate = IncrementalEmbeddingIndex(store, id_col="vec_id")
    eng.maintain_corpus_indexes("v", "vectors", gates=[gate])
    assert eng.audit_corpus_indexes("vectors", gates=[gate])["ok"]

    # corrupt vec 7's stored quantization in place — bucket unchanged
    tbl = store.read(gate.table)
    store.write(
        gate.table,
        tbl.withColumn(
            "qv",
            F.when(
                F.col("vec_id") == 7,
                F.transform(F.col("qv"), lambda x: x + F.lit(1)),
            ).otherwise(F.col("qv")),
        ),
        key="bucket",
    )
    rep = eng.audit_corpus_indexes("vectors", gates=[gate])
    assert not rep["ok"]
    assert {t["kind"]: t for t in rep["targets"]}["embedding_index"]["drift_ids"] == [7]

    fix = eng.repair_corpus_indexes("vectors", rep, gates=[gate])
    assert fix["ok"] and fix["repaired"][0]["drifted_docs"] == 1
    assert eng.audit_corpus_indexes("vectors", gates=[gate])["ok"]
    # exactly one row per (bucket, vec_id) for vec 7 — replaced, not doubled
    assert store.read(gate.table).where("vec_id = 7").groupBy(
        "bucket"
    ).count().where("count > 1").isEmpty()


def test_repair_refuses_rebuild_only_and_missing_targets(spark, tmp_path):
    """Postings / IVF-PQ drift is refused with the rebuild pointer (a
    sampled re-register would corrupt the batch-keyed stats), and a gate
    whose table was never built is refused rather than part-registered."""
    from stripe_sync_engine_spark.operators.incremental_dedup import (
        IncrementalDeduper,
    )
    from stripe_sync_engine_spark.operators.index_audit import (
        audit_corpus_indexes,
        repair_from_audit,
    )
    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex

    store = TableStore(spark, str(tmp_path / "wh_repair_r"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    store.write("corpus", _docs(spark), key="doc_id")
    idx = PersistedPostingsIndex(store)
    eng.maintain_corpus_indexes("a", "corpus", postings=idx)

    # truncate the stats table: postings drift that is rebuild-only
    store.write("corpus_extra", _docs(spark, 1), key="doc_id")  # noop filler
    stats = store.read(idx.stats_table)
    store.write(idx.stats_table, stats.limit(0), key="batch_id")
    rep = eng.audit_corpus_indexes("corpus", gates=[], postings=idx)
    assert not rep["ok"]
    fix = eng.repair_corpus_indexes("corpus", rep, postings=idx)
    assert not fix["ok"] and not fix["repaired"]
    assert fix["refused"][0]["kind"] == "postings"
    assert "rebuild" in fix["refused"][0]["reason"]

    # a never-built gate is refused, not sample-registered
    ghost = IncrementalDeduper(store, table="_never_built")
    corpus = store.read("corpus")
    rep2 = audit_corpus_indexes(corpus, gates=[ghost])
    assert not rep2["ok"] and rep2["targets"][0].get("missing_table")
    fix2 = repair_from_audit(rep2, corpus, gates=[ghost])
    assert not fix2["ok"] and fix2["refused"][0]["kind"] == "exact_gate"
    assert "never built" in fix2["refused"][0]["reason"]
    assert not store.exists("_never_built")

    # a table that existed at AUDIT time but was dropped before the
    # repair (operator mid-rebuild with a stale report) is refused with
    # the same structure — never an AttributeError crash
    import shutil as _sh

    gone = IncrementalDeduper(store, table="_dropped_later")
    gone.register(corpus)
    rep3 = audit_corpus_indexes(corpus, gates=[gone])
    # inject drift so the target is failing, then drop the whole table
    fp = gone._fingerprints(corpus.limit(1)).first()["fingerprint"]
    store.write(
        "_dropped_later",
        store.read("_dropped_later").where(F.col("fingerprint") != fp),
        key="fingerprint",
    )
    rep3 = audit_corpus_indexes(corpus, gates=[gone])
    assert not rep3["ok"]
    _sh.rmtree(store._dir("_dropped_later"), ignore_errors=True)
    fix3 = repair_from_audit(rep3, corpus, gates=[gone])
    assert not fix3["ok"] and "disappeared" in fix3["refused"][0]["reason"]


def test_audit_missing_and_unknown_targets(spark, tmp_path):
    """An index that was never built audits as missing (ok only for an
    empty corpus); an unknown gate type raises rather than silently
    passing."""
    from stripe_sync_engine_spark.operators.index_audit import audit_corpus_indexes
    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex

    store = TableStore(spark, str(tmp_path / "wh_audit_m"), vacuum_retain_s=3600.0)
    docs = _docs(spark, 4)
    idx = PersistedPostingsIndex(store)  # never registered
    rep = audit_corpus_indexes(docs, postings=idx)
    assert not rep["ok"] and rep["targets"][0].get("missing_table")

    with pytest.raises(TypeError, match="cannot audit"):
        audit_corpus_indexes(docs, gates=[object()])


def test_repair_embedding_removes_old_bucket_ghost(spark, tmp_path):
    """ADVICE r11: an out-of-band embedding change that also MOVES the
    vector's LSH bucket leaves a stale-qv ghost at the OLD bucket — a
    current-bucket unregister can't see it and the presence-keyed audit
    structurally can't either. The repairer deletes the drifted ids'
    rows STORE-WIDE (any bucket) before re-registering, so the ghost
    dies with the repair."""
    from stripe_sync_engine_spark.operators.embedding_index import (
        IncrementalEmbeddingIndex,
    )

    rng = [[(0.01 * ((i * 7 + d * 3) % 50) - 0.25) for d in range(64)] for i in range(24)]
    store = TableStore(spark, str(tmp_path / "wh_repair_g"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    vecs = spark.createDataFrame(
        [(i, rng[i]) for i in range(24)], "vec_id long, embedding array<double>"
    )
    store.write("vectors", vecs, key="vec_id")
    gate = IncrementalEmbeddingIndex(store, id_col="vec_id")
    eng.maintain_corpus_indexes("vg", "vectors", gates=[gate])
    assert eng.audit_corpus_indexes("vectors", gates=[gate])["ok"]
    old_buckets = {
        r["bucket"] for r in store.read(gate.table).where("vec_id = 7").collect()
    }

    # out-of-band: vec 7's embedding flips sign IN THE CORPUS only — its
    # LSH bucket moves (every hyperplane dot negates), the index keeps
    # the old-bucket row with the old qv
    import time

    time.sleep(0.002)
    store.write(
        "vectors",
        store.read("vectors").withColumn(
            "embedding",
            F.when(
                F.col("vec_id") == 7,
                F.transform(F.col("embedding"), lambda x: -x),
            ).otherwise(F.col("embedding")),
        ),
        key="vec_id",
    )
    new_buckets = {
        r["bucket"] for r in gate._bq(store.read("vectors").where("vec_id = 7")).collect()
    }
    assert new_buckets != old_buckets  # the move actually happened

    rep = eng.audit_corpus_indexes("vectors", gates=[gate])
    assert not rep["ok"]
    fix = eng.repair_corpus_indexes("vectors", rep, gates=[gate])
    assert fix["ok"]
    assert eng.audit_corpus_indexes("vectors", gates=[gate])["ok"]
    # the ghost is GONE: vec 7 owns exactly its current-bucket rows
    got = {
        r["bucket"] for r in store.read(gate.table).where("vec_id = 7").collect()
    }
    assert got == new_buckets
    assert not (got & old_buckets)


def test_repair_refuses_unaddressed_failing_targets(spark, tmp_path):
    """ADVICE r11: a failing target whose object the caller did NOT pass
    to the repair (rebuild-only postings without the postings argument, a
    gate absent from gates=...) must be refused, not silently skipped —
    ok=True over a known-failing index would read as 'verified clean'."""
    from stripe_sync_engine_spark.operators.incremental_dedup import (
        IncrementalDeduper,
    )
    from stripe_sync_engine_spark.operators.index_audit import (
        audit_corpus_indexes,
        repair_from_audit,
    )
    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex

    store = TableStore(spark, str(tmp_path / "wh_repair_u"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    store.write("corpus", _docs(spark), key="doc_id")
    idx = PersistedPostingsIndex(store)
    gate = IncrementalDeduper(store)
    eng.maintain_corpus_indexes("u", "corpus", gates=[gate], postings=idx)

    # break BOTH: truncate the postings stats (rebuild-only drift) and
    # hand-delete one fingerprint (gate drift)
    store.write(idx.stats_table, store.read(idx.stats_table).limit(0), key="batch_id")
    corpus = store.read("corpus")
    fp = gate._fingerprints(corpus.limit(1)).first()["fingerprint"]
    store.write(
        gate.table,
        store.read(gate.table).where(F.col("fingerprint") != fp),
        key="fingerprint",
    )
    rep = eng.audit_corpus_indexes("corpus", gates=[gate], postings=idx)
    assert not rep["ok"]

    # repair called with NEITHER object: both failing targets refused
    fix = repair_from_audit(rep, corpus)
    assert not fix["ok"] and not fix["repaired"]
    refused = {r["kind"]: r for r in fix["refused"]}
    assert "rebuild" in refused["postings"]["reason"]
    assert "not passed" in refused["exact_gate"]["reason"]

    # with the gate passed, the gate repairs but the rebuild-only target
    # is STILL refused even though the postings object was omitted
    fix2 = repair_from_audit(rep, corpus, gates=[gate])
    assert not fix2["ok"]
    assert [r["kind"] for r in fix2["repaired"]] == ["exact_gate"]
    assert fix2["repaired"][0]["post_ok"]
    assert [r["kind"] for r in fix2["refused"]] == ["postings"]
