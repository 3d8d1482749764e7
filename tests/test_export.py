"""Shard exporter tests: determinism, manifest verification, corruption
detection, resume rewriting only changed shards, emptied-shard cleanup."""

import os

from pyspark.sql import functions as F

from stripe_sync_engine_spark.operators.export import (
    _shard_col,
    export_corpus_shards,
    read_manifest,
    verify_export,
)
from stripe_sync_engine_spark.tables import load_table

N_SHARDS = 4


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")


def test_export_and_verify_round_trip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exp")
    docs = _docs(spark, sf_dir)
    manifest = export_corpus_shards(docs, out, n_shards=N_SHARDS)
    assert manifest["total_docs"] == docs.count()
    assert set(manifest["shards"]) == {str(k) for k in range(N_SHARDS)}
    report = verify_export(spark, out)
    assert report["ok"], report
    assert report["total_docs"] == manifest["total_docs"]
    # Every doc is present exactly once across shards, in its md5 shard.
    back = spark.read.parquet(os.path.join(out, "data"))
    assert back.count() == manifest["total_docs"]
    assert back.select("doc_id").distinct().count() == manifest["total_docs"]


def test_export_is_deterministic(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    a = export_corpus_shards(docs, str(tmp_path / "a"), n_shards=N_SHARDS)
    b = export_corpus_shards(docs, str(tmp_path / "b"), n_shards=N_SHARDS)
    assert a["shards"] == b["shards"]


def test_verify_catches_corruption(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exp")
    export_corpus_shards(_docs(spark, sf_dir), out, n_shards=N_SHARDS)
    # Remove one shard's data file: verify must flag exactly that shard.
    victim = os.path.join(out, "data", "shard=2")
    files = [f for f in os.listdir(victim) if f.endswith(".parquet")]
    assert files
    os.remove(os.path.join(victim, files[0]))
    report = verify_export(spark, out)
    assert not report["ok"]
    assert report["mismatched_shards"] == [2]


def test_resume_rewrites_only_changed_shards(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exp")
    docs = _docs(spark, sf_dir)
    first = export_corpus_shards(docs, out, n_shards=N_SHARDS)
    assert sorted(first["shards_rewritten"]) == list(range(N_SHARDS))

    # Identical rerun: nothing rewritten, directories untouched.
    mtimes = {
        k: os.path.getmtime(os.path.join(out, "data", f"shard={k}"))
        for k in range(N_SHARDS)
    }
    again = export_corpus_shards(docs, out, n_shards=N_SHARDS, resume=True)
    assert again["shards_rewritten"] == []
    for k in range(N_SHARDS):
        assert os.path.getmtime(os.path.join(out, "data", f"shard={k}")) == mtimes[k]

    # Change ONE document: only its shard is rewritten; verify stays green.
    one = docs.limit(1).collect()[0]
    changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == one["doc_id"], F.lit("EDITED")).otherwise(F.col("text")),
    )
    third = export_corpus_shards(changed, out, n_shards=N_SHARDS, resume=True)
    assert len(third["shards_rewritten"]) == 1
    assert verify_export(spark, out)["ok"]


def test_resume_removes_emptied_shard(spark, tmp_path):
    out = str(tmp_path / "exp")
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    export_corpus_shards(docs, out, n_shards=N_SHARDS)
    # Keep only docs of shard 0's complement: empty at least one shard.
    kept = docs.filter(_shard_col("doc_id", N_SHARDS) != 1)
    manifest = export_corpus_shards(kept, out, n_shards=N_SHARDS, resume=True)
    assert manifest["shards"]["1"]["n_docs"] == 0
    assert not os.path.isdir(os.path.join(out, "data", "shard=1"))
    assert verify_export(spark, out)["ok"]


def test_resume_rejects_shard_count_change(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exp")
    export_corpus_shards(_docs(spark, sf_dir), out, n_shards=N_SHARDS)
    try:
        export_corpus_shards(_docs(spark, sf_dir), out, n_shards=8, resume=True)
    except ValueError as ex:
        assert "n_shards" in str(ex)
    else:
        raise AssertionError("expected ValueError on shard-count change")


def test_manifest_is_atomic(spark, sf_dir, tmp_path):
    out = str(tmp_path / "exp")
    export_corpus_shards(_docs(spark, sf_dir), out, n_shards=N_SHARDS)
    m = read_manifest(out)
    assert m["format_version"] == 1
    assert not os.path.exists(os.path.join(out, "manifest.json.tmp"))


def test_incremental_export_from_change_set(spark, sf_dir, tmp_path):
    from stripe_sync_engine_spark.operators.export import export_changed_shards

    out = str(tmp_path / "exp")
    docs = _docs(spark, sf_dir)
    export_corpus_shards(docs, out, n_shards=N_SHARDS)

    rows = docs.limit(3).collect()
    upd_id, del_id, keep_id = (r["doc_id"] for r in rows)
    new_id = 10_000_000
    current = (
        docs.filter(F.col("doc_id") != del_id)
        .withColumn(
            "text",
            F.when(F.col("doc_id") == upd_id, F.lit("EDITED")).otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame([(new_id, "fresh", "en")], "doc_id long, text string, lang string")
        )
    )
    changed = spark.createDataFrame(
        [(upd_id,), (del_id,), (new_id,)], "doc_id long"
    )
    manifest = export_changed_shards(current, out, changed)
    assert manifest["total_docs"] == docs.count()  # -1 delete +1 insert
    assert 1 <= len(manifest["shards_rewritten"]) <= 3
    assert verify_export(spark, out)["ok"]
    # Incremental result is digest-identical to a from-scratch export.
    full = export_corpus_shards(current, str(tmp_path / "full"), n_shards=N_SHARDS)
    assert manifest["shards"] == full["shards"]
    # keep_id's shard untouched unless it shares a shard with a change.
    del keep_id


def test_incremental_export_rejects_reshaped_columns(spark, sf_dir, tmp_path):
    """A reordered or widened projection must be a fresh export, not an
    increment: touched shards would digest the new column struct while
    untouched shards carry forward old-column digests — the mismatch
    would only surface later as a confusing verify failure. Loud now."""
    import pytest

    from stripe_sync_engine_spark.operators.export import export_changed_shards

    out = str(tmp_path / "exp")
    docs = _docs(spark, sf_dir)
    export_corpus_shards(docs, out, n_shards=N_SHARDS)
    changed = docs.limit(1).select("doc_id")
    reordered = docs.select(*reversed(docs.columns))
    with pytest.raises(ValueError, match="column mismatch"):
        export_changed_shards(reordered, out, changed)
    widened = docs.withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="column mismatch"):
        export_changed_shards(widened, out, changed)
    # the matching projection still works
    assert export_changed_shards(docs, out, changed)["total_docs"] == docs.count()


def test_incremental_export_noop_change_set(spark, sf_dir, tmp_path):
    from stripe_sync_engine_spark.operators.export import export_changed_shards

    out = str(tmp_path / "exp")
    docs = _docs(spark, sf_dir)
    export_corpus_shards(docs, out, n_shards=N_SHARDS)
    mtimes = {
        k: os.path.getmtime(os.path.join(out, "data", f"shard={k}"))
        for k in range(N_SHARDS)
    }
    # Replayed ids with identical content: nothing rewritten.
    changed = docs.limit(5).select("doc_id")
    manifest = export_changed_shards(docs, out, changed)
    assert manifest["shards_rewritten"] == []
    for k in range(N_SHARDS):
        assert os.path.getmtime(os.path.join(out, "data", f"shard={k}")) == mtimes[k]


def test_streamed_curation_to_incremental_export(spark, tmp_path):
    """Capstone pipeline: JSONL docs stream through the curation gates
    into the corpus table; the change feed names what moved; incremental
    export rewrites only those shards — and the result is digest-equal to
    a from-scratch export of the current corpus."""
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.operators.export import export_changed_shards
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import start_document_stream

    landing = tmp_path / "landing"
    ckpt = tmp_path / "ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh"), vacuum_retain_s=3600.0)
    out = str(tmp_path / "corpus_v1")

    def land(name, rows):
        (landing / name).write_text("\n".join(_json.dumps(r) for r in rows))

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    land("b1.jsonl", [
        {"doc_id": 1, "text": base, "source": "web"},
        {"doc_id": 3, "text": "totally different content about spark parquet engines running distributed queries", "source": "web"},
    ])
    start_document_stream(store, str(landing), str(ckpt)).awaitTermination()
    corpus = store.read("corpus_documents").select("doc_id", "text", "source")
    export_corpus_shards(corpus, out, n_shards=N_SHARDS)
    t0 = store.commits("corpus_documents")[-1]

    land("b2.jsonl", [
        {"doc_id": 10, "text": base, "source": "crawl"},  # exact dup: gated
        {"doc_id": 12, "text": "fresh unrelated words describing completely novel subject matter entirely here today", "source": "crawl"},
    ])
    start_document_stream(store, str(landing), str(ckpt)).awaitTermination()

    feed = store.read_changes("corpus_documents", t0)
    changed = feed.select("doc_id")
    assert {r["doc_id"] for r in changed.collect()} == {12}

    current = store.read("corpus_documents").select("doc_id", "text", "source")
    manifest = export_changed_shards(current, out, changed)
    assert manifest["total_docs"] == 3
    assert len(manifest["shards_rewritten"]) == 1
    assert verify_export(spark, out)["ok"]
    scratch = export_corpus_shards(current, str(tmp_path / "scratch"), n_shards=N_SHARDS)
    assert manifest["shards"] == scratch["shards"]
