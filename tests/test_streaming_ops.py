"""Streaming analytics operators: watermarked windowed aggregation and
applyInPandasWithState sessionization (state carried across micro-batches,
deterministic data-driven session closes)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from stripe_sync_engine_spark.streaming.sessions import sessionize_batch, sessionize_stream
from stripe_sync_engine_spark.streaming.windows import windowed_event_counts

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", LongType()),
    ]
)


def _write_batch(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(event_id: int, ts: str, user_id: int, event_type: str = "click", value: int = 1) -> dict:
    return {
        "event_id": event_id,
        "ts": ts,
        "user_id": user_id,
        "event_type": event_type,
        "value": value,
    }


def _drain(stream_df, tmp_path, name: str):
    """Run one availableNow pass into a memory sink; return collected rows."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_with_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_batch(
        landing,
        "b1.json",
        [
            _ev(1, "2024-01-01 00:10:00", 1, "click", 2),
            _ev(2, "2024-01-01 00:40:00", 1, "click", 3),
            _ev(3, "2024-01-01 01:10:00", 2, "view", 5),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(landing)
    windowed = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    # append-mode windows only emit when the watermark passes; push it
    # forward with a later second batch
    _write_batch(landing, "b2.json", [_ev(4, "2024-01-01 05:00:00", 3, "click", 1)])
    _drain(windowed, tmp_path, "win_counts")
    rows = {
        (r["window_start"].isoformat(), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert rows[("2024-01-01T00:00:00", "click")] == (2, 5.0)
    assert rows[("2024-01-01T01:00:00", "view")] == (1, 5.0)


def test_windowed_counts_batch_parity(spark, sf_dir):
    from stripe_sync_engine_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(events, window="1 day", watermark="1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()  # tumbling windows partition the stream


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    landing = str(tmp_path / "sess_landing")
    ckpt = str(tmp_path / "ckpt_sessions")
    collected: list = []

    def run_pass():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(landing)
        sessions = sessionize_stream(stream, gap_s=1800)
        q = (
            sessions.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: user 1 has two events 10 min apart (one open session)
    _write_batch(
        landing,
        "b1.json",
        [
            _ev(1, "2024-01-01 00:00:00", 1),
            _ev(2, "2024-01-01 00:10:00", 1),
        ],
    )
    run_pass()
    assert collected == []  # session still open, held in state

    # batch 2 (same checkpoint → state restored): an event 2h later closes
    # the session; a second user appears
    _write_batch(
        landing,
        "b2.json",
        [
            _ev(3, "2024-01-01 02:10:00", 1),
            _ev(4, "2024-01-01 00:05:00", 2),
        ],
    )
    run_pass()
    assert len(collected) == 1
    s = collected[0]
    assert s["user_id"] == 1 and s["n_events"] == 2
    assert s["session_start"].isoformat() == "2024-01-01T00:00:00"
    assert s["session_end"].isoformat() == "2024-01-01T00:10:00"


def test_sessionize_batch_gaps_and_islands(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:10:00"),
        (3, 1, "2024-01-01 02:00:00"),
        (4, 2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        (r["user_id"], r["session_start"].isoformat()): r["n_events"]
        for r in sessionize_batch(df, gap_s=1800).collect()
    }
    assert out == {
        (1, "2024-01-01T00:00:00"): 2,
        (1, "2024-01-01T02:00:00"): 1,
        (2, "2024-01-01T00:00:00"): 1,
    }


def test_dedupe_stream_across_microbatches(spark, tmp_path):
    from stripe_sync_engine_spark.streaming.windows import dedupe_stream

    landing = str(tmp_path / "landing_dd")
    # event 1 appears in both files; maxFilesPerTrigger=1 forces the files
    # into separate micro-batches so the dedup state must carry across
    _write_batch(
        landing,
        "b1.json",
        [_ev(1, "2024-01-01 00:10:00", 1), _ev(2, "2024-01-01 00:11:00", 1)],
    )
    _write_batch(
        landing,
        "b2.json",
        [_ev(1, "2024-01-01 00:10:00", 1), _ev(3, "2024-01-01 00:12:00", 2)],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    deduped = dedupe_stream(stream, key_cols=("event_id",), watermark="1 hour")
    _drain(deduped, tmp_path, "dd_stream")
    got = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dd_stream").collect())
    assert got == [1, 2, 3]


def test_dedupe_stream_batch_fallback(spark):
    from stripe_sync_engine_spark.streaming.windows import dedupe_stream

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "event_id long, payload string"
    )
    assert dedupe_stream(df, key_cols=("event_id",)).count() == 2


# ---------------------------------------------------------------------------
# Streaming document ingestion with incremental dedup gates (r7):
# streaming/documents.py — select → keyed sink merge → register, convergent
# across crash-replay at any point.
def test_document_stream_dedups_across_batches(spark, tmp_path):
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import start_document_stream

    landing = tmp_path / "docs_landing"
    ckpt = tmp_path / "docs_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_docs"))
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"

    def land(name, rows):
        (landing / name).write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )

    land("b1.jsonl", [
        {"doc_id": 1, "text": base, "source": "web"},
        {"doc_id": 2, "text": base, "source": "web"},          # exact dup of 1 (in batch)
        {"doc_id": 3, "text": "totally different content about spark parquet engines running distributed queries", "source": "web"},
    ])
    start_document_stream(store, str(landing), str(ckpt)).awaitTermination()
    corpus = {r["doc_id"] for r in store.read("corpus_documents").collect()}
    assert corpus == {1, 3}  # in-batch exact dup collapsed to min id

    land("b2.jsonl", [
        {"doc_id": 10, "text": base, "source": "crawl"},        # exact dup of corpus
        {"doc_id": 11, "text": base + " extra", "source": "crawl"},  # near dup of 1
        {"doc_id": 12, "text": "fresh unrelated words describing completely novel subject matter entirely here today", "source": "crawl"},
    ])
    start_document_stream(store, str(landing), str(ckpt)).awaitTermination()
    corpus = {r["doc_id"] for r in store.read("corpus_documents").collect()}
    assert corpus == {1, 3, 12}  # exact AND near dups gated


def test_document_stream_file_uri_checkpoint_normalized(spark, tmp_path):
    """A file:-scheme checkpoint URI must not split the stream's state:
    the side-cars (span-gate run id, funnel files) os-write to the raw
    string, so without normalization they land in a literal './file:/...'
    tree while Spark checkpoints to the real path. Both streams share
    ONE normalizer (documents._local_checkpoint_path)."""
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import (
        _local_checkpoint_path,
        start_document_stream,
    )

    assert _local_checkpoint_path("file:///ck/pt") == "/ck/pt"

    landing = tmp_path / "uri_landing"
    ckpt = tmp_path / "uri_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_uri_docs"))
    (landing / "b1.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "alpha beta gamma delta words", "source": "web"})
    )
    start_document_stream(
        store, str(landing), "file://" + str(ckpt), span_k=3
    ).awaitTermination()
    assert store.read("corpus_documents").count() == 1
    # the span-gate run id landed beside the REAL checkpoint, and no
    # literal 'file:' directory appeared anywhere nearby
    assert _os.path.exists(ckpt / "span_gate_run_id")
    assert not _os.path.exists("file:") and not _os.path.exists(str(tmp_path / "file:"))


def test_document_stream_crash_between_sink_and_register_converges(spark, tmp_path):
    """Crash AFTER the sink merge but BEFORE registration — the widest
    at-least-once window — then restart: the replayed batch re-selects
    the same docs, the keyed sink drops them, registration completes,
    and a third batch is gated correctly against the healed state."""
    import json as _json
    import os as _os

    import pytest as _pytest
    from pyspark.sql.streaming import StreamingQueryException

    from stripe_sync_engine_spark.operators.incremental_dedup import IncrementalDeduper
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming import documents as docmod

    landing = tmp_path / "docs_landing_c"
    ckpt = tmp_path / "docs_ckpt_c"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_docs_c"))
    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    (landing / "b1.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": base, "source": "web"})
    )
    real_register = IncrementalDeduper.register

    def crash_register(self, docs):
        raise RuntimeError("injected crash before exact registration")

    IncrementalDeduper.register = crash_register
    try:
        q = docmod.start_document_stream(store, str(landing), str(ckpt))
        with _pytest.raises(StreamingQueryException):
            q.awaitTermination()
    finally:
        IncrementalDeduper.register = real_register
    # sink has the doc, fingerprints do not — the crash window
    assert store.read("corpus_documents").count() == 1
    assert store.read("_document_fingerprints") is None
    # restart: replay converges, then a near-dup batch is gated correctly
    (landing / "b2.jsonl").write_text(
        _json.dumps({"doc_id": 5, "text": base + " extra", "source": "crawl"})
    )
    docmod.start_document_stream(store, str(landing), str(ckpt)).awaitTermination()
    corpus = {r["doc_id"] for r in store.read("corpus_documents").collect()}
    assert corpus == {1}  # replay re-inserted nothing; near-dup 5 gated
    assert store.read("_document_fingerprints").count() == 1  # healed


def test_document_stream_self_vacuums(spark, tmp_path):
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import start_document_stream

    landing = tmp_path / "docs_landing_v"
    ckpt = tmp_path / "docs_ckpt_v"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_docs_v"))
    (landing / "a.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "w1 w2 w3 w4 w5 w6 w7 w8", "source": "s"})
    )
    start_document_stream(store, str(landing), str(ckpt), vacuum_landing_every=1).awaitTermination()
    assert (landing / "a.jsonl").exists()  # own batch not yet committed at vacuum time
    (landing / "b.jsonl").write_text(
        _json.dumps({"doc_id": 2, "text": "x1 x2 x3 x4 x5 x6 x7 x8", "source": "s"})
    )
    start_document_stream(store, str(landing), str(ckpt), vacuum_landing_every=1).awaitTermination()
    assert not (landing / "a.jsonl").exists() and (landing / "b.jsonl").exists()
    assert {r["doc_id"] for r in store.read("corpus_documents").collect()} == {1, 2}


def test_contamination_gate_unit(spark, tmp_path):
    """register_benchmark is idempotent, select_clean drops docs copying
    benchmark phrases, keeps clean and too-short docs, and measures the
    same fractions the corpus plan would."""
    from stripe_sync_engine_spark.operators.incremental_dedup import ContaminationGate
    from stripe_sync_engine_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "wh_contam"))
    gate = ContaminationGate(store, max_frac=0.2)
    bench = spark.createDataFrame(
        [(1, "the capital of france is paris obviously")], "doc_id long, text string"
    )
    n1 = gate.register_benchmark(bench)
    assert n1 > 0
    assert gate.register_benchmark(bench) == 0  # idempotent

    docs = spark.createDataFrame(
        [
            (10, "model answer the capital of france is paris obviously end", "web"),
            (11, "completely unrelated words about distributed query engines here", "web"),
            (12, "too short", "web"),  # < n tokens: no grams, passes
        ],
        "doc_id long, text string, source string",
    )
    clean = {r["doc_id"] for r in gate.select_clean(docs).collect()}
    assert clean == {11, 12}
    m = {r["doc_id"]: (r["n_contaminated"], r["n_grams"]) for r in gate.contamination_of(docs).collect()}
    assert m[10][0] >= 5 and m[11][0] == 0 and m[12] == (0, 0)
    # without a registered benchmark everything passes
    empty_gate = ContaminationGate(TableStore(spark, str(tmp_path / "wh_contam2")))
    assert empty_gate.select_clean(docs).count() == 3


def test_document_stream_with_contamination_gate(spark, tmp_path):
    """Streamed curation with decontamination first: a doc that copies a
    benchmark phrase never reaches the corpus or the dedup state."""
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.operators.incremental_dedup import ContaminationGate
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import start_document_stream

    landing = tmp_path / "cdocs_landing"
    ckpt = tmp_path / "cdocs_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_cdocs"))
    ContaminationGate(store).register_benchmark(
        spark.createDataFrame(
            [(1, "the capital of france is paris obviously")], "doc_id long, text string"
        )
    )
    (landing / "b1.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "students recall the capital of france is paris obviously when asked", "source": "web"},
                {"doc_id": 2, "text": "clean document describing parquet bucket manifests and streaming gates", "source": "web"},
            ]
        )
    )
    start_document_stream(
        store, str(landing), str(ckpt), contamination_max_frac=0.2
    ).awaitTermination()
    corpus = {r["doc_id"] for r in store.read("corpus_documents").collect()}
    assert corpus == {2}
    # the contaminated doc was filtered BEFORE registration: its content
    # is not in the fingerprint table, so policy changes can re-admit it
    fps = store.read("_document_fingerprints")
    assert fps.count() == 1


def test_document_stream_quality_gate(spark, tmp_path):
    """Low-quality docs (too few tokens / low diversity) never reach the
    corpus NOR the gate state — a later high-quality near-twin still
    lands."""
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import start_document_stream

    landing = tmp_path / "ql_landing"
    ckpt = tmp_path / "ql_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_ql"))
    good = "a genuinely varied sentence containing many different interesting words overall today"

    def land(name, rows):
        (landing / name).write_text("\n".join(_json.dumps(r) for r in rows))

    land("b1.jsonl", [
        {"doc_id": 1, "text": "too short", "source": "web"},                # < min tokens
        {"doc_id": 2, "text": "spam " * 19 + "spam", "source": "web"},      # low diversity
        {"doc_id": 3, "text": good, "source": "web"},
    ])
    start_document_stream(
        store, str(landing), str(ckpt),
        quality_min_tokens=10, quality_min_diversity=0.5,
    ).awaitTermination()
    assert {r["doc_id"] for r in store.read("corpus_documents").collect()} == {3}
    # The rejected docs left no fingerprints: doc 1's content arriving
    # later inside a LONG high-quality doc id is a fresh doc, and a
    # replayed doc 2 with fixed diversity is admitted.
    fps = store.read("_document_fingerprints")
    assert fps.count() == 1

    land("b2.jsonl", [
        {"doc_id": 20, "text": "spam " * 4 + "varied distinct interesting colorful brilliant words making this diverse enough now", "source": "web"},
    ])
    start_document_stream(
        store, str(landing), str(ckpt),
        quality_min_tokens=10, quality_min_diversity=0.5,
    ).awaitTermination()
    assert {r["doc_id"] for r in store.read("corpus_documents").collect()} == {3, 20}


def test_document_stream_lm_gate(spark, tmp_path, sf_dir):
    """A trained LM gates word-salad docs out of the stream; real-text
    docs pass."""
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.functions.ngram_lm import train_ngram_lm
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import start_document_stream
    from stripe_sync_engine_spark.tables import load_table

    corpus = load_table(spark, sf_dir, "documents").limit(200)
    lm = train_ngram_lm(corpus, min_count=2)
    real = corpus.select("text").first()["text"]
    salad = " ".join("zzqx" + str(i) for i in range(40))
    floor = (lm.score(real) + lm.score(salad)) / 2

    landing = tmp_path / "lm_landing"
    ckpt = tmp_path / "lm_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_lm"))
    (landing / "b1.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"doc_id": 1, "text": real, "source": "web"},
                {"doc_id": 2, "text": salad, "source": "web"},
            ]
        )
    )
    start_document_stream(
        store, str(landing), str(ckpt), lm_model=lm, lm_min_score=floor
    ).awaitTermination()
    assert {r["doc_id"] for r in store.read("corpus_documents").collect()} == {1}
    assert store.read("_document_fingerprints").count() == 1  # salad left no state


def test_document_stream_with_span_gate(spark, tmp_path):
    """ExactSubstr stage in the stream: boilerplate seen once in history
    clips out of later arrivals (keep-first), fully-boilerplate docs
    drop, and fresh text is untouched."""
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import start_document_stream

    landing = tmp_path / "span_landing"
    ckpt = tmp_path / "span_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_span_stream"))
    boiler = "subscribe to our newsletter for updates"

    def land(name, rows):
        (landing / name).write_text("\n".join(_json.dumps(r) for r in rows))

    land("b1.jsonl", [
        {"doc_id": 1, "text": f"intro words here {boiler}", "source": "web"},
        {"doc_id": 2, "text": "other fresh content entirely novel", "source": "web"},
    ])
    start_document_stream(
        store, str(landing), str(ckpt), near_threshold=None, span_k=3
    ).awaitTermination()
    corpus = {r["doc_id"]: r["text"] for r in store.read("corpus_documents").collect()}
    # boiler occurred ONCE so far: nothing clips in batch 1
    assert corpus[1] == f"intro words here {boiler}"

    land("b2.jsonl", [
        {"doc_id": 10, "text": f"{boiler} plus novel trailing words", "source": "crawl"},
        {"doc_id": 11, "text": boiler, "source": "crawl"},  # pure boilerplate
        {"doc_id": 12, "text": "more brand new material again", "source": "crawl"},
    ])
    start_document_stream(
        store, str(landing), str(ckpt), near_threshold=None, span_k=3
    ).awaitTermination()
    corpus = {r["doc_id"]: r["text"] for r in store.read("corpus_documents").collect()}
    assert corpus[10] == "plus novel trailing words"  # history copy kept, arrival clipped
    assert 11 not in corpus                            # fully clipped -> dropped
    assert corpus[12] == "more brand new material again"
    assert corpus[1] == f"intro words here {boiler}"   # the kept-first copy survives


def test_document_stream_funnel_metrics(spark, tmp_path):
    """funnel_metrics=True records where every document died, and the
    counts match the gate outcomes exactly on a batch engineered to lose
    documents at each stage (quality, span-drop, exact, near) — with the
    conservation invariant input == sum of cuts + inserted."""
    import json as _json
    import os as _os

    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.documents import (
        read_funnel_metrics,
        start_document_stream,
    )

    landing = tmp_path / "funnel_landing"
    ckpt = tmp_path / "funnel_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_funnel"))
    boiler = "subscribe to our newsletter for updates today"
    x = "unique exact target content words aplenty for duplication testing purposes"
    y = "another base document with plenty of filler words to be nearly copied later"

    def land(name, rows):
        (landing / name).write_text("\n".join(_json.dumps(r) for r in rows))

    def run():
        start_document_stream(
            store,
            str(landing),
            str(ckpt),
            near_threshold=0.6,
            quality_min_tokens=3,
            span_k=3,
            span_min_repeats=3,
            funnel_metrics=True,
        ).awaitTermination()

    land("b1.jsonl", [
        {"doc_id": 1, "text": f"{boiler} alpha beta gamma delta epsilon zeta", "source": "web"},
        {"doc_id": 2, "text": f"{boiler} omicron pi rho sigma tau upsilon", "source": "web"},
        {"doc_id": 3, "text": x, "source": "web"},
        {"doc_id": 4, "text": y, "source": "web"},
    ])
    run()
    land("b2.jsonl", [
        {"doc_id": 20, "source": "t"},                                   # null text
        {"doc_id": 21, "text": "tiny text", "source": "t"},              # < 3 tokens
        {"doc_id": 22, "text": boiler, "source": "t"},                   # pure boilerplate (3rd sighting)
        {"doc_id": 23, "text": f"{boiler} completely novel trailing commentary here", "source": "t"},
        {"doc_id": 24, "text": x, "source": "t"},                        # exact dup of 3
        {"doc_id": 25, "text": f"{y} slightly altered", "source": "t"},  # near dup of 4
        {"doc_id": 26, "text": "entirely fresh material on a wholly new topic never seen", "source": "t"},
    ])
    run()

    recs = read_funnel_metrics(str(ckpt))
    assert [r["batch_id"] for r in recs] == [0, 1]
    for r in recs:  # conservation: every input doc died somewhere or landed
        assert r["input"] == (
            r["quality_cut"] + r["lm_cut"] + r["contaminated"]
            + r["span_dropped"] + r["exact_dup"] + r["near_dup"] + r["inserted"]
        )
    b1, b2 = recs
    assert b1["input"] == 4 and b1["inserted"] == 4
    assert b2 == {
        "batch_id": 1, "input": 7, "quality_cut": 2, "lm_cut": 0,
        "contaminated": 0, "span_dropped": 1, "span_clipped_docs": 1,
        "exact_dup": 1, "near_dup": 1, "inserted": 2,
    }
    # the corpus agrees with the funnel's verdicts
    corpus = {r["doc_id"]: r["text"] for r in store.read("corpus_documents").collect()}
    assert set(corpus) == {1, 2, 3, 4, 23, 26}
    assert corpus[23] == "completely novel trailing commentary here"


def test_funnel_attribution_survives_crash_replay(spark, tmp_path):
    """The funnel line is appended once counts are final but BEFORE the
    registers, and reads are first-wins — so a crash-replay (whose exact
    gate rejects everything the first delivery registered) appends a
    second line that is IGNORED, and the surviving record carries the
    original attribution (inserted=N), matching what's actually in the
    corpus."""
    import json as _json
    import os as _os

    import pytest as _pytest
    from pyspark.sql.streaming import StreamingQueryException

    from stripe_sync_engine_spark.operators.incremental_dedup import IncrementalDeduper
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming import documents as docmod

    landing = tmp_path / "funnel_crash_landing"
    ckpt = tmp_path / "funnel_crash_ckpt"
    _os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh_funnel_crash"))
    (landing / "b1.jsonl").write_text(
        "\n".join(
            _json.dumps({"doc_id": i, "text": f"document number {i} with its own distinct words", "source": "web"})
            for i in (1, 2)
        )
    )
    real_register = IncrementalDeduper.register

    def crash_register(self, docs):
        raise RuntimeError("injected crash before exact registration")

    IncrementalDeduper.register = crash_register
    try:
        q = docmod.start_document_stream(
            store, str(landing), str(ckpt), near_threshold=None, funnel_metrics=True
        )
        with _pytest.raises(StreamingQueryException):
            q.awaitTermination()
    finally:
        IncrementalDeduper.register = real_register
    # the pre-crash line already carries the true attribution
    recs = docmod.read_funnel_metrics(str(ckpt))
    assert [(r["batch_id"], r["inserted"]) for r in recs] == [(0, 2)]
    # restart: this crash window (before exact.register) replays byte-
    # stably, so the replay's line agrees — but first-wins must hold even
    # for the post-register window where a replay's exact gate rejects
    # everything (simulated below), and torn lines must self-heal.
    docmod.start_document_stream(
        store, str(landing), str(ckpt), near_threshold=None, funnel_metrics=True
    ).awaitTermination()
    path = _os.path.join(str(ckpt), docmod.FUNNEL_FILE)
    raw_lines = open(path).read().strip().splitlines()
    assert len(raw_lines) == 2  # original + replay
    assert _json.loads(raw_lines[1])["inserted"] == 2  # byte-stable replay
    with open(path, "a") as f:
        # a post-register-window replay's divergent view: all exact dups
        f.write(_json.dumps({**_json.loads(raw_lines[0]), "inserted": 0, "exact_dup": 2}) + "\n")
        f.write('{"torn append from a crash mid-wri')  # no newline, no close brace
    recs = docmod.read_funnel_metrics(str(ckpt))
    assert [(r["batch_id"], r["inserted"], r["exact_dup"]) for r in recs] == [(0, 2, 0)]
    assert store.read("corpus_documents").count() == 2  # matches 'inserted'


def test_index_maintenance_stream_tracks_mutating_corpus(spark, tmp_path):
    """The streaming twin of maintain_corpus_indexes: the first
    micro-batch (initial load) BUILDS the exact gate and postings index,
    a later run over the same checkpoint applies the corpus's
    insert/update/delete window, and the result is score-identical to a
    fresh build over the current corpus. A third run with no new
    commits is a no-op, and the window ids compact in the fold ledger
    (epoch convention per checkpoint run)."""
    import math

    from stripe_sync_engine_spark.operators.incremental_dedup import IncrementalDeduper
    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.index_maintenance import (
        start_index_maintenance_stream,
    )
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_ims"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, f"alpha stream doc {i} words") for i in range(8)],
        "doc_id long, text string",
    )
    store.write("corpus", docs, key="doc_id")
    gate = IncrementalDeduper(store)
    idx = PersistedPostingsIndex(store)
    ckpt = str(tmp_path / "ckpt_ims")

    def run_once():
        q = start_index_maintenance_stream(
            eng, "corpus", ckpt, gates=[gate], postings=idx
        )
        assert q.awaitTermination(120), "availableNow run did not finish"
        q.stop()

    run_once()  # initial load builds both targets
    assert idx.topk(["alpha"], k=10).count() == 8
    assert gate.select_new(docs).isEmpty()

    import time as _t

    _t.sleep(0.002)
    nxt = (
        docs.where("doc_id >= 2")
        .where("doc_id != 7")
        .unionByName(
            spark.createDataFrame(
                [(7, "rewritten gamma body seven"), (100, "fresh delta doc")],
                "doc_id long, text string",
            )
        )
    )
    store.write("corpus", nxt, key="doc_id")
    run_once()  # the mutation window applies through the same checkpoint

    fresh = PersistedPostingsIndex(TableStore(spark, str(tmp_path / "wh_ims_f")))
    fresh.register(store.read("corpus"), "all")
    for terms in (["alpha"], ["gamma", "delta"]):
        got = {r["doc_id"]: r["score"] for r in idx.topk(terms, k=20).collect()}
        want = {r["doc_id"]: r["score"] for r in fresh.topk(terms, k=20).collect()}
        assert set(got) == set(want), terms
        for d, s in want.items():
            assert math.isclose(got[d], s, rel_tol=1e-9)

    before = store.read(idx.stats_table).count()
    run_once()  # no new commits: a no-op
    assert store.read(idx.stats_table).count() == before

    # window ids are epoch-convention per checkpoint run: fold compacts
    idx.fold_stats()
    led = json.load(
        open(os.path.join(store.root, idx.stats_table, "_folded_batches.json"))
    )
    assert led["ids"] == []


def test_index_maintenance_stream_handover_from_prebuilt_index(spark, tmp_path):
    """Subscribing the stream to indexes that ALREADY exist must pass
    starting_commit_ms (the commit the indexes are current to) — the
    handover then delivers NO initial load (postings stats stay exactly
    one batch row: no double-counted N/avgdl), and only later corpus
    windows apply."""
    import math

    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.index_maintenance import (
        start_index_maintenance_stream,
    )
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_imh"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, f"alpha handover doc {i} words") for i in range(6)],
        "doc_id long, text string",
    )
    store.write("corpus", docs, key="doc_id")
    idx = PersistedPostingsIndex(store)
    idx.register(store.read("corpus"), "prebuilt:0")  # built OUTSIDE the stream
    t0 = store.commits("corpus")[-1]
    ckpt = str(tmp_path / "ckpt_imh")

    def run_once():
        q = start_index_maintenance_stream(
            eng, "corpus", ckpt, postings=idx, starting_commit_ms=t0
        )
        assert q.awaitTermination(120)
        q.stop()

    run_once()  # handover: nothing re-delivered
    stats_ids = [r["batch_id"] for r in store.read(idx.stats_table).collect()]
    assert stats_ids == ["prebuilt:0"]  # no second whole-table stats row

    import time as _t

    _t.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(100, "fresh delta doc")], "doc_id long, text string")
        ),
        key="doc_id",
    )
    run_once()  # the post-handover window applies
    fresh = PersistedPostingsIndex(TableStore(spark, str(tmp_path / "wh_imh_f")))
    fresh.register(store.read("corpus"), "all")
    got = {r["doc_id"]: r["score"] for r in idx.topk(["alpha", "delta"], k=20).collect()}
    want = {r["doc_id"]: r["score"] for r in fresh.topk(["alpha", "delta"], k=20).collect()}
    assert set(got) == set(want)
    for d, s in want.items():
        assert math.isclose(got[d], s, rel_tol=1e-9)


def test_index_maintenance_stream_guards_initial_load_over_existing(spark, tmp_path):
    """The handover contract is ENFORCED: a fresh checkpoint with the
    default starting_commit_ms=0 over targets that already have state
    raises at start (naming the tables) instead of silently re-delivering
    the whole table and double-counting the postings N/avgdl. The
    explicit opt-in flag and a non-zero baseline both start cleanly, and
    a RESUMED checkpoint is exempt (its offsets, not the parameter,
    decide what replays)."""
    import pytest

    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.index_maintenance import (
        start_index_maintenance_stream,
    )
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_img"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, f"alpha guard doc {i} words") for i in range(5)],
        "doc_id long, text string",
    )
    store.write("corpus", docs, key="doc_id")
    idx = PersistedPostingsIndex(store)
    idx.register(store.read("corpus"), "prebuilt:0")

    with pytest.raises(RuntimeError, match="_postings_stats"):
        start_index_maintenance_stream(
            eng, "corpus", str(tmp_path / "ckpt_img_fresh"), postings=idx
        )

    # correct handover still starts (and is pinned by the sibling test)
    t0 = store.commits("corpus")[-1]
    q = start_index_maintenance_stream(
        eng, "corpus", str(tmp_path / "ckpt_img_ok"), postings=idx,
        starting_commit_ms=t0,
    )
    assert q.awaitTermination(120)
    q.stop()

    # a resumed checkpoint is exempt: build fresh targets through an
    # initial load, then re-run with the default 0 over the SAME
    # checkpoint — offsets exist, no raise, no re-delivery
    store2 = TableStore(spark, str(tmp_path / "wh_img2"), vacuum_retain_s=3600.0)
    eng2 = StripeSparkSync(spark, store2)
    store2.write("corpus", docs, key="doc_id")
    idx2 = PersistedPostingsIndex(store2)
    ckpt2 = str(tmp_path / "ckpt_img_resume")
    for _ in range(2):
        q = start_index_maintenance_stream(eng2, "corpus", ckpt2, postings=idx2)
        assert q.awaitTermination(120)
        q.stop()
    ids = [r["batch_id"] for r in store2.read(idx2.stats_table).collect()]
    assert len(ids) == 1  # one initial load, never re-delivered

    # the streaming form logs each applied window durably
    log = [
        r
        for r in eng2.read_maintenance_log()
        if r.get("op") == "corpus_cdc_fanout_stream"
    ]
    assert log and log[0]["entity"] == "corpus" and log[0]["rows"] == 5
    assert log[0]["applied"] is True and log[0]["targets"]["postings"] is True


def test_index_maintenance_stream_uri_checkpoint_paths(spark, tmp_path):
    """A file:-scheme checkpoint URI must not defeat the freshness probe:
    a checkpoint RESUMED under its file: spelling has offsets, so the
    initial-load guard must stay quiet (before normalization, listdir on
    the raw URI raised FileNotFoundError and the resumed checkpoint was
    misread as fresh → spurious guard raise). A remote scheme the local
    side-car state can't live on is rejected loudly."""
    import pytest

    from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.index_maintenance import (
        _local_checkpoint_path,
        start_index_maintenance_stream,
    )
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    assert _local_checkpoint_path("/plain/path") == "/plain/path"
    assert _local_checkpoint_path("file:/ck/pt") == "/ck/pt"
    assert _local_checkpoint_path("file:///ck/pt") == "/ck/pt"
    with pytest.raises(ValueError, match="hdfs"):
        _local_checkpoint_path("hdfs://nn:8020/ckpt")
    # ADVICE r11: a plain RELATIVE path whose first segment contains a
    # colon is a path, not a URI — urlparse would call 'run' a scheme
    # and reject what was always a valid checkpoint dir
    assert _local_checkpoint_path("run:3/ckpt") == "run:3/ckpt"
    assert _local_checkpoint_path("a:b") == "a:b"

    store = TableStore(spark, str(tmp_path / "wh_uri"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, f"alpha uri doc {i} words") for i in range(4)],
        "doc_id long, text string",
    )
    store.write("corpus", docs, key="doc_id")
    idx = PersistedPostingsIndex(store)
    ckpt = str(tmp_path / "ckpt_uri")

    # initial load under the plain spelling builds the index...
    q = start_index_maintenance_stream(eng, "corpus", ckpt, postings=idx)
    assert q.awaitTermination(120)
    q.stop()
    # ...then resuming under the file: spelling of the SAME checkpoint
    # must not spuriously raise the initial-load guard
    q = start_index_maintenance_stream(eng, "corpus", "file://" + ckpt, postings=idx)
    assert q.awaitTermination(120)
    q.stop()
    ids = [r["batch_id"] for r in store.read(idx.stats_table).collect()]
    assert len(ids) == 1  # one initial load; the file: resume re-delivered nothing


def test_index_maintenance_stream_reports_ann_drift(spark, tmp_path):
    """Parity with the cron form: each applied streaming window with an
    ANN target logs the codebook drift measured over the window's
    post-image vectors — on the initial load that is the creation batch
    itself, so the ratio is exactly 1.0 against the just-pinned
    baseline."""
    import pytest as _pytest

    from stripe_sync_engine_spark.operators.pq_index import (
        PersistedIVFPQ,
        train_ivf_pq,
    )
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.index_maintenance import (
        start_index_maintenance_stream,
    )
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    rng = [[(0.01 * ((i * 7 + d * 3) % 50) - 0.25) for d in range(64)] for i in range(48)]
    store = TableStore(spark, str(tmp_path / "wh_imd"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    vecs = spark.createDataFrame(
        [(i, rng[i]) for i in range(48)], "vec_id long, embedding array<double>"
    )
    store.write("vectors", vecs, key="vec_id")
    ann = PersistedIVFPQ(store, train_ivf_pq(vecs, n_cells=4, m=8, k=8))
    q = start_index_maintenance_stream(
        eng, "vectors", str(tmp_path / "ckpt_imd"), ann=ann
    )
    assert q.awaitTermination(120)
    q.stop()
    log = [
        r
        for r in eng.read_maintenance_log()
        if r.get("op") == "corpus_cdc_fanout_stream" and r.get("applied")
    ]
    assert log and log[-1]["ann_drift"]["ratio"] == _pytest.approx(1.0)
    assert log[-1]["ann_drift"]["rebuild_recommended"] is False


def test_mixture_folds_ride_the_stream_window(spark, tmp_path, monkeypatch):
    """VERDICT r14 #2: the STREAM twin of
    test_mixture_folds_ride_the_fanout_window — mixture folds ride the
    checkpointed index-maintenance stream, with each micro-batch's
    (since, until] commit-ms bounds recovered from the checkpoint's own
    OffsetSeqLog. Pins: (a) pre-images enforced loudly; (b) the initial
    load builds the fold and mutation windows keep it recount-equal;
    (c) a crash AFTER the fold applied but BEFORE the checkpoint commit
    replays the identical batch on restart and the fold's applied_until
    match skips the re-apply (no double-count); (d) a late-joining fold
    that missed windows fails the batch with the rebase pointer and
    rebase(at_ms=<stream cursor>) onboards it; (e) a WIPED checkpoint
    over a non-empty fold refuses at start (the renumbered-batch-id
    overlap batch ids alone cannot detect)."""
    import time

    import pytest

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.index_maintenance import (
        start_index_maintenance_stream,
    )
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_msf"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 10 * (1 + i % 3)) for i in range(20)],
        "doc_id long, lang string, n_chars long",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    ccw = CategoryCounts(eng, "corpus", weight_col="n_chars")
    ckpt = str(tmp_path / "ckpt_msf")

    def _recount(weight=None):
        df = store.read("corpus").groupBy("lang")
        agg = df.agg(
            (F.sum(weight) if weight else F.count(F.lit(1))).alias("w")
        )
        return {str(r["lang"]): int(r["w"]) for r in agg.collect()}

    def run_once(folds, checkpoint=ckpt):
        q = start_index_maintenance_stream(
            eng,
            "corpus",
            checkpoint,
            emit_update_preimages=True,
            mixture_folds=folds,
        )
        try:
            assert q.awaitTermination(120), "availableNow run did not finish"
        finally:
            q.stop()

    # (a) pre-images are non-negotiable for fold targets
    with pytest.raises(ValueError, match="emit_update_preimages"):
        start_index_maintenance_stream(eng, "corpus", ckpt, mixture_folds=[cc])

    # (b) batch 1 = the initial load, delivered THROUGH the stream
    run_once([cc])
    assert cc.counts() == {"en": 10, "fr": 10}

    # mutation window: insert + category move + delete, one stream pass
    time.sleep(0.002)
    cur = store.read("corpus")
    moved = cur.where("doc_id = 0").withColumn("lang", F.lit("fr"))
    nxt = (
        cur.where("doc_id NOT IN (0, 1)")
        .unionByName(moved)
        .unionByName(
            spark.createDataFrame(
                [(100, "en", 70), (101, "en", 10)],
                "doc_id long, lang string, n_chars long",
            )
        )
    )
    store.write("corpus", nxt, key="doc_id")
    run_once([cc])
    assert cc.counts() == _recount()

    # (c) crash AFTER the fold applied, BEFORE the checkpoint commit:
    # _log_maintenance runs after the folds in process_batch, so making
    # it raise once kills the query post-fold-commit; the restart
    # replays the identical batch (same OffsetSeqLog entry) and the
    # fold's applied_until match skips the re-apply
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame(
                [(200, "en", 20)], "doc_id long, lang string, n_chars long"
            )
        ),
        key="doc_id",
    )
    w3 = store.commits("corpus")[-1]
    real_log = eng._log_maintenance

    def flaky_log(record):
        raise OSError("injected crash before the checkpoint commit")

    monkeypatch.setattr(eng, "_log_maintenance", flaky_log)
    with pytest.raises(Exception, match="injected crash"):
        run_once([cc])
    monkeypatch.setattr(eng, "_log_maintenance", real_log)
    assert cc.cursor() == w3  # the fold committed before the crash
    run_once([cc])  # restart: replayed batch skipped, nothing doubled
    assert cc.counts() == _recount()

    # (d) a late-joining fold missed every prior window: the batch
    # fails with the onboarding pointer; rebase at the stream's cursor
    # (= the last committed offset, here the store head) onboards it
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame(
                [(300, "fr", 40)], "doc_id long, lang string, n_chars long"
            )
        ),
        key="doc_id",
    )
    with pytest.raises(Exception, match="missed windows"):
        run_once([cc, ccw])
    ccw.rebase(at_ms=w3)  # the stream's committed cursor before this write
    run_once([cc, ccw])
    assert cc.counts() == _recount()
    assert ccw.counts() == _recount(weight="n_chars")

    # (e) a wiped checkpoint over non-empty fold state refuses at start,
    # naming the fold's state file
    with pytest.raises(RuntimeError, match="fold counts|state tables already exist"):
        run_once([cc], checkpoint=str(tmp_path / "ckpt_msf_wiped"))
    # and the explicit starting_commit_ms handover runs clean
    q = start_index_maintenance_stream(
        eng,
        "corpus",
        str(tmp_path / "ckpt_msf_handover"),
        emit_update_preimages=True,
        mixture_folds=[cc],
        starting_commit_ms=store.commits("corpus")[-1],
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    assert cc.counts() == _recount()


@pytest.mark.slow  # 34s stream restart matrix
def test_stream_fold_bounds_are_reader_owned(spark, tmp_path, monkeypatch):
    """VERDICT r15 #3: stream fold delivery must not depend on Spark's
    private OffsetSeqLog layout. The feed stamps each batch's planned
    end offset on its own rows (``emit_window_bounds``) and the
    foreachBatch wrapper chains the lower bound through the durable
    ``_fold_window_bounds.json`` record (written through commitio
    BEFORE the folds apply). Pins: (a) with the legacy offsets parser
    monkeypatched to RAISE on any call, the full fold flow — initial
    load, mutation windows, crash-after-fold replay — runs green;
    (b) a wiped bounds side file falls back to the offsets parse
    (pre-r15 resume compatibility) and keeps delivering; (c) wiped
    side file AND unreadable offsets layout → LOUD refusal, fold state
    uncorrupted; (d) a bounds record AHEAD of the delivered batch
    (partially restored checkpoint) refuses under ambiguous bounds."""
    import json as _json
    import os
    import time

    import pytest

    import stripe_sync_engine_spark.streaming.index_maintenance as im
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_rob"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2]) for i in range(20)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    ckpt = str(tmp_path / "ckpt_rob")

    def _recount():
        return {
            str(r["lang"]): int(r["n"])
            for r in store.read("corpus").groupBy("lang").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }

    def run_once():
        q = im.start_index_maintenance_stream(
            eng, "corpus", ckpt, emit_update_preimages=True, mixture_folds=[cc]
        )
        try:
            assert q.awaitTermination(120), "availableNow run did not finish"
        finally:
            q.stop()

    # (a) the OffsetSeqLog parser is never needed on the primary path
    def boom(checkpoint_dir, bid):
        raise AssertionError(
            "fold delivery read Spark's private OffsetSeqLog on the "
            "primary path"
        )

    monkeypatch.setattr(im, "_offsets_end_of", boom)
    run_once()  # initial load
    assert cc.counts() == {"en": 10, "fr": 10}
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(100, "en")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    run_once()  # mutation window
    assert cc.counts() == _recount()
    # crash AFTER the fold applied, BEFORE the checkpoint commit: the
    # replayed batch reuses the recorded bounds, still no parser
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(101, "fr")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    real_log = eng._log_maintenance
    monkeypatch.setattr(
        eng,
        "_log_maintenance",
        lambda record: (_ for _ in ()).throw(OSError("injected crash")),
    )
    with pytest.raises(Exception, match="injected crash"):
        run_once()
    monkeypatch.setattr(eng, "_log_maintenance", real_log)
    run_once()  # replay: recorded bounds, applied_until match skips
    assert cc.counts() == _recount()

    bounds_path = os.path.join(ckpt, im._FOLD_BOUNDS_NAME)
    rec = _json.loads(open(bounds_path).read())

    # (d) a bounds record ahead of the delivered batch refuses loudly
    ahead = dict(rec, batch_id=rec["batch_id"] + 7)
    with open(bounds_path, "w") as f:
        f.write(_json.dumps(ahead))
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(102, "fr")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    with pytest.raises(Exception, match="ambiguous bounds"):
        run_once()
    with open(bounds_path, "w") as f:
        f.write(_json.dumps(rec))  # restore the true record

    # (b) wiped side file, parser restored: the legacy offsets parse
    # recovers the previous batch's end ONCE and delivery continues —
    # exactly the pre-r15-checkpoint resume path
    monkeypatch.undo()  # restore the real parser (and _log_maintenance)
    os.unlink(bounds_path)
    run_once()
    assert cc.counts() == _recount()
    assert os.path.exists(bounds_path)  # the record is re-established

    # (c) wiped side file AND a parser that cannot read the layout:
    # loud refusal, nothing folded, fold state intact
    before = cc.counts()
    os.unlink(bounds_path)

    def drifted(checkpoint_dir, bid):
        raise RuntimeError(
            "cannot read the micro-batch's commit-ms bounds (layout "
            "drift) — Mixture folds cannot be delivered without exact "
            "window bounds"
        )

    monkeypatch.setattr(im, "_offsets_end_of", drifted)
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(103, "en")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    with pytest.raises(Exception, match="cannot be delivered without exact"):
        run_once()
    assert cc.counts() == before  # refused, not corrupted
    monkeypatch.undo()
    run_once()  # parser back: the fallback realigns and folds the window
    assert cc.counts() == _recount()


def test_stream_delivered_fold_audits_and_repairs(spark, tmp_path):
    """Cross-feature pin: a STREAM-delivered fold rides the same
    audit/repair loop as a cron-delivered one — the sampled audit leg
    catches gross out-of-band corruption, repair rebases AT THE FOLD'S
    AUDITED CURSOR (not the head), and because that preserves window
    alignment the SAME checkpoint keeps delivering afterward."""
    import json as _json
    import time

    import pytest

    from stripe_sync_engine_spark.commitio import atomic_write_json
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.streaming.index_maintenance import (
        start_index_maintenance_stream,
    )
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_sar"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(600)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    ckpt = str(tmp_path / "ckpt_sar")

    def run_once():
        q = start_index_maintenance_stream(
            eng, "corpus", ckpt, emit_update_preimages=True, mixture_folds=[cc]
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()

    run_once()
    assert cc.counts() == {"en": 400, "fr": 200}
    cursor = cc.cursor()

    # gross out-of-band corruption, caught by the SAMPLED audit leg
    with open(cc._state_path()) as f:
        state = _json.load(f)
    state["counts"] = [[k, v * 3] for k, v in state["counts"]]
    atomic_write_json(cc._state_path(), state)
    report = eng.audit_corpus_indexes("corpus", mixture_folds=[cc])
    frep = report["mixture_folds"][0]
    assert not report["ok"] and frep["mode"] == "sampled"

    # repair rebases at the audited cursor -> stream alignment intact
    fixed = eng.repair_corpus_indexes("corpus", report, mixture_folds=[cc])
    assert fixed["ok"] and cc.cursor() == cursor
    assert cc.counts() == {"en": 400, "fr": 200}

    # the SAME checkpoint keeps delivering post-repair
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(1000, "fr")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    run_once()
    assert cc.counts() == {"en": 400, "fr": 201}
    # ...and poll() still refuses the stream-delivered fold (one
    # surface). Note repair's rebase ACKED the fold's own consumer at
    # the audited cursor, so the refusal needs a window to straddle:
    # with a commit past the stream's cursor, poll() would re-fold the
    # stream-delivered range — the guard stops it
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(1001, "en")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    with pytest.raises(RuntimeError, match="advanced by fan-out delivery"):
        cc.poll()
    assert cc.counts() == {"en": 400, "fr": 201}  # nothing double-folded
