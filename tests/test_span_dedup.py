"""Span-level dedup tests: hand-built micro corpora with known repeated
sequences, interval merging, clipping semantics, and value-level oracle
parity against a DuckDB formulation over the real documents table."""

from __future__ import annotations

import pytest

from stripe_sync_engine_spark.operators.span_dedup import (
    clip_repeated_spans,
    repeated_spans,
)
from stripe_sync_engine_spark.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in df.collect()
    )


def test_cross_doc_repeat_found(spark):
    shared = "the quick brown fox jumps over"
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"{shared} delta epsilon zeta"),
            (3, "nothing here repeats at all ever"),
        ],
    )
    got = _spans(repeated_spans(docs, k=3))
    # Doc 1: shared tokens at positions 2..7 -> windows 2..5 merge to [2, 8).
    # Doc 2: positions 0..5 -> windows 0..3 merge to [0, 6).
    assert got == [(1, 2, 8), (2, 0, 6)]


def test_within_doc_repeat_counts(spark):
    docs = _docs(
        spark,
        [(1, "spam spam spam spam unique tail words here")],
    )
    got = _spans(repeated_spans(docs, k=2))
    # "spam spam" occurs at positions 0,1,2 (3 occurrences in ONE doc):
    # windows [0,2) [1,3) [2,4) merge to [0, 4).
    assert got == [(1, 0, 4)]


def test_min_repeats_threshold(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c x1 y1"),
            (2, "a b c x2 y2"),
            (3, "a b c x3 y3"),
        ],
    )
    # "a b c" occurs 3 times; with min_repeats=4 nothing qualifies.
    assert _spans(repeated_spans(docs, k=3, min_repeats=4)) == []
    got = _spans(repeated_spans(docs, k=3, min_repeats=3))
    assert got == [(1, 0, 3), (2, 0, 3), (3, 0, 3)]


def test_disjoint_spans_stay_separate(spark):
    docs = _docs(
        spark,
        [
            (1, "aa bb u1 u2 u3 u4 u5 cc dd"),
            (2, "aa bb v1 v2 v3 v4 v5 cc dd"),
        ],
    )
    got = _spans(repeated_spans(docs, k=2))
    # Two repeated 2-grams per doc, 5 unique tokens apart: two spans each.
    assert got == [(1, 0, 2), (1, 7, 9), (2, 0, 2), (2, 7, 9)]


def test_short_docs_produce_no_rows(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a b")])
    assert _spans(repeated_spans(docs, k=3)) == []
    # But at k=2 the whole doc is one duplicated window.
    assert _spans(repeated_spans(docs, k=2)) == [(1, 0, 2), (2, 0, 2)]


def test_clip_removes_exactly_the_spans(spark):
    shared = "one two three four"
    docs = _docs(
        spark,
        [
            (1, f"head {shared} tail"),
            (2, f"{shared} solo"),
            (3, "untouched words remain put"),
        ],
    )
    spans = repeated_spans(docs, k=4)
    out = {
        r["doc_id"]: (r["text"], r["tokens_clipped"])
        for r in clip_repeated_spans(docs, spans).collect()
    }
    assert out[1] == ("head tail", 4)
    assert out[2] == ("solo", 4)
    assert out[3] == ("untouched words remain put", 0)


def test_clip_double_space_tokens_align(spark):
    # Empty tokens from doubled spaces are dropped by the shared
    # tokenization, so span indices align with the filtered token list.
    docs = _docs(
        spark,
        [(1, "x  a b c  y"), (2, "a b c z w")],
    )
    spans = repeated_spans(docs, k=3)
    got = _spans(spans)
    assert got == [(1, 1, 4), (2, 0, 3)]
    out = {r["doc_id"]: r["text"] for r in clip_repeated_spans(docs, spans).collect()}
    assert out[1] == "x y"
    assert out[2] == "z w"


@pytest.mark.parametrize("k,min_repeats", [(3, 2), (5, 2)])
def test_oracle_parity_on_documents(spark, sf_dir, k, min_repeats):
    """Value-level parity with a DuckDB formulation over gram TEXT (the
    Spark side groups on xxhash64 of the gram — collisions are the only
    possible divergence and would need 2^-64 luck on 500 docs)."""
    from tests.oracle import compare, run_oracle

    docs = load_table(spark, sf_dir, "documents")
    got = repeated_spans(docs, k=k, min_repeats=min_repeats)
    want = run_oracle(
        f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id, i - 1 AS pos,
                   array_to_string(toks[i:i+{k - 1}], ' ') AS gram
            FROM t, LATERAL UNNEST(generate_series(1, len(toks) - {k - 1})) AS u(i)
            WHERE len(toks) >= {k}
        ),
        d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= {min_repeats}),
        m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
        f AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             <= {k} THEN 0 ELSE 1 END AS brk
            FROM m
        ),
        s AS (
            SELECT doc_id, pos,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS grp
            FROM f
        )
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + {k} AS BIGINT) AS span_end
        FROM s GROUP BY doc_id, grp
        """,
        sf_dir,
    )
    compare(got, want, f"span_dedup_k{k}")


# ---- incremental gate -------------------------------------------------

from stripe_sync_engine_spark.operators.span_dedup import IncrementalSpanDeduper
from stripe_sync_engine_spark.storage import TableStore


def _b1(spark):
    shared = "w1 w2 w3 w4 w5"
    return _docs(spark, [(1, f"intro {shared} outro"), (2, "all fresh words here today")])


def _b2(spark):
    shared = "w1 w2 w3 w4 w5"
    return _docs(
        spark,
        [
            (10, f"{shared} trailing bits"),      # repeats history -> span
            (11, "rep rep rep rep rep rep"),       # batch-internal repeat
            (12, "completely novel text beyond"),  # clean
        ],
    )


def test_incremental_matches_global_on_union(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh_span"))
    gate = IncrementalSpanDeduper(store, k=3)
    b1, b2 = _b1(spark), _b2(spark)
    gate.register(b1, "b1")
    got = _spans(gate.spans_in(b2))
    union_spans = repeated_spans(b1.unionByName(b2), k=3)
    b2_ids = {r["doc_id"] for r in b2.collect()}
    want = sorted(t for t in _spans(union_spans) if t[0] in b2_ids)
    assert got == want
    assert got  # sanity: the cross-batch repeat was actually found


def test_incremental_register_is_idempotent(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh_span"))
    gate = IncrementalSpanDeduper(store, k=3)
    b1, b2 = _b1(spark), _b2(spark)
    gate.register(b1, "b1")
    once = _spans(gate.spans_in(b2))
    rows_once = store.read(gate.table).count()
    gate.register(b1, "b1")  # replay: commits nothing
    assert store.read(gate.table).count() == rows_once
    assert _spans(gate.spans_in(b2)) == once


def test_incremental_threshold_crosses_batches(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh_span"))
    gate = IncrementalSpanDeduper(store, k=3, min_repeats=3)
    shared = "p q r"
    gate.register(_docs(spark, [(1, f"{shared} one")]), "b1")
    # history count 1 + batch count 1 = 2 < 3: no span yet
    probe = _docs(spark, [(20, f"{shared} two")])
    assert _spans(gate.spans_in(probe)) == []
    gate.register(probe, "b2")
    # history 2 + batch 1 = 3: now it marks
    assert _spans(gate.spans_in(_docs(spark, [(30, f"{shared} three")]))) == [(30, 0, 3)]


def test_filter_batch_clips_and_replays_stably(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh_span"))
    gate = IncrementalSpanDeduper(store, k=3)
    gate.register(_b1(spark), "b1")
    b2 = _b2(spark)
    out1 = {r["doc_id"]: r["text"] for r in gate.filter_batch(b2, "b2").collect()}
    assert out1[10] == "trailing bits"
    assert out1[11] == ""            # fully self-repeating doc clips away
    assert out1[12] == "completely novel text beyond"
    # Replay the SAME batch: register is a no-op, spans are computed from
    # the same (unchanged) totals, output identical.
    out2 = {r["doc_id"]: r["text"] for r in gate.filter_batch(b2, "b2").collect()}
    assert out2 == out1


def test_fold_history_preserves_decisions(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh_span"))
    gate = IncrementalSpanDeduper(store, k=3)
    b1, b2 = _b1(spark), _b2(spark)
    gate.register(b1, "b1")
    gate.register(b2, "b2")
    probe = _docs(spark, [(40, "w1 w2 w3 w4 w5 probe")])
    before = _spans(gate.spans_in(probe))
    rows_before = store.read(gate.table).count()
    gate.fold_history()
    assert _spans(gate.spans_in(probe)) == before
    assert store.read(gate.table).count() <= rows_before
    batch_ids = {r["batch_id"] for r in store.read(gate.table).collect()}
    assert batch_ids == {"_folded"}


def test_fold_history_enforces_replay_horizon(spark, tmp_path):
    """The fold horizon is code, not documentation: a batch replayed after
    its rows were folded fails loudly (it would double-count), while
    batches registered after the fold replay convergently as before. Run-
    namespaced ids (<run>:<epoch>, the streaming scheme) fold to a compact
    per-run horizon — later epochs of the same run stay replayable."""
    store = TableStore(spark, str(tmp_path / "wh_span_h"))
    gate = IncrementalSpanDeduper(store, k=3)
    gate.register(_b1(spark), "run1:0")
    gate.register(_b2(spark), "run1:1")
    probe = _docs(spark, [(40, "w1 w2 w3 w4 w5 probe")])
    before = _spans(gate.spans_in(probe))
    gate.fold_history()
    assert _spans(gate.spans_in(probe)) == before  # decisions preserved
    # out-of-horizon replays: loud failure on both entry points
    with pytest.raises(RuntimeError, match="folded"):
        gate.register(_b1(spark), "run1:0")
    with pytest.raises(RuntimeError, match="folded"):
        gate.filter_batch(_b2(spark), "run1:1")
    # in-horizon: post-fold epochs of the SAME run register + replay fine
    b3 = _docs(spark, [(50, "x1 x2 x3 x4")])
    out1 = {r["doc_id"]: r["text"] for r in gate.filter_batch(b3, "run1:2").collect()}
    out2 = {r["doc_id"]: r["text"] for r in gate.filter_batch(b3, "run1:2").collect()}
    assert out2 == out1
    # a second fold advances the run horizon over the new epoch too
    gate.fold_history()
    with pytest.raises(RuntimeError, match="folded"):
        gate.register(b3, "run1:2")
    # free-form (non-namespaced) ids are refused verbatim after folding
    gate.register(b3, "manual-batch")
    gate.fold_history()
    with pytest.raises(RuntimeError, match="folded"):
        gate.register(b3, "manual-batch")


# ---- property tests -----------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Small vocabulary on purpose: repeats must actually occur for the
# properties to bite. Docs are lists of words; k stays small so short
# docs still produce windows.
_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus, k=st.integers(min_value=2, max_value=4))
def test_span_invariants_hold(spark, texts, k):
    """Spans lie inside the doc's token range, are disjoint and sorted,
    at least k long, and clipping removes exactly the covered tokens."""
    docs = _docs(spark, list(enumerate(texts)))
    spans = repeated_spans(docs, k=k)
    n_toks = {
        r["doc_id"]: len([t for t in r["text"].split(" ") if t])
        for r in docs.collect()
    }
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for d, s, e in _spans(spans):
        per_doc.setdefault(d, []).append((s, e))
        assert 0 <= s < e <= n_toks[d]
        assert e - s >= k
    for d, intervals in per_doc.items():
        for (s1, e1), (s2, e2) in zip(intervals, intervals[1:]):
            assert e1 < s2  # disjoint AND non-adjacent (adjacent merges)
    clipped = {
        r["doc_id"]: (r["text"], r["tokens_clipped"])
        for r in clip_repeated_spans(docs, spans).collect()
    }
    for d, (text, n_clip) in clipped.items():
        covered = sum(e - s for s, e in per_doc.get(d, []))
        assert n_clip == covered
        assert len([t for t in text.split(" ") if t]) == n_toks[d] - covered


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(_doc, min_size=2, max_size=10),
    split=st.integers(min_value=1, max_value=9),
    k=st.integers(min_value=2, max_value=3),
)
def test_incremental_composition_equals_global(spark, tmp_path_factory, texts, split, k):
    """Registering batch 1 then gating batch 2 marks exactly the spans the
    GLOBAL pass over the union marks in batch 2's docs — for arbitrary
    corpora and split points (the keep-first ExactSubstr contract)."""
    split = min(split, len(texts) - 1)
    rows = list(enumerate(texts))
    b1, b2 = rows[:split], rows[split:]
    store = TableStore(
        spark, str(tmp_path_factory.mktemp("wh_span_prop")), n_buckets=4
    )
    gate = IncrementalSpanDeduper(store, k=k)
    gate.register(_docs(spark, b1), "b1")
    got = _spans(gate.spans_in(_docs(spark, b2)))
    union = repeated_spans(_docs(spark, rows), k=k)
    b2_ids = {d for d, _ in b2}
    want = sorted(t for t in _spans(union) if t[0] in b2_ids)
    assert got == want


def test_clip_preserves_bytes_of_span_free_docs(spark):
    """A doc the operator never matched keeps its ORIGINAL bytes — the
    rejoin must not normalize whitespace (that would silently change the
    stored text and its exact-dedup fingerprint)."""
    docs = _docs(
        spark,
        [
            (1, "a b c pad1 pad2"),
            (2, "a b c pad3 pad4"),
            (3, "untouched  doubled  spaces stay"),
        ],
    )
    spans = repeated_spans(docs, k=3)
    assert {t[0] for t in _spans(spans)} == {1, 2}
    out = {r["doc_id"]: r["text"] for r in clip_repeated_spans(docs, spans).collect()}
    assert out[3] == "untouched  doubled  spaces stay"


def test_incremental_gate_rejects_degenerate_k(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh_span"))
    with pytest.raises(ValueError):
        IncrementalSpanDeduper(store, k=0)


def test_checkpoint_run_id_lifecycle(tmp_path):
    """Same checkpoint -> same run id (replays stay idempotent); a wiped
    checkpoint mints a NEW id, so a fresh stream's batch 0 never
    anti-probes into the old run's gram rows."""
    import shutil

    from stripe_sync_engine_spark.streaming.documents import _checkpoint_run_id

    ckpt = str(tmp_path / "ckpt")
    first = _checkpoint_run_id(ckpt)
    assert _checkpoint_run_id(ckpt) == first
    shutil.rmtree(ckpt)
    assert _checkpoint_run_id(ckpt) != first


def test_checkpoint_run_id_rejects_empty_debris(tmp_path):
    """A zero-byte run-id file cannot have been written by the atomic
    mint — returning '' would collide every run's batch ids, and silently
    'healing' it can race a concurrent minter. Loud failure instead."""
    import os

    from stripe_sync_engine_spark.streaming.documents import _checkpoint_run_id

    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    open(os.path.join(ckpt, "span_gate_run_id"), "w").close()  # empty file
    with pytest.raises(RuntimeError, match="empty"):
        _checkpoint_run_id(ckpt)
    # operator deletes the debris -> normal mint resumes
    os.unlink(os.path.join(ckpt, "span_gate_run_id"))
    rid = _checkpoint_run_id(ckpt)
    assert rid
    assert _checkpoint_run_id(ckpt) == rid


def test_long_horizon_register_fold_register_lifecycle(spark, tmp_path, sf_dir):
    """Steady-state lifecycle at depth: many micro-batches with folds
    interleaved (register → fold → register → fold → …) stay exactly
    equivalent to a single one-shot build — span decisions AND clipped
    output — and every fold's horizon keeps being enforced. This is the
    multi-year-deployment shape compressed: state folds never lose or
    double a count."""
    from pyspark.sql import functions as F

    from stripe_sync_engine_spark.operators.span_dedup import repeated_spans

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    n_batches, fold_every = 12, 5
    store = TableStore(spark, str(tmp_path / "wh_span_long"))
    gate = IncrementalSpanDeduper(store, k=8)
    seen = None
    for i in range(n_batches):
        b = docs.where(F.pmod(F.col("doc_id"), F.lit(n_batches)) == i)
        gate.register(b, f"run:{i}")
        seen = b if seen is None else seen.unionByName(b)
        if (i + 1) % fold_every == 0:
            gate.fold_history()
    # probe batch: fresh doc ids, text sampled from the corpus (so spans hit)
    probe = docs.where(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    got = _spans(gate.spans_in(probe))
    want = _spans(
        repeated_spans(
            seen.unionByName(probe), k=8, min_repeats=2
        ).join(probe.select("doc_id"), "doc_id", "left_semi")
    )
    assert got == want and got  # non-trivial: the probe really repeats
    # horizon still enforced after multiple folds
    with pytest.raises(RuntimeError, match="folded"):
        gate.register(docs.limit(1), "run:3")
    # and the final fold collapses everything registered so far
    gate.fold_history()
    ids = {r["batch_id"] for r in store.read(gate.table).select("batch_id").distinct().collect()}
    assert ids == {"_folded"}


def test_span_gate_deletion_contract_pinned(spark, tmp_path):
    """The PINNED deletion contract (class docstring): gram counts are
    aggregate corpus statistics, so deleting a corpus document does NOT
    decrement them — spans it contributed to keep clipping (conservative
    over-clipping, like an already-trained LM). The takedown path for
    the statistics is a REBUILD into a fresh table from the surviving
    corpus, after which the ghost stops gating."""
    shared = "one two three four five six"
    store = TableStore(spark, str(tmp_path / "wh_span_del"))
    gate = IncrementalSpanDeduper(store, k=3, min_repeats=2)
    # docs 1 and 2 both carry the shared run; both register
    gate.register(_docs(spark, [(1, shared + " tail1"), (2, shared + " tail2")]), "b1")
    probe = _docs(spark, [(10, shared + " probe pad")])
    assert _spans(gate.spans_in(probe))  # history repeats: clips

    # corpus deletes BOTH contributors — the gate statistics stand
    assert _spans(gate.spans_in(probe)), "pinned: deletion does not decrement"

    # rebuild from the surviving corpus (doc 2 only): threshold needs 2
    # total and the probe itself brings 1, so the run still clips —
    # while a corpus that lost both copies stops gating entirely
    rebuilt_partial = IncrementalSpanDeduper(
        TableStore(spark, str(tmp_path / "wh_span_rb1")), k=3, min_repeats=2
    )
    rebuilt_partial.register(_docs(spark, [(2, shared + " tail2")]), "b1")
    assert _spans(rebuilt_partial.spans_in(probe))
    rebuilt_empty = IncrementalSpanDeduper(
        TableStore(spark, str(tmp_path / "wh_span_rb2")), k=3, min_repeats=2
    )
    rebuilt_empty.register(_docs(spark, [(3, "totally different words here")]), "b1")
    assert not _spans(rebuilt_empty.spans_in(probe))


def test_clip_public_caller_overlapping_spans_still_merge(spark):
    """clip_repeated_spans is a public function: hand-built OVERLAPPING
    and abutting intervals (the producers never emit them) take the
    defensive merge-fold branch and clip as their union; disjoint spans
    take the O(spans) fast path with identical results."""
    docs = _docs(spark, [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")])
    # doc 1: [1,4) overlaps [3,6), abuts [6,7) -> union [1,7) clips b..g
    # doc 2: disjoint [0,2) and [8,10) -> fast path, clips a b and i j
    spans = spark.createDataFrame(
        [(1, 1, 4), (1, 3, 6), (1, 6, 7), (2, 0, 2), (2, 8, 10)],
        "doc_id long, span_start long, span_end long",
    )
    out = {
        r["doc_id"]: (r["text"], r["tokens_clipped"])
        for r in clip_repeated_spans(docs, spans).collect()
    }
    assert out[1] == ("a h i j", 6)
    assert out[2] == ("c d e f g h", 4)
