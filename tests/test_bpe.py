"""BPE trainer tests: known-merge toy case, determinism, driver/cluster
encode parity, histogram bounding."""

import pytest

from stripe_sync_engine_spark.functions.bpe import (
    EOW,
    BPETokenizer,
    encode_documents,
    train_bpe,
    train_bpe_from_histogram,
    word_histogram,
)
from stripe_sync_engine_spark.tables import load_table


def test_toy_merges_are_the_classic_ones():
    # The textbook corpus: "low"x5 "lower"x2 "newest"x6 "widest"x3.
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    tok = train_bpe_from_histogram(hist, vocab_size=10)
    # Highest-count first merge must come from "newest" (count 6) or a pair
    # shared with "widest" (9): ("e","s")=9 and ("s","t")=9 tie; the
    # deterministic tie-break picks the lexicographically smaller pair.
    assert tok.merges[0] == ("e", "s")
    assert tok.merges[1] == ("es", "t")
    # "newest" and "widest" now both end in "est</w>".
    assert ("est", EOW) in tok.merges
    enc = tok.encode("newest")
    assert enc[-1].endswith(EOW)
    assert "".join(enc) == "newest" + EOW


def test_trainer_is_deterministic_and_histogram_order_free():
    hist = [("abab", 4), ("abba", 4), ("baba", 4)]
    a = train_bpe_from_histogram(hist, vocab_size=6)
    b = train_bpe_from_histogram(list(reversed(hist)), vocab_size=6)
    assert a.merges == b.merges
    assert a.vocab == b.vocab


def test_min_pair_count_stops_noise_merges():
    tok = train_bpe_from_histogram([("xy", 1)], vocab_size=10, min_pair_count=2)
    assert tok.merges == ()
    assert tok.encode("xy") == ["x", "y", EOW]


def test_encode_round_trip_property():
    tok = train_bpe_from_histogram([("hello", 3), ("help", 2)], vocab_size=8)
    for text in ["hello help", "yelp", ""]:
        units = tok.encode(text)
        # Concatenating units and dropping EOW reconstructs the pre-tokens.
        joined = "".join(units).replace(EOW, "")
        assert joined == text.replace(" ", "")


def test_word_histogram_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc"), (2, "aa dd")], "doc_id long, text string"
    )
    rows = {r["piece"]: r["n"] for r in word_histogram(docs, min_count=2).collect()}
    assert rows == {"aa": 4, "bb": 2}
    capped = word_histogram(docs, max_word_types=1).collect()
    assert [r["piece"] for r in capped] == ["aa"]


def test_train_on_corpus_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = train_bpe(docs, vocab_size=64, min_count=2)
    b = train_bpe(docs, vocab_size=64, min_count=2)
    assert a.merges == b.merges
    assert len(a.merges) > 0


def test_distributed_encode_matches_driver(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    tok = train_bpe(docs, vocab_size=64, min_count=2)
    out = {
        r["doc_id"]: (r["n_tokens"], r["tokens"])
        for r in encode_documents(docs, tok).collect()
    }
    sample = docs.select("doc_id", "text").collect()
    assert len(out) == len(sample)
    for r in sample:
        units = tok.encode(r["text"])
        assert out[r["doc_id"]] == (len(units), units)


def test_encode_counts_only_schema(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    tok = BPETokenizer(merges=(("a", "b"),))
    out = encode_documents(docs, tok, keep_tokens=False)
    assert out.columns == ["doc_id", "n_tokens"]
    assert out.collect()[0]["n_tokens"] == 4  # ["ab", EOW] per piece


# ---------------------------------------------------------------------------
# Property-based checks (driver-side only: the tokenizer core is plain
# Python, so hypothesis runs it without a SparkSession).
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_corpus_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=20
)


@settings(max_examples=50, deadline=None)
@given(words=_corpus_words, vocab=st.integers(min_value=0, max_value=40))
def test_property_encode_reconstructs_pretokens(words, vocab):
    hist = [(w, 1 + i % 3) for i, w in enumerate(sorted(set(words)))]
    tok = train_bpe_from_histogram(hist, vocab_size=vocab)
    text = " ".join(words)
    units = tok.encode(text)
    assert "".join(units).replace(EOW, "") == text.replace(" ", "")
    # every emitted unit is in the induced vocabulary or a raw char/EOW
    vocab_set = set(tok.vocab) | set("abcdef") | {EOW}
    assert all(u in vocab_set for u in units)


@settings(max_examples=30, deadline=None)
@given(words=_corpus_words)
def test_property_merges_never_grow_token_count(words):
    hist = [(w, 2) for w in sorted(set(words))]
    untrained = train_bpe_from_histogram(hist, vocab_size=0)
    trained = train_bpe_from_histogram(hist, vocab_size=30)
    text = " ".join(words)
    assert len(trained.encode(text)) <= len(untrained.encode(text))


@settings(max_examples=30, deadline=None)
@given(words=_corpus_words, seed=st.integers(0, 2**32 - 1))
def test_property_histogram_order_invariance(words, seed):
    import random

    hist = [(w, 1 + len(w)) for w in sorted(set(words))]
    shuffled = hist[:]
    random.Random(seed).shuffle(shuffled)
    # pair counts are sums and the argmax tie-breaks totally, so
    # histogram ORDER must not matter even unsorted
    a = train_bpe_from_histogram(hist, 20)
    b = train_bpe_from_histogram(shuffled, 20)
    assert a.merges == b.merges and a.vocab == b.vocab


def test_assign_packs_parity_with_registered_query(spark, sf_dir):
    """The generic packer over the registered query's own estimated
    counts reproduces its packing columns exactly."""
    from stripe_sync_engine_spark.operators.packing import assign_packs
    from stripe_sync_engine_spark.plans.textops import (
        N_PACK_SHARDS,
        PACK_BUDGET,
        txt_bpe_tokens,
    )

    q = txt_bpe_tokens(spark, sf_dir)
    generic = assign_packs(
        q.select("doc_id", "n_pieces", "n_subwords"),
        count_col="n_subwords",
        budget=PACK_BUDGET,
        n_shards=N_PACK_SHARDS,
    )
    cols = ["doc_id", "shard", "pack_id", "pack_offset", "packs_spanned"]
    a = {tuple(r) for r in q.select(*cols).collect()}
    b = {tuple(r) for r in generic.select(*cols).collect()}
    assert a == b


def test_assign_packs_with_trained_tokenizer_counts(spark, sf_dir):
    """Real counts from a trained tokenizer flow through packing: every
    pack except a shard's last is exactly full by construction of the
    cumulative layout (offsets stay within budget, ids pack in order)."""
    from stripe_sync_engine_spark.operators.packing import assign_packs
    from stripe_sync_engine_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    tok = train_bpe(docs, vocab_size=64, min_count=2)
    counts = encode_documents(docs, tok, keep_tokens=False)
    packed = assign_packs(counts, count_col="n_tokens", budget=256, n_shards=4)
    rows = packed.collect()
    assert len(rows) == 200
    for r in rows:
        assert 0 <= r["pack_offset"] < 256
        assert r["packs_spanned"] >= 1
    # within a shard, doc_id order implies non-decreasing pack_id
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        prev = by_shard.setdefault(r["shard"], [])
        if prev:
            assert r["pack_id"] >= prev[-1]["pack_id"]
        prev.append(r)


def test_epoch_shuffle_is_deterministic_and_epoch_distinct(spark, sf_dir):
    """Per-epoch packing orders are reproducible across runs and differ
    between epochs (while id order stays the epoch-None layout)."""
    from stripe_sync_engine_spark.operators.packing import assign_packs, epoch_position
    from stripe_sync_engine_spark.plans.textops import txt_bpe_tokens

    counts = txt_bpe_tokens(spark, sf_dir).select("doc_id", "n_subwords")

    def layout(order_col):
        return sorted(
            (r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"])
            for r in assign_packs(
                counts, "n_subwords", 2048, n_shards=4, order_col=order_col
            ).collect()
        )

    e1a = layout(epoch_position(1))
    e1b = layout(epoch_position(1))
    e2 = layout(epoch_position(2))
    base = layout(None)
    assert e1a == e1b          # reproducible
    assert e1a != e2           # epochs decorrelate
    assert e1a != base         # shuffled order differs from id order
    # same docs, same shard membership, same total budget accounting
    assert [x[0] for x in e1a] == [x[0] for x in base]
    assert {x[:2] for x in e1a} == {x[:2] for x in base}


def test_tokenizer_json_round_trip():
    tok = train_bpe_from_histogram([("hello", 3), ("help", 2)], vocab_size=8)
    back = BPETokenizer.from_json(tok.to_json())
    assert back == tok
    assert back.encode("hello help") == tok.encode("hello help")


def test_materialize_packs_full_and_reconstructable(spark):
    """Every pack except a shard's last holds exactly budget tokens, and
    concatenating packs in pack order reconstructs the docs' tokens in id
    order per shard — including docs that straddle pack boundaries."""
    from stripe_sync_engine_spark.operators.packing import (
        assign_packs,
        materialize_packs,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, [f"t{i}_{j}" for j in range(i % 7)]) for i in range(40)],
        "doc_id long, tokens array<string>",
    )
    budget, n_shards = 5, 4
    packs = materialize_packs(docs, "tokens", budget=budget, n_shards=n_shards)
    rows = packs.collect()
    last = {}
    for r in rows:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["pack_id"])
    for r in rows:
        assert r["n_tokens"] == len(r["tokens"])
        if r["pack_id"] < last[r["shard"]]:
            assert r["n_tokens"] == budget, (r["shard"], r["pack_id"])
        else:
            assert 0 < r["n_tokens"] <= budget
    # reconstruction per shard
    assigned = assign_packs(
        docs.withColumn("_n", F.size("tokens").cast("long")),
        "_n", budget, n_shards,
    )
    want = {}
    for r in assigned.orderBy("shard", "doc_id").collect():
        want.setdefault(r["shard"], []).extend(r["tokens"])
    got = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["pack_id"])):
        got.setdefault(r["shard"], []).extend(r["tokens"])
    assert got == want
    # a straddling doc exists (6-token docs over budget-5 boundaries)
    n_docs_sum = sum(r["n_docs"] for r in rows)
    n_nonempty = docs.where(F.size("tokens") > 0).count()
    assert n_docs_sum > n_nonempty


def test_materialize_packs_epoch_order(spark):
    """Epoch-ordered packing reconstructs the epoch order, and distinct
    epochs produce different pack contents."""
    from stripe_sync_engine_spark.operators.packing import (
        epoch_position,
        materialize_packs,
    )

    docs = spark.createDataFrame(
        [(i, [f"w{i}_{j}" for j in range(3)]) for i in range(30)],
        "doc_id long, tokens array<string>",
    )
    e1 = materialize_packs(docs, "tokens", budget=7, n_shards=2,
                           order_col=epoch_position(1))
    e1_again = materialize_packs(docs, "tokens", budget=7, n_shards=2,
                                 order_col=epoch_position(1))
    e2 = materialize_packs(docs, "tokens", budget=7, n_shards=2,
                           order_col=epoch_position(2))

    def flat(df):
        return {
            s: [t for r in sorted(rs, key=lambda r: r["pack_id"]) for t in r["tokens"]]
            for s, rs in _group_by_shard(df.collect()).items()
        }

    def _group_by_shard(rows):
        out = {}
        for r in rows:
            out.setdefault(r["shard"], []).append(r)
        return out

    f1, f1b, f2 = flat(e1), flat(e1_again), flat(e2)
    assert f1 == f1b                       # reproducible per epoch
    assert f1 != f2                        # epochs decorrelate
    for s in f1:
        assert sorted(f1[s]) == sorted(f2[s])  # same multiset, new order


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=25),
    budget=st.integers(min_value=2, max_value=7),
)
@pytest.mark.slow  # 45s hypothesis sweep; deterministic pack parity stays in the default tier
def test_property_materialize_packs_invariants(spark, sizes, budget):
    """For arbitrary doc sizes and budgets: every pack except a shard's
    last is exactly full, per-shard concatenation in pack order equals
    the docs' tokens in id order, and no token is lost or duplicated."""
    from pyspark.sql import functions as F

    from stripe_sync_engine_spark.operators.export import _shard_col
    from stripe_sync_engine_spark.operators.packing import materialize_packs

    n_shards = 3
    docs = spark.createDataFrame(
        [(i, [f"t{i}_{j}" for j in range(n)]) for i, n in enumerate(sizes)],
        "doc_id long, tokens array<string>",
    )
    rows = materialize_packs(docs, "tokens", budget=budget, n_shards=n_shards).collect()
    last = {}
    for r in rows:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["pack_id"])
    for r in rows:
        full = r["pack_id"] < last[r["shard"]]
        assert r["n_tokens"] == budget if full else 0 < r["n_tokens"] <= budget
    got = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["pack_id"])):
        got.setdefault(r["shard"], []).extend(r["tokens"])
    want = {}
    for r in (
        docs.withColumn("shard", _shard_col("doc_id", n_shards))
        .orderBy("shard", "doc_id")
        .collect()
    ):
        want.setdefault(r["shard"], []).extend(r["tokens"])
    want = {s: t for s, t in want.items() if t}
    assert got == want


# ---- incremental packing ------------------------------------------------


@pytest.mark.slow  # 33s arrival-order sweep; fold-horizon/equivalence stay in the default tier
def test_incremental_packer_matches_one_shot_arrival_order(spark, tmp_path):
    """Batches assigned sequentially through IncrementalPacker land at
    exactly the positions a one-shot assign_packs gives the concatenated
    corpus ordered by (batch sequence, id) — each shard's stream just
    continues. Replays of an already-registered batch re-assign the first
    delivery's positions; register is idempotent."""
    from pyspark.sql import functions as F

    from stripe_sync_engine_spark.operators.packing import (
        IncrementalPacker,
        assign_packs,
    )
    from stripe_sync_engine_spark.storage import TableStore

    def mk(ids_counts, seq):
        return spark.createDataFrame(
            [(i, n, seq) for i, n in ids_counts], "doc_id long, n long, _seq long"
        )

    # interleaved ids across batches → arrival order != id order
    b1 = mk([(1, 30), (8, 45), (3, 0), (12, 61)], 0)
    b2 = mk([(2, 17), (9, 80), (4, 33)], 1)
    b3 = mk([(5, 100), (7, 5)], 2)
    store = TableStore(spark, str(tmp_path / "wh_pack"))
    packer = IncrementalPacker(store, budget=64, n_shards=4)

    got = {}
    for b, bid in ((b1, "run:0"), (b2, "run:1"), (b3, "run:2")):
        for r in packer.pack_batch(b, "n", bid).collect():
            got[r["doc_id"]] = (r["shard"], r["pack_id"], r["pack_offset"], r["packs_spanned"])

    union = b1.unionByName(b2).unionByName(b3)
    want = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"], r["packs_spanned"])
        for r in assign_packs(union, "n", 64, 4, order_col=F.col("_seq")).collect()
    }
    assert got == want

    # replay: same positions, no new state rows
    n_rows = store.read(packer.table).count()
    replay = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"], r["packs_spanned"])
        for r in packer.pack_batch(b2, "n", "run:1").collect()
    }
    assert replay == {r["doc_id"]: got[r["doc_id"]] for r in b2.collect()}
    assert store.read(packer.table).count() == n_rows


def test_incremental_packer_fold_horizon(spark, tmp_path):
    """fold_progress collapses state to one row per shard without moving
    any future position, and enforces the replay horizon afterwards."""
    import pytest

    from stripe_sync_engine_spark.operators.packing import IncrementalPacker
    from stripe_sync_engine_spark.storage import TableStore

    def mk(ids_counts, seq):
        return spark.createDataFrame(
            [(i, n, seq) for i, n in ids_counts], "doc_id long, n long, _seq long"
        )

    store = TableStore(spark, str(tmp_path / "wh_pack_fold"))
    packer = IncrementalPacker(store, budget=32, n_shards=4)
    packer.pack_batch(mk([(1, 20), (2, 40), (3, 7)], 0), "n", "run:0")
    packer.pack_batch(mk([(4, 11), (5, 90)], 1), "n", "run:1")
    probe = mk([(100, 13), (101, 55)], 2)
    before = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
        for r in packer.assign_batch(probe, "n", "run:2").collect()
    }
    packer.fold_progress()
    after = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
        for r in packer.assign_batch(probe, "n", "run:2").collect()
    }
    assert after == before
    ids = {r["batch_id"] for r in store.read(packer.table).collect()}
    assert ids == {"_folded"}
    with pytest.raises(RuntimeError, match="folded"):
        packer.register(probe, "n", "run:0")
    # post-fold batches continue normally
    packer.pack_batch(probe, "n", "run:2")
    assert store.read(packer.table).count() <= 4 + 2  # folded rows + run:2 shards


def test_incremental_packer_assign_batch_refuses_folded_replay(spark, tmp_path):
    """assign_batch is documented replay-stable, so it must enforce the
    same fold horizon as register: past fold_progress the batch's own
    contribution is inside the collapsed base and cannot be excluded —
    a replay would silently return SHIFTED positions, with no error
    until (or unless) register runs."""
    import pytest

    from stripe_sync_engine_spark.operators.packing import IncrementalPacker
    from stripe_sync_engine_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "wh_pack_af"))
    docs = spark.createDataFrame([(1, 10), (2, 20), (3, 5)], "doc_id long, n long")
    packer = IncrementalPacker(store, budget=16, n_shards=4)
    packer.pack_batch(docs, "n", "run:0")
    packer.fold_progress()
    with pytest.raises(RuntimeError, match="folded"):
        packer.assign_batch(docs, "n", "run:0")


def test_incremental_packer_pin_precedes_first_write(spark, tmp_path, monkeypatch):
    """The layout pin lands BEFORE the first state-table write: a crash
    between the two can no longer leave an unpinned table that a
    differently-configured packer would silently adopt and re-pin."""
    import pytest

    from stripe_sync_engine_spark.operators.packing import IncrementalPacker
    from stripe_sync_engine_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "wh_pack_crash"))
    docs = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n long")
    packer = IncrementalPacker(store, budget=64, n_shards=4)

    def boom(*a, **k):
        raise OSError("injected crash before the state write")

    monkeypatch.setattr(store, "write", boom)
    with pytest.raises(OSError, match="injected"):
        packer.register(docs, "n", "b0")
    monkeypatch.undo()
    # the crashed first register already pinned its layout: a packer with
    # different parameters fails loudly instead of healing the pin with
    # ITS parameters over positions assign_batch may have handed out
    with pytest.raises(RuntimeError, match="corrupt the pack layout"):
        IncrementalPacker(store, budget=128, n_shards=4).register(docs, "n", "b0")
    # the original parameters resume cleanly
    IncrementalPacker(store, budget=64, n_shards=4).pack_batch(docs, "n", "b0")


def test_incremental_packer_pins_layout_params(spark, tmp_path):
    """budget/n_shards are part of the persisted layout: reconstructing
    the packer with different parameters fails loudly instead of silently
    emitting positions that overlap already-materialized packs."""
    import pytest

    from stripe_sync_engine_spark.operators.packing import IncrementalPacker
    from stripe_sync_engine_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "wh_pack_params"))
    docs = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n long")
    IncrementalPacker(store, budget=64, n_shards=4).pack_batch(docs, "n", "b0")
    wrong_shards = IncrementalPacker(store, budget=64, n_shards=8)
    with pytest.raises(RuntimeError, match="corrupt the pack layout"):
        wrong_shards.assign_batch(docs, "n", "b1")
    with pytest.raises(RuntimeError, match="corrupt the pack layout"):
        IncrementalPacker(store, budget=128, n_shards=4).register(docs, "n", "b1")
    # the recorded parameters keep working
    IncrementalPacker(store, budget=64, n_shards=4).pack_batch(docs, "n", "b1")
