"""Deterministic weighted corpus mixing (operators/mixing): the rates
solver's closed forms and loud infeasibility, hash-threshold sampling's
determinism / nesting / DuckDB parity (the ONE h32 formula, both
sides), and the assemble convenience's realized proportions."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from stripe_sync_engine_spark.operators.mixing import (
    H32_SPACE,
    assemble_mixture,
    mixture_rates,
    mixture_where_sql,
    sample_mixture,
)
from stripe_sync_engine_spark.tables import load_table


def test_mixture_rates_closed_forms():
    counts = {"en": 1000, "fr": 200}
    # no total: the binding category (fr) sets the waterline — total 400
    assert mixture_rates(counts, {"en": 0.5, "fr": 0.5}) == {"en": 0.2, "fr": 1.0}
    # explicit feasible total
    assert mixture_rates(counts, {"en": 0.5, "fr": 0.5}, total=100) == {
        "en": 0.05,
        "fr": 0.25,
    }
    # proportions normalize; absent categories are explicit zeros
    assert mixture_rates(counts, {"en": 2.0}) == {"en": 1.0, "fr": 0.0}
    # infeasible total names the binding category and the max feasible
    with pytest.raises(ValueError, match="'fr'.*max feasible total.*400"):
        mixture_rates(counts, {"en": 0.5, "fr": 0.5}, total=1000)
    # unrealizable target (no rows in a wanted category)
    with pytest.raises(ValueError, match="unrealizable"):
        mixture_rates(counts, {"en": 0.5, "zz": 0.5})
    with pytest.raises(ValueError, match="empty"):
        mixture_rates(counts, {})


def test_sample_mixture_deterministic_nested_and_oracle_parity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.5, "fr": 1.0, "de": 0.25, "es": 0.0, "zh": 0.1}

    def ids(df):
        return {r["doc_id"] for r in df.select("doc_id").collect()}

    a = ids(sample_mixture(docs, rates, salt="epoch1"))
    b = ids(sample_mixture(docs, rates, salt="epoch1"))
    c = ids(sample_mixture(docs, rates, salt="epoch2"))
    assert a == b  # same salt: byte-identical mixture
    assert a != c  # different salt: an independent redraw
    # nesting: a lower-rate draw under the SAME salt is a subset
    half = {k: v / 2 for k, v in rates.items()}
    assert ids(sample_mixture(docs, half, salt="epoch1")) <= a
    # rate 0 excludes the category entirely; rate 1 keeps all of it
    langs = {
        r["lang"]
        for r in sample_mixture(docs, rates, salt="epoch1").select("lang").distinct().collect()
    }
    assert "es" not in langs and "fr" in langs

    # DuckDB parity: the ONE h32 formula selects the same rows
    con = duckdb.connect()
    import os

    pq = os.path.join(sf_dir, "documents.parquet")
    where = mixture_where_sql(rates, salt="epoch1")
    want = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{pq}') WHERE {where}"
        ).fetchall()
    }
    assert a == want


def test_assemble_mixture_realizes_proportions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sampled, rates = assemble_mixture(
        docs, {"en": 0.5, "fr": 0.5}, salt="mix"
    )
    # fr is the scarcer category at these proportions: it keeps everything
    assert rates["fr"] == 1.0 and 0 < rates["en"] < 1 and rates["es"] == 0.0
    got = {
        r["lang"]: r["count"]
        for r in sampled.groupBy("lang").count().collect()
    }
    assert set(got) == {"en", "fr"}
    n_fr = docs.where("lang = 'fr'").count()
    assert got["fr"] == n_fr  # rate-1.0 category is exact
    # the hash draw makes the en half binomial around its target; at
    # sf0.001-sized corpora keep the tolerance generous but meaningful
    target_en = rates["en"] * docs.where("lang = 'en'").count()
    assert abs(got["en"] - target_en) <= max(6, 0.35 * target_en)

    # explicit-total path composes with the guard
    s2, r2 = assemble_mixture(docs, {"en": 1.0}, total=10, salt="mix")
    assert s2.count() <= docs.where("lang = 'en'").count()
    with pytest.raises(ValueError, match="infeasible"):
        assemble_mixture(docs, {"fr": 1.0}, total=10**9)


def test_assemble_mixture_guards_high_cardinality_category(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    import stripe_sync_engine_spark.operators.mixing as mixing

    old = mixing.MAX_CATEGORIES
    mixing.MAX_CATEGORIES = 2  # force the guard with the 5-lang corpus
    try:
        with pytest.raises(ValueError, match="not a category column"):
            assemble_mixture(docs, {"en": 1.0})
    finally:
        mixing.MAX_CATEGORIES = old


def test_null_category_and_bad_total_edges(spark):
    """NULL categories (real language-ID output) never enter the rates
    dict — it stays sortable/persistable, the SQL mirror never sees a
    None key, and NULL-category rows are dropped by the sampler. A
    non-positive explicit total raises instead of silently producing an
    empty mixture."""
    docs = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", None), (3, "c", "en"), (4, "d", None)],
        "doc_id long, text string, lang string",
    )
    sampled, rates = assemble_mixture(docs, {"en": 1.0}, salt="nulls")
    assert rates == {"en": 1.0}  # no None key anywhere
    got = {(r["doc_id"], r["lang"]) for r in sampled.collect()}
    assert got == {(1, "en"), (3, "en")}  # NULL-category rows dropped
    # the SQL mirror round-trips the same rates without a TypeError
    assert "CASE lang WHEN 'en'" in mixture_where_sql(rates, salt="nulls")

    with pytest.raises(ValueError, match="positive sample size"):
        mixture_rates({"en": 100}, {"en": 1.0}, total=0)
    with pytest.raises(ValueError, match="positive sample size"):
        mixture_rates({"en": 100}, {"en": 1.0}, total=-5)


def test_quoted_category_and_salt_mirror_parity(spark):
    """A category value or salt containing a single quote must still
    render valid oracle SQL and select the SAME rows as the Spark draw —
    raw interpolation would break (or inject into) the DuckDB mirror,
    silently desynchronizing the reproducibility contract."""
    rows = [(i, "don't" if i % 2 else "it's", ) for i in range(1, 201)]
    docs = spark.createDataFrame(
        [(i, c, f"t{i}") for i, c in rows], "doc_id long, lang string, text string"
    )
    rates = {"don't": 0.5, "it's": 0.25}
    salt = "ep'och"
    got = {
        r["doc_id"] for r in sample_mixture(docs, rates, salt=salt).collect()
    }

    where = mixture_where_sql(rates, salt=salt)
    assert "''" in where  # the quotes were escaped, not interpolated raw
    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame(
        [(i, c) for i, c in rows], columns=["doc_id", "lang"]
    )
    con.register("docs", pdf)
    want = {
        r[0]
        for r in con.execute(f"SELECT doc_id FROM docs WHERE {where}").fetchall()
    }
    assert got == want and got  # parity AND a non-empty draw


def test_mixture_export_manifest_reconstructs_drawn_set(spark, sf_dir, tmp_path):
    """The recipe rides the export manifest: membership of every row is
    re-derivable from the manifest ALONE (Spark and the DuckDB mirror
    agree), verify_mixture passes a faithful export, fails a row that
    should not be in the drawn set, and (given the source) a drawn row
    missing from the export. Resume carries the recipe; resuming with a
    different recipe raises."""
    import os

    import pytest as _pytest

    from stripe_sync_engine_spark.operators.export import (
        export_corpus_shards,
        read_manifest,
    )
    from stripe_sync_engine_spark.operators.mixing import (
        mixture_record,
        verify_mixture,
    )
    from stripe_sync_engine_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    salt = "ep'och-7"  # quoted salt: the record must round-trip it
    sampled, rates = assemble_mixture(
        docs, {"en": 0.4, "fr": 0.3, "de": 0.3}, salt=salt
    )
    sampled = sampled.localCheckpoint(eager=True)
    out = str(tmp_path / "exp")
    rec = mixture_record(rates, salt)
    m = export_corpus_shards(sampled, out, n_shards=4, mixture=rec)
    assert m["mixture"] == rec

    rep = verify_mixture(spark, out)
    assert rep["ok"] and rep["total_docs"] == sampled.count()
    assert verify_mixture(spark, out, source=docs)["ok"]  # complete too

    # manifest ALONE → the exact drawn set, on both engines
    mix = read_manifest(out)["mixture"]
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}  # noqa: E731
    redrawn = sample_mixture(
        docs, mix["rates"], mix["category_col"], mix["id_col"], mix["salt"]
    )
    exported = spark.read.parquet(os.path.join(out, "data"))
    assert ids(redrawn) == ids(exported) == ids(sampled)
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "documents.parquet")
    where = mixture_where_sql(
        mix["rates"], mix["category_col"], mix["id_col"], mix["salt"]
    )
    want = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{pq}') WHERE {where}"
        ).fetchall()
    }
    assert want == ids(sampled)

    # a smuggled non-member row fails verification, named
    outsider = (
        docs.join(sampled.select("doc_id"), "doc_id", "left_anti").limit(1)
        .localCheckpoint(eager=True)
    )
    bad_id = outsider.first()["doc_id"]
    out_bad = str(tmp_path / "exp_bad")
    export_corpus_shards(
        sampled.unionByName(outsider), out_bad, n_shards=4, mixture=rec
    )
    rep_bad = verify_mixture(spark, out_bad)
    assert not rep_bad["ok"] and rep_bad["violation_ids"] == [bad_id]

    # a drawn row missing from the export fails the completeness check
    lost_id = sampled.first()["doc_id"]
    out_miss = str(tmp_path / "exp_miss")
    export_corpus_shards(
        sampled.where(F.col("doc_id") != lost_id), out_miss, n_shards=4, mixture=rec
    )
    assert verify_mixture(spark, out_miss)["ok"]  # membership alone can't see it
    rep_miss = verify_mixture(spark, out_miss, source=docs)
    assert not rep_miss["ok"] and rep_miss["missing_ids"] == [lost_id]

    # resume: recipe carried forward without repeating it; a different
    # recipe on resume is refused
    m2 = export_corpus_shards(sampled, out, n_shards=4, resume=True)
    assert m2["mixture"] == rec
    other = mixture_record(rates, "other-salt")
    with _pytest.raises(ValueError, match="different mixture"):
        export_corpus_shards(sampled, out, n_shards=4, resume=True, mixture=other)

    # an export with no recorded mixture refuses to verify as one
    out_plain = str(tmp_path / "exp_plain")
    export_corpus_shards(sampled, out_plain, n_shards=4)
    with _pytest.raises(ValueError, match="no mixture"):
        verify_mixture(spark, out_plain)


def test_mixture_export_incremental_from_change_feed(spark, tmp_path):
    """The pipeline tail, end to end on a MUTATING corpus: the drawn
    mixture is exported once, then maintained by export_changed_shards
    straight off the corpus change feed — inserts, deletes, and
    CATEGORY FLIPS (an update that moves a row into/out of the drawn
    set) all land by rewriting only the touched shards. The recipe rides
    the manifest through the increment, verify_mixture stays green
    against the mutated source, and the incremented export is
    digest-identical to a from-scratch export of the same drawn set."""
    from stripe_sync_engine_spark.operators.export import (
        export_changed_shards,
        export_corpus_shards,
        read_manifest,
    )
    from stripe_sync_engine_spark.operators.mixing import (
        mixture_record,
        verify_mixture,
    )
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_mixinc"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    rows = [
        (i, f"body {i}", ["en", "fr", "de"][i % 3]) for i in range(120)
    ]
    store.write(
        "corpus",
        spark.createDataFrame(rows, "doc_id long, text string, lang string"),
        key="doc_id",
    )
    rates = {"en": 0.6, "fr": 1.0, "de": 0.0}
    salt = "inc-epoch"
    rec = mixture_record(rates, salt)

    def drawn():
        return sample_mixture(store.read("corpus"), rates, salt=salt).select(
            "doc_id", "text", "lang"
        )

    out = str(tmp_path / "mix_out")
    export_corpus_shards(drawn(), out, n_shards=4, mixture=rec)
    assert verify_mixture(spark, out, source=store.read("corpus"))["ok"]
    # baseline the exporter's cursor (the export above covered this state)
    _, cur0 = eng.consume_changes("exporter", "corpus")
    eng.ack_changes("exporter", "corpus", cur0)

    # mutate: new docs (one drawn, lang fr; one never drawn, lang de),
    # delete a drawn doc, and flip memberships both ways via lang updates
    import time as _t

    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}  # noqa: E731
    drawn_ids = ids(drawn())
    victim = min(drawn_ids)
    flip_out = max(i for i, _, l in rows if i in drawn_ids and l == "en")
    flip_in = max(i for i, _, l in rows if i not in drawn_ids and l == "de")
    cur = store.read("corpus")
    nxt = (
        cur.where(F.col("doc_id") != victim)
        .withColumn(
            "lang",
            F.when(F.col("doc_id") == flip_out, "de")  # rate 0: leaves the set
            .when(F.col("doc_id") == flip_in, "fr")  # rate 1: joins the set
            .otherwise(F.col("lang")),
        )
        .unionByName(
            spark.createDataFrame(
                [(500, "fresh drawn", "fr"), (501, "fresh undrawn", "de")],
                "doc_id long, text string, lang string",
            )
        )
    )
    _t.sleep(0.002)
    store.write("corpus", nxt, key="doc_id")

    feed, cursor = eng.consume_changes("exporter", "corpus")
    m = export_changed_shards(drawn(), out, feed.select("doc_id"))
    eng.ack_changes("exporter", "corpus", cursor)

    assert m["mixture"] == rec  # the recipe rode the increment
    rep = verify_mixture(spark, out, source=store.read("corpus"))
    assert rep["ok"], rep
    got = ids(spark.read.parquet(out + "/data"))
    assert victim not in got and flip_out not in got
    assert flip_in in got and 500 in got and 501 not in got

    # digest-identical to a from-scratch export of the same drawn set
    out2 = str(tmp_path / "mix_out2")
    m2 = export_corpus_shards(drawn(), out2, n_shards=4, mixture=rec)
    assert m["shards"] == m2["shards"]


def _recount(store, entity, col="lang"):
    return {
        r[col]: r["count"]
        for r in store.read(entity).groupBy(col).count().collect()
    }


def test_category_counts_incremental_parity(spark, tmp_path):
    """The maintained histogram ≡ a full recount across inserts,
    updates (category moves), deletes, idle polls, replays, and a lost
    ack — the change-feed rollup that makes steady-state mixture
    re-solves O(changed buckets) instead of O(corpus)."""
    import time

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_cc"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, f"text {i}", ["en", "fr", "de"][i % 3]) for i in range(30)],
        "doc_id long, text string, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    assert cc.poll() == _recount(store, "corpus")  # initial load

    def commit(df):
        time.sleep(0.002)
        store.write("corpus", df, key="doc_id")

    # inserts (incl. a NEW category and a NULL category)
    commit(
        store.read("corpus").unionByName(
            spark.createDataFrame(
                [(100, "t", "zh"), (101, "t", None), (102, "t", "en")],
                "doc_id long, text string, lang string",
            )
        )
    )
    got = cc.poll()
    want = _recount(store, "corpus")
    assert got == want and got["zh"] == 1 and got[None] == 1

    # update that MOVES a doc between categories (pre-image -1, post +1)
    commit(
        store.read("corpus").withColumn(
            "lang", F.when(F.col("doc_id") == 0, "fr").otherwise(F.col("lang"))
        )
    )
    assert cc.poll() == _recount(store, "corpus")

    # deletes, incl. the last doc of a category (its key drops entirely)
    commit(store.read("corpus").where("doc_id not in (100, 5)"))
    got = cc.poll()
    assert got == _recount(store, "corpus") and "zh" not in got

    # idle poll: no commits — a no-op, state unchanged
    before = cc._read_state()
    assert cc.poll() == got and cc._read_state() == before

    # lost ack (crash after the state write): restore the pre-poll cursor,
    # re-poll — the pinned window re-delivers the same until, the
    # applied_until match skips the re-apply, counts stay exact
    import json

    cur_path = eng._cursor_path(cc.consumer)
    saved = open(cur_path).read()
    commit(
        store.read("corpus").unionByName(
            spark.createDataFrame([(200, "t", "en")], "doc_id long, text string, lang string")
        )
    )
    assert cc.poll() == _recount(store, "corpus")
    with open(cur_path, "w") as f:
        f.write(saved)  # the ack is lost; the state write survived...
    # ...and so did the PINNED WINDOW: ack_changes writes the cursor
    # first and clears the pin after, so every reachable crash that
    # lost the ack left the pin in place. Restore it alongside the
    # cursor — a cursor-without-pin rewind is unreachable by any crash
    # and indistinguishable from fan-out delivery, which poll() now
    # refuses loudly (test_poll_refuses_fanout_advanced_fold).
    from stripe_sync_engine_spark.commitio import atomic_write_json

    atomic_write_json(
        eng._pending_path(cc.consumer),
        {"corpus": int(cc._read_state()["applied_until"])},
    )
    assert cc.poll() == _recount(store, "corpus")  # replay double-counts nothing
    assert json.load(open(cur_path)) != json.loads(saved)  # re-acked
    assert "corpus" not in eng._read_pending(cc.consumer)  # pin re-cleared

    # rebase: drift remedy recounts and realigns the cursor — and the
    # recount is PINNED to the head the cursor baselines to (a writer
    # landing between the commits() read and the recount would otherwise
    # be counted now AND re-delivered by the next poll)
    seen_as_of = []
    real_read = store.read

    def spying_read(entity, as_of_ms=None):
        seen_as_of.append(as_of_ms)
        return real_read(entity, as_of_ms=as_of_ms)

    store.read = spying_read
    try:
        assert cc.rebase() == _recount(store, "corpus")
    finally:
        store.read = real_read
    assert seen_as_of and seen_as_of[0] == store.commits("corpus")[-1]
    assert cc.poll() == _recount(store, "corpus")

    # a WIPED cursor cannot silently double the counts: the whole-table
    # initial load it would trigger is refused loudly, and rebase() is
    # the recovery
    import os

    os.remove(eng._cursor_path(cc.consumer))
    with pytest.raises(RuntimeError, match="cursor was wiped.*rebase"):
        cc.poll()
    assert cc.rebase() == _recount(store, "corpus")
    assert cc.poll() == _recount(store, "corpus")


def test_assemble_mixture_with_maintained_counts(spark, tmp_path):
    """assemble_mixture(counts=...) solves from the maintained histogram
    with no corpus count scan and draws the SAME mixture as the scan
    path (the counts are exact, so the rates are identical)."""
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_ccm"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, f"text {i}", ["en", "fr"][i % 2]) for i in range(40)],
        "doc_id long, text string, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    counts = cc.poll()

    corpus = store.read("corpus")
    s_scan, r_scan = assemble_mixture(corpus, {"en": 0.5, "fr": 0.5}, salt="e")
    s_cnt, r_cnt = assemble_mixture(
        corpus, {"en": 0.5, "fr": 0.5}, salt="e", counts=counts
    )
    assert r_scan == r_cnt
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}  # noqa: E731
    assert ids(s_scan) == ids(s_cnt)


def test_token_weighted_mixing_and_counts(spark, tmp_path):
    """Training mixtures are specified in TOKENS: with weight_col the
    histogram is SUM(n_tokens) per category, the rates realize token
    proportions in expectation (the draw stays the per-doc salted hash —
    deterministic membership), and the weighted CategoryCounts tracks a
    full recount across inserts, weight changes, category moves, and
    deletes — coexisting with a doc counter on the same column."""
    import time

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_tw"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    # en docs are LONG (90 tokens), fr docs short (10): token-weighted
    # rates must differ sharply from doc-weighted ones
    docs = spark.createDataFrame(
        [
            (i, "t", "en" if i % 2 else "fr", 90 if i % 2 else 10)
            for i in range(200)
        ],
        "doc_id long, text string, lang string, n_tokens long",
    )
    store.write("corpus", docs, key="doc_id")
    corpus = store.read("corpus")

    def tok_recount():
        return {
            r["lang"]: r["n"]
            for r in corpus.groupBy("lang").agg(F.sum("n_tokens").alias("n")).collect()
        }

    tw = CategoryCounts(eng, "corpus", weight_col="n_tokens")
    dc = CategoryCounts(eng, "corpus")  # doc counter coexists
    assert tw.poll() == tok_recount() == {"en": 9000, "fr": 1000}
    assert dc.poll() == {"en": 100, "fr": 100}
    assert tw._state_path() != dc._state_path() and tw.consumer != dc.consumer

    # 50/50 token recipe: fr (scarce in tokens) keeps all, en downsamples
    # to 1000 expected tokens = rate 1/9 — a doc-weighted solve would say
    # rate 1.0 for both (equal doc counts); the weighted one must not
    sampled, rates = assemble_mixture(
        corpus, {"en": 0.5, "fr": 0.5}, weight_col="n_tokens", salt="tw"
    )
    assert rates["fr"] == 1.0 and rates["en"] == pytest.approx(1000 / 9000)
    got = {
        r["lang"]: r["n"]
        for r in sampled.groupBy("lang").agg(F.sum("n_tokens").alias("n")).collect()
    }
    assert got["fr"] == 1000  # rate-1.0 side exact
    # en realized tokens binomial around 1000 (100 docs × p=1/9 × 90)
    assert abs(got.get("en", 0) - 1000) <= 600

    # the maintained path solves identically to the scan path
    _, rates2 = assemble_mixture(
        corpus, {"en": 0.5, "fr": 0.5}, salt="tw", counts=tw.counts()
    )
    assert rates2 == rates
    # explicit totals are WEIGHT totals now; infeasible still raises
    with pytest.raises(ValueError, match="infeasible"):
        assemble_mixture(
            corpus, {"fr": 1.0}, total=2000, weight_col="n_tokens", salt="tw"
        )

    # mutate: weight change, category move, delete, insert — weighted
    # parity holds (update pre-images carry the OLD weight)
    time.sleep(0.002)
    store.write(
        "corpus",
        corpus.where("doc_id not in (0, 2)")  # delete two fr docs (-20)
        .withColumn(
            "n_tokens",
            F.when(F.col("doc_id") == 1, F.lit(900)).otherwise(F.col("n_tokens")),
        )  # en doc grows 90 -> 900
        .withColumn(
            "lang",
            F.when(F.col("doc_id") == 3, "fr").otherwise(F.col("lang")),
        )  # moves 90 en-tokens to fr
        .unionByName(
            spark.createDataFrame(
                [(900, "t", "de", 7)], "doc_id long, text string, lang string, n_tokens long"
            )
        ),
        key="doc_id",
    )
    corpus = store.read("corpus")
    want = tok_recount()
    assert tw.poll() == want
    assert want == {"en": 9000 - 90 - 90 + 900, "fr": 1000 - 20 + 90, "de": 7}
    assert dc.poll() == {"en": 99, "fr": 99, "de": 1}  # doc counter unaffected
    assert tw.rebase() == want  # weighted rebase recounts the same


def test_mixture_rates_properties():
    """Property-based pin of the solver's invariants: rates always lie
    in [0, 1]; the realized expected total equals the requested total
    (or the feasibility waterline when none is requested); and the
    realized proportions match the normalized targets exactly —
    rate_c × count_c / total == prop_c for every targeted category."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cats = st.dictionaries(
        st.text("abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10**6),
        min_size=1,
        max_size=8,
    )
    props = st.lists(st.floats(0.01, 100.0), min_size=1, max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(counts=cats, weights=props, frac=st.floats(0.01, 1.0))
    def check(counts, weights, frac):
        names = sorted(counts)[: len(weights)]
        target = {c: w for c, w in zip(names, weights)}
        norm = sum(target.values())
        feasible = min(counts[c] / (w / norm) for c, w in target.items())

        # no-total form: the waterline
        rates = mixture_rates(counts, target)
        assert all(0.0 <= r <= 1.0 for r in rates.values())
        realized = sum(rates[c] * counts[c] for c in rates)
        assert realized == pytest.approx(feasible, rel=1e-9)
        for c, w in target.items():
            assert rates[c] * counts[c] / feasible == pytest.approx(
                w / norm, rel=1e-9
            )

        # explicit-total form: exactly the asked-for expected size
        total = max(frac * feasible, 1e-6)
        rates2 = mixture_rates(counts, target, total=total)
        assert sum(rates2[c] * counts[c] for c in rates2) == pytest.approx(
            total, rel=1e-9
        )

    check()


def _py_h32(s: str) -> int:
    """Python mirror of export.h32_col / sql_h32 (md5 → first 8 hex
    chars as int) — lets the stratified property sweep recompute draw
    membership without a cluster."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _py_stratum(w: int) -> int:
    import math

    return int(math.floor(math.log2(max(w, 1))))


def _py_cdf(docs, salt: str, n_bins: int) -> dict:
    """Build the (category, stratum, hash-bin) → weight histogram in
    Python, exactly as the scan path / StratifiedCDF would."""
    bin_w = H32_SPACE // n_bins
    cdf: dict = {}
    for i, c, w in docs:
        k = (c, _py_stratum(w), _py_h32(f"{i}:{salt}") // bin_w)
        cdf[k] = cdf.get(k, 0) + w
    return cdf


def _py_members(docs, strata: dict, salt: str) -> set:
    return {
        i
        for i, c, w in docs
        if _py_h32(f"{i}:{salt}")
        < int(round(strata.get(c, {}).get(_py_stratum(w), 0.0) * H32_SPACE))
    }


def test_stratified_rates_properties():
    """hypothesis sweep (VERDICT r12 #3) of the stratified solver's
    invariants, via the maintained-CDF path (pure Python, no cluster):
    every threshold is an exact float64 t/2^32 with t a 32-bit integer;
    rates lie in [0, 1]; the realized per-category weight — recomputed
    from the returned recipe by the same h32 the draw uses — lands
    within HALF THE HEAVIEST (stratum, hash-bin) CELL of the target
    rho_c·W_c (the documented deterministic bound: a picking stratum
    leaves |residual| ≤ half its largest bin by the closest-boundary
    rule, a clamping stratum only shrinks the carried residual); and
    total=None realizes the feasibility waterline within the summed
    per-category bounds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stripe_sync_engine_spark.operators.mixing import (
        stratified_weighted_rates,
    )

    weights = st.lists(
        st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=40
    )

    @settings(max_examples=150, deadline=None)
    @given(
        per_cat=st.lists(weights, min_size=1, max_size=3),
        props=st.lists(st.floats(0.05, 10.0), min_size=3, max_size=3),
        frac=st.floats(0.05, 1.0),
        n_bins=st.sampled_from([16, 64, 256]),
        salt=st.text("xyz01", max_size=6),
    )
    def check(per_cat, props, frac, n_bins, salt):
        cats = ["ca", "cb", "cc"][: len(per_cat)]
        docs = []
        did = 0
        for c, ws in zip(cats, per_cat):
            for w in ws:
                docs.append((did, c, w))
                did += 1
        totals = {c: sum(w for _, cc, w in docs if cc == c) for c in cats}
        if any(t <= 0 for t in totals.values()):
            return  # unrealizable recipes raise — pinned elsewhere
        target = dict(zip(cats, props))
        norm = sum(target.values())
        feasible = min(totals[c] / (target[c] / norm) for c in cats)
        cdf = _py_cdf(docs, salt, n_bins)

        for total in (None, max(frac * feasible, 1.0)):
            strata = stratified_weighted_rates(
                None, target, salt=salt, n_bins=n_bins, cdf=cdf, total=total
            )
            eff = feasible if total is None else total
            assert set(strata) == set(cats)
            realized_sum, bound_sum = 0, 0.0
            for c in cats:
                for r in strata[c].values():
                    assert 0.0 <= r <= 1.0
                    t32 = int(round(r * H32_SPACE))
                    assert t32 / H32_SPACE == r  # exact t/2^32
                rho_w = (target[c] / norm) * eff
                realized = sum(
                    w
                    for i, cc, w in docs
                    if cc == c
                    and _py_h32(f"{i}:{salt}")
                    < int(
                        round(
                            strata[c].get(_py_stratum(w), 0.0) * H32_SPACE
                        )
                    )
                )
                max_cell = max(
                    w for (cc, _b, _hb), w in cdf.items() if cc == c
                )
                bound = 0.5 * max_cell + 1e-6 * totals[c] + 1e-9
                assert abs(realized - rho_w) <= bound, (
                    c, realized, rho_w, bound,
                )
                realized_sum += realized
                bound_sum += bound
            assert abs(realized_sum - eff) <= bound_sum

    check()


def _fanout_fold(tmpdir: str, commits: list):
    """A CategoryCounts over a fake single-table store whose history is
    ``commits = [(t_ms, {key: delta})]`` — read(as_of) returns prefix
    sums, commits() the timestamps. The ONE Spark touchpoint of the
    fan-out delivery path — ``_grouped_rows``'s groupBy-and-collect —
    passes the already-grouped ``[(key, delta)]`` list through, so the
    hypothesis sweep exercises the REAL state machine
    (``apply_window``'s alignment guards, ``_fold_window``'s merge +
    negative-count guard + atomic commit, ``rebase(at_ms)``'s
    recount-and-realign) at pure-Python speed."""
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts

    class _Store:
        root = tmpdir

        def commits(self, entity):
            return [t for t, _ in commits]

        def read(self, entity, as_of_ms=None, buckets=None):
            counts: dict = {}
            for t, delta in commits:
                if as_of_ms is not None and t > as_of_ms:
                    break
                for k, d in delta.items():
                    counts[k] = counts.get(k, 0) + d
            return [(k, v) for k, v in counts.items() if v]

    class _Engine:
        store = _Store()
        acked: dict = {}

        def ack_changes(self, consumer, entity, cursor_ms):
            self.acked[entity] = int(cursor_ms)

    class _Fold(CategoryCounts):
        def _grouped_rows(self, feed, value_col):
            return list(feed)

    return _Fold(_Engine(), "corpus")


def test_fanout_fold_delivery_properties(spark, tmp_path):
    # the spark fixture is unused directly but guarantees an active
    # session: _fold_window builds (never executes) Column expressions
    """VERDICT r14 #5: hypothesis over random commit sequences split
    into arbitrary window partitions, with injected crash-replays and
    an interleaved rebase(at_ms) — the hand-built fan-out tests cover
    the known shapes; this closes the unknown ones. Invariants: (a)
    after any aligned delivery schedule the fold state equals the
    prefix-sum recount at its cursor; (b) every replayed window
    (crash between fold commit and consumer ack) is a no-op; (c) every
    MISALIGNED delivery — a skipped window — raises and leaves state
    untouched; (d) rebase(at_ms=<any retained commit>) realigns so
    delivery continues from exactly there."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    ids = itertools.count()

    @st.composite
    def scenarios(draw):
        n = draw(st.integers(min_value=2, max_value=8))
        times = sorted(
            draw(
                st.sets(
                    st.integers(min_value=1, max_value=10**6),
                    min_size=n,
                    max_size=n,
                )
            )
        )
        keys = ["a", "b", "c"]
        running = {k: 0 for k in keys}
        commits = []
        for t in times:
            delta = {}
            for k in keys:
                d = draw(st.integers(min_value=-running[k], max_value=3))
                if d:
                    delta[k] = d
                    running[k] += d
            commits.append((t, delta))
        # window partition of (0, times[-1]]: cut after these indices
        cuts = sorted(
            draw(
                st.sets(st.integers(min_value=0, max_value=n - 2), max_size=n - 1)
            )
            | {n - 1}
        )
        replay = draw(
            st.lists(st.booleans(), min_size=len(cuts), max_size=len(cuts))
        )
        rebase_at = draw(st.one_of(st.none(), st.integers(0, len(cuts) - 1)))
        rebase_back = draw(st.integers(min_value=0, max_value=n - 1))
        return commits, cuts, replay, rebase_at, rebase_back

    def recount(commits, until):
        counts: dict = {}
        for t, delta in commits:
            if t > until:
                break
            for k, d in delta.items():
                counts[k] = counts.get(k, 0) + d
        return {k: v for k, v in counts.items() if v}

    def window_feed(commits, since, until):
        net: dict = {}
        for t, delta in commits:
            if since < t <= until:
                for k, d in delta.items():
                    net[k] = net.get(k, 0) + d
        return list(net.items())

    @settings(max_examples=120, deadline=None)
    @given(sc=scenarios())
    def check(sc):
        commits, cuts, replay, rebase_at, rebase_back = sc
        times = [t for t, _ in commits]
        fold = _fanout_fold(str(tmp_path / f"ff{next(ids)}"), commits)
        since = 0
        for i, cut in enumerate(cuts):
            until = times[cut]
            feed = window_feed(commits, since, until)
            fold.apply_window(feed, since, until)
            assert fold.counts() == recount(commits, until)  # (a)
            if replay[i]:  # (b) crash retry: identical window, no-op
                fold.apply_window(feed, since, until)
                assert fold.counts() == recount(commits, until)
            if rebase_at == i:
                # (d) interleaved rebase to an ARBITRARY retained commit
                # at or before the cursor: the recount matches that
                # snapshot, and re-delivering (there, until] converges
                # back — the onboarding/repair flow, mid-schedule
                back = times[min(rebase_back, cut)]
                fold.rebase(at_ms=back)
                assert fold.cursor() == back
                assert fold.counts() == recount(commits, back)
                if back < until:
                    fold.apply_window(
                        window_feed(commits, back, until), back, until
                    )
                assert fold.cursor() == until
                assert fold.counts() == recount(commits, until)
            # (c) a skipped window raises and mutates nothing
            if cut + 2 < len(times):
                gap_since, gap_until = times[cut + 1], times[-1]
                before = fold.counts()
                with pytest.raises(RuntimeError, match="missed windows"):
                    fold.apply_window(
                        window_feed(commits, gap_since, gap_until),
                        gap_since,
                        gap_until,
                    )
                assert fold.counts() == before and fold.cursor() == until
            since = until
        # final: state == full recount at the head
        assert fold.counts() == recount(commits, times[-1])
        assert fold.cursor() == times[-1]

    check()


def _audit_fold(tmpdir: str, rows: list, n_b: int = 32, cursor: int = 1000):
    """A CategoryCounts over a fake BUCKETED single-table store —
    ``rows = [(category, weight, bucket)]`` — so the sampled audit's
    real machinery (md5 bucket choice incl. the epoch seed, the
    concentration tolerance, the atom escalation's filtered complement
    scan, the degraded-to-exact path) runs at pure-Python speed under
    hypothesis. Only the two Spark touchpoints are faked:
    ``_grouped_rows`` aggregates plain lists and
    ``_margin_predicate`` returns a membership set consumed by the fake
    frame's ``where``; everything else — ``verify`` /
    ``_verify_sampled`` — is the production code under test."""
    import hashlib

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts

    class _Rows(list):
        def where(self, margin_set):
            return _Rows(r for r in self if r[0] in margin_set)

    class _Store:
        root = tmpdir

        def commits(self, entity):
            return [cursor]

        def read(self, entity, as_of_ms=None, buckets=None):
            if buckets is None:
                return _Rows(rows)
            sel = set(buckets)
            return _Rows(r for r in rows if r[2] in sel)

        def read_bucket_sample(self, entity, k, seed="", as_of_ms=None):
            k = int(k)
            if k <= 0:
                raise ValueError("k must be >= 1")
            if k >= n_b:
                return _Rows(rows), list(range(n_b)), n_b
            ranked = sorted(
                range(n_b),
                key=lambda b: hashlib.md5(f"{b}:{seed}".encode()).hexdigest(),
            )
            chosen = sorted(ranked[:k])
            return self.read(entity, buckets=chosen), chosen, n_b

    class _Engine:
        store = _Store()

    class _Fold(CategoryCounts):
        def _grouped_rows(self, feed, value_col, with_rows=False):
            agg: dict = {}
            for cat, w, _b in feed:
                s, n = agg.get(cat, (0, 0))
                agg[cat] = (s + w, n + 1)
            if with_rows:
                return [(k, s, n) for k, (s, n) in agg.items()]
            return [(k, s) for k, (s, _n) in agg.items()]

        def _margin_predicate(self, margins):
            return set(margins)

    return _Fold(_Engine(), "corpus")


def test_sampled_audit_error_rate_properties(spark, tmp_path):
    # the spark fixture is unused directly but guarantees an active
    # session: verify() builds (never executes) Column expressions
    """VERDICT r15 #6: hypothesis over random fold states × injected
    drift magnitudes × rotated audit epochs, generalizing the
    hand-built pins (and the 5bd3a5e claim-anchored tolerance fix).
    Invariants, each checked across independently drawn epochs:
    (a) ZERO false positives on a clean fold at z=6 — no corpus shape,
    sample size, or epoch draw flags clean state (atom-shaped margins
    escalate to an exact recount, which a clean fold passes exactly);
    (b) inflation beyond the documented detection bound
    (z·sqrt(claim·w·(1-f)/f) + z·w, computed from the drifted claim
    itself) is ALWAYS flagged;
    (c) a single-row atom margin is flagged for ANY inflation ≥ 1 —
    the r15 escalation's whole point (no tolerance, exact recount);
    (d) a wiped large margin is flagged."""
    import itertools
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    ids = itertools.count()
    N_B, Z, CURSOR = 32, 6.0, 1000

    @st.composite
    def corpora(draw):
        cats = draw(st.integers(min_value=1, max_value=5))
        wmax = draw(st.sampled_from([1, 1, 3, 20]))
        rows, i = [], 0
        for c in range(cats):
            n = draw(st.integers(min_value=0, max_value=1500))
            w = draw(st.integers(min_value=1, max_value=wmax))
            for _ in range(n):
                # stride assignment ≈ the store's uniform hash
                # bucketing; hypothesis varies sizes, not placement
                rows.append((f"c{c}", w, (i * 2654435761) % N_B))
                i += 1
        # sometimes a whole-row ATOM: one huge doc in its own margin
        atom_w = draw(st.one_of(st.none(), st.integers(10_000, 10_000_000)))
        if atom_w is not None:
            rows.append(("zz", atom_w, draw(st.integers(0, N_B - 1))))
        k = draw(st.integers(min_value=4, max_value=16))
        epochs = draw(
            st.lists(
                st.integers(min_value=0, max_value=10_000),
                min_size=2,
                max_size=3,
                unique=True,
            )
        )
        atom_inflation = draw(st.integers(min_value=1, max_value=10_000_000))
        return rows, k, epochs, atom_w, atom_inflation

    @settings(max_examples=150, deadline=None)
    @given(sc=corpora())
    def check(sc):
        rows, k, epochs, atom_w, atom_inflation = sc
        fold = _audit_fold(str(tmp_path / f"af{next(ids)}"), rows, N_B, CURSOR)
        true: dict = {}
        for cat, w, _b in rows:
            true[cat] = true.get(cat, 0) + w
        fold._write_state(CURSOR, true)
        f = min(k, N_B) / N_B
        wmax_of = {}
        for cat, w, _b in rows:
            wmax_of[cat] = max(wmax_of.get(cat, 1), w)

        # (a) clean: no false positive at any epoch
        for e in epochs:
            rep = fold.verify(sample=k, z=Z, epoch=e)
            assert rep["ok"], (rep, rows)

        populated = sorted(c for c, t in true.items() if t and c != "zz")
        if populated:
            victim = populated[0]
            T, w = true[victim], wmax_of[victim]
            # (b) inflation beyond the detection bound always flags:
            # solve D > 2·tol(T+D) by iteration (tol grows only as
            # sqrt(claim), so this converges), with slack for the
            # slice estimate's own deviation
            D = 1000
            for _ in range(6):
                tol = Z * math.sqrt((T + D) * w * (1 - f) / max(f, 1e-9)) + Z * w
                D = max(D, int(2 * tol) + 2 * T + 100)
            fold._write_state(CURSOR, {**true, victim: T + D})
            for e in epochs:
                rep = fold.verify(sample=k, z=Z, epoch=e)
                assert not rep["ok"] and victim in rep["drift"], (rep, T, D)
            # (d) a wiped LARGE margin flags (small wiped margins are
            # only guaranteed via escalation, covered by (a)/(c)); the
            # 400w bound keeps T safely past the z²·w·(1-f)/f detection
            # floor plus the slice estimate's own worst-case deviation
            if T > 400 * w + 300:
                fold._write_state(
                    CURSOR, {c: t for c, t in true.items() if c != victim}
                )
                for e in epochs:
                    rep = fold.verify(sample=k, z=Z, epoch=e)
                    assert not rep["ok"] and victim in rep["drift"], (rep, T)

        # (c) the atom margin: ANY inflation is caught via escalation
        if atom_w is not None:
            fold._write_state(
                CURSOR, {**true, "zz": atom_w + atom_inflation}
            )
            for e in epochs:
                rep = fold.verify(sample=k, z=Z, epoch=e)
                assert not rep["ok"] and "zz" in rep["drift"], rep
                assert rep["drift"]["zz"] == (
                    atom_w + atom_inflation,
                    atom_w,
                ), rep

    check()


def test_stratified_draw_is_not_nested_across_totals():
    """Pinned counterexample behind the solver docstring's loud
    NO-CURRICULUM-SUBSET warning: the flat draw's nesting property
    (lower total ⊂ higher total at the same salt — advertised and
    tested above) does NOT carry to the stratified draw, because the
    residual carry makes per-stratum thresholds non-monotone in the
    total: raising the total here clamps the heavy stratum to keep-some
    and pushes a LOWER threshold into the light strata, so doc 1 leaves
    the mixture as the total RISES."""
    from stripe_sync_engine_spark.operators.mixing import (
        stratified_weighted_rates,
    )

    docs = [
        (0, "a", 100), (1, "a", 1), (2, "a", 3),
        (3, "a", 200), (4, "a", 100), (5, "a", 100),
    ]
    salt = "cx0"
    w_total = sum(w for *_i, w in docs)  # 504
    cdf = _py_cdf(docs, salt, 16)
    s_lo = stratified_weighted_rates(
        None, {"a": 1.0}, salt=salt, n_bins=16, cdf=cdf, total=0.3 * w_total
    )
    s_hi = stratified_weighted_rates(
        None, {"a": 1.0}, salt=salt, n_bins=16, cdf=cdf, total=0.6 * w_total
    )
    m_lo = _py_members(docs, s_lo, salt)
    m_hi = _py_members(docs, s_hi, salt)
    assert m_lo == {1, 2, 4} and m_hi == {2, 3, 4}
    assert not m_lo <= m_hi  # the non-subset, pinned


def test_weighted_draw_heavy_tail_bound_and_stratified_path(spark):
    """The token-weighted mixture's two guarantees, pinned on a
    heavy-tailed fixture (a few huge docs dominating one category —
    real corpora): the default expectation draw realizes the token
    share only in expectation (variance rho(1-rho)*sum(w^2) — the huge
    docs make it loose), while the length-stratified draw solves a
    threshold per (category, weight-stratum) with residual carry and is
    DETERMINISTICALLY close: the light strata absorb the heavy strata's
    atomicity error. The stratified predicate has a DuckDB mirror, so
    the drawn set is re-derivable cross-engine byte-for-byte."""
    from stripe_sync_engine_spark.operators.mixing import (
        assemble_stratified_mixture,
        sample_stratified_mixture,
        stratified_weighted_rates,
        stratified_where_sql,
    )

    salt = "ht-epoch"
    # big: 4 huge docs (20000 tokens) + 400 tiny (50) = 100_000 tokens;
    # small: 200 docs x 100 = 20_000 tokens; plus one zero-weight doc
    # (stratum-0 edge). 50/50 token recipe -> waterline 40_000, target
    # 20_000 per category, small keeps all.
    rows = (
        [(i, "big", 20_000) for i in range(4)]
        + [(10 + i, "big", 50) for i in range(400)]
        + [(5000, "big", 0)]
        + [(1000 + i, "small", 100) for i in range(200)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    target = {"big": 0.5, "small": 0.5}

    def realized(df):
        return {
            r["lang"]: int(r["n"])
            for r in df.groupBy("lang").agg(F.sum("n_tokens").alias("n")).collect()
        }

    # expectation path: correct in expectation, loose in realization —
    # each huge doc is an independent p=0.2 coin worth 20% of the target
    s_exp, r_exp = assemble_mixture(docs, target, weight_col="n_tokens", salt=salt)
    assert r_exp["small"] == 1.0 and r_exp["big"] == pytest.approx(0.2)
    exp_err = abs(realized(s_exp).get("big", 0) - 20_000)

    # stratified path: the rate-1.0 category is exact, and the
    # heavy-tailed category lands within ~one hash-bin of the LIGHTEST
    # stratum (the residual carry's documented bound; worst case is half
    # a huge doc = 10_000 — nothing whole-doc sampling can beat)
    s_q, strata = assemble_stratified_mixture(
        docs, target, weight_col="n_tokens", salt=salt
    )
    got_q = realized(s_q)
    assert got_q["small"] == 20_000
    # the bound is TWO-SIDED: the closest-boundary rule plus residual
    # carry may land slightly over or under the target (a document is
    # atomic — half a huge doc is the unbeatable worst case); what is
    # guaranteed is |error| within the heaviest doc's half-weight, and
    # ~one lightest-stratum hash-bin when light strata can absorb the
    # heavy strata's rounding (this fixture's shape)
    q_err = abs(got_q.get("big", 0) - 20_000)
    assert q_err <= 10_000  # adversarial worst case: half a huge doc
    assert q_err <= 300  # the typical-shape bound: ~W_light/256 + one doc
    # deterministically tighter than this salt's expectation-draw error
    assert q_err < exp_err
    # strata shape: big spans the huge stratum (log2 20000 = 14) and the
    # tiny stratum (log2 50 = 5); rates are exact float64 t/2^32
    assert set(strata) == {"big", "small"}
    assert 14 in strata["big"] and 5 in strata["big"]
    # ADVICE r12: the all-zero-weight stratum (doc 5000, 0 tokens ->
    # stratum 0 with band weight 0) must NOT be swept in wholesale by
    # the rate-1.0 clamp — it cannot move the token share, and a
    # doc-count audit would be surprised by an unconditional member
    assert strata["big"][0] == 0.0
    assert 5000 not in {r["doc_id"] for r in s_q.select("doc_id").collect()}
    assert all(
        int(round(r * H32_SPACE)) / H32_SPACE == r
        for bands in strata.values()
        for r in bands.values()
    )

    # determinism + DuckDB mirror: same salt -> byte-identical set on
    # both engines; the solver standalone returns the same recipe
    assert stratified_weighted_rates(
        docs, target, salt=salt, weight_col="n_tokens"
    ) == strata
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle_ids = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE "
            + stratified_where_sql(strata, salt=salt)
        ).fetchall()
    }
    assert {r["doc_id"] for r in s_q.select("doc_id").collect()} == oracle_ids
    # re-applying the persisted recipe re-derives the identical set
    assert {
        r["doc_id"]
        for r in sample_stratified_mixture(docs, strata, salt=salt)
        .select("doc_id")
        .collect()
    } == oracle_ids

    # guard rails: infeasible totals fail loudly naming the binding
    # category; an unbounded recipe is refused (bounded-collect rule)
    with pytest.raises(ValueError, match="infeasible.*'small'"):
        assemble_stratified_mixture(
            docs, target, weight_col="n_tokens", salt=salt, total=100_000
        )
    with pytest.raises(ValueError, match="unrealizable"):
        assemble_stratified_mixture(
            docs, {"big": 0.5, "zz": 0.5}, weight_col="n_tokens", salt=salt
        )
    many = {f"c{i}": 1.0 for i in range(40)}
    with pytest.raises(ValueError, match="targeted categories"):
        stratified_weighted_rates(docs, many, weight_col="n_tokens")


def test_weight_col_must_be_integral(spark, tmp_path):
    """ADVICE r11: a fractional weight column would truncate per window
    in the maintained counter (drifting from the scan path, spurious
    negative-count trips) — every weight entry point rejects it loudly."""
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 1.5 * i) for i in range(10)],
        "doc_id long, lang string, w double",
    )
    with pytest.raises(ValueError, match="integral"):
        assemble_mixture(docs, {"en": 1.0}, weight_col="w")
    with pytest.raises(ValueError, match="integral"):
        from stripe_sync_engine_spark.operators.mixing import (
            assemble_stratified_mixture,
        )

        assemble_stratified_mixture(docs, {"en": 1.0}, weight_col="w")

    store = TableStore(spark, str(tmp_path / "wh_fw"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus", category_col="lang", weight_col="w")
    with pytest.raises(ValueError, match="integral"):
        cc.poll()
    with pytest.raises(ValueError, match="integral"):
        cc.rebase()


def test_category_counts_crash_retry_with_concurrent_writer(
    spark, tmp_path, monkeypatch
):
    """VERDICT r11 #6a: a crash between the atomic counts+cursor write
    and the ack, followed by a CONCURRENT writer landing a new commit,
    must not corrupt the histogram: the pinned window makes the retry
    byte-identical (same `until`), the applied_until match skips the
    re-apply, and the late commit arrives as its own next window."""
    import time

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_ccc"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2]) for i in range(20)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    assert cc.poll() == {"en": 10, "fr": 10}

    # window W1: +3 en docs
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame(
                [(100, "en"), (101, "en"), (102, "en")], "doc_id long, lang string"
            )
        ),
        key="doc_id",
    )
    w1 = store.commits("corpus")[-1]

    real_ack = eng.ack_changes
    calls = {"n": 0}

    def flaky_ack(consumer, entity, cursor_ms):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash after state write, before ack")
        real_ack(consumer, entity, cursor_ms)

    monkeypatch.setattr(eng, "ack_changes", flaky_ack)
    with pytest.raises(OSError, match="injected"):
        cc.poll()
    # the state write survived the crash; the window pin survived too
    assert cc.counts() == {"en": 13, "fr": 10}
    assert eng._read_pending(cc.consumer) == {"corpus": w1}

    # a CONCURRENT writer lands commit W2 before the retry
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(200, "fr")], "doc_id long, lang string")
        ),
        key="doc_id",
    )

    # retry: pinned window -> identical until -> applied_until matches ->
    # apply skipped (no double-count), ack clears the pin
    assert cc.poll() == {"en": 13, "fr": 10}
    assert int(cc._read_state()["applied_until"]) == w1
    assert eng._read_pending(cc.consumer) == {}
    # the late commit is its own next window, counted exactly once
    assert cc.poll() == {"en": 13, "fr": 11} == _recount(store, "corpus")


def test_mixture_folds_ride_the_fanout_window(spark, tmp_path, monkeypatch):
    """VERDICT r12 #4: CategoryCounts and StratifiedCDF ride the corpus
    CDC fan-out's ONE consumed window (``apply_window``) instead of
    each re-diffing the same window under its own consumer — at
    deployment that was N redundant bucket-diffs per cycle. Pins: (a)
    fold state matches a scan recount through insert/category-move/
    delete windows; (b) the maintained stratified CDF solves the SAME
    thresholds as a fresh corpus scan; (c) pre-images are enforced
    loudly; (d) the fan-out's crash-between-apply-and-ack retry under a
    concurrent writer re-delivers the pinned window and the folds'
    applied_until match skips the re-apply (no double-count); (e) a
    fold that missed windows raises with the rebase pointer, and
    ``rebase(at_ms=<window start>)`` onboards it."""
    import time

    from stripe_sync_engine_spark.operators.mixing import (
        CategoryCounts,
        StratifiedCDF,
        stratified_weighted_rates,
    )
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_ff"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 10 * (1 + i % 3)) for i in range(20)],
        "doc_id long, lang string, n_chars long",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    cdf = StratifiedCDF(eng, "corpus", "ff-standing", weight_col="n_chars")

    # (c) pre-images are non-negotiable for fold targets
    with pytest.raises(ValueError, match="emit_update_preimages"):
        eng.maintain_corpus_indexes("fanout", "corpus", mixture_folds=[cc])

    # window 1 = the initial load, delivered THROUGH the fan-out
    rep = eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc, cdf]
    )
    assert rep["applied"] and cc.counts() == {"en": 10, "fr": 10}

    # window 2: insert + category move + delete, one fan-out poll
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
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc, cdf]
    )
    assert cc.counts() == _recount(store, "corpus")
    # (b) the absorbed CDF solves the same thresholds as a fresh scan
    props = {"en": 0.6, "fr": 0.4}
    strata_fold = stratified_weighted_rates(
        None, props, salt=cdf.salt, weight_col="n_chars",
        n_bins=cdf.n_bins, cdf=cdf.counts(),
    )
    strata_scan = stratified_weighted_rates(
        store.read("corpus"), props, salt=cdf.salt, weight_col="n_chars"
    )
    assert strata_fold == strata_scan

    # (d) crash between fold apply and ack, concurrent writer lands
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
    real_ack = eng.ack_changes
    calls = {"n": 0}

    def flaky_ack(consumer, entity, cursor_ms):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash before fan-out ack")
        real_ack(consumer, entity, cursor_ms)

    monkeypatch.setattr(eng, "ack_changes", flaky_ack)
    with pytest.raises(OSError, match="injected"):
        eng.maintain_corpus_indexes(
            "fanout", "corpus", emit_update_preimages=True,
            mixture_folds=[cc, cdf],
        )
    assert int(cc._read_state()["applied_until"]) == w3  # fold committed
    assert eng._read_pending("fanout") == {"corpus": w3}  # pin survived
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame(
                [(201, "fr", 20)], "doc_id long, lang string, n_chars long"
            )
        ),
        key="doc_id",
    )
    # retry: identical pinned window, folds skip via applied_until match
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc, cdf]
    )
    # the late commit arrives as its own next window, counted once
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc, cdf]
    )
    assert cc.counts() == _recount(store, "corpus")

    # (e) a late-joining fold missed every prior window: loud, with the
    # onboarding pointer; rebase(at_ms=<window start>) realigns it
    late = CategoryCounts(eng, "corpus", weight_col="n_chars")
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
    with pytest.raises(RuntimeError, match="missed windows"):
        eng.maintain_corpus_indexes(
            "fanout", "corpus", emit_update_preimages=True,
            mixture_folds=[cc, late],
        )
    since = int(eng._read_cursors("fanout").get("corpus", 0))
    late.rebase(at_ms=since)
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True,
        mixture_folds=[cc, late],
    )
    want_w = {
        str(r["lang"]): int(r["w"])
        for r in store.read("corpus")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("w"))
        .collect()
    }
    assert late.counts() == want_w
    assert cc.counts() == _recount(store, "corpus")


def test_poll_refuses_fanout_advanced_fold(spark, tmp_path):
    """ADVICE r13 (medium): poll() after fan-out delivery must raise,
    not double-count. Two shapes: (a) the fold NEVER polled (own cursor
    absent, state ahead) — the cursor-gone guard names fan-out delivery
    as a cause; (b) the fold polled once THEN rode the fan-out (own
    cursor stale at w1, state at w2) — a later poll() would re-fold the
    already-applied (w1, w2] range with all-positive deltas, which the
    negative-count guard cannot see; the new guard raises before
    folding. rebase() returns the fold to poll()-only delivery."""
    import time

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_pfg"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2]) for i in range(20)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")

    # (a) fan-out-only fold: state advanced, own consumer cursor absent
    cc = CategoryCounts(eng, "corpus")
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc]
    )
    assert cc.counts() == {"en": 10, "fr": 10}
    with pytest.raises(RuntimeError, match="fan-out-delivered"):
        cc.poll()
    assert cc.counts() == {"en": 10, "fr": 10}  # nothing folded

    # (b) poll-then-fanout mixing: own cursor at w1, fan-out advances
    # the state to w2, then a poll() over (w1, w3] must refuse.
    # A second table so its fold state is distinct from (a)'s.
    docs2 = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2]) for i in range(10)],
        "doc_id long, lang string",
    )
    store.write("corpus2", docs2, key="doc_id")
    cc2 = CategoryCounts(eng, "corpus2")
    assert cc2.poll() == {"en": 5, "fr": 5}
    w1 = store.commits("corpus2")[-1]
    # hand the fold to a fan-out consumer aligned at w1
    eng.ack_changes("fanout2", "corpus2", w1)
    time.sleep(0.002)
    store.write(
        "corpus2",
        store.read("corpus2").unionByName(
            spark.createDataFrame([(100, "en")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    eng.maintain_corpus_indexes(
        "fanout2", "corpus2", emit_update_preimages=True, mixture_folds=[cc2]
    )
    assert cc2.counts() == {"en": 6, "fr": 5}
    w2 = store.commits("corpus2")[-1]
    assert int(cc2._read_state()["applied_until"]) == w2
    # HEAD-ALIGNED shape (ADVICE r14): the table head EQUALS the
    # fan-out-advanced cursor, so the old straddle-only guard consumed
    # an "aligned" window, skipped the fold, and silently ACKED the
    # fold's own consumer up to the fan-out cursor — re-arming
    # dual-surface delivery without the documented rebase. The guard
    # now refuses BEFORE consuming, in every window shape.
    with pytest.raises(RuntimeError, match="advanced by fan-out delivery"):
        cc2.poll()
    assert int(eng._read_cursors(cc2.consumer).get("corpus2", 0)) == w1
    # a third commit so poll()'s own window (w1, w3] is non-empty and
    # straddles the already-folded (w1, w2]
    time.sleep(0.002)
    store.write(
        "corpus2",
        store.read("corpus2").unionByName(
            spark.createDataFrame([(101, "fr")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    with pytest.raises(RuntimeError, match="advanced by fan-out delivery"):
        cc2.poll()
    assert cc2.counts() == {"en": 6, "fr": 5}  # the double-count never landed
    # remedy: rebase() recounts at head and realigns the own cursor,
    # after which poll()-only delivery works again
    cc2.rebase()
    time.sleep(0.002)
    store.write(
        "corpus2",
        store.read("corpus2").unionByName(
            spark.createDataFrame([(102, "fr")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    assert cc2.poll() == {"en": 6, "fr": 7} == _recount(store, "corpus2")


def test_fold_verify_audits_drift_read_only(spark, tmp_path):
    """fold.verify() — the index-audit analog for maintained fold
    state: recounts AS OF the fold's own cursor (exact even while the
    fold lags the table) and reports drift WITHOUT committing anything;
    a hand-corrupted state file is caught, rebase() is the remedy, and
    a lagging-but-consistent fold still audits ok."""
    import json
    import time

    from stripe_sync_engine_spark.operators.mixing import (
        CategoryCounts,
        StratifiedCDF,
    )
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_vfy"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 10 + i) for i in range(20)],
        "doc_id long, lang string, n_chars long",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    cc.poll()
    assert cc.verify() == {
        "ok": True,
        "cursor": store.commits("corpus")[-1],
        "mode": "exact",
        "drift": {},
    }

    # the fold LAGS the table (new commit, no poll): still ok — the
    # recount is taken as of the fold's cursor, not the head
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame(
                [(100, "en", 30)], "doc_id long, lang string, n_chars long"
            )
        ),
        key="doc_id",
    )
    assert cc.verify()["ok"]

    # out-of-band corruption (hand-edited state file): caught read-only
    with open(cc._state_path()) as f:
        state = json.load(f)
    state["counts"][0][1] += 3
    from stripe_sync_engine_spark.commitio import atomic_write_json

    atomic_write_json(cc._state_path(), state)
    rep = cc.verify()
    assert not rep["ok"]
    (key, (got, want)) = next(iter(rep["drift"].items()))
    assert got == want + 3
    cc.rebase()
    assert cc.verify()["ok"]  # the remedy

    # the stratified CDF audits through the same machinery
    cdf = StratifiedCDF(eng, "corpus", "vfy-salt", weight_col="n_chars")
    cdf.poll()
    assert cdf.verify()["ok"]


def test_fold_verify_sampled_catches_gross_drift(spark, tmp_path):
    """VERDICT r14 #3: the sampled fold audit — ``verify(sample=k)``
    recounts k hash-chosen snapshot buckets (a ~k/n row sample, reading
    only k/n of the table) and compares scaled estimates under the
    concentration tolerance. Pins: (a) a clean fold audits ok at the
    sampled level; (b) injected GROSS drift (a doubled large entry and
    a wiped one) is caught; (c) sample >= n_buckets degrades to the
    exact scan; (d) the engine audit path is sample-bounded by default
    and the repair pair fixes the failing fold."""
    import json

    from stripe_sync_engine_spark.commitio import atomic_write_json
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_svf"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(600)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    cc.poll()
    assert cc.counts() == {"en": 400, "fr": 200}

    # (a) clean: ok at the sampled level, and genuinely sample-bounded
    # (16 of 32 buckets = half the data; the tolerance puts a clean
    # false-positive ~6 sigma out, so this is draw-stable)
    rep = cc.verify(sample=16)
    assert rep["ok"] and rep["mode"] == "sampled"
    assert rep["sample"]["buckets"] == 16 and rep["sample"]["of"] == 32

    # (c) a sample covering every bucket degrades to the exact scan
    assert cc.verify(sample=32)["mode"] == "exact"

    # (b) gross drift injected out-of-band: triple 'en', wipe 'fr' —
    # both many tolerance-widths past any bucket-draw realization
    with open(cc._state_path()) as f:
        state = json.load(f)
    state["counts"] = [
        [k, 1200 if k == "en" else v] for k, v in state["counts"] if k != "fr"
    ]
    atomic_write_json(cc._state_path(), state)
    rep2 = cc.verify(sample=16)
    assert not rep2["ok"]
    assert "en" in rep2["drift"] and "fr" in rep2["drift"]
    assert rep2["drift"]["en"][0] == 1200  # (maintained, estimate)
    assert rep2["drift"]["fr"][0] == 0

    # (d) the engine audit leg is sampled by default, and audit→repair
    # rebases the failing fold at its audited cursor
    audit = eng.audit_corpus_indexes("corpus", mixture_folds=[cc])
    frep = audit["mixture_folds"][0]
    assert not audit["ok"] and not frep["ok"] and frep["mode"] == "sampled"
    fixed = eng.repair_corpus_indexes("corpus", audit, mixture_folds=[cc])
    assert fixed["ok"]
    assert cc.counts() == {"en": 400, "fr": 200}
    assert cc.verify(sample=16)["ok"] and cc.verify()["ok"]

    # the stratified CDF's (category, stratum, bin) keys flow through
    # the same sampled machinery: a clean fold audits ok, per-cell
    # drift of a few weights stays under the tolerance BY DESIGN
    # (tiny-cell noise is the exact scan's job), and a grossly
    # inflated cell is caught
    from stripe_sync_engine_spark.operators.mixing import StratifiedCDF

    docs_w = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr", 100 + (i % 7)) for i in range(600)],
        "doc_id long, lang string, n_tokens long",
    )
    store.write("corpus_w", docs_w, key="doc_id")
    cdf = StratifiedCDF(eng, "corpus_w", "svf-salt")
    cdf.poll()
    rep_cdf = cdf.verify(sample=16)
    assert rep_cdf["ok"] and rep_cdf["mode"] == "sampled"
    with open(cdf._state_path()) as f:
        st = json.load(f)
    st["counts"][0][1] += 100_000  # one cell claims ~1000x its weight
    atomic_write_json(cdf._state_path(), st)
    bad = cdf.verify(sample=16)
    assert not bad["ok"] and len(bad["drift"]) == 1

    # heavy-tailed corpora don't false-flag: a lone 10^6-token doc's
    # (category, stratum, bin) cell is in the slice or not — a swing no
    # mean-weight tolerance covers — so the tolerance scales by the
    # KEY'S OWN stratum bound (2^(stratum+1)); a clean fold stays ok at
    # every bucket draw (exercise several cursors' rotations via
    # repeated commits)
    import time as _time

    docs_h = spark.createDataFrame(
        [(i, "en", 100 + (i % 7)) for i in range(300)]
        + [(9999, "en", 1_000_000)],
        "doc_id long, lang string, n_tokens long",
    )
    store.write("corpus_h", docs_h, key="doc_id")
    cdf_h = StratifiedCDF(eng, "corpus_h", "svf-heavy")
    cdf_h.poll()
    assert cdf_h.verify(sample=8)["ok"]
    for i in range(3):  # rotate the bucket draw (seed = cursor:epoch)
        _time.sleep(0.002)
        store.write(
            "corpus_h",
            store.read("corpus_h").unionByName(
                spark.createDataFrame(
                    [(10_000 + i, "fr", 120)],
                    "doc_id long, lang string, n_tokens long",
                )
            ),
            key="doc_id",
        )
        cdf_h.poll()
        assert cdf_h.verify(sample=8)["ok"]
    # a GROSSLY inflated many-row margin is caught (the CDF's audit
    # aggregates single-row cells to (category, stratum) margins —
    # per-cell sampling has no power, the margin has the stratum's
    # full row count): triple every (en, stratum-6) cell
    with open(cdf_h._state_path()) as f:
        sth = json.load(f)
    for row in sth["counts"]:
        if row[0][0] == "en" and row[0][1] == 6:
            row[1] *= 3
    atomic_write_json(cdf_h._state_path(), sth)
    bad_h = cdf_h.verify(sample=8)
    assert not bad_h["ok"] and list(bad_h["drift"]) == [("en", 6)]

    # ...and the r14 atom blind spot is now AUTO-ESCALATED (VERDICT r15
    # #2) instead of silently passed: the lone heavy doc's (en, 19)
    # margin is single-row, so no concentration bound separates its
    # claim from any slice — the sampled audit recounts exactly that
    # margin from the unsampled buckets (one filtered complement scan,
    # extra buckets counted in the report) and catches whole-row-atom
    # inflation the tolerance never could
    cdf_h.rebase()
    with open(cdf_h._state_path()) as f:
        sth = json.load(f)
    for row in sth["counts"]:
        if row[1] >= 1_000_000:  # the heavy doc's cell
            row[1] += 30_000_000
    atomic_write_json(cdf_h._state_path(), sth)
    bad_atom = cdf_h.verify(sample=8)
    assert not bad_atom["ok"]  # escalated and caught (was blind pre-r15)
    assert ("en", 19) in bad_atom["drift"]
    claim, exact = bad_atom["drift"][("en", 19)]
    assert claim == exact + 30_000_000  # the exact recount, no tolerance
    assert ("en", 19) in bad_atom["escalated"]
    # the escalation is bounded: it scanned only the complement buckets
    assert bad_atom["escalated_buckets"] == 32 - 8
    assert not cdf_h.verify()["ok"]  # exact agrees


def test_sampled_audit_rotates_buckets_across_epochs(spark, tmp_path):
    """VERDICT r15 #1: the sampled fold audit must not re-read the same
    k buckets forever on an IDLE corpus — bucket choice is seeded by
    (cursor, epoch), the epoch defaulting to the wall-clock day, so
    scheduled audits rotate coverage even when the fold never advances.
    Pins: (a) two audits over an UNCHANGED fold at different epochs
    cover different buckets, matching the documented md5 ranking;
    (b) drift confined to a bucket the first epoch never samples is
    INVISIBLE to it but CAUGHT by a later epoch whose draw covers that
    bucket; (c) the default epoch is the wall-clock UTC day."""
    import hashlib
    import json
    import time

    from stripe_sync_engine_spark.commitio import atomic_write_json
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_rot"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    # 200 'zz' docs that ALL live in one bucket (ids chosen by the
    # store's own bucket expression) — simulating corruption confined
    # to a slice of the table — plus uniform en/fr filler
    b0 = spark.range(0, 1).select(
        store.bucket_expr("id", 32).alias("b")
    ).first()["b"]
    zz_ids = [
        r["id"]
        for r in spark.range(0, 40_000)
        .where(store.bucket_expr("id", 32) == int(b0))
        .limit(200)
        .collect()
    ]
    assert len(zz_ids) == 200
    docs = spark.createDataFrame(
        [(int(i), "zz") for i in zz_ids]
        + [(100_000 + i, ["en", "fr"][i % 2]) for i in range(600)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    cc.poll()
    assert cc.counts() == {"en": 300, "fr": 300, "zz": 200}
    cursor = cc.cursor()

    # out-of-band corruption: the 'zz' entry is wiped from the state —
    # observable ONLY from rows in bucket b0
    with open(cc._state_path()) as f:
        state = json.load(f)
    state["counts"] = [kv for kv in state["counts"] if kv[0] != "zz"]
    atomic_write_json(cc._state_path(), state)

    def predicted(epoch):
        # the documented draw: rank buckets by md5(bucket:cursor:epoch)
        ranked = sorted(
            range(32),
            key=lambda b: hashlib.md5(
                f"{b}:{cursor}:{epoch}".encode()
            ).hexdigest(),
        )
        return sorted(ranked[:8])

    e_miss = next(e for e in range(1000) if int(b0) not in predicted(e))
    e_hit = next(e for e in range(1000) if int(b0) in predicted(e))

    # (b) the epoch whose draw misses b0 cannot see the wiped margin...
    rep_miss = cc.verify(sample=8, epoch=e_miss)
    assert rep_miss["ok"]
    assert rep_miss["sample"]["bucket_ids"] == predicted(e_miss)
    # ...and a later epoch whose draw covers b0 catches it — the
    # cursor never moved; only the epoch rotated the coverage
    rep_hit = cc.verify(sample=8, epoch=e_hit)
    assert not rep_hit["ok"] and "zz" in rep_hit["drift"]
    assert rep_hit["drift"]["zz"][0] == 0  # (maintained claim, estimate)
    assert rep_hit["sample"]["bucket_ids"] == predicted(e_hit)
    # (a) unchanged fold, different epochs → different slices
    assert rep_miss["sample"]["bucket_ids"] != rep_hit["sample"]["bucket_ids"]

    # (c) the default epoch rotates by wall-clock day (read-only audit:
    # replay determinism across days is explicitly not a contract)
    rep_default = cc.verify(sample=8)
    assert rep_default["sample"]["epoch"] == int(time.time() // 86400)


def test_mixture_folds_drain_backlog_with_max_commits(spark, tmp_path):
    """A fold riding the fan-out drains a multi-commit backlog in
    ack-checkpointed steps (max_commits=1): every capped window ends at
    a real commit, the fold's cursor advances in lockstep with the
    fan-out's (the alignment guard never trips mid-drain), and the
    final histogram equals a recount."""
    import time

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_bl"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2]) for i in range(10)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc]
    )

    # the fold falls behind by THREE commits
    for k in range(3):
        time.sleep(0.002)
        store.write(
            "corpus",
            store.read("corpus").unionByName(
                spark.createDataFrame(
                    [(100 + k, ["en", "fr", "en"][k])],
                    "doc_id long, lang string",
                )
            ),
            key="doc_id",
        )
    head = store.commits("corpus")[-1]

    steps = 0
    while True:
        rep = eng.maintain_corpus_indexes(
            "fanout",
            "corpus",
            emit_update_preimages=True,
            mixture_folds=[cc],
            max_commits=1,
        )
        steps += 1
        # lockstep: the fold's committed cursor is the window's end
        assert int(cc._read_state()["applied_until"]) == rep["cursor"]
        if rep["cursor"] >= head:
            break
        assert steps < 10
    assert steps == 3  # one capped window per backlog commit
    assert cc.counts() == _recount(store, "corpus")


def test_audit_and_repair_cover_mixture_folds(spark, tmp_path):
    """The cron audit covers what the cron fan-out now maintains: an
    audit with mixture_folds verifies each fold read-only (flipping ok
    on drift), the repair refuses a failing fold whose object was not
    passed (ok must never read clean over a known-failing target), and
    with the fold passed it rebases AT THE FOLD'S OWN AUDITED CURSOR —
    fixing the counts without moving the cursor, so a fan-out-driven
    fold stays window-aligned — then re-verifies before returning.
    The injected drift here is SMALL (+5 on a 20-row corpus), below
    the default sampled tolerance by design, so this test runs the
    deep option (fold_sample=None, exact recount); the sampled default
    is covered by test_fold_verify_sampled_catches_gross_drift."""
    import json

    from stripe_sync_engine_spark.commitio import atomic_write_json
    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_far"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2]) for i in range(20)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc]
    )
    cursor = int(cc._read_state()["applied_until"])

    report = eng.audit_corpus_indexes(
        "corpus", mixture_folds=[cc], fold_sample=None
    )
    assert report["ok"] and report["mixture_folds"][0]["ok"]
    assert report["mixture_folds"][0]["mode"] == "exact"

    # out-of-band corruption: the audit flips ok, read-only
    with open(cc._state_path()) as f:
        state = json.load(f)
    state["counts"][0][1] += 5
    atomic_write_json(cc._state_path(), state)
    report = eng.audit_corpus_indexes(
        "corpus", mixture_folds=[cc], fold_sample=None
    )
    assert not report["ok"]
    assert report["mixture_folds"][0]["drift_entries"] == 1

    # repair WITHOUT the fold: refused loudly, never reads clean
    res = eng.repair_corpus_indexes("corpus", report)
    assert not res["ok"]
    assert any(
        r["kind"] == "mixture_fold" and "not passed" in r["reason"]
        for r in res["refused"]
    )

    # repair WITH the fold: rebased at the audited cursor, re-verified
    res = eng.repair_corpus_indexes("corpus", report, mixture_folds=[cc])
    assert res["ok"]
    assert any(
        r["kind"] == "mixture_fold" and r["post_ok"] for r in res["repaired"]
    )
    assert cc.verify()["ok"]
    # the cursor did NOT move — fan-out alignment preserved: the next
    # fan-out window applies cleanly
    assert int(cc._read_state()["applied_until"]) == cursor
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(100, "en")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    eng.maintain_corpus_indexes(
        "fanout", "corpus", emit_update_preimages=True, mixture_folds=[cc]
    )
    assert cc.counts() == _recount(store, "corpus")


def test_category_counts_rebucket_during_lag_recovers_via_rebase(spark, tmp_path):
    """VERDICT r11 #6b: a REBUCKET landing inside the consumer's lag
    window makes the feed raise (bucket ids incomparable across widths)
    rather than corrupt; rebase() recounts at the new width, realigns
    the cursor, and polling resumes exactly."""
    import time

    from stripe_sync_engine_spark.operators.mixing import CategoryCounts
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_ccrb"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    docs = spark.createDataFrame(
        [(i, ["en", "fr", "de"][i % 3]) for i in range(30)],
        "doc_id long, lang string",
    )
    store.write("corpus", docs, key="doc_id")
    cc = CategoryCounts(eng, "corpus")
    assert cc.poll() == _recount(store, "corpus")

    # commits the consumer has NOT seen yet (the lag window)...
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").unionByName(
            spark.createDataFrame([(300, "zh")], "doc_id long, lang string")
        ),
        key="doc_id",
    )
    # ...then a rebucket lands inside that window
    time.sleep(0.002)
    eng.rebucket_entity("corpus", 8)

    with pytest.raises(Exception, match="rebucket"):
        cc.poll()
    # counts untouched by the failed poll (still the pre-lag state)
    assert cc.counts() == {"en": 10, "fr": 10, "de": 10}

    # rebase: one O(table) recount at the new width, cursor realigned
    want = _recount(store, "corpus")
    assert cc.rebase() == want and want["zh"] == 1
    assert cc.poll() == want  # idle poll: clean no-op

    # and the feed works again across the rebucket boundary
    time.sleep(0.002)
    store.write(
        "corpus",
        store.read("corpus").where("doc_id != 0"),
        key="doc_id",
    )
    assert cc.poll() == _recount(store, "corpus")


def test_stratified_mixture_export_verifies_from_manifest(spark, tmp_path):
    """The stratified recipe rides the export manifest exactly like the
    flat one: stratified_record round-trips through JSON (string stratum
    keys), verify_mixture re-derives membership from the manifest alone
    via member_col_from_record, flags a smuggled non-member, and (with
    the source) a drawn-but-missing row."""
    import os

    from stripe_sync_engine_spark.operators.export import (
        export_corpus_shards,
        read_manifest,
    )
    from stripe_sync_engine_spark.operators.mixing import (
        assemble_stratified_mixture,
        member_col_from_record,
        stratified_record,
        verify_mixture,
    )

    rows = (
        [(i, "big", 20_000) for i in range(4)]
        + [(10 + i, "big", 50) for i in range(400)]
        + [(1000 + i, "small", 100) for i in range(200)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    salt = "st'r-epoch"  # quoted salt: the record must round-trip it
    sampled, strata = assemble_stratified_mixture(
        docs, {"big": 0.5, "small": 0.5}, weight_col="n_tokens", salt=salt
    )
    sampled = sampled.localCheckpoint(eager=True)
    rec = stratified_record(strata, salt)
    out = str(tmp_path / "exp_st")
    m = export_corpus_shards(sampled, out, n_shards=4, mixture=rec)
    assert m["mixture"] == rec

    rep = verify_mixture(spark, out, source=docs)
    assert rep["ok"] and rep["total_docs"] == sampled.count()

    # manifest ALONE -> the exact drawn set (JSON round-trip included)
    mix = read_manifest(out)["mixture"]
    assert mix == rec
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}  # noqa: E731
    redrawn = docs.where(member_col_from_record(mix))
    exported = spark.read.parquet(os.path.join(out, "data"))
    assert ids(redrawn) == ids(exported) == ids(sampled)

    # a smuggled non-member fails, named
    outsider = (
        docs.join(sampled.select("doc_id"), "doc_id", "left_anti")
        .limit(1)
        .localCheckpoint(eager=True)
    )
    bad_id = outsider.first()["doc_id"]
    out_bad = str(tmp_path / "exp_st_bad")
    export_corpus_shards(
        sampled.unionByName(outsider), out_bad, n_shards=4, mixture=rec
    )
    rep_bad = verify_mixture(spark, out_bad)
    assert not rep_bad["ok"] and rep_bad["violation_ids"] == [bad_id]

    # a drawn row missing from the export fails completeness
    lost_id = sampled.first()["doc_id"]
    out_miss = str(tmp_path / "exp_st_miss")
    export_corpus_shards(
        sampled.where(F.col("doc_id") != lost_id),
        out_miss,
        n_shards=4,
        mixture=rec,
    )
    rep_miss = verify_mixture(spark, out_miss, source=docs)
    assert not rep_miss["ok"] and rep_miss["missing_ids"] == [lost_id]


def test_stratified_cdf_maintained_solve_matches_scan(spark, tmp_path):
    """StratifiedCDF: the change-feed-maintained (category, stratum,
    hash-bin) histogram solves the SAME thresholds as the scan path —
    across inserts, weight changes (docs move strata), category moves,
    and deletes — with zero corpus scans at solve time; the wiped-cursor
    guard and rebase() are inherited from the shared fold machinery, and
    a parameter mismatch against pinned state fails loudly."""
    import os
    import time

    from stripe_sync_engine_spark.operators.mixing import (
        StratifiedCDF,
        sample_stratified_mixture,
        stratified_weighted_rates,
    )
    from stripe_sync_engine_spark.storage import TableStore
    from stripe_sync_engine_spark.sync.engine import StripeSparkSync

    store = TableStore(spark, str(tmp_path / "wh_cdf"), vacuum_retain_s=3600.0)
    eng = StripeSparkSync(spark, store)
    rows = (
        [(i, "big", 20_000) for i in range(4)]
        + [(10 + i, "big", 50) for i in range(300)]
        + [(1000 + i, "small", 100) for i in range(200)]
    )
    store.write(
        "corpus",
        spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long"),
        key="doc_id",
    )
    salt, target = "standing-epoch", {"big": 0.5, "small": 0.5}
    cdf = StratifiedCDF(eng, "corpus", salt)
    cdf.poll()  # initial load

    def scan_solve():
        return stratified_weighted_rates(
            store.read("corpus"), target, salt=salt, weight_col="n_tokens"
        )

    assert cdf.solve(target) == scan_solve()

    # mutate: weight change that MOVES a doc's stratum (50 -> 20_000),
    # a category move, deletes, and fresh inserts
    time.sleep(0.002)
    cur = store.read("corpus")
    store.write(
        "corpus",
        cur.where("doc_id not in (10, 1000)")
        .withColumn(
            "n_tokens",
            F.when(F.col("doc_id") == 11, F.lit(20_000)).otherwise(F.col("n_tokens")),
        )
        .withColumn(
            "lang",
            F.when(F.col("doc_id") == 12, "small").otherwise(F.col("lang")),
        )
        .unionByName(
            spark.createDataFrame(
                [(9000, "small", 100), (9001, "big", 50)],
                "doc_id long, lang string, n_tokens long",
            )
        ),
        key="doc_id",
    )
    strata = cdf.solve(target)
    assert strata == scan_solve()
    # the maintained thresholds draw the byte-identical set
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}  # noqa: E731
    assert ids(
        sample_stratified_mixture(store.read("corpus"), strata, salt=salt)
    ) == ids(
        sample_stratified_mixture(store.read("corpus"), scan_solve(), salt=salt)
    )

    # parameter mismatch against pinned state fails loudly (same state
    # file — id_col is pinned in meta but not in the filename)
    clash = StratifiedCDF(eng, "corpus", salt, id_col="other_id")
    assert clash._state_path() == cdf._state_path()
    with pytest.raises(RuntimeError, match="id_col"):
        clash.poll()

    # a NEW salt is its own epoch: own consumer, own state, rebase
    # initializes it in one pass and it solves the new draw
    epoch2 = StratifiedCDF(eng, "corpus", "epoch-2")
    assert epoch2._state_path() != cdf._state_path()
    assert epoch2.consumer != cdf.consumer
    epoch2.rebase()
    assert epoch2.solve(target) == stratified_weighted_rates(
        store.read("corpus"), target, salt="epoch-2", weight_col="n_tokens"
    )

    # wiped-cursor guard inherited; rebase recovers
    os.remove(eng._cursor_path(cdf.consumer))
    with pytest.raises(RuntimeError, match="cursor was wiped.*rebase"):
        cdf.poll()
    cdf.rebase()
    assert cdf.solve(target) == scan_solve()


def test_stratified_mixture_incremental_export_e2e(spark, tmp_path):
    """The standing stratified mixture end-to-end: thresholds pinned in
    the manifest (a re-solve is a NEW recipe/export, same as the flat
    flow), corpus mutations drive export_changed_shards via the change
    feed's ids — a weight change that moves a doc across strata flips
    its threshold and hence possibly its membership, and the touched
    shards recompute against the new draw. verify_mixture stays green
    from the manifest alone + the source."""
    import time

    from stripe_sync_engine_spark.operators.export import (
        export_changed_shards,
        export_corpus_shards,
    )
    from stripe_sync_engine_spark.operators.mixing import (
        assemble_stratified_mixture,
        sample_stratified_mixture,
        stratified_record,
        verify_mixture,
    )
    from stripe_sync_engine_spark.storage import TableStore

    store = TableStore(spark, str(tmp_path / "wh_sie"), vacuum_retain_s=3600.0)
    rows = (
        [(i, "big", 20_000) for i in range(3)]
        + [(10 + i, "big", 50) for i in range(200)]
        + [(1000 + i, "small", 100) for i in range(150)]
    )
    store.write(
        "corpus",
        spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long"),
        key="doc_id",
    )
    salt, target = "standing", {"big": 0.5, "small": 0.5}
    corpus = store.read("corpus")
    drawn, strata = assemble_stratified_mixture(
        corpus, target, weight_col="n_tokens", salt=salt
    )
    out = str(tmp_path / "exp")
    export_corpus_shards(
        drawn.localCheckpoint(eager=True),
        out,
        n_shards=4,
        mixture=stratified_record(strata, salt),
    )
    assert verify_mixture(spark, out, source=corpus)["ok"]

    # the mutation window: a weight change that MOVES a doc's stratum
    # (50 -> 20_000 tokens: tiny band rate != huge band rate, so its
    # membership re-evaluates under a different threshold), a category
    # flip, a delete, and fresh inserts
    t_base = store.commits("corpus")[-1]
    time.sleep(0.002)
    cur = store.read("corpus")
    store.write(
        "corpus",
        cur.where("doc_id != 1000")
        .withColumn(
            "n_tokens",
            F.when(F.col("doc_id") == 10, F.lit(20_000)).otherwise(F.col("n_tokens")),
        )
        .withColumn(
            "lang",
            F.when(F.col("doc_id") == 11, "small").otherwise(F.col("lang")),
        )
        .unionByName(
            spark.createDataFrame(
                [(5000, "small", 100), (5001, "big", 50)],
                "doc_id long, lang string, n_tokens long",
            )
        ),
        key="doc_id",
    )
    corpus = store.read("corpus")
    changed = store.read_changes("corpus", t_base).select("doc_id").distinct()
    assert changed.count() >= 5

    # same PINNED recipe over the mutated corpus; only touched shards
    # rewrite, the manifest's recipe carries forward
    new_drawn = sample_stratified_mixture(corpus, strata, salt=salt)
    export_changed_shards(
        new_drawn.localCheckpoint(eager=True), out, changed_ids=changed
    )
    rep = verify_mixture(spark, out, source=corpus)
    assert rep["ok"], rep
    import os

    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}  # noqa: E731
    assert ids(spark.read.parquet(os.path.join(out, "data"))) == ids(new_drawn)


def test_verify_mixture_names_missing_recipe_columns(spark, tmp_path):
    """A stratified export whose projection dropped the weight column
    (or any recipe column) fails verification with the REASON, not an
    unresolved-column AnalysisException."""
    from stripe_sync_engine_spark.operators.export import export_corpus_shards
    from stripe_sync_engine_spark.operators.mixing import (
        assemble_stratified_mixture,
        stratified_record,
        verify_mixture,
    )

    docs = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], 100) for i in range(80)],
        "doc_id long, lang string, n_tokens long",
    )
    sampled, strata = assemble_stratified_mixture(
        docs, {"a": 0.5, "b": 0.5}, weight_col="n_tokens", salt="vc"
    )
    out = str(tmp_path / "exp_drop")
    export_corpus_shards(
        sampled.select("doc_id", "lang").localCheckpoint(eager=True),  # weight dropped
        out,
        n_shards=2,
        mixture=stratified_record(strata, "vc"),
    )
    with pytest.raises(ValueError, match="n_tokens.*cannot be verified"):
        verify_mixture(spark, out)
    # ...and a source missing the column is named the same way
    out2 = str(tmp_path / "exp_ok")
    export_corpus_shards(
        sampled.localCheckpoint(eager=True), out2, n_shards=2,
        mixture=stratified_record(strata, "vc"),
    )
    assert verify_mixture(spark, out2)["ok"]
    with pytest.raises(ValueError, match="source is missing"):
        verify_mixture(spark, out2, source=docs.select("doc_id", "lang"))
