"""N-gram LM quality scorer: probability sanity, order sensitivity,
driver/cluster parity, determinism."""

import math

from stripe_sync_engine_spark.functions.ngram_lm import (
    UNK,
    score_documents,
    train_ngram_lm,
)
from stripe_sync_engine_spark.tables import load_table


def test_unigram_distribution_sums_to_one(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    lm = train_ngram_lm(docs, min_count=1)
    total_p = sum(math.exp(lm.logp_word(w)) for w in lm.uni) + math.exp(
        lm.logp_word(UNK)
    )
    assert abs(total_p - 1.0) < 1e-9


def test_scores_are_order_sensitive(spark, sf_dir):
    """A bigram model must score real corpus sentences above the same
    words in reversed order (unigram mass is identical, so only the
    transitions differ)."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    lm = train_ngram_lm(docs, min_count=2)
    rows = docs.select("doc_id", "text").limit(30).collect()
    wins = 0
    for r in rows:
        fwd = lm.score(r["text"])
        rev = lm.score(" ".join(reversed(r["text"].split(" "))))
        wins += fwd > rev
    assert wins > len(rows) * 0.6, f"only {wins}/{len(rows)} forward wins"


def test_oov_text_scores_below_corpus_text(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    lm = train_ngram_lm(docs, min_count=2)
    real = docs.select("text").first()["text"]
    gibberish = " ".join("zqxj" + str(i) for i in range(30))
    assert lm.score(real) > lm.score(gibberish)


def test_distributed_score_matches_driver(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    lm = train_ngram_lm(docs, min_count=2)
    got = {r["doc_id"]: r["lm_score"] for r in score_documents(docs, lm).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert abs(got[r["doc_id"]] - lm.score(r["text"])) < 1e-12


def test_training_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    a = train_ngram_lm(docs, min_count=2)
    b = train_ngram_lm(docs, min_count=2)
    assert a.uni == b.uni and a.bi == b.bi and a.total == b.total


def test_empty_and_null_texts(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    lm = train_ngram_lm(docs, min_count=1)
    out = {r["doc_id"]: r["lm_score"] for r in score_documents(docs, lm).collect()}
    assert len(out) == 3
    assert out[2] == out[3] == lm.logp_word(UNK)
