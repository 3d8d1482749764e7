"""scale_probe.py's corpus synthesizers — the controlled-measurement
preconditions: copy 0 is byte-identical to the base corpus (so the
mutation window is IDENTICAL at every scale), copies k>=1 carry distinct
ids and distinct content (so the gates/indexes hold mult× real state),
and row counts multiply exactly. The timing measurement itself is the
script's job (one JSON line; results recorded in BASELINE.md)."""

from __future__ import annotations

import scale_probe as sp


def test_mult_docs_identity_and_distinctness(spark):
    base = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(20)], "doc_id long, text string"
    )
    out = sp._mult_docs(base, 4)
    assert out.count() == 80
    assert out.select("doc_id").distinct().count() == 80  # no id collisions
    # copy 0 is byte-identical to the base
    copy0 = {
        (r["doc_id"], r["text"])
        for r in out.where("doc_id < 100000000").collect()
    }
    assert copy0 == {(i, f"doc body {i}") for i in range(20)}
    # copies are content-distinct from the base (real gate state)
    texts = [r["text"] for r in out.collect()]
    assert len(set(texts)) == 80
    assert sp._mult_docs(base, 1) is base  # mult 1 = the base, untouched


def test_mult_vecs_identity_and_perturbation(spark):
    base = spark.createDataFrame(
        [(i, [float(i), 0.5]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = sp._mult_vecs(base, 3)
    assert out.count() == 30
    assert out.select("vec_id").distinct().count() == 30
    rows = {r["vec_id"]: r["embedding"] for r in out.collect()}
    assert rows[5] == [5.0, 0.5]  # copy 0 identical
    assert rows[100_000_005] == [5.0 + 1e-4, 0.5 + 1e-4]  # perturbed copy


def test_mutation_window_is_scale_invariant(spark):
    """_mutate touches only base-id rows (50..149 and deletes < 50), so
    the change window read back from the store is the same set of ids at
    any corpus multiplier."""
    base = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(200)], "doc_id long, text string"
    )
    for mult in (1, 3):
        cur = sp._mult_docs(base, mult)
        nxt = sp._mutate(cur)
        # deleted: ids < 50 of copy 0 only; copies' shifted ids survive
        assert nxt.where("doc_id < 50").count() == 0
        assert nxt.count() == cur.count() - 50 + 50  # -50 deleted, +50 new
        rewritten = nxt.where("text like 'rewritten%'")
        assert rewritten.count() == 50
        assert rewritten.where("doc_id >= 50 and doc_id < 100").count() == 50
