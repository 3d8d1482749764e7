"""Product-quantization index tests: determinism, code shape/compression,
recall floors vs the exact ranking, monotone improvement with finer
codebooks, and the re-rank refinement."""

import numpy as np

from stripe_sync_engine_spark.operators.pq_index import (
    encode_pq,
    pq_topk,
    pq_topk_rerank,
    train_pq,
)
from stripe_sync_engine_spark.tables import load_table


def _corpus(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = vecs.collect()
    X = np.asarray([r["embedding"] for r in rows], dtype=float)
    ids = np.asarray([r["vec_id"] for r in rows])
    return vecs, X, ids


def _recall_at(got_ids_by_q, X, ids, queries, k=10):
    rs = []
    for qid, _ in queries:
        d = ((X - X[ids == qid][0]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(d)[:k]].tolist())
        rs.append(len(exact & set(got_ids_by_q.get(qid, []))) / k)
    return sum(rs) / len(rs)


def _by_query(rows):
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    return got


def test_train_is_deterministic(spark, sf_dir):
    vecs, _, _ = _corpus(spark, sf_dir)
    a = train_pq(vecs, m=8, k=8)
    b = train_pq(vecs, m=8, k=8)
    assert a == b
    assert (a.m, a.k, a.dim) == (8, 8, 64)


def test_codes_shape_and_compression(spark, sf_dir):
    vecs, X, _ = _corpus(spark, sf_dir)
    cb = train_pq(vecs, m=8, k=16)
    codes = encode_pq(vecs, cb).collect()
    assert len(codes) == len(X)
    for r in codes:
        assert len(r["codes"]) == 8  # 8 ids vs 64 floats: 32x smaller
        assert all(0 <= c < 16 for c in r["codes"])


def test_train_rejects_bad_geometry(spark, sf_dir):
    vecs, _, _ = _corpus(spark, sf_dir)
    try:
        train_pq(vecs, m=7)  # 64 % 7 != 0
    except ValueError as ex:
        assert "divisible" in str(ex)
    else:
        raise AssertionError("expected ValueError")
    try:
        train_pq(vecs, m=8, k=16, sample_limit=8)
    except ValueError as ex:
        assert "sample" in str(ex)
    else:
        raise AssertionError("expected ValueError")


def test_adc_recall_floor_and_monotone_improvement(spark, sf_dir):
    vecs, X, ids = _corpus(spark, sf_dir)
    queries = [(int(ids[i]), list(X[i])) for i in range(5)]
    recalls = {}
    for m, kc in ((8, 4), (16, 16)):
        cb = train_pq(vecs, m=m, k=kc)
        got = _by_query(pq_topk(encode_pq(vecs, cb), cb, queries, k=10).collect())
        # a query vector IS in the corpus: its own id must rank (dist 0
        # table lookups can tie but re-partition keeps it in the top-k
        # with overwhelming margin on 64 dims)
        recalls[(m, kc)] = _recall_at(got, X, ids, queries)
    # measured on this corpus: 0.2 / 0.48 — assert conservative floors
    assert recalls[(8, 4)] >= 0.1
    assert recalls[(16, 16)] >= 0.3
    assert recalls[(16, 16)] > recalls[(8, 4)]


def test_rerank_recovers_exact_ranking(spark, sf_dir):
    vecs, X, ids = _corpus(spark, sf_dir)
    queries = [(int(ids[i]), list(X[i])) for i in range(5)]
    cb = train_pq(vecs, m=16, k=16)
    codes = encode_pq(vecs, cb)
    out = pq_topk_rerank(codes, vecs, cb, queries, k=10, expand=10).collect()
    got = _by_query(out)
    # measured 0.98 on this corpus; floor at 0.8
    assert _recall_at(got, X, ids, queries) >= 0.8
    # exact distances are exact: the self-match leads every list
    for r in out:
        if r["vec_id"] == r["query_id"]:
            assert r["exact_dist"] == 0.0
    first = {
        q: min(rows, key=lambda r: (r["exact_dist"], r["vec_id"]))
        for q, rows in _by_query_rows(out).items()
    }
    for q, r in first.items():
        assert r["vec_id"] == q


def _by_query_rows(rows):
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r)
    return got


def test_partial_topk_matches_driver_adc(spark, sf_dir):
    """The distributed partial-top-k reduction returns EXACTLY the ADC
    ranking a driver-side numpy computation produces."""
    vecs, X, ids = _corpus(spark, sf_dir)
    queries = [(int(ids[0]), list(X[0]))]
    cb = train_pq(vecs, m=8, k=8)
    codes_rows = encode_pq(vecs, cb).collect()
    got = [
        (r["vec_id"], round(r["approx_dist"], 9))
        for r in sorted(
            pq_topk(encode_pq(vecs, cb), cb, queries, k=5).collect(),
            key=lambda r: (r["approx_dist"], r["vec_id"]),
        )
    ]
    c = cb.as_array()
    sub = cb.dim // cb.m
    q = np.asarray(queries[0][1])
    tables = np.stack(
        [((q[s * sub : (s + 1) * sub][None, :] - c[s]) ** 2).sum(axis=1) for s in range(cb.m)]
    )
    dist = {
        r["vec_id"]: float(sum(tables[s][r["codes"][s]] for s in range(cb.m)))
        for r in codes_rows
    }
    want = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    assert got == [(v, round(d, 9)) for v, d in want]


def test_ivf_pq_recall_monotone_in_nprobe(spark, sf_dir):
    from stripe_sync_engine_spark.operators.pq_index import (
        encode_ivf_pq,
        ivf_pq_topk,
        train_ivf_pq,
    )

    vecs, X, ids = _corpus(spark, sf_dir)
    queries = [(int(ids[i]), list(X[i])) for i in range(5)]
    idx = train_ivf_pq(vecs, n_cells=16, m=16, k=16)
    codes = encode_ivf_pq(vecs, idx).localCheckpoint(eager=True)
    rows = codes.collect()
    assert all(0 <= r["cell"] < 16 and len(r["codes"]) == 16 for r in rows)
    r_small = _recall_at(
        _by_query(ivf_pq_topk(codes, idx, queries, k=10, nprobe=2).collect()),
        X, ids, queries,
    )
    r_full = _recall_at(
        _by_query(ivf_pq_topk(codes, idx, queries, k=10, nprobe=16).collect()),
        X, ids, queries,
    )
    # probing every cell must match flat-PQ quality; fewer cells may only
    # lose recall (measured 0.34 → 0.48 on this corpus)
    assert r_full >= r_small
    assert r_full >= 0.3


def test_ivf_pq_composes_with_rerank(spark, sf_dir):
    from stripe_sync_engine_spark.operators.pq_index import (
        encode_ivf_pq,
        ivf_pq_topk,
        rerank_shortlist,
        train_ivf_pq,
    )

    vecs, X, ids = _corpus(spark, sf_dir)
    queries = [(int(ids[i]), list(X[i])) for i in range(5)]
    idx = train_ivf_pq(vecs, n_cells=8, m=16, k=16)
    codes = encode_ivf_pq(vecs, idx).localCheckpoint(eager=True)
    shortlist = ivf_pq_topk(codes, idx, queries, k=100, nprobe=4)
    out = rerank_shortlist(shortlist, vecs, queries, k=10).collect()
    got = _by_query(out)
    # self-match: the query's own cell is always its nearest, so the
    # exact re-rank must put the query vector first
    for q, rows in _by_query_rows(out).items():
        best = min(rows, key=lambda r: (r["exact_dist"], r["vec_id"]))
        assert best["vec_id"] == q and best["exact_dist"] == 0.0
    assert _recall_at(got, X, ids, queries) >= 0.5


def test_ivf_pq_train_deterministic_and_validates(spark, sf_dir):
    from stripe_sync_engine_spark.operators.pq_index import train_ivf_pq

    vecs, _, _ = _corpus(spark, sf_dir)
    a = train_ivf_pq(vecs, n_cells=8, m=8, k=8)
    b = train_ivf_pq(vecs, n_cells=8, m=8, k=8)
    assert a == b
    try:
        train_ivf_pq(vecs, n_cells=8, m=7)
    except ValueError as ex:
        assert "divisible" in str(ex)
    else:
        raise AssertionError("expected ValueError")


def test_persisted_ivf_pq_register_and_probe(spark, sf_dir, tmp_path):
    """Codes persist bucketed by cell; replay registers nothing; the
    probe reads only probed-cell buckets and matches the unpersisted
    computation exactly."""
    from stripe_sync_engine_spark.operators.pq_index import (
        PersistedIVFPQ,
        encode_ivf_pq,
        ivf_pq_topk,
        train_ivf_pq,
    )
    from stripe_sync_engine_spark.storage import TableStore

    vecs, X, ids = _corpus(spark, sf_dir)
    queries = [(int(ids[i]), list(X[i])) for i in range(3)]
    idx = train_ivf_pq(vecs, n_cells=8, m=8, k=8)
    store = TableStore(spark, str(tmp_path / "wh_pq"))
    p = PersistedIVFPQ(store, idx)

    half = vecs.limit(250).localCheckpoint(eager=True)
    p.register(half)
    n1 = store.read("_ivfpq_codes").count()
    assert n1 == 250
    p.register(half)  # replay: deterministic cells → nothing fresh
    assert store.read("_ivfpq_codes").count() == 250
    p.register(vecs)  # the rest arrives incrementally
    assert store.read("_ivfpq_codes").count() == len(X)

    got = sorted(
        (r["query_id"], r["vec_id"], round(r["approx_dist"], 9))
        for r in p.topk(queries, k=10, nprobe=4).collect()
    )
    codes = encode_ivf_pq(vecs, idx)
    want = sorted(
        (r["query_id"], r["vec_id"], round(r["approx_dist"], 9))
        for r in ivf_pq_topk(codes, idx, queries, k=10, nprobe=4).collect()
    )
    assert got == want
