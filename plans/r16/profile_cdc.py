#!/usr/bin/env python3
"""Profile ONE CDC window (postings + ivfpq) standalone: Spark job count
and wall per phase, via a job-start listener. Mirrors
bench._bench_cdc_maintenance's steady-state shape. Usage:
  python plans/r16/profile_cdc.py [reps]
Prints one JSON line per rep: {"bm25_s", "ivfpq_s", "bm25_jobs", "ivfpq_jobs"}.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from stripe_sync_engine_spark.operators.postings import PersistedPostingsIndex  # noqa: E402
from stripe_sync_engine_spark.operators.pq_index import PersistedIVFPQ, train_ivf_pq  # noqa: E402
from stripe_sync_engine_spark.session import get_spark  # noqa: E402
from stripe_sync_engine_spark.storage import TableStore  # noqa: E402
from stripe_sync_engine_spark.tables import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark("profile_cdc")
spark.sparkContext.setLogLevel("ERROR")
tracker = spark.sparkContext.statusTracker()


def job_ids():
    return set(tracker.getJobIdsForGroup(None) or [])


def one_rep(i):
    out = {}
    wh = tempfile.mkdtemp(prefix=f"prof_cdc_{i}_")
    try:
        store = TableStore(spark, wh, vacuum_retain_s=3600.0)
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        store.write("corpus", docs, key="doc_id")
        t0_commit = store.commits("corpus")[-1]
        idx = PersistedPostingsIndex(store)
        idx.register(store.read("corpus"), "run:0")
        cur = store.read("corpus")
        upd = cur.where("doc_id >= 50 and doc_id < 100").withColumn(
            "text", F.concat(F.lit("rewritten spark corpus body "), F.col("text"))
        )
        new = cur.where("doc_id >= 100 and doc_id < 150").select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        nxt = (
            cur.where("doc_id >= 50")
            .join(upd.select("doc_id"), "doc_id", "left_anti")
            .unionByName(upd)
            .unionByName(new)
        )
        store.write("corpus", nxt, key="doc_id")
        j0 = len(job_ids())
        t0 = time.perf_counter()
        feed = store.read_changes("corpus", t0_commit)
        idx.apply_changes(feed, "w:1")
        n = idx.topk(["spark", "query", "join"], k=20).count()
        out["bm25_s"] = round(time.perf_counter() - t0, 3)
        out["bm25_jobs"] = len(job_ids()) - j0
        assert n > 0

        vecs = load_table(spark, SF, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        ivf = train_ivf_pq(vecs, n_cells=16, m=8, k=16)
        store.write("vectors", vecs, key="vec_id")
        t0_commit = store.commits("vectors")[-1]
        p = PersistedIVFPQ(store, ivf)
        p.register(store.read("vectors"), "run:0")
        cur = store.read("vectors")
        donors = {
            r["vec_id"]: r["embedding"]
            for r in cur.orderBy("vec_id").limit(100).collect()
        }
        ids = sorted(donors)
        upd = spark.createDataFrame(
            [(ids[i], [float(v) for v in donors[ids[50 + i]]]) for i in range(25)],
            "vec_id long, embedding array<double>",
        )
        new = spark.createDataFrame(
            [(1_000_000 + i, [float(v) for v in donors[ids[75 + i]]]) for i in range(25)],
            "vec_id long, embedding array<double>",
        )
        dels = spark.createDataFrame([(i,) for i in ids[25:50]], "vec_id long")
        nxt = (
            cur.join(dels, "vec_id", "left_anti")
            .join(upd.select("vec_id"), "vec_id", "left_anti")
            .unionByName(upd.select("vec_id", F.col("embedding").cast("array<double>")))
            .unionByName(new)
        )
        store.write("vectors", nxt, key="vec_id")
        queries = [(int(i), [float(v) for v in donors[i]]) for i in ids[:8]]
        j0 = len(job_ids())
        t0 = time.perf_counter()
        feed = store.read_changes("vectors", t0_commit)
        p.apply_changes(feed, "w:1")
        n = p.topk(queries, k=10, nprobe=4).count()
        out["ivfpq_s"] = round(time.perf_counter() - t0, 3)
        out["ivfpq_jobs"] = len(job_ids()) - j0
        assert n > 0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    return out


for i in range(REPS):
    print(json.dumps(one_rep(i)), flush=True)
