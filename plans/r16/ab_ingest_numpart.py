#!/usr/bin/env python3
"""Interleaved A/B: merge_upsert_clustered with an explicit per-touched-
bucket partition count (arm "numpart") vs the r16-entry behavior where the
merge's window exchange is AQE-coalescible (arm "coalesce"). Arms alternate
inside ONE JVM so host drift hits both; each rep runs bench's
_bench_sync_ingest verbatim (fresh tempdir store per rep).

Usage: python plans/r16/ab_ingest_numpart.py [reps_per_arm]
Prints one JSON line per rep and a medians summary.
"""
import json
import statistics
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
import stripe_sync_engine_spark.sync.engine as eng_mod  # noqa: E402
from stripe_sync_engine_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

spark = get_spark("ab_ingest")
spark.sparkContext.setLogLevel("ERROR")

real = eng_mod.merge_upsert_clustered


def coalescible(*args, **kwargs):
    kwargs.pop("num_partitions", None)
    return real(*args, **kwargs)


# warm both the JVM and the Python worker pool once (bench.py protocol)
spark.range(256).repartition(8).mapInPandas(lambda it: it, "id long").write.format(
    "noop"
).mode("overwrite").save()

results = {"numpart": [], "coalesce": []}
for rep in range(REPS):
    for arm in ("coalesce", "numpart"):
        eng_mod.merge_upsert_clustered = coalescible if arm == "coalesce" else real
        t = bench._bench_sync_ingest(spark, n_events=5000)
        results[arm].append(t)
        print(json.dumps({"rep": rep, "arm": arm, **t}), flush=True)
eng_mod.merge_upsert_clustered = real

summary = {}
for arm, rows in results.items():
    for k in rows[0]:
        summary[f"{arm}.{k}"] = round(statistics.median([r[k] for r in rows]), 3)
print(json.dumps({"medians": summary}))
