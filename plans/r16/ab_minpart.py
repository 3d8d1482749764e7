#!/usr/bin/env python3
"""Interleaved A/B of spark.sql.files.minPartitionNum (default=32 local
vs 1) on the bench sections dominated by tiny bucket-file scans:
_bench_mixing (the inverse-scaling steady trio) and _bench_cdc_maintenance
(the two disputed CDC windows + fanout + audit). One JVM, conf toggled
per rep (it is a dynamic SQL conf read at scan planning time), reps
alternate A/B/A/B... so host drift hits both arms equally.

Usage: python plans/r16/ab_minpart.py [reps_per_arm] [mixing|cdc|both]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from stripe_sync_engine_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
WHICH = sys.argv[2] if len(sys.argv) > 2 else "mixing"

spark = get_spark("ab_minpart")
spark.sparkContext.setLogLevel("ERROR")
DEFAULT = spark.conf.get("spark.sql.files.minPartitionNum", None)

sections = []
if WHICH in ("mixing", "both"):
    sections.append(("mixing", lambda: bench._bench_mixing(spark, SF)))
if WHICH in ("cdc", "both"):
    sections.append(("cdc", lambda: bench._bench_cdc_maintenance(spark, SF)))

for rep in range(REPS):
    for arm, value in (("A_default", None), ("B_min1", "1")):
        if value is None:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", value)
        for name, fn in sections:
            t0 = time.perf_counter()
            out = fn()
            wall = round(time.perf_counter() - t0, 3)
            print(
                json.dumps({"rep": rep, "arm": arm, "section": name, "wall": wall, **out}),
                flush=True,
            )
