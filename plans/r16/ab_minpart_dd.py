#!/usr/bin/env python3
"""Interleaved A/B of minPartitionNum on the incremental dedup/ANN bench
sections (store-scan + CPU-heavy minhash/encode paths)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
from stripe_sync_engine_spark.session import get_spark
import bench
SF = "/root/testdata/sf0.1"
spark = get_spark("ab_dd")
spark.sparkContext.setLogLevel("ERROR")
for rep in range(3):
    for arm, v in (("A_default", None), ("B_min1", "1")):
        if v is None:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", v)
        out = {}
        out.update(bench._bench_incremental_dedup(spark, SF))
        out.update(bench._bench_incremental_near_and_ann(spark, SF))
        print(json.dumps({"rep": rep, "arm": arm, **out}), flush=True)
