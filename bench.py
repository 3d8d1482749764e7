#!/usr/bin/env python3
"""Benchmark: run every registered engine query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (full computation of all
output columns — ``count()`` alone would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stripe_sync_engine_spark.plans import REGISTRY  # noqa: E402
from stripe_sync_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # queries, not session bootstrap.
    warm = REGISTRY["q09_distinct_custkeys"].spark(spark, sf_dir)
    warm.write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name, q in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "engine_query_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
