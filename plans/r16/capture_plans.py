#!/usr/bin/env python3
"""Capture .explain("formatted") for every registry query into
plans/r16/<name>_<tag>.txt (tag = before/after, argv[1]).

Usage: python plans/r16/capture_plans.py before [name ...]
Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) — plan SHAPE is what matters,
and the driver benches at sf0.1, so plans are captured there too.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from stripe_sync_engine_spark.plans import REGISTRY  # noqa: E402
from stripe_sync_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            df = q.spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")


if __name__ == "__main__":
    main()
