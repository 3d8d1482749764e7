#!/usr/bin/env python3
"""Profile the sync_ingest bench shape: job count + wall for each
process_webhook_events call (the timed region is two 2.5k-event calls).
Usage: python plans/r16/profile_ingest.py [reps]
"""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from stripe_sync_engine_spark.session import get_spark  # noqa: E402
from stripe_sync_engine_spark.storage import INDEXED_STATS_COLUMNS, TableStore  # noqa: E402
from stripe_sync_engine_spark.sync import StripeSparkSync  # noqa: E402

import bench  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N = 5000

spark = get_spark("profile_ingest")
spark.sparkContext.setLogLevel("ERROR")
tracker = spark.sparkContext.statusTracker()


def jobs():
    return len(tracker.getJobIdsForGroup(None) or [])


# reuse bench's synthetic batch builder by inlining its shape
def batch(start: int, n: int) -> list[str]:
    payloads = []
    for i in range(start, start + n):
        if i % 4 == 0:
            obj = {"id": f"cus_{i % 997}", "object": "customer", "email": f"u{i}@x.io"}
            etype = "customer.updated"
        else:
            obj = {
                "id": f"ch_{i % 3001}",
                "object": "charge",
                "amount": i,
                "created": 1_700_000_000 + i,
                "customer": f"cus_{i % 997}",
                "status": "succeeded",
            }
            etype = "charge.updated"
        payloads.append(
            json.dumps(
                {
                    "id": f"evt_{i:08d}",
                    "object": "event",
                    "type": etype,
                    "created": 1_700_000_000 + i,
                    "data": {"object": obj},
                }
            )
        )
    return payloads


for rep in range(REPS):
    wh = tempfile.mkdtemp(prefix=f"prof_ing_{rep}_")
    try:
        engine = StripeSparkSync(
            spark, TableStore(spark, wh, stats_columns=list(INDEXED_STATS_COLUMNS))
        )
        half = N // 2
        out = {"rep": rep}
        for label, (s, n) in {"call1": (0, half), "call2": (half, N - half)}.items():
            j0, t0 = jobs(), time.perf_counter()
            engine.process_webhook_events(engine.events_df_from_json(batch(s, n)))
            out[label + "_s"] = round(time.perf_counter() - t0, 3)
            out[label + "_jobs"] = jobs() - j0
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
