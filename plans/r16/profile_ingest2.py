#!/usr/bin/env python3
"""Per-phase job/wall attribution for one ingest call, with handler
chains serialized (webhook_parallelism=1) so job deltas attribute
cleanly. Wraps the store's probe/write/commit surfaces."""
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from stripe_sync_engine_spark.session import get_spark  # noqa: E402
from stripe_sync_engine_spark.storage import INDEXED_STATS_COLUMNS, TableStore  # noqa: E402
from stripe_sync_engine_spark.sync import StripeSparkSync  # noqa: E402

from profile_ingest import batch  # noqa: E402

spark = get_spark("profile_ingest2")
spark.sparkContext.setLogLevel("ERROR")
tracker = spark.sparkContext.statusTracker()


def jobs():
    return len(tracker.getJobIdsForGroup(None) or [])


wh = tempfile.mkdtemp(prefix="prof_ing2_")
trace = []
try:
    store = TableStore(spark, wh, stats_columns=list(INDEXED_STATS_COLUMNS))
    engine = StripeSparkSync(spark, store)
    engine.config.webhook_parallelism = 1

    def wrap(obj, name):
        orig = getattr(obj, name)

        def run(*a, **k):
            j0, t0 = jobs(), time.perf_counter()
            r = orig(*a, **k)
            trace.append((name, jobs() - j0, round(time.perf_counter() - t0, 3)))
            return r

        setattr(obj, name, run)

    for m in ["bucket_counts", "read_buckets", "_write_version", "_version_stats", "_commit_partial"]:
        wrap(store, m)
    wrap(engine, "_merge_plan")

    # warm call (table creation paths) — untraced
    engine.process_webhook_events(engine.events_df_from_json(batch(0, 2500)))
    trace.clear()
    j0, t0 = jobs(), time.perf_counter()
    engine.process_webhook_events(engine.events_df_from_json(batch(2500, 2500)))
    total_j, total_s = jobs() - j0, round(time.perf_counter() - t0, 3)
    print(json.dumps({"total_jobs": total_j, "total_s": total_s}))
    for name, dj, ds in trace:
        print(f"  {name:18s} jobs+{dj} {ds}s")
finally:
    shutil.rmtree(wh, ignore_errors=True)
