"""Driver-session parity probe: the grading driver builds its OWN plain
SparkSession (no engine configs), so any query that silently depends on
engine session settings — parquet NANOS handling, NTZ inference, session
time zone — passes the in-process suite yet fails the driver. (Exactly
that crashed round 3: events.parquet TIMESTAMP(NANOS) is unreadable
without ``nanosAsLong``, which ``tables.load_table`` must set at runtime
on whatever session it is given.)

A plain session cannot be created inside the test process (getOrCreate
would return the engine-configured one), so this boots a fresh
subprocess with a default session and runs the events-reading query
family — the config-sensitive class — against the DuckDB oracles.
"""

from __future__ import annotations

import os
import subprocess
import sys

# The queries whose inputs carry the session-config hazards: every one
# reads events.parquet (timestamps), plus a point lookup for the basics.
PROBE_QUERIES = [
    "q01_point_lookup",
    "q04_latest_event_per_user",
    "q14_lag_gap_seconds",
    "q23_sessionize",
    "q13_running_total",  # carries the folded trailing-1h RANGE frame
]

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(
        f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{sf_dir}/{{t}}.parquet')"
    )
qs, os_ = e.queries(), e.oracle_sql()
for name in {names!r}:
    sdf = qs[name](spark, {sf_dir!r}).toPandas()
    odf = con.execute(os_[name]).df()
    sdf = sdf[sorted(sdf.columns)].copy(); odf = odf[sorted(odf.columns)].copy()
    assert list(sdf.columns) == list(odf.columns), (name, "schema")
    for c in sdf.columns:
        if str(sdf[c].dtype).startswith("datetime"):
            sdf[c] = sdf[c].astype("datetime64[ns]")
        if str(odf[c].dtype).startswith("datetime"):
            odf[c] = odf[c].astype("datetime64[ns]")
    sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    odf = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert sdf.shape == odf.shape, (name, "rows", sdf.shape, odf.shape)
    assert sdf.equals(odf), (name, "values")
    print("OK", name)
print("ALL_OK")
"""


def test_events_queries_on_plain_driver_session():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    script = _SCRIPT.format(repo=repo, sf_dir=sf_dir, names=PROBE_QUERIES)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": repo},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "ALL_OK" in proc.stdout
