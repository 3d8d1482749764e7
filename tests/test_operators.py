"""Unit tests for standalone operators (range join)."""

import datetime as dt

from pyspark.sql import functions as F

from stripe_sync_engine_spark.operators.range_join import interval_range_join


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_range_join_bounds(spark):
    """Window is (left+lower, left+upper]: lower exclusive, upper inclusive."""
    left = spark.createDataFrame([(1, _ts(0))], "lid int, lt timestamp")
    right = spark.createDataFrame(
        [(10, _ts(0)), (11, _ts(0.000001)), (12, _ts(600)), (13, _ts(600.000001))],
        "rid int, rt timestamp",
    )
    out = interval_range_join(left, right, "lt", "rt", lower_s=0, upper_s=600)
    assert sorted(r["rid"] for r in out.collect()) == [11, 12]


def test_range_join_bucket_spanning(spark):
    """Matches are found across bucket boundaries and never duplicated."""
    left = spark.createDataFrame([(1, _ts(599))], "lid int, lt timestamp")
    # 1199 is inside (599, 1199]; bucket(599..1199) spans buckets 0 and 1
    right = spark.createDataFrame(
        [(20, _ts(600)), (21, _ts(1199)), (22, _ts(1200))], "rid int, rt timestamp"
    )
    out = interval_range_join(left, right, "lt", "rt", lower_s=0, upper_s=600).collect()
    assert sorted(r["rid"] for r in out) == [20, 21]
    assert len(out) == 2  # exactly-once per qualifying pair


def test_range_join_equi_keys(spark):
    left = spark.createDataFrame([(1, "u1", _ts(0)), (2, "u2", _ts(0))], "lid int, lu string, lt timestamp")
    right = spark.createDataFrame([(30, "u1", _ts(5))], "rid int, ru string, rt timestamp")
    out = interval_range_join(
        left, right, "lt", "rt", lower_s=0, upper_s=600, equi_keys=[("lu", "ru")]
    ).collect()
    assert [(r["lid"], r["rid"]) for r in out] == [(1, 30)]


def test_range_join_negative_window(spark):
    """A look-back window (lower < upper <= 0) works the same way."""
    left = spark.createDataFrame([(1, _ts(100))], "lid int, lt timestamp")
    right = spark.createDataFrame(
        [(40, _ts(40)), (41, _ts(99)), (42, _ts(100))], "rid int, rt timestamp"
    )
    out = interval_range_join(left, right, "lt", "rt", lower_s=-60, upper_s=0).collect()
    # window is (40, 100]: ts=40 sits exactly on the exclusive lower bound
    assert sorted(r["rid"] for r in out) == [41, 42]
