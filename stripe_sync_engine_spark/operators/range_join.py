"""Interval / range join (SURVEY J6 theta-range family).

Joins a LEFT row to every RIGHT row whose time falls in the left-anchored
window ``(left_time + lower_s, left_time + upper_s]`` (optionally with
equi-keys). Spark has no native range-join operator; the naive encoding is
a theta join that Catalyst executes as BroadcastNestedLoopJoin /
CartesianProduct — O(|L|·|R|) and a non-starter at 100 TB.

Physical strategy — **band (bucket) join**, the standard scale-safe plan:

1. pick a bucket width ≈ the window width; each left interval then spans
   at most ``ceil(window/width)+1`` buckets,
2. explode the left side over the bucket ids its interval covers
   (``sequence`` + ``explode`` — JVM-side, bounded fan-out),
3. the right side computes its single bucket id map-side,
4. equi-join on the bucket id (hash-partitioned shuffle — AQE handles
   skewed buckets), then apply the exact interval predicate.

Each qualifying (left, right) pair matches on exactly ONE bucket (the
right row's bucket is unique), so no dedup pass is needed. Work is
O(pairs-in-band), not O(|L|·|R|); shuffle keys are ``(equi keys, bucket)``
so hot time-buckets spread across however many equi-key values exist.

Reference parity: the reference delegates such queries to Postgres over
synced tables (README.md:18-20); this is the Spark-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US = 1_000_000


def interval_range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    lower_s: float,
    upper_s: float,
    equi_keys: list[tuple[str, str]] | None = None,
    bucket_s: float | None = None,
) -> DataFrame:
    """Inner-join rows where ``right_time ∈ (left_time+lower_s, left_time+upper_s]``.

    ``equi_keys`` is a list of ``(left_col, right_col)`` pairs joined
    exactly; ``bucket_s`` defaults to the window width. Column name
    collisions must be resolved by the caller (select/alias before the
    call) — the result carries all columns from both sides.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    width_us = int((bucket_s if bucket_s is not None else (upper_s - lower_s)) * US)
    lo_us, hi_us = int(lower_s * US), int(upper_s * US)

    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))

    l = left.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor((lt + F.lit(lo_us)) / F.lit(width_us)),
                F.floor((lt + F.lit(hi_us)) / F.lit(width_us)),
            )
        ),
    )
    r = right.withColumn("_rj_bucket", F.floor(rt / F.lit(width_us)))

    cond = l["_rj_bucket"] == r["_rj_bucket"]
    for lk, rk in equi_keys or []:
        cond = cond & (l[lk] == r[rk])

    lt_j = F.unix_micros(l[left_time])
    rt_j = F.unix_micros(r[right_time])
    joined = l.join(r, cond, "inner").where(
        (rt_j > lt_j + F.lit(lo_us)) & (rt_j <= lt_j + F.lit(hi_us))
    )
    return joined.drop("_rj_bucket")
