"""Skew mitigation operators (100 TB design): deterministic salting and
shuffle-key widening for Zipf-hot keys.

At web scale the key histograms of joins and aggregations are Zipfian: one
customer with 10^8 events, one event_type holding half the table. A plain
shuffle routes every row of a hot key through ONE reducer task — the stage
runs at the speed of its slowest key no matter how many executors exist.
Two declarative rewrites fix this without changing semantics:

* ``salted_join`` — widen the join key with a salt derived from a column
  that VARIES WITHIN the join key on the skewed (fact) side, and replicate
  the other side once per salt value. A hot key's rows spread over
  ``n_salt`` tasks. This is the static form of what AQE's skew-join split
  (``spark.sql.adaptive.skewJoin.enabled``) does at runtime; the explicit
  operator covers the cases AQE cannot see (skew appearing after
  filters/explodes, broadcast-ineligible mid-size dims, streaming joins
  where AQE is unavailable).
* ``two_level_count_distinct`` — exact COUNT(DISTINCT x) BY hot-key via a
  widened first shuffle: dedupe on ``(keys, x)`` (no hot partition — the
  distinct column spreads the hot key), then a partial-aggregable count by
  ``keys``. The reducer for a hot key receives at most one partial count
  per map partition instead of every raw row.

Salting is DETERMINISTIC (``pmod(xxhash64(salt_on), n_salt)``) — reruns
produce identical task routing, and correctness never depends on the salt
value (it only routes rows), so any within-key-varying column works.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Join types for which replicating the build side per salt value preserves
# semantics: they emit each LEFT row at most once per match (inner/left) or
# use the right side only as a filter (semi/anti). right/full/cross would
# duplicate unmatched right rows n_salt times.
_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt_on: Column,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    ``salt_on`` must be an expression over ``left`` that varies within a
    single join-key value (a row id, line number, timestamp — anything);
    rows of one hot key then land in ``n_salt`` different reducer tasks,
    each joined against its own copy of the right rows for that key.
    Result == ``left.join(right, on, how)`` for the supported join types.

    Cost model: the right side is shuffled ``n_salt``× — size it so
    ``n_salt · |right|`` stays well under the left shuffle volume. If the
    right side fits in memory whole, use ``F.broadcast`` instead (no
    shuffle at all); salting is the middle regime.
    """
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(f"salted_join supports {sorted(_SALT_SAFE_JOINS)}, not {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted = left.withColumn("_salt", F.pmod(F.xxhash64(salt_on), F.lit(n_salt)).cast("int"))
    replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return salted.join(replicated, keys + ["_salt"], how).drop("_salt")


def two_level_count_distinct(
    df: DataFrame, keys: str | list[str], col: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col), skew-safe.

    Stage 1 shuffles on ``(keys, col)`` — the distinct column spreads a hot
    key across the cluster, so no single task owns it. Stage 2 counts by
    ``keys``; COUNT is algebraic, so partial aggregation collapses each map
    partition's contribution to one row per key before the exchange — the
    hot key's reducer sees O(#partitions) rows, not O(#rows).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    dedup = df.select(*ks, col).distinct()
    return dedup.groupBy(*ks).agg(F.count(F.lit(1)).alias(alias))
