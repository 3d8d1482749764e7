"""Incrementally-maintained aggregate rollups over synced tables (IVM).

The reference delegates analytics to Postgres (README.md:18-20), where a
consumer keeping a daily-revenue summary re-runs its GROUP BY; at 100 TB
a rollup cannot be recomputed per micro-batch. This engine's writes are
manifest commits of WHOLE buckets (storage.py), so the exact aggregate
delta of any commit is computable from the old and new contents of just
the touched buckets: ``agg(new) - agg(old)`` group-wise — O(touched
buckets), independent of table size. Sums and counts are subtractable,
so applying the delta to the rollup table is pure addition, and the
rollup store itself is bucket-pruned by a deterministic group key.

Idempotence falls out of the formulation: a replayed or stale batch
leaves the buckets byte-identical (the merge is timestamp-protected), so
its delta is exactly zero — maintenance inherits the merge's replay
safety with no extra bookkeeping.

Limits (declared, not discovered): aggregates must be additive
(``sum(expr)`` / ``count(*)`` shapes). Non-subtractable aggregates
(min/max/distinct) need either full refresh (``refresh`` here) or a
sketch with deletion support; both are out of scope for parity with what
summary tables over the reference's schema actually use.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unit separator: never appears in Stripe ids/enum values or formatted dates.
_GK_SEP = "\x1f"


@dataclass(frozen=True)
class RollupSpec:
    """Declarative rollup: ``SELECT <group_by>, <aggregates> FROM entity
    GROUP BY <group_by>`` maintained incrementally.

    ``group_by``/``aggregates`` map output column name → SQL expression
    over the source table's rows. Aggregate expressions must be additive
    (sum/count family). ``count_col`` names the aggregate that counts
    contributing rows; groups whose count reaches zero (all their rows
    deleted or moved) are removed from the rollup."""

    name: str
    entity: str
    group_by: dict[str, str] = field(default_factory=dict)
    aggregates: dict[str, str] = field(default_factory=dict)
    count_col: str | None = None

    def __post_init__(self):
        if not self.group_by or not self.aggregates:
            raise ValueError("RollupSpec needs at least one group_by and one aggregate")
        if self.count_col is not None and self.count_col not in self.aggregates:
            raise ValueError(f"count_col {self.count_col!r} is not an aggregate column")
        overlap = set(self.group_by) & set(self.aggregates)
        if overlap:
            raise ValueError(f"columns declared as both group and aggregate: {sorted(overlap)}")

    @property
    def gcols(self) -> list[str]:
        return list(self.group_by)

    @property
    def acols(self) -> list[str]:
        return list(self.aggregates)


def group_key_col(spec: RollupSpec):
    """Deterministic bucket key for the rollup store: the group columns
    serialized with an unambiguous separator (NULL → a marker no cast can
    produce, so (NULL) and ('') key differently)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in spec.gcols
    ]
    return F.concat_ws(_GK_SEP, *parts)


def contributions(rows: DataFrame, spec: RollupSpec) -> DataFrame:
    """Group-wise aggregate contributions of a set of rows (one output row
    per group present). NULL-valued sums normalize to 0 so subtraction is
    total."""
    grouped = rows.groupBy(
        *[F.expr(e).alias(c) for c, e in spec.group_by.items()]
    ).agg(*[F.expr(e).alias(c) for c, e in spec.aggregates.items()])
    return grouped.select(
        *spec.gcols,
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in spec.acols],
    )


def delta(old_contrib: DataFrame | None, new_contrib: DataFrame, spec: RollupSpec) -> DataFrame:
    """``agg(new) - agg(old)`` group-wise; groups with an all-zero delta
    are dropped (their buckets changed but their aggregate did not — e.g.
    a replayed batch)."""
    signed = new_contrib.select(
        *spec.gcols, *[F.col(c).alias(c) for c in spec.acols]
    )
    if old_contrib is not None:
        signed = signed.unionByName(
            old_contrib.select(*spec.gcols, *[(-F.col(c)).alias(c) for c in spec.acols])
        )
    d = signed.groupBy(*spec.gcols).agg(
        *[F.sum(F.col(c)).alias(c) for c in spec.acols]
    )
    nonzero = reduce(lambda a, b: a | b, [F.col(c) != 0 for c in spec.acols])
    return d.where(nonzero)


def apply_delta(rollup_old: DataFrame | None, d: DataFrame, spec: RollupSpec) -> DataFrame:
    """Add a delta into the rollup's current (bucket-pruned) state.
    Group keys join null-safely (a NULL group value is a real group);
    groups whose ``count_col`` lands on zero are dropped."""
    if rollup_old is None:
        merged = d
    else:
        o = rollup_old.alias("o")
        n = d.alias("n")
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in spec.gcols],
        )
        merged = o.join(n, cond, "full_outer").select(
            *[
                F.coalesce(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(c)
                for c in spec.gcols
            ],
            *[
                (
                    F.coalesce(F.col(f"o.{c}"), F.lit(0))
                    + F.coalesce(F.col(f"n.{c}"), F.lit(0))
                ).alias(c)
                for c in spec.acols
            ],
        )
    if spec.count_col is not None:
        merged = merged.where(F.col(spec.count_col) != 0)
    return merged.withColumn("_gk", group_key_col(spec))


def full_rollup(rows: DataFrame, spec: RollupSpec) -> DataFrame:
    """The rollup recomputed from scratch — initialization and the drift
    repair path (``StripeSparkSync.refresh_rollup``)."""
    out = contributions(rows, spec)
    if spec.count_col is not None:
        out = out.where(F.col(spec.count_col) != 0)
    return out.withColumn("_gk", group_key_col(spec))
