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

Aggregate classes (declared, not discovered):

* **Additive** (``aggregates``): sum/count shapes. Deltas subtract
  exactly, so maintenance is pure addition. Result types must be
  integral or decimal — float sums recomputed in a different order need
  not cancel, so a logically no-op commit would emit tiny spurious
  deltas that drift the rollup; registration validates and rejects
  double-typed aggregates (cast to DECIMAL instead).
* **Extrema** (``min_aggregates`` / ``max_aggregates``): maintained by
  TIGHTENING — a commit can only lower a group's stored min (raise its
  max) without a rescan. The one case tightening cannot handle is an
  endangered extremum: the touched buckets previously attained the
  stored extremum and no longer do, so the true value might now live
  nowhere we looked. ``touched_group_update`` flags exactly those groups
  and the engine falls back to a refresh — refresh-on-invalidation.
  Updates that merely add rows or tighten bounds (the overwhelming
  majority of CDC traffic) stay O(touched buckets).

Distinct counts remain out of scope here; the HLL sketch machinery
(plans/skewops.py q28) is the scale path for those.
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
    deleted or moved) are removed from the rollup.

    ``min_aggregates`` / ``max_aggregates`` map output column name → a
    ROW-LEVEL expression whose group min/max is maintained (tightened
    incrementally, refreshed when an extremum is endangered — module
    docstring). They require ``count_col`` so group disappearance is
    decided exactly."""

    name: str
    entity: str
    group_by: dict[str, str] = field(default_factory=dict)
    aggregates: dict[str, str] = field(default_factory=dict)
    count_col: str | None = None
    min_aggregates: dict[str, str] = field(default_factory=dict)
    max_aggregates: dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if not self.group_by or not (self.aggregates or self.min_aggregates or self.max_aggregates):
            raise ValueError("RollupSpec needs at least one group_by and one aggregate")
        if self.count_col is not None and self.count_col not in self.aggregates:
            raise ValueError(f"count_col {self.count_col!r} is not an aggregate column")
        if (self.min_aggregates or self.max_aggregates) and self.count_col is None:
            raise ValueError("min/max aggregates require count_col (group-removal detection)")
        cols = [*self.group_by, *self.aggregates, *self.min_aggregates, *self.max_aggregates]
        dupes = {c for c in cols if cols.count(c) > 1}
        if dupes:
            raise ValueError(f"output column declared more than once: {sorted(dupes)}")

    @property
    def gcols(self) -> list[str]:
        return list(self.group_by)

    @property
    def acols(self) -> list[str]:
        """Additive aggregate output columns."""
        return list(self.aggregates)

    @property
    def xcols(self) -> list[str]:
        """Extrema (min/max) output columns."""
        return [*self.min_aggregates, *self.max_aggregates]

    @property
    def has_extrema(self) -> bool:
        return bool(self.min_aggregates or self.max_aggregates)


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
    total; extrema stay NULL when every contributing value is NULL."""
    aggs = [F.expr(e).alias(c) for c, e in spec.aggregates.items()]
    aggs += [F.min(F.expr(e)).alias(c) for c, e in spec.min_aggregates.items()]
    aggs += [F.max(F.expr(e)).alias(c) for c, e in spec.max_aggregates.items()]
    grouped = rows.groupBy(
        *[F.expr(e).alias(c) for c, e in spec.group_by.items()]
    ).agg(*aggs)
    return grouped.select(
        *spec.gcols,
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in spec.acols],
        *spec.xcols,
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


def touched_group_update(
    rollup_old: DataFrame | None,
    old_contrib: DataFrame | None,
    new_contrib: DataFrame,
    spec: RollupSpec,
) -> tuple[DataFrame, DataFrame]:
    """Extrema-aware state update for the groups present in a commit's
    touched buckets. Returns ``(updated, endangered)``:

    * ``updated`` — the new rollup state of the touched rollup buckets,
      valid ONLY if ``endangered`` is empty: additive columns get the
      exact delta added, extrema are tightened (``least``/``greatest`` —
      Spark's skip NULLs, which is exactly the wanted semantics), groups
      whose count reaches zero are dropped, untouched groups in the same
      buckets pass through.
    * ``endangered`` — groups whose stored extremum was attained by the
      touched buckets' OLD rows and is no longer attained by their new
      rows (and whose count stays nonzero): the true extremum may now
      live in rows nobody re-read, so the caller must refresh instead of
      committing ``updated``. A group that merely gains rows or tightens
      its bounds is never endangered — CDC's common case stays O(touched
      buckets).

    The detection is sound because stored extrema bound contribution
    extrema: stored_min <= old_contrib_min always (global min over a
    superset of rows), so the only information loss is when equality held
    and the new contribution retreats.

    The three-way join base is ``localCheckpoint``-ed eagerly: the caller
    runs TWO actions over it (the bounded endangered probe, then the
    rollup write), and without the checkpoint the join/aggregation lineage
    would execute twice per commit — the same reason the additive path
    checkpoints its delta."""
    o = old_contrib if old_contrib is not None else new_contrib.limit(0)
    c = _outer_merge(o, new_contrib, spec, "_o", "_n")
    r = rollup_old
    if r is None:
        base = c.select(
            *spec.gcols,
            *[F.lit(None).alias(f"_r{c_}") for c_ in (*spec.acols, *spec.xcols)],
            *[F.col(f"_o{c_}") for c_ in (*spec.acols, *spec.xcols)],
            *[F.col(f"_n{c_}") for c_ in (*spec.acols, *spec.xcols)],
        )
    else:
        ra = r.alias("r")
        ca = c.alias("c")
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"r.{g}").eqNullSafe(F.col(f"c.{g}")) for g in spec.gcols],
        )
        base = ra.join(ca, cond, "full_outer").select(
            *[F.coalesce(F.col(f"r.{g}"), F.col(f"c.{g}")).alias(g) for g in spec.gcols],
            *[F.col(f"r.{c_}").alias(f"_r{c_}") for c_ in (*spec.acols, *spec.xcols)],
            *[F.col(f"c._o{c_}").alias(f"_o{c_}") for c_ in (*spec.acols, *spec.xcols)],
            *[F.col(f"c._n{c_}").alias(f"_n{c_}") for c_ in (*spec.acols, *spec.xcols)],
        )
    base = base.localCheckpoint(eager=True)
    add = [
        (
            F.coalesce(F.col(f"_r{a}"), F.lit(0))
            + F.coalesce(F.col(f"_n{a}"), F.lit(0))
            - F.coalesce(F.col(f"_o{a}"), F.lit(0))
        ).alias(a)
        for a in spec.acols
    ]
    tightened = [
        F.least(F.col(f"_r{x}"), F.col(f"_n{x}")).alias(x) for x in spec.min_aggregates
    ] + [F.greatest(F.col(f"_r{x}"), F.col(f"_n{x}")).alias(x) for x in spec.max_aggregates]
    out = base.select(*spec.gcols, *add, *tightened)
    if spec.count_col is not None:
        out = out.where(F.col(spec.count_col) != 0)
    updated = out.withColumn("_gk", group_key_col(spec))

    danger = [
        F.col(f"_o{x}").isNotNull()
        & F.col(f"_o{x}").eqNullSafe(F.col(f"_r{x}"))
        & (F.col(f"_n{x}").isNull() | (F.col(f"_n{x}") > F.col(f"_o{x}")))
        for x in spec.min_aggregates
    ] + [
        F.col(f"_o{x}").isNotNull()
        & F.col(f"_o{x}").eqNullSafe(F.col(f"_r{x}"))
        & (F.col(f"_n{x}").isNull() | (F.col(f"_n{x}") < F.col(f"_o{x}")))
        for x in spec.max_aggregates
    ]
    endangered = base
    if spec.count_col is not None:
        cc = spec.count_col
        surviving = (
            F.coalesce(F.col(f"_r{cc}"), F.lit(0))
            + F.coalesce(F.col(f"_n{cc}"), F.lit(0))
            - F.coalesce(F.col(f"_o{cc}"), F.lit(0))
        ) != 0
        endangered = endangered.where(surviving)  # vanishing groups just drop
    endangered = endangered.where(reduce(lambda a, b: a | b, danger)).select(*spec.gcols)
    return updated, endangered


def _outer_merge(o: DataFrame, n: DataFrame, spec: RollupSpec, op: str, np: str) -> DataFrame:
    """Full-outer join of old/new contributions on the group columns, with
    value columns prefixed ``op``/``np``."""
    oa = o.alias("oc")
    na = n.alias("nc")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"oc.{g}").eqNullSafe(F.col(f"nc.{g}")) for g in spec.gcols],
    )
    return oa.join(na, cond, "full_outer").select(
        *[F.coalesce(F.col(f"oc.{g}"), F.col(f"nc.{g}")).alias(g) for g in spec.gcols],
        *[F.col(f"oc.{c}").alias(f"{op}{c}") for c in (*spec.acols, *spec.xcols)],
        *[F.col(f"nc.{c}").alias(f"{np}{c}") for c in (*spec.acols, *spec.xcols)],
    )


def full_rollup(rows: DataFrame, spec: RollupSpec) -> DataFrame:
    """The rollup recomputed from scratch — initialization and the drift
    repair path (``StripeSparkSync.refresh_rollup``)."""
    out = contributions(rows, spec)
    if spec.count_col is not None:
        out = out.where(F.col(spec.count_col) != 0)
    return out.withColumn("_gk", group_key_col(spec))
