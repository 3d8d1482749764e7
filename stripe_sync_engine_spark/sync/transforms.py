"""Per-entity ``transform(df) -> df`` registry — the engine's public UDF
seam (SURVEY §2.10).

The reference's "UDFs" are hand-coded per-entity normalizers
(``stripeSync.ts:1484-1509`` subscription-item price→id and defaults,
``:1537-1549`` line-item price extraction, ``:1696-1704`` entitlement
flattening). Here those projection-level normalizations stay declarative
(``overrides`` column expressions in the engine), and THIS registry is the
user-extensible hook the reference never exposed: every registered
transform runs on the fully-projected entity DataFrame immediately before
its merge, on every write path (webhook batch, backfill, fan-out,
point sync).

Transforms must be pure DataFrame→DataFrame (no collect, no side
effects) so they stay inside the distributed plan — a transform built
from ``pyspark.sql.functions`` keeps whole-stage codegen; one that needs
Python should use a ``pandas_udf`` (Arrow-batched), never a row-at-a-time
UDF.

Usage::

    from stripe_sync_engine_spark.sync.transforms import register_transform

    @register_transform("customers")
    def mask_email(df):
        return df.withColumn("email", F.sha2(F.col("email"), 256))
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Callable

from pyspark.sql import DataFrame

TransformFn = Callable[[DataFrame], DataFrame]

_REGISTRY: dict[str, list[TransformFn]] = defaultdict(list)


def register_transform(entity: str, fn: TransformFn | None = None):
    """Register a transform for ``entity``; usable as a decorator
    (``@register_transform("charges")``) or called directly
    (``register_transform("charges", fn)``). Transforms run in
    registration order."""

    def add(f: TransformFn) -> TransformFn:
        _REGISTRY[entity].append(f)
        return f

    return add(fn) if fn is not None else add


def transforms_for(entity: str) -> list[TransformFn]:
    return list(_REGISTRY.get(entity, ()))


def apply_transforms(entity: str, df: DataFrame) -> DataFrame:
    """Chain every registered transform for ``entity`` over ``df``. The
    result must keep the entity's merge key (``id``) — the engine will
    fail fast on a transform that drops it."""
    for fn in _REGISTRY.get(entity, ()):
        df = fn(df)
        if "id" in df.columns:
            continue
        raise ValueError(
            f"transform {getattr(fn, '__name__', fn)!r} for entity {entity!r} "
            "dropped the 'id' merge key"
        )
    return df


def clear_transforms(entity: str | None = None) -> None:
    """Remove registered transforms (all entities when ``entity`` is None).
    Primarily for tests and notebook re-registration."""
    if entity is None:
        _REGISTRY.clear()
    else:
        _REGISTRY.pop(entity, None)
