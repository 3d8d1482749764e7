"""As-of join: for each left row, the latest right row with
``right_time <= left_time`` (inclusive) sharing the join key.

Spark has no native ASOF JOIN; the naive formulation (non-equi range join
+ argmax) degenerates to a per-key cross product. This implementation uses
the **union + window** strategy: tag both sides, union them, and carry the
most recent right payload forward with ``last(..., ignoreNulls=True)`` over
an ordered window per key. Cost: ONE shuffle on the key and a sort within
partitions — linear in |L|+|R|, no row-pair explosion; skew handling comes
from AQE like any other window.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_payload: Mapping[str, str],
    right_order: Sequence[str] | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Returns ``left`` columns + ``right_payload`` (src→alias) columns.

    ``right_order``: extra right columns breaking ties among right rows with
    identical (key, time) — the row greatest in this order wins.
    ``inclusive``: whether a right row at exactly left_time is eligible.
    """
    left_cols = left.columns
    payload_srcs = list(right_payload.keys())

    # Right side at equal timestamps sorts before (inclusive) or after
    # (strict) the left row, controlling visibility of exact-time matches.
    right_tag, left_tag = (0, 1) if inclusive else (1, 0)

    # The whole right payload travels as ONE struct carried with a single
    # last(..., ignoreNulls) — carrying columns independently would
    # back-fill a NULL payload column of the most recent right row from an
    # OLDER right row, silently mixing columns of different rows. The
    # struct itself is non-null exactly on right rows, so ignoreNulls skips
    # left rows and the latest right row wins atomically, its NULLs
    # included.
    payload_type = StructType([StructField(c, right.schema[c].dataType) for c in payload_srcs])
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(right_tag).alias("_tag"),
        F.struct(*[F.col(c).alias(c) for c in payload_srcs]).alias("_p"),
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(left_tag).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c) for c in left_cols],
    )
    r_full = r.select(
        "_k", "_t", "_tag", "_p",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    unioned = l.unionByName(r_full).withColumn("_is_left", F.col("_tag") == F.lit(left_tag))

    order = [F.col("_t").asc(), F.col("_tag").asc()] + [F.col("_p")[c].asc_nulls_first() for c in (right_order or [])]
    w = Window.partitionBy("_k").orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = unioned.select("*", F.last(F.col("_p"), ignorenulls=True).over(w).alias("_asof"))
    return carried.where(F.col("_is_left")).select(
        *left_cols,
        *[F.col("_asof")[src].alias(dst) for src, dst in right_payload.items()],
    )
