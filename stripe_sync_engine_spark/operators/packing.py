"""Sequence packing over ARBITRARY per-doc token counts — the generic
core of ``plans/textops.txt_bpe_tokens``'s packing stage.

The registered query packs by the fixed ceil(len/4) subword ESTIMATE
(oracle-mirrored); production packs by the REAL counts a trained
tokenizer produces (``functions/bpe.encode_documents``). Same layout
either way: docs concatenate in id order within their md5 shard and cut
every ``budget`` tokens. Packing is per SHARD, not global — a global
cumulative sum is a single-partition window (the 100 TB anti-pattern),
while ``n_shards`` independent windows run in parallel and each shard's
packs are self-contained. The shard formula is the exporter's
(``operators/export._shard_col``), so a pack never straddles an export
shard file.

Parity with the registered query's packing columns is pytest-pinned
(``tests/test_operators.py`` asset-profile-style stage test in
``tests/test_bpe.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stripe_sync_engine_spark.operators.export import _shard_col


def epoch_position(epoch: int, id_col: str = "doc_id"):
    """Deterministic per-epoch shuffle key: xxhash64(epoch ⊕ id).

    Training epochs need a DIFFERENT but REPRODUCIBLE document order each
    pass — ``df.sample``/``orderBy(rand())`` reshuffle per run, per
    layout, per engine. A hash of (epoch, id) is a pure function of both:
    epoch 3 orders identically on every run of every cluster, and
    distinct epochs decorrelate. Compose with ``assign_packs(order_col=
    epoch_position(...))`` so each epoch re-packs in its own order."""
    return F.xxhash64(F.lit(int(epoch)).cast("long"), F.col(id_col))


def assign_packs(
    df: DataFrame,
    count_col: str,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    order_col=None,
) -> DataFrame:
    """``df`` + (shard, pack_id, pack_offset, packs_spanned).

    One shuffle total (the per-shard window's exchange); the cumulative
    sum never crosses shards, so parallelism is ``n_shards`` regardless
    of corpus size. Zero-count docs still occupy a position (they span 1
    pack at their offset), matching the registered query's
    ``greatest(n, 1)`` convention for boundary accounting.

    ``order_col``: optional Column (or name) ordering docs WITHIN their
    shard — default is id order (the registered query's layout); pass
    ``epoch_position(epoch)`` for a deterministic per-epoch shuffle. The
    id is always the tiebreak, so ordering stays total."""
    shard = _shard_col(id_col, n_shards)
    order = [id_col] if order_col is None else [order_col, id_col]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(count_col).over(w), F.lit(0).cast("long"))
    return (
        df.withColumn("shard", shard)
        .withColumn("pack_id", F.floor(start / budget).cast("long"))
        .withColumn("pack_offset", (start % budget).cast("long"))
        .withColumn(
            "packs_spanned",
            (
                F.floor((start + F.greatest(F.col(count_col), F.lit(1)) - 1) / budget)
                - F.floor(start / budget)
                + 1
            ).cast("long"),
        )
    )
