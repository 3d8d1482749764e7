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


def materialize_packs(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    order_col=None,
) -> DataFrame:
    """``(shard, pack_id, n_docs, n_tokens, tokens)`` — the ACTUAL
    concat-and-chunk training sequences: every doc's token array lands at
    its ``assign_packs`` position, docs straddling a pack boundary SPLIT
    across the packs they span, and each pack except a shard's last holds
    exactly ``budget`` tokens (pytest-pinned). The last mile from pack
    bookkeeping to dataloader tensors.

    All JVM-side: per doc, one HOF builds its ≤packs_spanned (pack, local
    slice) pieces; one explode + one groupBy(shard, pack_id) later, each
    pack's pieces sort by their global position (array_sort on the
    collected structs — tie-free since positions are distinct) and
    flatten. ONE exchange total (measured via executedPlan): the groupBy's
    ClusteredDistribution on (shard, pack_id) is satisfied by the window's
    hashpartitioning(shard) — shard alone determines the partition — so no
    second shuffle is planned. Pack rows are bounded by ``budget`` tokens
    each, so no group outgrows memory regardless of document length.
    Generic over the token element type (subword strings or ids)."""
    assigned = assign_packs(
        df.withColumn("_n", F.size(tokens_col).cast("long")),
        "_n",
        budget,
        n_shards,
        id_col,
        order_col,
    )
    start = F.col("pack_id") * budget + F.col("pack_offset")
    pieces = F.transform(
        F.sequence(F.lit(0), F.col("packs_spanned") - 1),
        lambda j: F.struct(
            (F.col("pack_id") + j).alias("pid"),
            F.greatest((F.col("pack_id") + j) * budget - start, F.lit(0).cast("long")).alias("lo"),
            F.least(F.col("_n"), (F.col("pack_id") + j + 1) * budget - start).alias("hi"),
        ),
    )
    piece_rows = (
        assigned.select(
            "shard",
            F.col(tokens_col).alias("_toks"),
            start.alias("_start"),
            F.explode(pieces).alias("p"),
        )
        .where(F.col("p.hi") > F.col("p.lo"))  # zero-count docs place, not pack
        .select(
            "shard",
            F.col("p.pid").alias("pack_id"),
            (F.col("_start") + F.col("p.lo")).cast("long").alias("_gpos"),
            F.slice("_toks", F.col("p.lo") + 1, F.col("p.hi") - F.col("p.lo")).alias("_piece"),
        )
    )
    return (
        piece_rows.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("_gpos").alias("o"), F.col("_piece").alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                )
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
        .select("shard", "pack_id", "n_docs", "n_tokens", "tokens")
    )


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
