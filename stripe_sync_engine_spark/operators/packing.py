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


def assign_packs(
    df: DataFrame,
    count_col: str,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """``df`` + (shard, pack_id, pack_offset, packs_spanned).

    One shuffle total (the per-shard window's exchange); the cumulative
    sum never crosses shards, so parallelism is ``n_shards`` regardless
    of corpus size. Zero-count docs still occupy a position (they span 1
    pack at their offset), matching the registered query's
    ``greatest(n, 1)`` convention for boundary accounting.
    """
    shard = _shard_col(id_col, n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
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
