"""Incremental embedding index: persisted LSH buckets of quantized
vectors — the per-batch counterpart of ``plans/similarity``'s one-shot
ANN/near-dup plans, completing the incremental-gate family
(``operators/incremental_dedup``: exact text, near text; here: near
embedding).

The store table holds (vec_id, bucket, qv) — the random-hyperplane LSH
bucket key and the floor(v·1e7) int64 quantization, computed by the
EXACT pipeline the corpus plans use (``plans/similarity.
buckets_and_quant_for``: measured numpy-in-Arrow assignment, bit-equal
arithmetic) — BUCKETED BY THE LSH BUCKET KEY. An arriving batch of
vectors probes only the store buckets its own keys hash into, joins on
the bucket key, and scores candidates with the exact quantized cosine
(int64 dot products — ``plans/similarity._idot`` semantics, norms
hoisted per side before the join). Same two-phase contract as the text
gates: pure ``neighbors``/``select_new``, idempotent OCC-guarded
``register``, ``filter_new`` composing both; self-matches (same vec_id)
never gate.

Recall matches the one-shot ``dd_embed_cosine``'s single-band LSH; at
100 TB recall is tuned by adding independent bands (OR of several plane
sets), which multiplies index rows — not candidate work per band — just
like the MinHash band index. The index is ~8 + 8·64 bytes per vector, a
<1% shadow of fp32 embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementalEmbeddingIndex:
    """LSH-bucketed near-duplicate gate for an ``array<float>`` column."""

    def __init__(
        self,
        store,
        table: str = "_embedding_index",
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        threshold: float = 0.92,
    ):
        self.store = store
        self.table = table
        self.vec_col = vec_col
        self.id_col = id_col
        self.threshold = threshold

    def _bq(self, batch: DataFrame) -> DataFrame:
        from stripe_sync_engine_spark.plans.similarity import buckets_and_quant_for

        return buckets_and_quant_for(batch, id_col=self.id_col, vec_col=self.vec_col)

    def neighbors(self, batch: DataFrame) -> DataFrame:
        """(vec_id, seen_vec_id, cosine) — indexed vectors sharing the
        batch vectors' LSH buckets, scored with the exact quantized
        cosine. Bucket-pruned: only the batch's own bucket keys' store
        buckets are read. Self-pairs excluded."""
        from stripe_sync_engine_spark.plans.similarity import _idot

        rows = self._bq(batch)
        store, table = self.store, self.table
        if not store.exists(table):
            return rows.select(
                F.col("vec_id"),
                F.col("vec_id").alias("seen_vec_id"),
                F.lit(0.0).alias("cosine"),
            ).limit(0)
        touched = store.buckets_of(rows, key="bucket", table=table)
        index = store.read_buckets(table, touched)
        # hoist norms per SIDE before the join (the similarity module's
        # rule: |pairs| >> |rows|, never recompute per pair)
        left = rows.select(
            "bucket",
            F.col("vec_id"),
            F.col("qv").alias("qa"),
            F.sqrt(_idot(F.col("qv"), F.col("qv")).cast("double")).alias("na"),
        )
        right = index.select(
            "bucket",
            F.col("vec_id").alias("seen_vec_id"),
            F.col("qv").alias("qb"),
            F.sqrt(_idot(F.col("qv"), F.col("qv")).cast("double")).alias("nb"),
        )
        return (
            left.join(right, "bucket")
            .where(F.col("vec_id") != F.col("seen_vec_id"))
            .select(
                "vec_id",
                "seen_vec_id",
                (_idot(F.col("qa"), F.col("qb")).cast("double") / (F.col("na") * F.col("nb"))).alias(
                    "cosine"
                ),
            )
        )

    def select_new(self, batch: DataFrame) -> DataFrame:
        """PURE: batch rows with no indexed neighbor at ``threshold``
        cosine (original schema). No state is mutated."""
        dup_ids = (
            self.neighbors(batch)
            .where(F.col("cosine") >= self.threshold)
            .select("vec_id")
            .distinct()
            .withColumnRenamed("vec_id", self.id_col)
        )
        return batch.join(dup_ids, self.id_col, "left_anti")

    def register(self, batch: DataFrame) -> None:
        """Durably index ``batch``'s vectors, idempotently (already-
        indexed ids register nothing); one OCC-guarded partial commit."""
        rows = self._bq(batch)
        store, table = self.store, self.table
        if not store.exists(table):
            store.write(table, rows, key="bucket")
            return
        manifest = store._read_manifest(table)
        touched = store.buckets_of(rows, key="bucket", table=table)
        index = store._scan_manifest(table, manifest, touched)
        fresh = rows.join(
            index.select("vec_id").distinct(), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)  # pre-commit lineage cut (vacuum)
        if fresh.isEmpty():
            return
        store.write_buckets(
            table,
            index.unionByName(fresh),
            touched,
            key="bucket",
            planned_versions=dict(manifest["buckets"]),
        )

    def filter_new(self, batch: DataFrame) -> DataFrame:
        """select_new + register in one call."""
        survivors = self.select_new(batch).localCheckpoint(eager=True)
        self.register(survivors)
        return survivors
