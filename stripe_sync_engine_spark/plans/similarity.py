"""Similarity search over the ``embeddings`` table (``array<float>``):

* ``sim_topk_l2`` / ``sim_topk_cosine`` — brute-force top-k as the exact
  baseline: the (small) query set is **broadcast** against the corpus, the
  distance arithmetic runs in JVM higher-order functions (zip_with /
  aggregate), and ranking is a per-query window. O(|Q|·N), no shuffle of
  the corpus, linear scale-out across executors — the right brute-force
  shape at 100 TB.
* ``sim_lsh_buckets`` — random-hyperplane LSH bucketing as the scale path:
  deterministic ±1 hyperplanes (md5-derived, inlined identically into the
  Spark plan and the SQL oracle), sign-bit bucket key, so candidate
  generation becomes an equi-join on the bucket key instead of a cross
  join.

Float discipline: engines disagree on float→decimal conversion and on
double summation order, so vector components are **quantized to int64**
(``floor(v · 10^7)``) on both sides — IEEE multiply + floor is
bit-deterministic — and all dot products / norms are exact integer sums
(max |v|≈1 → Σ 64·(10^7)^2 ≈ 6.4e15, well inside int64). Only the final
cosine converts to double (sqrt/division on identical inputs is IEEE-
deterministic), so values and ranks hash-match DuckDB exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stripe_sync_engine_spark.plans.registry import register
from stripe_sync_engine_spark.tables import load_table

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
N_PLANES = 8
N_DIMS = 64
QUANT = 10_000_000  # 1e7: quantization scale for float components


def _quant(arr: Column) -> Column:
    """array<float> → array<long>: floor(v * 1e7), bit-identical to the
    DuckDB expression ``CAST(floor(CAST(v AS DOUBLE) * 10000000) AS BIGINT)``."""
    return F.transform(arr, lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))).cast("long"))


def _idot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)


SQL_QUANT_PAIRS = f"""
    SELECT query_id, neighbor_id,
           CAST(floor(CAST(qv AS DOUBLE) * {QUANT}) AS BIGINT) AS qi,
           CAST(floor(CAST(ev AS DOUBLE) * {QUANT}) AS BIGINT) AS ei
    FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               unnest(q.embedding) AS qv, unnest(e.embedding) AS ev
        FROM embeddings q, embeddings e
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> e.vec_id
    )
"""

SQL_DOTS = f"""
    SELECT query_id, neighbor_id,
           CAST(SUM(qi * ei) AS BIGINT) AS dot,
           CAST(SUM(qi * qi) AS BIGINT) AS qn2,
           CAST(SUM(ei * ei) AS BIGINT) AS en2
    FROM ({SQL_QUANT_PAIRS})
    GROUP BY query_id, neighbor_id
"""


def _scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, dot, qn2, en2) with exact int64 arithmetic;
    query side broadcast so the corpus never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _quant(F.col("embedding")).alias("q_emb")
    )
    e = emb.select(F.col("vec_id").alias("neighbor_id"), _quant(F.col("embedding")).alias("e_emb"))
    return (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _idot(F.col("q_emb"), F.col("e_emb")).alias("dot"),
            _idot(F.col("q_emb"), F.col("q_emb")).alias("qn2"),
            _idot(F.col("e_emb"), F.col("e_emb")).alias("en2"),
        )
    )


@register(
    "sim_topk_l2",
    oracle=f"""
        WITH dots AS ({SQL_DOTS}),
        ranked AS (
            SELECT query_id, neighbor_id,
                   qn2 + en2 - 2 * dot AS l2sq,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY qn2 + en2 - 2 * dot, neighbor_id) AS rank
            FROM dots
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, CAST(l2sq AS BIGINT) AS l2sq
        FROM ranked WHERE rank <= {TOP_K}
    """,
    operators="TDP-ann-bruteforce",
)
def sim_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN by (quantized) squared L2 distance — exact integers
    end to end."""
    scored = _scored_pairs(spark, sf_dir).select(
        "query_id", "neighbor_id", (F.col("qn2") + F.col("en2") - 2 * F.col("dot")).alias("l2sq")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2sq").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.col("l2sq").cast("long"))
    )


@register(
    "sim_topk_cosine",
    oracle=f"""
        WITH dots AS ({SQL_DOTS}),
        ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) AS cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(en2 AS DOUBLE))) DESC,
                                               neighbor_id) AS rank
            FROM dots
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
        FROM ranked WHERE rank <= {TOP_K}
    """,
    operators="TDP-ann-cosine",
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k cosine: exact integer dot/norms, IEEE-deterministic
    final sqrt/division."""
    cosine = F.col("dot").cast("double") / (F.sqrt(F.col("qn2").cast("double")) * F.sqrt(F.col("en2").cast("double")))
    scored = _scored_pairs(spark, sf_dir).select("query_id", "neighbor_id", cosine.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def lsh_planes() -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign of the first md5 nibble of
    ``"{plane}:{dim}"``. Computed once driver-side and inlined as literals
    into BOTH the Spark plan and the oracle SQL (identical by construction).
    """
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(N_DIMS):
            nib = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16)
            row.append(1 if nib >= 8 else -1)
        planes.append(row)
    return planes


def _sql_plane_values() -> str:
    """(p, d, w) VALUES literal for the oracle."""
    rows = []
    for p, row in enumerate(lsh_planes()):
        for d, w in enumerate(row):
            rows.append(f"({p},{d + 1},{w})")
    return ", ".join(rows)


@register(
    "sim_lsh_buckets",
    oracle=f"""
        WITH planes(p, d, w) AS (VALUES {_sql_plane_values()}),
        comps AS (
            SELECT vec_id,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT}) AS BIGINT) AS vi,
                   unnest(generate_series(1, {N_DIMS})) AS d
            FROM embeddings
        ),
        signs AS (
            SELECT c.vec_id, pl.p, CAST(SUM(c.vi * pl.w) AS BIGINT) AS s
            FROM comps c JOIN planes pl ON pl.d = c.d
            GROUP BY c.vec_id, pl.p
        )
        SELECT vec_id,
               string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
        FROM signs GROUP BY vec_id
    """,
    operators="TDP-ann-lsh",
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment: 8 deterministic ±1 planes →
    8 sign bits → bucket string. Entirely map-side per vector in Spark
    (literal plane arrays, zip_with dot products) — no shuffle until a
    candidate join on ``bucket``."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", _quant(F.col("embedding")).alias("qv"))
    planes = lsh_planes()
    bits = []
    for p in range(N_PLANES):
        plane_lit = F.array(*[F.lit(w).cast("long") for w in planes[p]])
        s = _idot(F.col("qv"), plane_lit)
        bits.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select("vec_id", F.concat(*bits).alias("bucket"))
