"""Deduplication operators over ``documents`` — exact, n-gram Jaccard,
MinHash+LSH, and SimHash. These are first-class training-data-pipeline
components (the 100 TB use case), expressed scale-first:

* Exact dedup = one hash aggregation on a fingerprint (never on raw text).
* Near-dup candidate generation uses an **inverted-index join** (explode
  shingles → self-join on shingle) or **LSH band buckets** — never an
  O(n²) cross join. Pair counts are bounded by bucket sizes, and skewed
  buckets are AQE-splittable like any other shuffle join.
* All hashing is md5-based (identical hex on Spark and DuckDB), so every
  stage has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_sync_engine_spark.plans.registry import register
from stripe_sync_engine_spark.tables import load_table

SHINGLE_W = 5  # words per shingle
MINHASH_SEEDS = 12
LSH_BANDS = 4  # 4 bands × 3 rows
LSH_ROWS = MINHASH_SEEDS // LSH_BANDS
JACCARD_THRESHOLD = 0.5


def shingles_col(text: Column, w: int = SHINGLE_W) -> Column:
    """Distinct word w-shingles of a text column, JVM-side (split +
    transform over an index sequence; empty when fewer than w words)."""
    words = F.split(text, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), n - w)
    mk = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(w)]))
    return F.when(n >= w, F.array_distinct(mk)).otherwise(F.array().cast("array<string>"))


SQL_SHINGLES = f"""
    CASE WHEN len(string_split(text, ' ')) >= {SHINGLE_W}
         THEN list_distinct(list_transform(
                  generate_series(1, len(string_split(text, ' ')) - {SHINGLE_W - 1}),
                  i -> array_to_string(string_split(text, ' ')[i:i+{SHINGLE_W - 1}], ' ')))
         ELSE [] END
"""


def _doc_shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh_arr): the shingle array materialized as a REAL column in
    its own projection. This matters: referencing ``shingles_col(...)`` from
    several downstream expressions (or from a projection above an explode)
    makes Catalyst re-inline the whole array construction at every use site
    — per exploded row, per minhash seed. A dedicated projection below the
    Generate/consumer computes it exactly once per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", shingles_col(F.col("text")).alias("sh_arr"))


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_sh, shingle): per-doc distinct-shingle size is an O(1)
    ``size()`` on the materialized array, so downstream consumers never
    need a per-doc re-aggregation join."""
    base = _doc_shingle_arrays(spark, sf_dir)
    return base.select(
        "doc_id",
        F.size("sh_arr").cast("long").alias("n_sh"),
        F.explode("sh_arr").alias("shingle"),
    )


@register(
    "dd_exact",
    oracle="""
        SELECT md5(text) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    operators="TDP-dedup-exact,A1",
)
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint, keeping the
    smallest doc_id per group. Aggregating the 16-byte fp (not the text)
    keeps shuffle rows tiny at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dd_ngram_jaccard",
    oracle=f"""
        WITH ds AS (
            SELECT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.doc_a, i.doc_b,
               CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {JACCARD_THRESHOLD}
    """,
    operators="TDP-dedup-jaccard",
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup: inverted-index self-join on shingles (pair
    work bounded by shingle-bucket sizes), then exact set algebra
    |A∩B| / (|A|+|B|-|A∩B|). Per-doc sizes ride along on the exploded rows
    (computed map-side from the array), so the whole query is ONE shuffle
    join + one pair aggregation — no per-doc size joins."""
    ds = _doc_shingles(spark, sf_dir)
    a = ds.alias("a")
    b = ds.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.n_sh")).alias("n_a"),
            F.first(F.col("b.n_sh")).alias("n_b"),
        )
    )
    jac = F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
    return inter.select("doc_a", "doc_b", jac.alias("jaccard")).where(F.col("jaccard") >= JACCARD_THRESHOLD)


def _minhash_band_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc LSH band keys, computed ENTIRELY map-side: the MinHash for
    seed s is ``array_min(transform(shingles, x -> md5(s:x)))`` — a
    string-min MinHash (md5 as the permutation; lexicographic min over hex
    is a uniform min-hash). No explode, no shuffle, no per-(doc,seed)
    aggregation: at 100 TB this is a pure scan→project stage whose only
    shuffle is whatever consumes the band keys."""
    base = _doc_shingle_arrays(spark, sf_dir)
    sh = F.col("sh_arr")
    mins = [
        F.array_min(F.transform(sh, lambda x: F.md5(F.concat_ws(":", F.lit(s), x))))
        for s in range(MINHASH_SEEDS)
    ]
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", *mins[b * LSH_ROWS : (b + 1) * LSH_ROWS]))
            for b in range(LSH_BANDS)
        ]
    )
    return (
        base.where(F.size(sh) > 0)  # shingle-less docs have no signature (oracle parity)
        .select("doc_id", F.posexplode(bands).alias("band", "band_key"))
        .select("doc_id", F.col("band").cast("int").alias("band"), "band_key")
    )


SQL_MINHASH_SIGS = f"""
        SELECT doc_id, seed, MIN(md5(seed || ':' || shingle)) AS minhash
        FROM (SELECT doc_id, unnest({SQL_SHINGLES}) AS shingle FROM documents) ds
        CROSS JOIN (SELECT unnest(generate_series(0, {MINHASH_SEEDS - 1})) AS seed) seeds
        GROUP BY doc_id, seed
"""


@register(
    "dd_minhash_bands",
    oracle=f"""
        WITH sigs AS ({SQL_MINHASH_SIGS})
        SELECT doc_id, CAST(seed // {LSH_ROWS} AS INTEGER) AS band,
               md5(string_agg(minhash, '|' ORDER BY seed)) AS band_key
        FROM sigs
        GROUP BY doc_id, seed // {LSH_ROWS}
    """,
    operators="TDP-dedup-minhash",
)
def dd_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures folded into LSH band keys (band = md5 of its
    ordered minhash rows). The band key IS the shuffle key for candidate
    generation — tiny fixed-width rows at any scale, and the signature
    computation itself is shuffle-free (see _minhash_band_rows)."""
    return _minhash_band_rows(spark, sf_dir)


@register(
    "dd_minhash_lsh_pairs",
    oracle=f"""
        WITH sigs AS ({SQL_MINHASH_SIGS}),
        bands AS (
            SELECT doc_id, seed // {LSH_ROWS} AS band,
                   md5(string_agg(minhash, '|' ORDER BY seed)) AS band_key
            FROM sigs GROUP BY doc_id, seed // {LSH_ROWS}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
    operators="TDP-dedup-minhash-lsh",
)
def dd_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing any band bucket. Join key is
    (band, band_key) so pair fan-out is per-bucket, never global."""
    bands = _minhash_band_rows(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


SIMHASH_BITS = 16


@register(
    "dd_simhash",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        ),
        bits AS (
            SELECT doc_id, p,
                   SUM(CASE WHEN strpos('0123456789abcdef', substr(md5(token), p + 1, 1)) - 1 >= 8
                            THEN 1 ELSE -1 END) AS s
            FROM tok
            CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS p) ps
            GROUP BY doc_id, p
        )
        SELECT doc_id,
               SUM(CASE WHEN s > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS simhash
        FROM bits GROUP BY doc_id
    """,
    operators="TDP-dedup-simhash",
)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint: per-token md5 nibbles vote ±1 on each of 16 bit
    positions; the sign vector packs into an integer fingerprint. Two
    aggregations, both map-side-combinable."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    ps = tok.sparkSession.range(SIMHASH_BITS).select(F.col("id").cast("int").alias("p"))
    nibble = F.conv(F.md5(F.col("token")).substr(F.col("p") + 1, F.lit(1)), 16, 10).cast("int")
    bits = (
        tok.crossJoin(F.broadcast(ps))
        .select("doc_id", "p", F.when(nibble >= 8, F.lit(1)).otherwise(F.lit(-1)).alias("vote"))
        .groupBy("doc_id", "p")
        .agg(F.sum("vote").alias("s"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("p")).cast("long")).otherwise(F.lit(0))).alias("simhash")
    )
