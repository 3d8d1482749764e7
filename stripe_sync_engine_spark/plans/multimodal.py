"""Multimodal pipeline query: documents.text → binary column → mapInPandas
"decode" → typed metadata. The Spark side exercises the REAL plumbing
(binary column, Arrow batches, Python worker decode); the oracle mirrors
the deterministic fake-decode arithmetic in SQL, so the whole path is
value-checked end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_sync_engine_spark.functions.multimodal import decode_binary_meta
from stripe_sync_engine_spark.plans.registry import register
from stripe_sync_engine_spark.tables import load_table

_HEX = "0123456789abcdef"


@register(
    "mm_decode_meta",
    oracle=f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST((strpos('{_HEX}', substr(md5(text), 1, 1)) - 1) * 16
                    + (strpos('{_HEX}', substr(md5(text), 2, 1)) - 1) AS INTEGER) AS content_sha,
               CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
               CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS fake_height
        FROM documents
    """,
    operators="TDP-multimodal",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode plumbing: encode text → binary payload column →
    Arrow-batched mapInPandas decode → metadata. The decode itself is a
    deterministic stub (see functions/multimodal.py); the Spark plan is
    the production shape."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_binary_meta(docs)
