"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_meta`` computes deterministic fake features from the raw
bytes behind the same UDF signature, schema, and batch shape a real
decoder (PIL/ffmpeg) would use — swap ``_fake_decode`` for the real
library call and nothing else changes. ``decode_real`` raises
NotImplementedError by design.

Scale shape: mapInPandas streams Arrow record batches through one Python
worker per partition — decode parallelism == partition count, bytes never
pass through the driver, and the pattern is identical at 100 TB (partition
sizing governed by spark.sql.files.maxPartitionBytes on the binary-file
source).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_META_SCHEMA = (
    "doc_id long, n_bytes long, content_sha int, fake_width long, fake_height long"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder. A real implementation
    would be: img = PIL.Image.open(io.BytesIO(payload)); return its size."""
    n = len(payload)
    digest = hashlib.md5(payload).digest()
    return {
        "n_bytes": n,
        "content_sha": digest[0],
        "fake_width": n % 640,
        "fake_height": (n * 7) % 480,
    }


def decode_real(payload: bytes) -> dict:  # pragma: no cover - by design
    raise NotImplementedError(
        "real image/audio decode requires PIL/ffmpeg, not present in this "
        "container; the Spark-side plumbing uses _fake_decode instead"
    )


def decode_binary_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """binary column → typed metadata rows via mapInPandas (Arrow batches)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(b) for b in pdf[bin_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(decode, schema=DECODED_META_SCHEMA)
