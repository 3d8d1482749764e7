"""Multimodal pipeline query: documents.text → binary column → mapInPandas
"decode" → typed metadata. The Spark side exercises the REAL plumbing
(binary column, Arrow batches, Python worker decode); the oracle mirrors
the deterministic fake-decode arithmetic in SQL, so the whole path is
value-checked end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_sync_engine_spark.plans.registry import register
from stripe_sync_engine_spark.tables import load_table

_HEX = "0123456789abcdef"


@register(
    "mm_asset_profile",
    oracle=f"""
        WITH dims AS (
            SELECT doc_id, text,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(octet_length(encode(text)) % 640 AS BIGINT) AS src_w,
                   CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS src_h
            FROM documents
        )
        SELECT doc_id, n_bytes,
               CAST((strpos('{_HEX}', substr(md5(text), 1, 1)) - 1) * 16
                    + (strpos('{_HEX}', substr(md5(text), 2, 1)) - 1) AS INTEGER) AS content_sha,
               src_w, src_h,
               CASE WHEN src_w = 0 OR src_h = 0 THEN NULL
                    ELSE CAST(floor(src_w * least(1.0, 320.0 / src_w, 240.0 / src_h)) AS BIGINT) END AS out_w,
               CASE WHEN src_w = 0 OR src_h = 0 THEN NULL
                    ELSE CAST(floor(src_h * least(1.0, 320.0 / src_w, 240.0 / src_h)) AS BIGINT) END AS out_h,
               CASE WHEN src_w = 0 OR src_h = 0 THEN NULL
                    ELSE CAST(floor(src_w * least(1.0, 320.0 / src_w, 240.0 / src_h)) AS BIGINT)
                         * CAST(floor(src_h * least(1.0, 320.0 / src_w, 240.0 / src_h)) AS BIGINT) * 3 END AS out_bytes,
               CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
               CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
               CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS n_lower,
               CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS n_space,
               CAST(n_bytes
                    - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                    - (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                    - (length(text) - length(regexp_replace(text, '[a-z]', '', 'g')))
                    - (length(text) - length(regexp_replace(text, '[ ]', '', 'g'))) AS BIGINT) AS n_other
        FROM dims
    """,
    operators="TDP-multimodal,TDP-multimodal-resize,TDP-multimodal-features",
)
def mm_asset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset profile in ONE Arrow pass: decode metadata (byte count,
    content signature, source dims), keep-aspect resize planning, and the
    byte-class feature histogram — the folded form of the former
    mm_decode_meta / mm_resize / mm_features registry entries (same input
    scan, union of their oracles — a consolidation, not a coverage cut;
    stage parity is pytest-gated in tests/test_operators.py). One scan is
    a third of the I/O at 100 TB, and the pixel seam stays
    runtime-optional: PIL on the workers → real decoded dims, absent →
    the deterministic byte-length fake the oracle mirrors."""
    from stripe_sync_engine_spark.functions.multimodal import profile_assets

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return profile_assets(docs)


@register(
    "mm_media_probe",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 17 = 0 THEN NULL
                    WHEN doc_id % 6 = 0 THEN 'png'
                    WHEN doc_id % 6 = 1 THEN 'gif'
                    WHEN doc_id % 6 = 2 THEN 'bmp'
                    WHEN doc_id % 6 = 3 THEN 'jpeg'
                    WHEN doc_id % 6 = 4 THEN 'wav'
                    ELSE 'mp4' END AS format,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 = 4 THEN NULL
                    ELSE CAST(doc_id % 640 + 1 AS BIGINT) END AS width,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 = 4 THEN NULL
                    ELSE CAST(doc_id % 480 + 1 AS BIGINT) END AS height,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 <> 4 THEN NULL
                    ELSE CAST(1 AS BIGINT) END AS channels,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 <> 4 THEN NULL
                    WHEN doc_id % 4 = 0 THEN 8000
                    WHEN doc_id % 4 = 1 THEN 16000
                    WHEN doc_id % 4 = 2 THEN 22050
                    ELSE 44100 END AS sample_rate,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 <> 4 THEN NULL
                    ELSE CAST(16 AS BIGINT) END AS bits,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 <> 4 THEN NULL
                    ELSE CAST(doc_id % 96 + 32 AS BIGINT) END AS n_samples,
               CASE WHEN doc_id % 17 = 0 THEN NULL
                    WHEN doc_id % 6 = 4 THEN
                         CAST((doc_id % 96 + 32) * 1000.0 /
                         (CASE WHEN doc_id % 4 = 0 THEN 8000
                               WHEN doc_id % 4 = 1 THEN 16000
                               WHEN doc_id % 4 = 2 THEN 22050
                               ELSE 44100 END) AS DOUBLE)
                    WHEN doc_id % 6 = 5 THEN
                         CAST((doc_id % 5000 + 100) * 1000.0 /
                         (CASE WHEN doc_id % 4 = 0 THEN 600
                               WHEN doc_id % 4 = 1 THEN 1000
                               WHEN doc_id % 4 = 2 THEN 90000
                               ELSE 48000 END) AS DOUBLE)
                    ELSE NULL END AS duration_ms,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 <> 4 THEN NULL
                    ELSE CAST((doc_id % 1000 + 1) * 16 AS DOUBLE) END AS rms,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 <> 4 THEN NULL
                    ELSE CAST((doc_id % 1000 + 1) * 16 AS BIGINT) END AS peak,
               CASE WHEN doc_id % 17 = 0 OR doc_id % 6 <> 4 THEN NULL
                    ELSE CAST((doc_id % 96 + 31) // (doc_id % 7 + 2) AS BIGINT)
                    END AS zero_crossings
        FROM documents
    """,
    operators="TDP-multimodal-headers,TDP-multimodal-audio,TDP-multimodal-video",
)
def mm_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media-probe round-trip over a MIXED binary column (the r7
    extension of the former mm_header_decode entry — images unchanged,
    audio and video containers added): synthesize valid PNG/GIF/BMP/JPEG
    headers, complete 16-bit PCM WAV files, AND minimal ISO-BMFF (MP4)
    containers (format by doc_id % 6; dims, sample rate, length, mvhd
    timescale/duration, and a ±amp square wave all derived from doc_id)
    in one mapInPandas stage, then push them through the pure-stdlib
    prober (functions/multimodal.probe_media — no fake arithmetic; the
    MP4 branch walks the box tree for mvhd duration and the first video
    tkhd's 16.16 fixed-point dims). WAV rows are
    value-checked END TO END including the numpy DSP: a square wave of
    amplitude A with half-period P over n samples has RMS exactly A, peak
    A, and floor((n-1)/P) zero crossings — all integer-exact in float64,
    so the oracle states them in closed form. Every 17th payload is
    truncated to 5 bytes to prove the decoder-failure path yields NULL
    rows instead of failing the scan."""
    from stripe_sync_engine_spark.functions.multimodal import probe_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import struct

        import pandas as pd  # noqa: PLC0415 - worker-local import

        def payload(doc_id: int) -> bytes:
            w, h = doc_id % 640 + 1, doc_id % 480 + 1
            kind = doc_id % 6
            if kind == 0:
                raw = b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR" + struct.pack(">II", w, h)
            elif kind == 1:
                raw = b"GIF89a" + struct.pack("<HH", w, h)
            elif kind == 2:
                raw = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", w, h)
            elif kind == 3:
                raw = b"\xff\xd8\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03"
            elif kind == 4:
                rate = (8000, 16000, 22050, 44100)[doc_id % 4]
                n = doc_id % 96 + 32
                amp = (doc_id % 1000 + 1) * 16
                half = doc_id % 7 + 2
                pcm = b"".join(
                    struct.pack("<h", amp if (i // half) % 2 == 0 else -amp)
                    for i in range(n)
                )
                raw = (
                    b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                    + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data" + struct.pack("<I", len(pcm)) + pcm
                )
            else:
                # Minimal ISO-BMFF: ftyp + moov{mvhd v0, trak{tkhd v0}}.
                # mvhd body = ver/flags(4) ctime(4) mtime(4) TIMESCALE(4)
                # DURATION(4) + 80 filler; tkhd body = ver/flags(4) + 72
                # filler + 16.16 WIDTH/HEIGHT — the offsets the prober reads.
                ts = (600, 1000, 90000, 48000)[doc_id % 4]
                dur = doc_id % 5000 + 100
                ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0x200)
                mvhd_body = bytes(4) + struct.pack(">IIII", 0, 0, ts, dur) + bytes(80)
                mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
                tkhd_body = bytes(76) + struct.pack(">II", w << 16, h << 16)
                tkhd = struct.pack(">I", 8 + len(tkhd_body)) + b"tkhd" + tkhd_body
                trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
                moov = struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
                raw = ftyp + moov
            return raw[:5] if doc_id % 17 == 0 else raw

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": [payload(int(d)) for d in pdf["doc_id"]]}
            )

    built = docs.mapInPandas(build, schema="doc_id long, payload binary")
    return probe_media(built)


@register(
    "mm_frame_sample",
    oracle=f"""
        WITH f AS (
            SELECT doc_id, text,
                   unnest(generate_series(0, CAST(octet_length(encode(text)) // 64 AS INTEGER) - 1)) AS frame_idx
            FROM documents
            WHERE octet_length(encode(text)) >= 64
        )
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(frame_idx * 64 AS BIGINT) AS frame_off,
               CAST(64 AS BIGINT) AS frame_size,
               CAST((strpos('{_HEX}', substr(md5(substr(text, frame_idx * 64 + 1, 64)), 1, 1)) - 1) * 16
                    + (strpos('{_HEX}', substr(md5(substr(text, frame_idx * 64 + 1, 64)), 2, 1)) - 1) AS INTEGER) AS frame_sig
        FROM f
        WHERE frame_idx % 4 = 0
    """,
    operators="TDP-multimodal-frames",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: row-expanding mapInPandas (every 4th frame → one
    output row with byte extent + signature) — the ffmpeg frame-extract
    shape. ISO-BMFF payloads get REAL frame offsets/sizes from the
    stsz/stsc/stco sample-table walk (functions/multimodal, pytest
    round-trip on synthesized containers); this driver row feeds text
    payloads, exercising the fixed-64-byte framing the oracle mirrors
    over the ASCII text (bytes == chars for this corpus)."""
    from stripe_sync_engine_spark.functions.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return sample_frames(docs)


