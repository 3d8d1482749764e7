"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Why: the store's bucket assignment is ``pmod(xxhash64(cast(key as
string)), n_buckets)`` (storage.bucket_expr), computed JVM-side — so a
probe whose key VALUES are already known on the driver (a BM25 query's
terms, an ANN query's probed cell ids) still paid one Spark
collect job just to learn which buckets to read (r16 measured ~0.15-0.3s
of fixed job latency per probe, ×2-3 probes per indexed query). XXH64 is
a public, fully-specified algorithm (Collet's xxHash, the same function
Spark implements in ``XxHash64Function``); this module reimplements it
for the DRIVER-KNOWN-VALUE case only, letting those probes run in
microseconds with zero jobs. Distributed probes (window id sets) keep
the Spark path — collecting them would violate the bounded-driver rule.

Equivalence to the JVM expression is pinned by
``tests/test_operators.py::test_xxh64_matches_spark`` over ascii /
unicode / long / empty strings and integer casts; a mismatch here would
silently read the wrong buckets, which is why the test sweeps the
stripe (>= 32 bytes), 8/4/1-byte tail, and multi-block paths.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

#: Spark's fixed seed for the ``xxhash64`` SQL expression
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_str(value: str | int) -> int:
    """``F.xxhash64(F.col(c).cast("string"))`` for a driver-known value,
    as the SIGNED long Spark returns. Accepts str (hashed as UTF-8) and
    int (Spark's long→string cast is the decimal rendering, i.e.
    ``str(int)``); anything else must go through the JVM expression."""
    if isinstance(value, bool) or not isinstance(value, (str, int)):
        raise TypeError(
            f"driver-side xxhash64 supports str/int keys only (got "
            f"{type(value).__name__}); use the Spark expression"
        )
    h = xxh64(str(value).encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h
