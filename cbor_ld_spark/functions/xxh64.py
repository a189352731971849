"""Pure-Python XXH64 bit-compatible with Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(c1, c2, ...)`` chains: the running hash starts at
seed 42 and each non-null column re-seeds the next primitive hash —
strings via the full XXH64 byte algorithm over UTF-8, int32 via the
4-byte finalizer, int64 via the 8-byte finalizer (JVM:
org.apache.spark.sql.catalyst.expressions.XxHash64 +
org.apache.spark.sql.catalyst.expressions.XXH64).

Purpose: *data-trained DuckDB oracles*.  The dedup family (MinHash /
SimHash / LSH) hashes with xxhash64 JVM-side, which DuckDB lacks; this
module lets the oracle generator compute the expected signatures
driver-side at oracle-build time and emit them as SQL literals, turning
the dedup queries from rows-only checks into value-verified ones.
Results are Java signed longs (two's complement), matching both the
Spark column values and their ``cast("string")`` forms.
"""

from __future__ import annotations

PRIME_1 = _P1 = 0x9E3779B185EBCA87
PRIME_2 = _P2 = 0xC2B2AE3D27D4EB4F
PRIME_3 = _P3 = 0x165667B19E3779F9
PRIME_4 = _P4 = 0x85EBCA77C2B2AE63
PRIME_5 = _P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Reference XXH64 over bytes -> unsigned 64-bit int."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            k1 = int.from_bytes(data[i:i + 8], "little")
            k2 = int.from_bytes(data[i + 8:i + 16], "little")
            k3 = int.from_bytes(data[i + 16:i + 24], "little")
            k4 = int.from_bytes(data[i + 24:i + 32], "little")
            v1 = (_rotl((v1 + k1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + k2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + k3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + k4 * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k1 * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int32(value: int, seed: int) -> int:
    """XXH64 4-byte finalizer (Spark XXH64.hashInt) -> unsigned."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_int64(value: int, seed: int) -> int:
    """XXH64 8-byte finalizer (Spark XXH64.hashLong) -> unsigned."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def spark_xxhash64(*values) -> int:
    """Replicate ``F.xxhash64(*cols)`` for str/int32/int64 inputs.

    Python ints are treated as Spark IntegerType when they fit in 32
    bits (matching ``F.lit``'s inference) unless passed as
    ``("long", v)``; strings hash their UTF-8 bytes.  Returns the Java
    signed long Spark produces.
    """
    h = SPARK_SEED
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple) and v[0] == "long":
            h = xxh64_int64(v[1] & _M, h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = xxh64_bytes(v, h)
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = xxh64_int32(v & 0xFFFFFFFF, h)
            else:
                h = xxh64_int64(v & _M, h)
        else:
            raise TypeError(f"unsupported xxhash64 input type {type(v)}")
    return _signed(h)
