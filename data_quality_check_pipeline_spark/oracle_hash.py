"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression semantics.

Implements the public XXH64 algorithm (Cyan4973/xxHash spec; Spark's
catalyst XXH64.java is a line-for-line Java port of it) plus Spark's
multi-column chaining rule: ``xxhash64(c1, c2, ...)`` starts from seed 42
and feeds each column's hash as the seed of the next; array columns fold
element-wise the same way.

This is the INDEPENDENT reference used to precompute goldens for the
signature-based dedup queries (minhash/simhash), giving them a DuckDB-
checkable oracle even though DuckDB itself has no xxhash64. Parity with
the engine is asserted in tests/test_parity.py against F.xxhash64 for
longs, strings and string arrays.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    x &= _M
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h &= _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_long(value: int, seed: int) -> int:
    """XXH64.hashLong (one 8-byte block). value/seed are signed longs."""
    v = value & _M
    h = (seed & _M) + _P5 + 8
    h ^= _rotl((v * _P2) & _M, 31) * _P1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _to_signed(_fmix(h))


def hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt (one 4-byte block)."""
    h = (seed & _M) + _P5 + 4
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _to_signed(_fmix(h))


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte stream (Spark hashes strings as UTF-8 bytes)."""
    n = len(data)
    seed &= _M
    if n >= 32:
        acc = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed,
            (seed - _P1) & _M,
        ]
        i = 0
        while i <= n - 32:
            for j in range(4):
                w = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                acc[j] = (_rotl((acc[j] + w * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (
            _rotl(acc[0], 1) + _rotl(acc[1], 7)
            + _rotl(acc[2], 12) + _rotl(acc[3], 18)
        ) & _M
        for v in acc:
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h & _M) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i <= n - 8:
        w = int.from_bytes(data[i:i + 8], "little")
        h ^= _rotl((w * _P2) & _M, 31) * _P1 & _M
        h = (_rotl(h & _M, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        w = int.from_bytes(data[i:i + 4], "little")
        h ^= (w * _P1) & _M
        h = (_rotl(h & _M, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h & _M, 11) * _P1) & _M
        i += 1
    return _to_signed(_fmix(h))


def spark_xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """Spark ``F.xxhash64(*cols)``: fold each value's hash into the seed of
    the next, starting at 42. Supports the types the engine hashes:
    int (IntegerType), 'long:'-tagged ints are not needed — Python ints
    are hashed as LONG unless wrapped in Int32; str (UTF-8 bytes); list
    (element-wise fold); None (skipped, Spark semantics)."""
    h = seed
    for v in values:
        h = _fold(v, h)
    return h


class Int32(int):
    """Marker for IntegerType literals (e.g. F.lit(i))."""


def _fold(v, h: int) -> int:
    if v is None:
        return h  # null columns leave the running hash unchanged
    if isinstance(v, Int32):
        return hash_int(int(v), h)
    if isinstance(v, bool):
        raise TypeError("bool hashing not needed/implemented")
    if isinstance(v, int):
        return hash_long(v, h)
    if isinstance(v, str):
        return hash_bytes(v.encode("utf-8"), h)
    if isinstance(v, (list, tuple)):
        for e in v:
            h = _fold(e, h)
        return h
    raise TypeError(f"unsupported type {type(v)}")
