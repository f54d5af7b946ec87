#!/usr/bin/env python3
"""Pure-Python xxHash64 (XXH64), from the public spec
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) —
an INDEPENDENT reimplementation used to cross-check the two
engine-pinned oracles (text_fingerprint, dedup_simhash) whose values
depend on Spark's `xxhash64` and which DuckDB cannot recompute.
Nothing here imports or shells to Spark: agreement between this file
and the engine is evidence, not circularity.

`xxh64(data, seed)` returns the UNSIGNED 64-bit digest;
`xxh64_signed` two's-complements it into the signed int64 Spark's
`xxhash64` column function yields.

Self-test: `python3 tools/xxhash64.py` checks the spec's published
vectors and a couple of pyspark-verified string vectors.
"""
MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc, inp):
    acc = (acc + inp * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge_round(acc, val):
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        i = 0
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK
        i = 0
    h = (h + n) & MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h, 27) * P1) + P4) & MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = ((_rotl(h, 23) * P2) + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 0) -> int:
    """Spark's xxhash64 column value: the digest as a SIGNED int64."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


if __name__ == "__main__":
    # public reference vectors (xxhsum -H1)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999
    # pyspark-verified vectors at Spark's default seed 42
    # (spark.sql("SELECT xxhash64('abc')") etc., Spark 4.1.2):
    assert xxh64_signed(b"abc", 42) == 1423657621850124518
    assert xxh64_signed(b"Spark", 42) == -4294468057691064905
    assert xxh64_signed(b"alpha beta gamma delta", 42) == -690752732395596498
    assert xxh64_signed(b"", 42) == -7444071767201028348
    print("xxhash64 self-test OK")
