"""Vectorized 64-bit hashing over numpy arrays.

The reference (addthis/stream-lib) dispatches every item through
MurmurHash (``hash/MurmurHash.java:135-217`` — MurmurHash64A, seed
``0xe17a1465``).  We re-implement MurmurHash64A *vectorized* over numpy
so that identical string inputs hash to identical 64-bit values,
which lets the statistical contracts (HLL register distribution, CMS
row hashes) line up with the reference's published behaviour.  The
implementation below is written from the public MurmurHash64A
specification (Austin Appleby, public domain), not translated from the
reference source.

Also provides splitmix64 (Steele et al., public domain) for deriving
deterministic per-row hash seeds (CMS rows, Bloom double hashing).

All arithmetic is modulo 2**64 via ``np.uint64``; numpy overflow
warnings are intentionally suppressed inside these kernels.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

MURMUR64_DEFAULT_SEED = np.uint64(0xE17A1465)  # matches MurmurHash.java:136
_M = np.uint64(0xC6A4A7935BD1E995)
_R = np.uint64(47)


def _u64(x: int) -> np.uint64:
    return np.uint64(x & 0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """SplitMix64 finalizer — deterministic seed derivation."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=U64) + U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
        z = z ^ (z >> U64(31))
    return z


def murmur64a_bytes(data: bytes, seed: int | np.uint64 = MURMUR64_DEFAULT_SEED) -> int:
    """Scalar MurmurHash64A of one byte string (reference semantics:
    ``MurmurHash.java:170-217`` with UTF-8 encoding standardized).

    Returns a Python int in [0, 2**64).
    """
    with np.errstate(over="ignore"):
        length = len(data)
        h = (U64(seed) & U64(0xFFFFFFFFFFFFFFFF)) ^ (U64(length) * _M)
        n_blocks = length // 8
        if n_blocks:
            blocks = np.frombuffer(data[: n_blocks * 8], dtype="<u8")
            for k in blocks:
                k = k * _M
                k ^= k >> _R
                k = k * _M
                h ^= k
                h = h * _M
        tail = data[n_blocks * 8 :]
        if tail:
            t = U64(0)
            for i in range(len(tail) - 1, -1, -1):
                t = (t << U64(8)) | U64(tail[i])
            h ^= t
            h = h * _M
        h ^= h >> _R
        h = h * _M
        h ^= h >> _R
    return int(h)


def murmur64a_array(strings: np.ndarray, seed: int | np.uint64 = MURMUR64_DEFAULT_SEED) -> np.ndarray:
    """Vectorized MurmurHash64A over an object array of str/bytes.

    Groups inputs by byte length so each group is processed as a dense
    ``(n, L)`` uint8 matrix with fully vectorized 8-byte block mixing.
    Returns uint64 array of the same shape.
    """
    n = len(strings)
    out = np.zeros(n, dtype=U64)
    if n == 0:
        return out
    enc = np.array(
        [s if isinstance(s, bytes) else ("" if s is None else str(s)).encode("utf-8") for s in strings],
        dtype=object,
    )
    lengths = np.array([len(b) for b in enc], dtype=np.int64)
    with np.errstate(over="ignore"):
        for L in np.unique(lengths):
            idx = np.nonzero(lengths == L)[0]
            if L == 0:
                h = U64(seed) ^ U64(0)
                h ^= h >> _R
                h = h * _M
                h ^= h >> _R
                out[idx] = h
                continue
            buf = np.frombuffer(b"".join(enc[idx]), dtype=np.uint8).reshape(len(idx), L)
            out[idx] = _murmur64a_fixed(buf, int(L), seed)
    return out


def _murmur64a_fixed(buf: np.ndarray, length: int, seed: int | np.uint64) -> np.ndarray:
    """MurmurHash64A over an (n, length) uint8 matrix, vectorized."""
    n = buf.shape[0]
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        init = U64(seed) ^ (U64(length) * _M)
    h = np.full(n, init, dtype=U64)
    n_blocks = length // 8
    if n_blocks:
        blocks = buf[:, : n_blocks * 8].copy().view("<u8")  # (n, n_blocks)
        for j in range(n_blocks):
            k = blocks[:, j] * _M
            k ^= k >> _R
            k *= _M
            h ^= k
            h *= _M
    tail_len = length - n_blocks * 8
    if tail_len:
        t = np.zeros(n, dtype=U64)
        for i in range(tail_len - 1, -1, -1):
            t = (t << U64(8)) | buf[:, n_blocks * 8 + i].astype(U64)
        h ^= t
        h *= _M
    h ^= h >> _R
    h *= _M
    h ^= h >> _R
    return h


def murmur64a_int64(values: np.ndarray, seed: int | np.uint64 = MURMUR64_DEFAULT_SEED) -> np.ndarray:
    """MurmurHash64A of int64 values serialized as 8 little-endian bytes.
    Fully vectorized single-block path.

    NOTE: this is a fast numeric hash, NOT reference parity for numeric
    inputs — the reference's ``hash64(Object)`` routes ``Long`` through
    ``toString()`` (``MurmurHash.java:135-146`` falls through to the
    string overload).  The murmur parity mode in ``agg.py`` is
    unaffected: it casts items to string before hashing.
    """
    with np.errstate(over="ignore"):
        k = values.astype(np.int64).view(U64) * _M
        k ^= k >> _R
        k *= _M
        h = np.full(len(values), U64(seed) ^ (U64(8) * _M), dtype=U64)
        h ^= k
        h *= _M
        h ^= h >> _R
        h *= _M
        h ^= h >> _R
    return h


def clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array, exact, vectorized (no float)."""
    x = x.astype(U64, copy=True)
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        su = U64(s)
        small = (x >> U64(64 - s)) == 0
        n += np.where(small, s, 0)
        with np.errstate(over="ignore"):
            x = np.where(small, x << su, x)
    # x == 0 originally → all steps matched → n == 63; bump to 64
    n += (x >> U64(63)) == 0
    return n


def murmur64a_chunked(data: np.ndarray, offsets: np.ndarray,
                      seed: int | np.uint64 = MURMUR64_DEFAULT_SEED) -> np.ndarray:
    """MurmurHash64A over variable-length byte strings given as Arrow
    buffers: ``data`` = concatenated UTF-8 bytes (uint8), ``offsets`` =
    int offsets of length n+1.  Zero per-row Python: rows are grouped by
    byte length and each group is hashed as a dense (n, L) uint8 matrix
    gathered straight from the Arrow data buffer."""
    offsets = offsets.astype(np.int64, copy=False)
    starts, lengths = offsets[:-1], np.diff(offsets)
    n = len(starts)
    out = np.zeros(n, dtype=U64)
    if n == 0:
        return out
    with np.errstate(over="ignore"):
        for L in np.unique(lengths):
            sel = np.nonzero(lengths == L)[0]
            if L == 0:
                h = U64(seed) ^ U64(0)
                h ^= h >> _R
                h = h * _M
                h ^= h >> _R
                out[sel] = h
                continue
            # vectorized gather: (n_sel, L) matrix from the flat buffer
            buf = data[starts[sel][:, None] + np.arange(L, dtype=np.int64)[None, :]]
            out[sel] = _murmur64a_fixed(buf, int(L), seed)
    return out


# ---------------------------------------------------------------------------
# XXH64 (Spark ``xxhash64`` parity) — written from the public xxHash
# specification (Yann Collet, BSD 2-clause).  Spark's ``F.xxhash64`` over
# a LongType column hashes each value's 8-byte little-endian encoding
# with seed 42; bit parity with the JVM is pinned by
# tests/test_direct_scan.py (golden literals + random fuzz).

_XXP1 = U64(0x9E3779B185EBCA87)
_XXP2 = U64(0xC2B2AE3D27D4EB4F)
_XXP3 = U64(0x165667B19E3779F9)
_XXP4 = U64(0x85EBCA77C2B2AE63)
_XXP5 = U64(0x27D4EB2F165667C5)

SPARK_XXHASH64_SEED = 42  # Spark's default seed for xxhash64/hash exprs


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    ru = U64(r)
    return (x << ru) | (x >> (U64(64) - ru))


def xxhash64_long(values: np.ndarray, seed: int | np.uint64 = SPARK_XXHASH64_SEED) -> np.ndarray:
    """Vectorized XXH64 of each int64 value (8-byte little-endian input,
    i.e. exactly what Spark's ``xxhash64(longCol)`` computes).  Returns
    int64 (Spark's signed representation)."""
    with np.errstate(over="ignore"):
        x = np.asarray(values).astype(np.int64, copy=False).view(U64)
        h = U64(int(seed) & 0xFFFFFFFFFFFFFFFF) + _XXP5 + U64(8)
        k1 = _rotl64(x * _XXP2, 31) * _XXP1
        h = _rotl64(h ^ k1, 27) * _XXP1 + _XXP4
        h ^= h >> U64(33)
        h *= _XXP2
        h ^= h >> U64(29)
        h *= _XXP3
        h ^= h >> U64(32)
    return h.view(np.int64)
