"""t-digest wire interop — the reference's VERBOSE and SMALL encodings
(``quantile/TDigest.java:366-426``), for migrating serialized digests
to/from JVM stream-lib.

    VERBOSE: i32 1 | f64 compression | i32 n | n×f64 means | n×i32 counts
    SMALL:   i32 2 | f64 compression | i32 n | n×f32 mean deltas
             (cumulative, decoded with double += float) | n×7-bit varint counts
    (all big-endian, ByteBuffer defaults)

Note the reference digest itself is RNG-dependent (its add() path
samples), so identical INPUT never guarantees identical centroids
across implementations — the interop contract is: parse any reference
blob into an equivalent digest (same centroids ⇒ same quantile
behavior), re-serialize it byte-exactly, and export our deterministic
digests in a form the reference can read.  Golden-tested in
``tests/test_tdigest_wire.py`` against javac-compiled reference output.
"""

from __future__ import annotations

import struct

import numpy as np

from .tdigest import TDigest

VERBOSE_ENCODING = 1
SMALL_ENCODING = 2


def _read_varint(data: bytes, off: int) -> tuple[int, int]:
    z, shift = 0, 0
    while True:
        b = data[off]
        off += 1
        z += (b & 0x7F) << shift
        if not b & 0x80:
            return z, off
        shift += 7


def _write_varint(out: bytearray, n: int) -> None:
    while n > 0x7F:
        out.append(0x80 | (n & 0x7F))
        n >>= 7
    out.append(n)


def from_reference_bytes(data: bytes) -> TDigest:
    (enc,) = struct.unpack_from(">i", data, 0)
    (compression,) = struct.unpack_from(">d", data, 4)
    (n,) = struct.unpack_from(">i", data, 12)
    off = 16
    if enc == VERBOSE_ENCODING:
        means = np.frombuffer(data, dtype=">f8", count=n, offset=off).astype(np.float64)
        off += 8 * n
        counts = np.frombuffer(data, dtype=">i4", count=n, offset=off).astype(np.float64)
    elif enc == SMALL_ENCODING:
        deltas = np.frombuffer(data, dtype=">f4", count=n, offset=off).astype(np.float64)
        means = np.cumsum(deltas)  # double += float, same sequential sums
        off += 4 * n
        counts = np.empty(n, dtype=np.float64)
        for i in range(n):
            c, off = _read_varint(data, off)
            counts[i] = c
    else:
        raise ValueError(f"unknown t-digest encoding {enc}")
    td = TDigest(compression=compression)
    td.means = means
    td.weights = counts
    td.total = float(counts.sum())
    if n:
        td.vmin, td.vmax = float(means[0]), float(means[-1])
    return td


def to_reference_bytes(td: TDigest, small: bool = False) -> bytes:
    counts = np.rint(td.weights).astype(np.int64)
    if not np.allclose(counts, td.weights):
        raise ValueError("t-digest weights are not integral — cannot export counts")
    out = bytearray()
    if small:
        out += struct.pack(">idi", SMALL_ENCODING, td.compression, len(td.means))
        x = 0.0
        for m in td.means.tolist():
            out += struct.pack(">f", m - x)
            x += np.float64(np.float32(m - x))
        for c in counts.tolist():
            _write_varint(out, int(c))
    else:
        out += struct.pack(">idi", VERBOSE_ENCODING, td.compression, len(td.means))
        out += td.means.astype(">f8").tobytes()
        out += counts.astype(">i4").tobytes()
    return bytes(out)
