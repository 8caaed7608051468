"""HyperBitBit — Sedgewick's experimental 128+8-bit cardinality
estimator, single-stream only.

Semantics mirror the reference's experimental class
(``experimental/stream/cardinality/HyperBitBit.java:58-117``, itself
from Sedgewick's AC11 talk): per offered item with 64-bit murmur hash
``x``, bit index ``k = x & 63``; rank ``r = nlz(x >> 6) - 6``
(arithmetic shift, so a negative hash gives r = -6); if ``r > lgN``
set bit k of ``sketch``; if ``r > lgN + 1`` set bit k of ``sketch2``;
after EVERY offer, if ``popcount(sketch) > 31`` then ``sketch``
becomes ``sketch2``, ``sketch2`` clears, and ``lgN`` increments.
Estimate = ``2 ** (lgN + 5.4 + popcount(sketch) / 32)``.

Why this is NOT a distributed aggregate (and not a ``SketchSpec``
kind): the state transition depends on arrival ORDER (the reference's
own header warns that re-offering an element can change the state) and
two HBB states cannot be merged — the reference's ``merge`` throws
unconditionally (``HyperBitBit.java:131-134``).  A non-mergeable,
order-sensitive state cannot ride the two-level partition merge every
other sketch here uses, so this class is offered as what it is: a
sequential single-stream estimator (use per-partition via
``mapPartitions`` for *per-partition* estimates, or just use HLL —
which this algorithm aims to beat but, per its own header, does not
yet).  Implemented from the published algorithm; state-parity-tested
against the javac-compiled reference class on identical streams.

The update is chunk-vectorized but EXACT: within a chunk at fixed
``lgN``, candidate bits accumulate via a cumulative-OR matrix and the
first popcount-crossing splits the chunk, reproducing the sequential
semantics bit-for-bit (including back-to-back swaps when ``sketch2``
itself arrives with more than 31 bits).
"""

from __future__ import annotations

import numpy as np

from ..hashing import murmur64a_array, murmur64a_int64
from .base import SketchMergeError

U64 = np.uint64

_M1 = U64(0x5555555555555555)
_M2 = U64(0x3333333333333333)
_M4 = U64(0x0F0F0F0F0F0F0F0F)
_H01 = U64(0x0101010101010101)


def _popcount_u64(v: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array (numpy<2 has no bitwise_count)."""
    v = v - ((v >> U64(1)) & _M1)
    v = (v & _M2) + ((v >> U64(2)) & _M2)
    v = (v + (v >> U64(4))) & _M4
    return (v * _H01) >> U64(56)


def _nlz_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros via OR-smear + popcount."""
    v = v.copy()
    for s in (1, 2, 4, 8, 16, 32):
        v |= v >> U64(s)
    return U64(64) - _popcount_u64(v)


def _popcount_scalar(x: int) -> int:
    return bin(x & 0xFFFFFFFFFFFFFFFF).count("1")


class HyperBitBit:
    """See module docstring.  State: (lgN, sketch, sketch2)."""

    def __init__(self) -> None:
        self.lgN = 5
        self.sketch = 0  # python ints, masked to 64 bits
        self.sketch2 = 0

    # ------------------------------------------------------ updates

    def update_hashed(self, hashes: np.ndarray) -> "HyperBitBit":
        """Fold pre-hashed int64 values, in order."""
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return self
        k = (h.view(U64) & U64(63)).astype(np.int64)
        # arithmetic shift then unsigned clz, exactly the Java expression
        r = (_nlz_u64((h >> 6).view(U64)).astype(np.int64)) - 6
        i, n = 0, len(h)
        while i < n:
            if _popcount_scalar(self.sketch) > 31:
                # the per-offer check fires even when no bit is set:
                # consume ONE item then swap (handles a sketch2 that
                # arrived with >31 bits — the next offer swaps again)
                if r[i] > self.lgN:
                    self.sketch |= 1 << int(k[i])
                if r[i] > self.lgN + 1:
                    self.sketch2 |= 1 << int(k[i])
                self.sketch, self.sketch2 = self.sketch2 & 0xFFFFFFFFFFFFFFFF, 0
                self.lgN += 1
                i += 1
                continue
            sel = np.flatnonzero(r[i:] > self.lgN) + i
            if sel.size == 0:
                # no sketch bit can be set at this lgN -> no crossing
                # possible; sketch2 bits still accumulate
                sel2 = np.flatnonzero(r[i:] > self.lgN + 1) + i
                for j in np.unique(k[sel2]):
                    self.sketch2 |= 1 << int(j)
                break
            # cumulative sketch state over the candidate items only
            onehot = np.zeros((sel.size, 64), dtype=bool)
            onehot[np.arange(sel.size), k[sel]] = True
            base = np.array(
                [(self.sketch >> b) & 1 for b in range(64)], dtype=bool)
            cum = np.logical_or.accumulate(onehot | base, axis=0)
            popc = cum.sum(axis=1)
            cross = np.flatnonzero(popc > 31)
            if cross.size == 0:
                end = n  # whole remainder folds at this lgN
                last = sel.size - 1
            else:
                last = cross[0]
                end = int(sel[last]) + 1  # swap happens AFTER this item
            bits = np.flatnonzero(cum[last])
            s = self.sketch
            for b in bits:
                s |= 1 << int(b)
            sel2 = np.flatnonzero(r[i:end] > self.lgN + 1) + i
            for j in np.unique(k[sel2]):
                self.sketch2 |= 1 << int(j)
            self.sketch = s & 0xFFFFFFFFFFFFFFFF
            if cross.size > 0:
                self.sketch, self.sketch2 = self.sketch2, 0
                self.lgN += 1
            i = end
        return self

    def update(self, values: np.ndarray) -> "HyperBitBit":
        """Hash (strings via Murmur64A, matching the reference's
        ``MurmurHash.hash64``) and fold, in order."""
        arr = np.asarray(values)
        if arr.dtype.kind in ("i", "u"):
            hashes = murmur64a_int64(arr.astype(np.int64, copy=False))
        else:
            hashes = murmur64a_array(arr)
        return self.update_hashed(hashes)

    # ------------------------------------------------------ queries

    def cardinality(self) -> float:
        return float(
            2.0 ** (self.lgN + 5.4 + _popcount_scalar(self.sketch) / 32.0))

    def merge(self, other: "HyperBitBit") -> "HyperBitBit":
        raise SketchMergeError(
            "HyperBitBit state is order-sensitive and non-mergeable "
            "(the reference's merge throws unconditionally, "
            "HyperBitBit.java:131-134) — use HLL for distributed "
            "cardinality; this estimator is single-stream only")
