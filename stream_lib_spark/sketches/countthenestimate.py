"""CountThenEstimate — exact until a tipping point, then sketch.

Rebuild of ``cardinality/CountThenEstimate.java:43-317``: keeps the
exact set of 64-bit item hashes until ``tipping_point`` distinct values,
then tips into HLL++ (``CountThenEstimate.java:130-168`` tips into the
configured estimator).  Merge (``:158-168``): union exact sets; tip when
the union crosses the threshold; exact×tipped folds the exact hashes
into the sketch.

While un-tipped the state is exactly associative (sorted uint64 set
union → byte-identical under any grouping); after tipping it inherits
HLL++'s monoid properties.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import HEADER_SIZE, SketchMergeError, pack_header, unpack_header
from .hll import HllPlusPlus

KIND_CTE = 10

U64 = np.uint64


class CountThenEstimate:
    def __init__(self, tipping_point: int = 1000, p: int = 14, sp: int = 25):
        self.tipping_point = tipping_point
        self.p = p
        self.sp = sp
        self.exact: np.ndarray | None = np.empty(0, dtype=U64)  # None once tipped
        self.sketch: HllPlusPlus | None = None

    @property
    def tipped(self) -> bool:
        return self.exact is None

    def update_hashed(self, hashes: np.ndarray) -> "CountThenEstimate":
        h = hashes.view(U64) if hashes.dtype == np.int64 else hashes.astype(U64, copy=False)
        if self.tipped:
            self.sketch.update_hashed(h)
            return self
        self.exact = np.unique(np.concatenate([self.exact, h]))
        if len(self.exact) > self.tipping_point:
            self._tip()
        return self

    def _tip(self) -> None:
        sk = HllPlusPlus.new(p=self.p, sp=self.sp)
        sk.update_hashed(self.exact)
        self.sketch = sk
        self.exact = None

    def cardinality(self) -> float:
        if self.tipped:
            return self.sketch.cardinality()
        return float(len(self.exact))

    def merge(self, other: "CountThenEstimate") -> "CountThenEstimate":
        if (self.tipping_point, self.p, self.sp) != (other.tipping_point, other.p, other.sp):
            raise SketchMergeError("CountThenEstimate parameter mismatch")
        if not self.tipped and not other.tipped:
            self.exact = np.unique(np.concatenate([self.exact, other.exact]))
            if len(self.exact) > self.tipping_point:
                self._tip()
            return self
        if not self.tipped:
            self._tip()
        if other.tipped:
            self.sketch.merge(other.sketch)
        else:
            self.sketch.update_hashed(other.exact)
        return self

    def to_bytes(self) -> bytes:
        head = pack_header(KIND_CTE) + struct.pack(
            "<IBBB", self.tipping_point, self.p, self.sp, 1 if self.tipped else 0
        )
        if self.tipped:
            return head + self.sketch.to_bytes()
        return head + struct.pack("<I", len(self.exact)) + self.exact.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountThenEstimate":
        _, kind = unpack_header(data)
        if kind != KIND_CTE:
            raise ValueError(f"not a CountThenEstimate blob (kind={kind})")
        tip, p, sp, tipped = struct.unpack_from("<IBBB", data, HEADER_SIZE)
        off = HEADER_SIZE + struct.calcsize("<IBBB")
        sk = cls(tipping_point=tip, p=p, sp=sp)
        if tipped:
            sk.exact = None
            sk.sketch = HllPlusPlus.from_bytes(data[off:])
        else:
            (n,) = struct.unpack_from("<I", data, off)
            sk.exact = np.frombuffer(data, dtype=U64, count=n, offset=off + 4).copy()
        return sk
