"""Count-Min Sketch (plain + conservative update) over numpy state.

Matches the reference's parameterization and guarantees
(``frequency/CountMinSketch.java:35-351``):

- dims from accuracy: ``w = ceil(2/eps)``, ``d = ceil(-log(1-conf)/log(2))``
  (``CountMinSketch.java:59-67``) so the point-query error is at most
  ``eps * N`` with probability ``conf = 1 - 2^-d``;
- point query = min over rows (``CountMinSketch.java:192-228``);
- merge = element-wise sum, requiring identical (d, w, seed)
  (``CountMinSketch.java:260-296``) — exactly associative, so merged
  state is byte-identical under any grouping.

Row hashing: instead of the reference's per-row ``(a_i*x mod 2^31-1)``
family with RNG-drawn ``a_i`` (``CountMinSketch.java:72-77,166-175``) we
derive the ``d`` row buckets from one 64-bit item hash via the standard
double-hashing construction ``h1 + i*h2 mod w`` (Kirsch–Mitzenmacher;
the same construction the reference itself uses for Bloom buckets,
``membership/Filter.java:79-87``).  Seeds derive deterministically from
``seed`` via splitmix64 so all partitions agree (mandatory for merge
validity, ``CountMinSketch.java:277-279``).

Conservative update (``frequency/ConservativeAddSketch.java:25-83``):
``table[i][b_i] = max(table[i][b_i], min_j table[j][b_j] + c)``.
Vectorized per Arrow batch by first summing counts per distinct key
(exact within the batch), then one gather-min / scatter-max pass.
Batch-parallel application can only make estimates *smaller* than the
sequential reference while still never undercounting (the max-write
keeps every row >= the key's true post-batch count), so the eps/delta
contract is preserved; update-order dependence is inherent to
conservative CMS and is documented in SURVEY.md §7.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from ..hashing import splitmix64
from .base import HEADER_SIZE, KIND_CMS, SketchMergeError, pack_header, unpack_header

U64 = np.uint64


def dims_from_accuracy(eps: float, confidence: float) -> tuple[int, int]:
    """(depth, width) from eps/confidence, same formulas as
    ``CountMinSketch.java:59-67``."""
    width = int(math.ceil(2.0 / eps))
    depth = int(math.ceil(-math.log(1.0 - confidence) / math.log(2.0)))
    return depth, width


@dataclass
class CountMinSketch:
    depth: int
    width: int
    seed: int = 7364181  # the reference tests' favorite seed
    conservative: bool = False
    table: np.ndarray | None = None  # int64[depth, width]
    size: int = 0  # total count added (CountMinSketch.java `size`)

    def __post_init__(self):
        if self.table is None:
            self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    @classmethod
    def from_accuracy(cls, eps: float, confidence: float, seed: int = 7364181,
                      conservative: bool = False) -> "CountMinSketch":
        d, w = dims_from_accuracy(eps, confidence)
        return cls(depth=d, width=w, seed=seed, conservative=conservative)

    @property
    def eps(self) -> float:
        return 2.0 / self.width

    @property
    def confidence(self) -> float:
        return 1.0 - 2.0 ** -self.depth

    # ---------------------------------------------------------------- buckets

    def _buckets(self, hashes: np.ndarray) -> np.ndarray:
        """(d, n) int64 bucket indices from 64-bit item hashes via
        seeded double hashing."""
        h = hashes.view(U64) if hashes.dtype == np.int64 else hashes.astype(U64, copy=False)
        s1, s2 = splitmix64(np.array([self.seed, self.seed + 1], dtype=np.int64).view(U64))
        with np.errstate(over="ignore"):
            h1 = splitmix64(h ^ s1)
            h2 = splitmix64(h ^ s2) | U64(1)  # odd → full-period stepping
            rows = np.arange(self.depth, dtype=U64)[:, None]
            combined = h1[None, :] + rows * h2[None, :]
        return (combined % U64(self.width)).astype(np.int64)

    # ---------------------------------------------------------------- update

    def update_hashed(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> "CountMinSketch":
        """Add a batch of pre-hashed items.  ``counts`` defaults to 1
        each.  Duplicates within the batch are first combined exactly."""
        h = hashes.view(U64) if hashes.dtype == np.int64 else hashes.astype(U64, copy=False)
        if counts is None:
            counts = np.ones(len(h), dtype=np.int64)
        uniq, inv = np.unique(h, return_inverse=True)
        c = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(c, inv, counts)
        b = self._buckets(uniq)  # (d, n_uniq)
        if self.conservative:
            current = self.table[np.arange(self.depth)[:, None], b]  # (d, n)
            new_val = current.min(axis=0) + c  # (n,)
            for i in range(self.depth):
                np.maximum.at(self.table[i], b[i], new_val)
        else:
            for i in range(self.depth):
                np.add.at(self.table[i], b[i], c)
        self.size += int(counts.sum())
        return self

    # ---------------------------------------------------------------- query

    def estimate_hashed(self, hashes: np.ndarray) -> np.ndarray:
        b = self._buckets(np.asarray(hashes))
        return self.table[np.arange(self.depth)[:, None], b].min(axis=0)

    # ---------------------------------------------------------------- merge

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width, self.seed) != (other.depth, other.width, other.seed):
            raise SketchMergeError("CMS depth/width/seed mismatch — cannot merge")
        if self.conservative != other.conservative:
            # mixed flags would make the merged flag (and future update
            # behavior + bytes) depend on merge order
            raise SketchMergeError("CMS conservative-flag mismatch — cannot merge")
        # Merge is plain + even for conservative sketches (the reference
        # has no conservative merge either; sum preserves no-undercount).
        self.table += other.table
        self.size += other.size
        return self

    # ---------------------------------------------------------------- bytes

    def to_bytes(self) -> bytes:
        head = pack_header(KIND_CMS) + struct.pack(
            "<IIqqB", self.depth, self.width, self.seed, self.size,
            1 if self.conservative else 0,
        )
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        _, kind = unpack_header(data)
        if kind != KIND_CMS:
            raise ValueError(f"not a CMS blob (kind={kind})")
        depth, width, seed, size, cons = struct.unpack_from("<IIqqB", data, HEADER_SIZE)
        off = HEADER_SIZE + struct.calcsize("<IIqqB")
        table = np.frombuffer(data, dtype=np.int64, count=depth * width, offset=off)
        return cls(depth=depth, width=width, seed=seed, conservative=bool(cons),
                   table=table.reshape(depth, width).copy(), size=size)
