"""HyperLogLog / HyperLogLog++ as a mergeable numpy-state sketch.

Semantics follow the reference:

- dense update ``M[idx] = max(M[idx], rho)`` with ``idx = h >> (64-p)``
  and ``rho = nlz((h << p) | 1 << (p-1)) + 1``
  (``cardinality/HyperLogLogPlus.java:302-311``,
  ``cardinality/RegisterSet.java:71-85``) — here vectorized as
  ``np.maximum.at`` over uint8 registers;
- sparse mode keeps an exact sorted set of ``(idx_sp, rho_rest)`` codes
  at sparse precision ``sp`` and linear-counts over ``2^sp`` buckets
  (``HyperLogLogPlus.java:412-435,489-527``), converting to dense once
  the set outgrows ``0.75·m`` entries (``HyperLogLogPlus.java:246,767``);
- merge: dense×dense = element-wise max; sparse×sparse = set union with
  per-index max run length; mixed = stream sparse entries into registers
  (``HyperLogLogPlus.java:819-864``).

Estimation differs deliberately from the reference: instead of copying
Google's empirical bias tables (``HyperLogLogPlus.java:82-149``) we use
the table-free improved raw estimator of Ertl 2017 ("New cardinality
estimation algorithms for HyperLogLog sketches", §§5-6), which meets or
beats the same ~1.04/sqrt(2^p) relative-standard-error contract that the
reference's tests assert (``TestHyperLogLogPlus.java:139-154``).  A
``classic`` estimator (alphaMM raw + linear-counting small-range
correction, ``HyperLogLog.java:174-194``) is provided for the plain-HLL
operator.

Merges are exactly associative and commutative; serialized state is a
pure function of the observed multiset → byte-identical under any merge
grouping (north-rule contract).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from ..hashing import clz64
from .base import HEADER_SIZE, KIND_HLLPP, SketchMergeError, pack_header, unpack_header

U64 = np.uint64

FORMAT_SPARSE = 0
FORMAT_DENSE = 1

_RHO_BITS = 7  # rho_rest <= 64 - sp + 1 <= 64 fits in 7 bits
_RHO_MASK = U64((1 << _RHO_BITS) - 1)


def _alpha_mm(p: int, m: int) -> float:
    """alpha_m * m^2 (constants from Flajolet et al. 2007, as used at
    ``HyperLogLogPlus.java:151-160``)."""
    if p == 4:
        a = 0.673
    elif p == 5:
        a = 0.697
    elif p == 6:
        a = 0.709
    else:
        a = 0.7213 / (1 + 1.079 / m)
    return a * m * m


@dataclass
class HllPlusPlus:
    """HLL++ sketch state. ``sp == 0`` disables sparse mode (classic HLL
    shape); ``estimator`` is 'ertl' (default) or 'classic'."""

    p: int
    sp: int = 25
    estimator: str = "ertl"
    fmt: int = FORMAT_SPARSE
    registers: np.ndarray | None = None  # uint8[m] when dense
    sparse: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=U64))

    def __post_init__(self):
        if not (4 <= self.p <= 18):
            raise ValueError("p must be in [4, 18]")
        if self.sp and not (self.p <= self.sp <= 30):
            raise ValueError("sp must be 0 or in [p, 30]")
        if self.sp == 0 and self.fmt == FORMAT_SPARSE:
            self.fmt = FORMAT_DENSE
        if self.fmt == FORMAT_DENSE and self.registers is None:
            self.registers = np.zeros(self.m, dtype=np.uint8)

    @property
    def m(self) -> int:
        return 1 << self.p

    # ------------------------------------------------------------------ update

    def update_hashed(self, hashes: np.ndarray) -> "HllPlusPlus":
        """Offer a batch of pre-computed 64-bit hashes (uint64/int64)."""
        h = hashes.view(U64) if hashes.dtype == np.int64 else hashes.astype(U64, copy=False)
        if self.fmt == FORMAT_SPARSE:
            codes = self._encode_sparse(h)
            self.sparse = _sparse_union(self.sparse, codes)
            if len(self.sparse) > (self.m * 3) // 4:
                self._to_dense()
        else:
            idx, rho = self._dense_parts(h)
            np.maximum.at(self.registers, idx, rho)
        return self

    def _dense_parts(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        p = U64(self.p)
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        with np.errstate(over="ignore"):
            shifted = (h << p) | U64(1 << (self.p - 1))
        rho = (clz64(shifted) + 1).astype(np.uint8)
        return idx, rho

    def _encode_sparse(self, h: np.ndarray) -> np.ndarray:
        """code = (idx_sp << 7) | rho_rest, where idx_sp is the top sp
        bits of h and rho_rest is the run length of the remaining
        (64 - sp) bits.  Max-per-index == max code → unions are a sorted
        last-per-group pass."""
        sp = self.sp
        idx_sp = h >> U64(64 - sp)
        with np.errstate(over="ignore"):
            rest = (h << U64(sp)) | U64(1 << (sp - 1))
        rho_rest = (clz64(rest) + 1).astype(U64)
        return (idx_sp << U64(_RHO_BITS)) | rho_rest

    def _to_dense(self) -> None:
        regs = np.zeros(self.m, dtype=np.uint8)
        if len(self.sparse):
            idx, rho = self._sparse_to_dense_parts(self.sparse)
            np.maximum.at(regs, idx, rho)
        self.registers = regs
        self.sparse = np.empty(0, dtype=U64)
        self.fmt = FORMAT_DENSE

    def _sparse_to_dense_parts(self, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(idx_sp, rho_rest) → (idx_p, rho_p): if the (sp-p) bits below
        the dense index are nonzero, rho is their leading-zero run + 1;
        else rho = (sp - p) + rho_rest (``HyperLogLogPlus.java:358-410``
        semantics, simpler encoding)."""
        sp, p = self.sp, self.p
        idx_sp = codes >> U64(_RHO_BITS)
        rho_rest = (codes & _RHO_MASK).astype(np.int64)
        idx_p = (idx_sp >> U64(sp - p)).astype(np.int64)
        sub = idx_sp & U64((1 << (sp - p)) - 1)
        # leading zeros of sub within an (sp-p)-bit window
        sub_clz = clz64(sub) - (64 - (sp - p))
        rho = np.where(sub != 0, sub_clz + 1, (sp - p) + rho_rest).astype(np.uint8)
        return idx_p, rho

    # ------------------------------------------------------------------ merge

    def merge(self, other: "HllPlusPlus") -> "HllPlusPlus":
        if (self.p, self.sp) != (other.p, other.sp):
            raise SketchMergeError(
                f"HLL++ p/sp mismatch: ({self.p},{self.sp}) vs ({other.p},{other.sp})"
            )
        if self.estimator != other.estimator:
            # a silent mix would make the merged flag (bytes AND the
            # estimate formula) depend on merge ORDER — same contract as
            # LogLog's adaptive-flag check
            raise SketchMergeError(
                f"HLL++ estimator mismatch: {self.estimator} vs {other.estimator}")
        if self.fmt == FORMAT_DENSE and other.fmt == FORMAT_DENSE:
            np.maximum(self.registers, other.registers, out=self.registers)
        elif self.fmt == FORMAT_SPARSE and other.fmt == FORMAT_SPARSE:
            self.sparse = _sparse_union(self.sparse, other.sparse)
            if len(self.sparse) > (self.m * 3) // 4:
                self._to_dense()
        else:
            if self.fmt == FORMAT_SPARSE:
                self._to_dense()
            if other.fmt == FORMAT_SPARSE:
                if len(other.sparse):
                    idx, rho = other._sparse_to_dense_parts(other.sparse)
                    np.maximum.at(self.registers, idx, rho)
            else:
                np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # ------------------------------------------------------------------ estimate

    def cardinality(self) -> float:
        if self.fmt == FORMAT_SPARSE:
            m_sp = 1 << self.sp
            # self.sparse is always a _sparse_union output: exactly one
            # code per idx_sp, so the distinct-index count is just the
            # length (no O(n log n) re-sort per estimate)
            v = len(self.sparse)
            if v == 0:
                return 0.0
            return _linear_counting(m_sp, m_sp - v)
        if self.estimator == "ertl":
            return _ertl_estimate(self.registers, self.p)
        return _classic_estimate(self.registers, self.p)

    # ------------------------------------------------------------------ bytes

    def to_bytes(self) -> bytes:
        head = pack_header(KIND_HLLPP) + struct.pack(
            "<BBBB", self.p, self.sp, self.fmt, 0 if self.estimator == "ertl" else 1
        )
        if self.fmt == FORMAT_SPARSE:
            payload = struct.pack("<I", len(self.sparse)) + self.sparse.tobytes()
        else:
            payload = self.registers.tobytes()
        return head + payload

    @classmethod
    def from_bytes(cls, data: bytes) -> "HllPlusPlus":
        _, kind = unpack_header(data)
        if kind != KIND_HLLPP:
            raise ValueError(f"not an HLL++ blob (kind={kind})")
        p, sp, fmt, est = struct.unpack_from("<BBBB", data, HEADER_SIZE)
        off = HEADER_SIZE + 4
        sk = cls.__new__(cls)
        sk.p, sk.sp, sk.fmt = p, sp, fmt
        sk.estimator = "ertl" if est == 0 else "classic"
        if fmt == FORMAT_SPARSE:
            (n,) = struct.unpack_from("<I", data, off)
            sk.sparse = np.frombuffer(data, dtype=U64, count=n, offset=off + 4).copy()
            sk.registers = None
        else:
            sk.registers = np.frombuffer(data, dtype=np.uint8, count=1 << p, offset=off).copy()
            sk.sparse = np.empty(0, dtype=U64)
        return sk

    @classmethod
    def new(cls, p: int = 14, sp: int = 25, estimator: str = "ertl") -> "HllPlusPlus":
        return cls(p=p, sp=sp, estimator=estimator)


def _sparse_union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of sparse code sets keeping max rho per idx_sp.  Because
    code = (idx << 7) | rho, the max code per idx wins: sort, then take
    the last entry of each idx group."""
    if len(a) == 0 and len(b) == 0:
        return np.empty(0, dtype=U64)
    codes = np.sort(np.concatenate([a, b]))
    idx = codes >> U64(_RHO_BITS)
    keep = np.empty(len(codes), dtype=bool)
    keep[:-1] = idx[:-1] != idx[1:]
    keep[-1] = True
    return codes[keep]


def _linear_counting(m: int, zeros: int) -> float:
    return m * math.log(m / zeros)


def _classic_estimate(registers: np.ndarray, p: int) -> float:
    """Flajolet raw estimate + small-range linear counting
    (``HyperLogLog.java:174-194``)."""
    m = 1 << p
    est = _alpha_mm(p, m) / float(np.sum(np.exp2(-registers.astype(np.float64))))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros > 0:
            return _linear_counting(m, zeros)
    return est


def _ertl_sigma(x: float) -> float:
    if x == 1.0:
        return math.inf
    y, z = 1.0, x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev:
            return z


def _ertl_tau(x: float) -> float:
    if x == 0.0 or x == 1.0:
        return 0.0
    y, z = 1.0, 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


def _ertl_estimate(registers: np.ndarray, p: int) -> float:
    """Ertl 2017 improved raw estimator (algorithm 6 of the paper) —
    table-free, no bias-correction lookup, no LC/raw switching."""
    m = 1 << p
    q = 64 - p  # max register value is q + 1
    counts = np.bincount(registers, minlength=q + 2).astype(np.float64)
    z = m * _ertl_tau(1.0 - counts[q + 1] / m)
    for k in range(q, 0, -1):
        z = 0.5 * (z + counts[k])
    z += m * _ertl_sigma(counts[0] / m)
    if z == 0.0:
        return math.inf
    alpha_inf = 1.0 / (2.0 * math.log(2.0))
    return alpha_inf * m * m / z
