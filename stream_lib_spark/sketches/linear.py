"""LinearCounting + LogLog / AdaptiveCounting — the reference's other
cardinality estimators (operator parity; SURVEY.md §2 rows 4-6).

- LinearCounting (Whang et al.; ``cardinality/LinearCounting.java:35-350``):
  m-bit bitmap, estimate ``m * ln(m / V)`` where V = unset bits.
  Merge = bitwise OR (``LinearCounting.java:174-193``) — exact monoid.
- LogLog (Durand-Flajolet; ``cardinality/LogLog.java:24-222``): one
  byte register per bucket holding max rho; estimate
  ``alpha_m * m * 2^(Rsum/m)``.  Merge = element-wise max
  (``LogLog.java:155-175``).
- AdaptiveCounting (``cardinality/AdaptiveCounting.java:36-179``): same
  registers; when the empty-bucket ratio B >= 0.051 the estimate
  switches to linear-counting style ``-m * ln(B)`` (``:83-90``).

The reference sizes LogLog's alpha via the mAlpha table
(``LogLog.java:32-65``); we use the published closed form
``alpha_m = (Gamma(-1/m) * (1-2^(1/m)) / ln 2)^(-m)`` evaluated
numerically, which converges to the same constants.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import clz64
from .base import HEADER_SIZE, KIND_LINEARCOUNTING, KIND_LOGLOG, SketchMergeError, pack_header, unpack_header

U64 = np.uint64


class LinearCounting:
    def __init__(self, m_bits: int, bits: np.ndarray | None = None):
        if m_bits % 8:
            m_bits += 8 - m_bits % 8
        self.m_bits = m_bits
        self.bits = np.zeros(m_bits // 8, dtype=np.uint8) if bits is None else bits

    @classmethod
    def for_cardinality(cls, max_n: int) -> "LinearCounting":
        """Size for ~1% std error at max_n (Whang Table II shape:
        m grows ~ n/load_factor; load factor ~12 keeps error ~1%)."""
        return cls(max(1 << 10, int(max_n / 12) * 8))

    def update_hashed(self, hashes: np.ndarray) -> "LinearCounting":
        h = hashes.view(U64) if hashes.dtype == np.int64 else hashes.astype(U64, copy=False)
        pos = (h % U64(self.m_bits)).astype(np.int64)
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return self

    def cardinality(self) -> float:
        v = self.m_bits - int(np.unpackbits(self.bits).sum())
        if v == 0:
            return float("inf")  # saturated (LinearCounting.java:244-246)
        return self.m_bits * math.log(self.m_bits / v)

    def merge(self, other: "LinearCounting") -> "LinearCounting":
        if self.m_bits != other.m_bits:
            raise SketchMergeError("LinearCounting size mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def to_bytes(self) -> bytes:
        return pack_header(KIND_LINEARCOUNTING) + struct.pack("<Q", self.m_bits) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "LinearCounting":
        _, kind = unpack_header(data)
        if kind != KIND_LINEARCOUNTING:
            raise ValueError("not a LinearCounting blob")
        (m_bits,) = struct.unpack_from("<Q", data, HEADER_SIZE)
        bits = np.frombuffer(data, dtype=np.uint8, count=m_bits // 8, offset=HEADER_SIZE + 8).copy()
        return cls(m_bits, bits)


def _loglog_alpha(m: int) -> float:
    # closed form from Durand-Flajolet; matches the reference's mAlpha
    # table (LogLog.java:32-65) to ~1e-4 for k >= 4
    return (math.gamma(-1.0 / m) * (1 - 2 ** (1.0 / m)) / math.log(2)) ** (-m)


class LogLog:
    """Byte-register LogLog; ``adaptive=True`` gives AdaptiveCounting's
    empty-bucket switch."""

    B_S = 0.051  # AdaptiveCounting.java:47

    def __init__(self, k: int, adaptive: bool = False, registers: np.ndarray | None = None):
        self.k = k
        self.m = 1 << k
        self.adaptive = adaptive
        self.registers = np.zeros(self.m, dtype=np.uint8) if registers is None else registers

    def update_hashed(self, hashes: np.ndarray) -> "LogLog":
        h = hashes.view(U64) if hashes.dtype == np.int64 else hashes.astype(U64, copy=False)
        idx = (h >> U64(64 - self.k)).astype(np.int64)
        with np.errstate(over="ignore"):
            rest = (h << U64(self.k)) | U64(1 << (self.k - 1))
        rho = (clz64(rest) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def cardinality(self) -> float:
        if self.adaptive:
            b = float(np.count_nonzero(self.registers == 0)) / self.m
            if b >= self.B_S:
                return -self.m * math.log(b)  # AdaptiveCounting.java:83-90
        rsum = float(self.registers.astype(np.float64).sum())
        return _loglog_alpha(self.m) * self.m * 2.0 ** (rsum / self.m)

    def merge(self, other: "LogLog") -> "LogLog":
        if self.k != other.k or self.adaptive != other.adaptive:
            raise SketchMergeError("LogLog k/adaptive mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return (pack_header(KIND_LOGLOG) + struct.pack("<BB", self.k, int(self.adaptive))
                + self.registers.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "LogLog":
        _, kind = unpack_header(data)
        if kind != KIND_LOGLOG:
            raise ValueError("not a LogLog blob")
        k, adaptive = struct.unpack_from("<BB", data, HEADER_SIZE)
        regs = np.frombuffer(data, dtype=np.uint8, count=1 << k, offset=HEADER_SIZE + 2).copy()
        return cls(k, bool(adaptive), regs)
