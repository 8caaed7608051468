"""Reference LogLog / AdaptiveCounting interop.

The wire format IS the register array (``cardinality/LogLog.java:96-107``
``getBytes() { return M; }``) — one byte per register, m = 2^k registers.
What differs is the update/estimate path:

* LogLog (``LogLog.java:120-138``) addresses registers with the 32-bit
  MurmurHash (``MurmurHash.hash(Object)``, seed -1 — the same murmur2-32
  already replicated for CMS/LC interop): bucket = h >>> (32-k), rank =
  nlz32((h << k) | (1 << (k-1))) + 1.  Estimate = Ca(k) * 2^(Rsum/m),
  truncated to long, with the published mAlpha constants
  (``LogLog.java:32-65``).
* AdaptiveCounting (``AdaptiveCounting.java:60-92``) addresses with the
  64-bit Lookup3 hash (``hash/Lookup3Hash.java:237-318`` lookup3ycs64,
  ported below), and switches to the LinearCounting estimator
  ``round(-m ln(B))`` while the empty-register fraction B >= 0.051.

``ReferenceLogLog`` / ``ReferenceAdaptiveCounting`` import a blob, add
items with reference-identical register updates, max-merge, estimate
exactly as the reference, and re-serialize byte-exactly.  Golden-tested
against the javac-compiled reference in ``tests/test_loglog_wire.py``.
"""

from __future__ import annotations

import math

import numpy as np

from .base import SketchMergeError
from .lc_wire import _murmur32_items

# LogLog.java:32-65 — the paper's alpha_m correction constants, k = 0..31
MALPHA = (
    0,
    0.44567926005415,
    1.2480639342271,
    2.8391255240079,
    6.0165231584809,
    12.369319965552,
    25.073991603111,
    50.482891762408,
    101.30047482584,
    202.93553338100,
    406.20559696699,
    812.74569744189,
    1625.8258850594,
    3251.9862536323,
    6504.3069874480,
    13008.948453415,
    26018.231384516,
    52036.797246302,
    104073.92896967,
    208148.19241629,
    416296.71930949,
    832593.77309585,
    1665187.8806686,
    3330376.0958140,
    6660752.5261049,
    13321505.386687,
    26643011.107850,
    53286022.550177,
    106572045.43483,
    213144091.20414,
    426288182.74275,
    852576365.81999,
)

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def lookup3ycs64(s: str, initval: int = -1) -> int:
    """Port of ``Lookup3Hash.lookup3ycs64(CharSequence)`` — Bob
    Jenkins' lookup3 over the string's Unicode code points (Java
    combines surrogate pairs via Character.toCodePoint, which for
    well-formed strings is exactly code-point iteration).  Returns the
    unsigned 64-bit value of the Java long result."""

    def rot(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _M32

    a = b = c = (0xDEADBEEF + (initval & _M32)) & _M32
    c = (c + ((initval >> 32) & _M32)) & _M32
    cps = [ord(ch) for ch in s]
    i, n = 0, len(cps)
    mixed = True
    while i < n:
        mixed = False
        a = (a + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        b = (b + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        c = (c + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        # mix(a,b,c)
        a = (a - c) & _M32; a ^= rot(c, 4);  c = (c + b) & _M32
        b = (b - a) & _M32; b ^= rot(a, 6);  a = (a + c) & _M32
        c = (c - b) & _M32; c ^= rot(b, 8);  b = (b + a) & _M32
        a = (a - c) & _M32; a ^= rot(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= rot(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= rot(b, 4);  b = (b + a) & _M32
        mixed = True
    if not mixed:
        # final(a,b,c)
        c ^= b; c = (c - rot(b, 14)) & _M32
        a ^= c; a = (a - rot(c, 11)) & _M32
        b ^= a; b = (b - rot(a, 25)) & _M32
        c ^= b; c = (c - rot(b, 16)) & _M32
        a ^= c; a = (a - rot(c, 4)) & _M32
        b ^= a; b = (b - rot(a, 14)) & _M32
        c ^= b; c = (c - rot(b, 24)) & _M32
    # Java: c + (((long) b) << 32) — c is sign-extended to long
    c_signed = c - ((c & 0x80000000) << 1)
    return ((b << 32) + c_signed) & _M64


class ReferenceLogLog:
    """Reference-exact LogLog over an imported (or fresh) register blob."""

    def __init__(self, registers: np.ndarray | bytes):
        M = np.frombuffer(registers, dtype=np.uint8).copy() if isinstance(
            registers, (bytes, bytearray)) else registers.astype(np.uint8)
        m = len(M)
        k = (m - 1).bit_length()
        if m != (1 << k):
            raise ValueError("register array length must be a power of 2")
        self.M, self.m, self.k, self.Ca = M, m, k, MALPHA[k]

    @classmethod
    def new(cls, k: int) -> "ReferenceLogLog":
        return cls(np.zeros(1 << k, dtype=np.uint8))

    # ----------------------------------------------------------- update

    def _bucket_rank(self, items) -> tuple[np.ndarray, np.ndarray]:
        h = _murmur32_items(items).view(np.uint32)
        j = (h >> np.uint32(32 - self.k)).astype(np.int64)
        x = ((h << np.uint32(self.k)) | np.uint32(1 << (self.k - 1))) & np.uint32(_M32)
        nlz = np.uint8(31) - np.floor(np.log2(x.astype(np.float64))).astype(np.uint8)
        return j, nlz + np.uint8(1)

    def add(self, items) -> "ReferenceLogLog":
        j, r = self._bucket_rank(items)
        np.maximum.at(self.M, j, r)
        return self

    # --------------------------------------------------------- estimate

    def cardinality(self) -> int:
        r_avg = int(self.M.astype(np.int64).sum()) / float(self.m)
        return int(self.Ca * math.pow(2.0, r_avg))  # Java (long) cast truncates

    # ------------------------------------------------------------ merge

    def merge(self, other: "ReferenceLogLog") -> "ReferenceLogLog":
        # reference semantics (LogLog.java:162): other must be an
        # INSTANCE of self's class — merging an AdaptiveCounting into a
        # LogLog is legal (max-registers), the reverse is not
        if not isinstance(other, type(self)):
            raise SketchMergeError("cannot merge estimators of different class")
        if other.m != self.m:
            raise SketchMergeError("cannot merge estimators of different sizes")
        np.maximum(self.M, other.M, out=self.M)
        return self

    def to_bytes(self) -> bytes:
        return self.M.tobytes()


class ReferenceAdaptiveCounting(ReferenceLogLog):
    """AdaptiveCounting: LogLog registers, Lookup3-ycs64 addressing,
    LinearCounting estimate while the empty fraction B >= B_s = 0.051
    (``AdaptiveCounting.java:41-92``)."""

    B_S = 0.051

    def _bucket_rank(self, items) -> tuple[np.ndarray, np.ndarray]:
        h = np.array([lookup3ycs64(str(s)) for s in items], dtype=np.uint64)
        j = (h >> np.uint64(64 - self.k)).astype(np.int64)
        x = ((h << np.uint64(self.k)) | np.uint64(1 << (self.k - 1))) & np.uint64(_M64)
        # nlz64 via float64 log2 is unsafe above 2^53 — use bit_length
        nlz = np.array([64 - int(v).bit_length() for v in x], dtype=np.uint8)
        return j, nlz + np.uint8(1)

    def cardinality(self) -> int:
        b_e = int((self.M == 0).sum())
        B = b_e / float(self.m)
        if B >= self.B_S:
            # Java Math.round = floor(x + 0.5), NOT banker's rounding
            return math.floor(-self.m * math.log(B) + 0.5)
        return super().cardinality()


class ReferenceHyperLogLog:
    """Classic HyperLogLog interop (``cardinality/HyperLogLog.java``).

    Wire format (``HyperLogLog.java:200-216``): big-endian int log2m,
    int byte-size, then the RegisterSet's packed words (6 five-bit
    registers per 32-bit int, ``RegisterSet.java:19-60``).  Update path
    (``HyperLogLog.java:157-171``): murmur2-32 of the item, bucket =
    h >>> (32-log2m), and rho replicates the reference's exact
    expression ``(h << log2m) | (1 << (log2m-1)) + 1`` — Java precedence
    makes that ``| (guard + 1)``, which we reproduce verbatim for
    bit-parity.  Estimate (``:174-194``): alphaMM / sum(2^-reg) with the
    linear-counting small-range switch at 2.5m, Math.round semantics."""

    def __init__(self, log2m: int, registers: np.ndarray):
        self.log2m, self.m = log2m, 1 << log2m
        self.registers = registers.astype(np.uint8)

    @classmethod
    def new(cls, log2m: int) -> "ReferenceHyperLogLog":
        return cls(log2m, np.zeros(1 << log2m, dtype=np.uint8))

    @classmethod
    def from_bytes(cls, data: bytes) -> "ReferenceHyperLogLog":
        import struct

        from .hll_wire import _unpack_registers

        log2m, nbytes = struct.unpack_from(">ii", data, 0)
        words = np.frombuffer(data, dtype=">i4", count=nbytes // 4, offset=8).astype(np.uint32)
        return cls(log2m, _unpack_registers(words, 1 << log2m))

    def to_bytes(self) -> bytes:
        import struct

        from .hll_wire import _pack_registers

        words = _pack_registers(self.registers)
        return struct.pack(">ii", self.log2m, 4 * len(words)) + words.astype(">i4").tobytes()

    def add(self, items) -> "ReferenceHyperLogLog":
        h = _murmur32_items(items).view(np.uint32)
        k = np.uint32(self.log2m)
        j = (h >> (np.uint32(32) - k)).astype(np.int64)
        guard = np.uint32((1 << (self.log2m - 1)) + 1)  # Java precedence quirk
        x = ((h << k) | guard) & np.uint32(_M32)
        nlz = np.uint8(31) - np.floor(np.log2(x.astype(np.float64))).astype(np.uint8)
        np.maximum.at(self.registers, j, nlz + np.uint8(1))
        return self

    def merge(self, other: "ReferenceHyperLogLog") -> "ReferenceHyperLogLog":
        if other.log2m != self.log2m:
            raise SketchMergeError("log2m mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> int:
        regs = self.registers.astype(np.float64)
        alpha_mm = self._alpha_mm()
        estimate = alpha_mm / float(np.sum(np.exp2(-regs)))
        if estimate <= 2.5 * self.m:
            zeros = float(np.count_nonzero(self.registers == 0))
            if zeros == 0:
                # replicate the JVM exactly: HyperLogLog.java:188-190 has
                # no zeros guard — count*log(count/0.0) = Infinity and
                # Math.round(Infinity) = Long.MAX_VALUE
                return (1 << 63) - 1
            return math.floor(self.m * math.log(self.m / zeros) + 0.5)
        return math.floor(estimate + 0.5)

    def _alpha_mm(self) -> float:
        m = self.m
        if self.log2m == 4:
            a = 0.673
        elif self.log2m == 5:
            a = 0.697
        elif self.log2m == 6:
            a = 0.709
        else:
            a = 0.7213 / (1 + 1.079 / m)
        return a * m * m
