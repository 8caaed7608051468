"""Wire-compatible HLL++ serialization — the reference's ``getBytes``
format (``cardinality/HyperLogLogPlus.java:715-746``, VERSION=2), so
sketch state can round-trip with JVM stream-lib deployments.

Format (re-derived from the reference's behavior; golden-tested in
``tests/test_hll_wire.py`` against byte vectors produced by the actual
reference implementation compiled with javac):

    int32 BE  -VERSION (=-2)
    varint    p
    varint    sp
    varint    format (0 = NORMAL, 1 = SPARSE)
    NORMAL:   varint byte_len (= words*4), then words int32 BE —
              6 five-bit registers per word (RegisterSet.java:21-27),
              word count = the reference's getSizeForCount quirk
    SPARSE:   varint n_codes, then delta-varints of the encoded-int
              sequence in ascending sparse-index order; deltas are
              int32 two's-complement (they CAN be negative for small
              flagged indices — written as their unsigned 32-bit image,
              exactly like Java's writeUnsignedVarInt on a negative int)

Sparse encoded int (HyperLogLogPlus.java:412-441): idx' = top sp hash
bits; if the (sp-p) bits of idx' below the dense index are all zero the
run length is stored explicitly, inverted, with a flag bit:
``((idx' << 6) | (run ^ 63)) << 1 | 1``; otherwise just ``idx' << 1``.
Our internal sparse code (idx' << 7 | rho_rest) carries equivalent
information: for flagged entries run = (sp - p) + rho_rest (proof: the
bits between p and sp are zero, so the leading-zero run measured from p
extends through them into the post-sp remainder, and both sentinel
positions cap at the same 65-p).

Known deviation: the reference's 5-bit registers silently corrupt
neighbors when a register value exceeds 31 (updateIfGreater writes
``value << shift`` unmasked) — a ~2^-31-probability event per item.  We
clamp to 31 on export instead of reproducing the corruption.
"""

from __future__ import annotations

import struct

import numpy as np

from .hll import FORMAT_DENSE, FORMAT_SPARSE, _RHO_BITS, _RHO_MASK, HllPlusPlus

U64 = np.uint64
WIRE_VERSION = 2


# ------------------------------------------------------------------- varint

def _write_varint(out: bytearray, value: int) -> None:
    """Unsigned LEB128 of the 32-bit two's-complement image (matches
    Varint.writeUnsignedVarInt fed a possibly-negative Java int)."""
    v = value & 0xFFFFFFFF
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_varint(data: bytes, off: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = data[off]
        off += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v & 0xFFFFFFFF, off
        shift += 7


# ----------------------------------------------------------- register packing

def _size_for_count(m: int) -> int:
    """RegisterSet.getSizeForCount — including its bits%32 quirk."""
    bits = m // 6
    if bits == 0:
        return 1
    if bits % 32 == 0:
        return bits
    return bits + 1


def _pack_registers(regs: np.ndarray) -> np.ndarray:
    m = len(regs)
    words = np.zeros(_size_for_count(m), dtype=np.uint32)
    vals = np.minimum(regs.astype(np.uint32), 31)  # 5-bit clamp (see module doc)
    pos = np.arange(m)
    shifted = (vals << (5 * (pos % 6)).astype(np.uint32)).astype(np.uint32)
    np.bitwise_or.at(words, pos // 6, shifted)
    return words


def _unpack_registers(words: np.ndarray, m: int) -> np.ndarray:
    pos = np.arange(m)
    return ((words[pos // 6] >> (5 * (pos % 6)).astype(np.uint32)) & np.uint32(0x1F)).astype(np.uint8)


# ------------------------------------------------------------- sparse codes

def _our_codes_to_wire(codes: np.ndarray, p: int, sp: int) -> np.ndarray:
    """(idx' << 7 | rho_rest) → the reference's encoded ints (uint32)."""
    idx = (codes >> U64(_RHO_BITS)).astype(np.uint32)
    rho_rest = (codes & _RHO_MASK).astype(np.uint32)
    if sp > p:
        flagged = (idx & np.uint32((1 << (sp - p)) - 1)) == 0
    else:
        flagged = np.ones(len(idx), dtype=bool)
    run = (sp - p) + rho_rest
    invrl = run ^ np.uint32(63)
    k_flag = (((idx << np.uint32(6)) | invrl) << np.uint32(1)) | np.uint32(1)
    k_plain = idx << np.uint32(1)
    return np.where(flagged, k_flag, k_plain).astype(np.uint32)


def _wire_codes_to_ours(ks: np.ndarray, p: int, sp: int) -> np.ndarray:
    """Reference encoded ints → our (idx' << 7 | rho_rest) codes.  For
    un-flagged entries the post-sp run length was never stored (the run
    is recoverable from idx' alone); we set rho_rest = 1, which leaves
    every estimate and dense conversion identical."""
    ks = ks.astype(np.uint32)
    flagged = (ks & np.uint32(1)) == 1
    idx = np.where(flagged, ks >> np.uint32(7), ks >> np.uint32(1)).astype(U64)
    run = ((ks >> np.uint32(1)) & np.uint32(63)) ^ np.uint32(63)
    rho_rest = np.where(flagged, run.astype(np.int64) - (sp - p), 1)
    return (idx << U64(_RHO_BITS)) | rho_rest.astype(U64)


# ---------------------------------------------------------------- public API

def to_reference_bytes(sk: HllPlusPlus) -> bytes:
    out = bytearray(struct.pack(">i", -WIRE_VERSION))
    _write_varint(out, sk.p)
    _write_varint(out, sk.sp)
    if sk.fmt == FORMAT_DENSE:
        _write_varint(out, 0)
        words = _pack_registers(sk.registers)
        _write_varint(out, len(words) * 4)
        out += words.astype(">u4").tobytes()
    else:
        _write_varint(out, 1)
        ks = _our_codes_to_wire(np.sort(sk.sparse), sk.p, sk.sp)
        _write_varint(out, len(ks))
        prev = 0
        for k in ks.tolist():
            _write_varint(out, (k - prev) & 0xFFFFFFFF)
            prev = k
    return bytes(out)


def from_reference_bytes(data: bytes, estimator: str = "ertl") -> HllPlusPlus:
    (neg_version,) = struct.unpack_from(">i", data, 0)
    if neg_version >= 0 or -neg_version != WIRE_VERSION:
        raise ValueError(f"unsupported stream-lib HLL++ version {-neg_version}")
    off = 4
    p, off = _read_varint(data, off)
    sp, off = _read_varint(data, off)
    fmt, off = _read_varint(data, off)
    if p > 18 or sp > 30:
        # the reference accepts p up to sp and sp up to 32; this build's
        # native sketch caps at p<=18 / sp<=30 — name the interop limit
        # instead of a bare constructor ValueError
        raise ValueError(
            f"reference HLL++ blob has p={p}, sp={sp}, outside this "
            f"library's supported range (p<=18, sp<=30) — re-export from "
            f"the JVM at a supported precision to migrate this sketch")
    sk = HllPlusPlus(p=p, sp=sp, estimator=estimator,
                     fmt=FORMAT_DENSE if fmt == 0 else FORMAT_SPARSE)
    if fmt == 0:
        byte_len, off = _read_varint(data, off)
        words = np.frombuffer(data, dtype=">u4", count=byte_len // 4, offset=off)
        sk.registers = _unpack_registers(words.astype(np.uint32), 1 << p)
        sk.sparse = np.empty(0, dtype=U64)
    else:
        n, off = _read_varint(data, off)
        ks = np.empty(n, dtype=np.uint32)
        prev = 0
        for i in range(n):
            d, off = _read_varint(data, off)
            prev = (prev + d) & 0xFFFFFFFF
            ks[i] = prev
        sk.sparse = _wire_codes_to_ours(ks, p, sp)
        sk.registers = None
    return sk
