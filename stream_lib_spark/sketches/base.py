"""Sketch protocol + serialization helpers.

Every sketch in this library is a *commutative monoid*: ``new() ·
update(batch) · merge(other)`` with merge commutative/associative, which
is the property that makes a sketch a valid distributed aggregation
state (mirrors the reference's merge contracts, e.g.
``cardinality/RegisterSet.java:87-99`` max-merge and
``frequency/CountMinSketch.java:260-296`` sum-merge).

State is serialized to a versioned little-endian byte blob:

    magic u16 | version u8 | kind u8 | header (kind-specific) | payload

carried through Spark as a ``BinaryType`` column.  Exact byte layouts
live in each sketch module; all are pure functions of the sketch state
so that monoid identities hold at the *byte* level wherever the merge
is exactly associative (HLL, CMS, Bloom, LinearCounting).
"""

from __future__ import annotations

import struct

MAGIC = 0x5B5B  # "[[", stream-lib-spark

# kind ids
KIND_HLL = 1
KIND_HLLPP = 2
KIND_CMS = 3
KIND_TDIGEST = 4
KIND_KLL = 5
KIND_BLOOM = 6
KIND_SPACESAVING = 7
KIND_LINEARCOUNTING = 8
KIND_LOGLOG = 9


def pack_header(kind: int, version: int = 1) -> bytes:
    return struct.pack("<HBB", MAGIC, version, kind)


def unpack_header(data: bytes) -> tuple[int, int]:
    """Returns (version, kind); raises on bad magic."""
    magic, version, kind = struct.unpack_from("<HBB", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad sketch magic 0x{magic:04x}")
    return version, kind


HEADER_SIZE = 4


class SketchMergeError(ValueError):
    """Incompatible sketch parameters at merge time (mirrors the
    reference's CardinalityMergeException / FrequencyMergeException,
    ``HyperLogLogPlus.java:819-822``, ``CountMinSketch.java:271-279``)."""
