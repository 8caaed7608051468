"""Reference-HASH-FAMILY build mode for CMS and Bloom — the export
direction's missing half.

Cardinality and quantile sketches export soundly because the JVM never
re-hashes at query time; CMS and Bloom do (``frequency/
CountMinSketch.java:166-175`` mod-prime rows over ``hashA`` /
``Filter.getHashBuckets``'s UTF-16 murmur2-32 double hashing,
``membership/Filter.java:69-87``).  A table built with our xxhash64
family would answer garbage to a JVM prober, so ``wire_export``
historically REFUSED those kinds.

These wrappers close that gap: they carry a ``ReferenceCMS`` /
``ReferenceBloom`` (the same classes the import path uses, already
golden-tested hash-for-hash) as distributed aggregation state behind
the library's sketch protocol — ``update_batch · merge · to_bytes``
with the versioned frame — so ``SketchSpec('cms',
hash_family='reference')`` builds a sketch in Spark whose exported
blob a JVM stream-lib deployment loads AND queries with exact parity
(proved by the ``ReadBack3`` javac harness in
tests/test_reference_family.py).

Scale shape is identical to the native kinds: partition-local numpy
updates, blob-only shuffle, byte-associative merges (table addition /
bitset OR)."""

from __future__ import annotations

import struct

import numpy as np

from .base import HEADER_SIZE, SketchMergeError, pack_header, unpack_header
from .bloom_wire import ReferenceBloom
from .cms_wire import ReferenceCMS

KIND_CMS_REF = 13
KIND_BLOOM_REF = 14
KIND_LC_REF = 15
KIND_LOGLOG_REF = 16
KIND_ALC_REF = 17

_ITEM_TYPES = ("string", "long")


class ReferenceFamilyCMS:
    """CountMinSketch in the REFERENCE's hash family, as library
    aggregation state.  ``item_type`` picks which JVM add/query surface
    the sketch is parity with: 'string' = ``add(String)`` (UTF-16
    double-hash buckets), 'long' = ``add(long)`` (per-row universal
    hashes) — they are different families in the reference itself."""

    _KIND_ID = KIND_CMS_REF

    def __init__(self, depth: int | None = None, width: int | None = None,
                 seed: int = 1, eps: float | None = None,
                 confidence: float | None = None, item_type: str = "string",
                 _ref: ReferenceCMS | None = None):
        if item_type not in _ITEM_TYPES:
            raise ValueError(f"item_type must be one of {_ITEM_TYPES}")
        self.item_type = item_type
        self.ref = _ref if _ref is not None else ReferenceCMS.create(
            depth=depth, width=width, seed=seed, eps=eps, confidence=confidence)

    # ------------------------------------------------------------ update

    def update_batch(self, items: np.ndarray, counts: np.ndarray) -> "ReferenceFamilyCMS":
        if self.item_type == "long":
            self.ref.add_long(items.astype(np.int64, copy=False), counts)
        else:
            self.ref.add_string(items, counts)
        return self

    # ------------------------------------------------------------ query

    def estimate(self, items) -> np.ndarray:
        if self.item_type == "long":
            return self.ref.estimate_long(np.asarray(items, dtype=np.int64))
        return self.ref.estimate_string(items)

    @property
    def size(self) -> int:
        return self.ref.size

    # ------------------------------------------------------------- merge

    def merge(self, other: "ReferenceFamilyCMS") -> "ReferenceFamilyCMS":
        if self.item_type != other.item_type:
            raise SketchMergeError("ReferenceFamilyCMS item_type mismatch")
        self.ref.merge(other.ref)
        return self

    # ------------------------------------------------------------- bytes

    def to_bytes(self) -> bytes:
        return (pack_header(KIND_CMS_REF)
                + struct.pack("<B", _ITEM_TYPES.index(self.item_type))
                + self.ref.to_bytes())

    def to_reference_bytes(self) -> bytes:
        """The raw JVM blob (``CountMinSketch.serialize`` layout)."""
        return self.ref.to_bytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "ReferenceFamilyCMS":
        _, kind = unpack_header(data)
        if kind != KIND_CMS_REF:
            raise ValueError(f"not a reference-family CMS blob (kind {kind})")
        (it,) = struct.unpack_from("<B", data, HEADER_SIZE)
        return cls(item_type=_ITEM_TYPES[it],
                   _ref=ReferenceCMS.from_bytes(data[HEADER_SIZE + 1:]))


class ReferenceFamilyBloom:
    """BloomFilter in the REFERENCE's hash family (``add(String)`` /
    ``isPresent(String)`` semantics) as library aggregation state.
    The exported word array is written UNTRIMMED so the JVM reader's
    ``BitSet.size()`` modulus equals the build modulus — every key
    answers identically on both sides (see ReferenceBloom.create)."""

    _KIND_ID = KIND_BLOOM_REF

    def __init__(self, n_elements: int | None = None,
                 fpp: float | None = None,
                 buckets_per_element: int | None = None,
                 _ref: ReferenceBloom | None = None):
        self.ref = _ref if _ref is not None else ReferenceBloom.create(
            n_elements, buckets_per_element=buckets_per_element, fpp=fpp)

    # ------------------------------------------------------------ update

    def update_batch(self, items: np.ndarray, counts: np.ndarray | None = None) -> "ReferenceFamilyBloom":
        self.ref.add([str(x) for x in items])
        return self

    # ------------------------------------------------------------ query

    def might_contain(self, items) -> np.ndarray:
        return self.ref.is_present([str(x) for x in items])

    @property
    def hash_count(self) -> int:
        return self.ref.hash_count

    # ------------------------------------------------------------- merge

    def merge(self, other: "ReferenceFamilyBloom") -> "ReferenceFamilyBloom":
        self.ref.merge(other.ref)
        return self

    # ------------------------------------------------------------- bytes

    def to_bytes(self) -> bytes:
        return pack_header(KIND_BLOOM_REF) + self.ref.to_bytes()

    def to_reference_bytes(self) -> bytes:
        """The raw JVM blob (``BloomFilter.serialize`` layout)."""
        return self.ref.to_bytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "ReferenceFamilyBloom":
        _, kind = unpack_header(data)
        if kind != KIND_BLOOM_REF:
            raise ValueError(f"not a reference-family Bloom blob (kind {kind})")
        return cls(_ref=ReferenceBloom.from_bytes(data[HEADER_SIZE:]))


class _ReferenceFamilyCardinality:
    """Shared shape for the cardinality family built with the
    reference's OWN item hashing (LC: murmur2-32 UTF-8 seed -1; LogLog:
    murmur2-32 bucket/rank; AdaptiveCounting: lookup3ycs64).  These
    estimators never re-hash at QUERY time, so plain estimation doesn't
    need hash parity — what does is cross-system UNION: a JVM
    deployment merging our exported state with its own sketches of an
    overlapping stream, or continuing to offer() items into an imported
    blob, double-counts unless both sides hashed items identically.
    This build mode gives bit-parity on that axis (the update paths are
    golden-tested byte-for-byte in tests/test_lc_wire.py /
    tests/test_loglog_wire.py)."""

    _KIND_ID: int = -1

    def __init__(self, _ref=None, **params):
        self.ref = _ref if _ref is not None else self._new(**params)

    def update_batch(self, items: np.ndarray, counts: np.ndarray | None = None):
        self.ref.add([str(x) for x in items])
        return self

    def cardinality(self) -> float:
        return self.ref.cardinality()

    def merge(self, other):
        if self._KIND_ID != other._KIND_ID:
            raise SketchMergeError("reference-family kind mismatch")
        self.ref.merge(other.ref)
        return self

    def to_bytes(self) -> bytes:
        return pack_header(self._KIND_ID) + self.ref.to_bytes()

    def to_reference_bytes(self) -> bytes:
        return self.ref.to_bytes()

    @classmethod
    def from_bytes(cls, data: bytes):
        _, kind = unpack_header(data)
        if kind != cls._KIND_ID:
            raise ValueError(f"not a {cls.__name__} blob (kind {kind})")
        return cls(_ref=cls._parse(data[HEADER_SIZE:]))


class ReferenceFamilyLC(_ReferenceFamilyCardinality):
    """LinearCounting with the reference's bitmap addressing —
    ``new LinearCounting(size)`` semantics (size in BYTES)."""

    _KIND_ID = KIND_LC_REF

    @staticmethod
    def _new(size: int):
        from .lc_wire import ReferenceLC

        return ReferenceLC.new(size)

    @staticmethod
    def _parse(raw: bytes):
        from .lc_wire import ReferenceLC

        return ReferenceLC(np.frombuffer(raw, dtype=np.uint8).copy())


class ReferenceFamilyLogLog(_ReferenceFamilyCardinality):
    """LogLog (Durand–Flajolet) with the reference's murmur2-32
    bucket/rank addressing — ``new LogLog(k)`` semantics."""

    _KIND_ID = KIND_LOGLOG_REF

    @staticmethod
    def _new(k: int):
        from .loglog_wire import ReferenceLogLog

        return ReferenceLogLog.new(k)

    @staticmethod
    def _parse(raw: bytes):
        from .loglog_wire import ReferenceLogLog

        return ReferenceLogLog(raw)


class ReferenceFamilyAdaptiveCounting(_ReferenceFamilyCardinality):
    """AdaptiveCounting with the reference's lookup3ycs64 addressing
    and LC-below-0.051-empty-ratio estimator switch."""

    _KIND_ID = KIND_ALC_REF

    @staticmethod
    def _new(k: int):
        from .loglog_wire import ReferenceAdaptiveCounting

        return ReferenceAdaptiveCounting.new(k)

    @staticmethod
    def _parse(raw: bytes):
        from .loglog_wire import ReferenceAdaptiveCounting

        return ReferenceAdaptiveCounting(raw)
