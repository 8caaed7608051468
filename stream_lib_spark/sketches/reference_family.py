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
KIND_CTE_REF = 18
KIND_HLLC_REF = 19

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
        # no outer per-item coercion here: string_hash_buckets /
        # _coerce_batch handle the whole batch before the hash kernel
        self.ref.add(items)
        return self

    # ------------------------------------------------------------ query

    def might_contain(self, items) -> np.ndarray:
        return self.ref.is_present(items)

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
        # batch coercion happens inside the hash kernels
        # (string_hash_buckets/_coerce_batch, lookup3 path), not here
        self.ref.add(items)
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

        return ReferenceLC.from_bytes(raw)


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


class ReferenceFamilyHLLClassic(_ReferenceFamilyCardinality):
    """Classic HyperLogLog (the reference's separate ``HyperLogLog``
    class, not HLL++) with its murmur2-32 update path, including the
    rho-expression precedence quirk reproduced verbatim — packed 5-bit
    RegisterSet wire."""

    _KIND_ID = KIND_HLLC_REF

    @staticmethod
    def _new(log2m: int):
        from .loglog_wire import ReferenceHyperLogLog

        return ReferenceHyperLogLog.new(log2m)

    @staticmethod
    def _parse(raw: bytes):
        from .loglog_wire import ReferenceHyperLogLog

        return ReferenceHyperLogLog.from_bytes(raw)


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


# --------------------------------------------------- CountThenEstimate

_CTE_PKG = "com.clearspring.analytics.stream.cardinality."
_CTE_BUILDERS = {
    # kind -> (JVM builder class, args-from-params, estimator type code)
    "lc": (_CTE_PKG + "LinearCounting$Builder", ("size",)),
    "adaptive": (_CTE_PKG + "AdaptiveCounting$Builder", ("k",)),
    "hllpp": (_CTE_PKG + "HyperLogLogPlus$Builder", ("p", "sp")),
    # round 6: the remaining two estimator types the reference's own
    # readExternal switch handles (CountThenEstimate.java:190-205)
    "llc": (_CTE_PKG + "LogLog$Builder", ("k",)),
    "hlc": (_CTE_PKG + "HyperLogLog$Builder", ("log2m",)),
}
_BUILDER_TO_KIND = {cls: kind for kind, (cls, _) in _CTE_BUILDERS.items()}


def _hll_classic_rsd(log2m: int) -> float:
    """``HyperLogLog.rsd(log2m)`` (HyperLogLog.java:101-103) — the
    double the JVM stores in Builder.rsd and serializes."""
    import math

    return 1.106 / math.sqrt(math.exp(log2m * math.log(2.0)))


def _hll_classic_log2m(rsd: float) -> int:
    """``HyperLogLog.log2m(rsd)`` (HyperLogLog.java:97-99) — how
    Builder.readObject restores the transient log2m from rsd."""
    import math

    return int(math.log((1.106 / rsd) * (1.106 / rsd)) / math.log(2.0))


def _stable_log2m(log2m: int) -> int:
    """Fixpoint of log2m → log2m(rsd(log2m)): the value an hlc Builder
    lands on after the JVM's own serialize/readObject cycle.  The
    reference's float truncation makes log2m=4 restore as 3 (int() of
    3.9999999999999996) — the JVM itself cannot preserve 4 across JOS,
    and a distributed build serializes every partial, so neither can
    we (code-review r6 #3)."""
    seen = set()
    while log2m not in seen:
        seen.add(log2m)
        log2m = _hll_classic_log2m(_hll_classic_rsd(log2m))
    return log2m


class ReferenceFamilyCTE:
    """CountThenEstimate with the reference's exact semantics as
    distributed aggregation state — the untipped phase counts RAW
    items (so the exported JOS stream carries real elements the JVM
    re-counts / re-offers, unlike the native CTE whose untipped state
    holds our 64-bit hashes), and the tip builds the estimator with
    the reference's own hash paths:

      lc        LinearCounting(size)        murmur2-32 UTF-8 seed -1
      adaptive  AdaptiveCounting(k)         lookup3ycs64
      hllpp     HyperLogLogPlus(p, sp)      MurmurHash64A (our parity
                                            path, smhasher-golden)

    Monoid shape: untipped ∪ untipped = element-set union (tipping if
    past the point); tipped ⊔ tipped = estimator merge (bitmap OR /
    register max — the reference's own merge semantics); mixed = offer
    the untipped side's elements into the estimator.  All three are
    set-functions of the offered items (dedup/order-insensitive), so
    the distributed build equals a sequential reference offer-loop,
    and serialization is canonical (elements sorted) → byte-identical
    state under any regrouping.

    JVM note (pinned in tests/test_cte_wire.py): the reference's
    deserialization constructor AUTO-TIPS an untipped blob when
    ``builder.sizeof() <= bytes.length`` — a large exported element
    list loads tipped on the JVM side; the elements it tips with are
    exactly ours, so cardinality agrees either way."""

    _KIND_ID = KIND_CTE_REF

    def __init__(self, tipping_point: int = 1000, builder: str = "hllpp",
                 size: int | None = None, k: int | None = None,
                 p: int = 14, sp: int = 25, log2m: int | None = None,
                 _parsed=None):
        if builder not in _CTE_BUILDERS:
            raise ValueError(f"builder must be one of {sorted(_CTE_BUILDERS)}")
        if builder == "hlc" and log2m is not None and _stable_log2m(log2m) != log2m:
            raise ValueError(
                f"log2m={log2m} cannot survive the reference's own Builder "
                f"rsd round-trip (readObject restores "
                f"{_stable_log2m(log2m)} — HyperLogLog.java:97-103 float "
                f"truncation); a distributed build serializes every "
                f"partial, so use {_stable_log2m(log2m)} or {log2m + 1}")
        self.tipping_point = tipping_point
        self.builder = builder
        self.bparams = {"size": size, "k": k, "p": p, "sp": sp, "log2m": log2m}
        self.elements: set | None = set()
        self.est = None
        self.etype: int | None = None
        if _parsed is not None:
            self._restore(_parsed)

    # ----------------------------------------------------------- build

    def _builder_args(self) -> dict:
        _, fields = _CTE_BUILDERS[self.builder]
        args = {f: self.bparams[f] for f in fields}
        if any(v is None for v in args.values()):
            raise ValueError(f"builder {self.builder!r} needs params {fields}")
        return args

    def _build_estimator(self):
        from .cte_wire import TYPE_AC, TYPE_HLC, TYPE_HLPC, TYPE_LC, TYPE_LLC

        if self.builder == "lc":
            from .lc_wire import ReferenceLC

            return ReferenceLC.new(self.bparams["size"]), TYPE_LC
        if self.builder == "adaptive":
            from .loglog_wire import ReferenceAdaptiveCounting

            return ReferenceAdaptiveCounting.new(self.bparams["k"]), TYPE_AC
        if self.builder == "llc":
            from .loglog_wire import ReferenceLogLog

            return ReferenceLogLog.new(self.bparams["k"]), TYPE_LLC
        if self.builder == "hlc":
            from .loglog_wire import ReferenceHyperLogLog

            return ReferenceHyperLogLog.new(self.bparams["log2m"]), TYPE_HLC
        from .hll import HllPlusPlus

        return HllPlusPlus(p=self.bparams["p"], sp=self.bparams["sp"]), TYPE_HLPC

    def _offer_into_est(self, items) -> None:
        from .cte_wire import TYPE_HLPC

        if len(items) == 0:
            return
        if self.etype == TYPE_HLPC:
            from ..hashing import murmur64a_array

            arr = np.asarray(items, dtype=object)
            self.est.update_hashed(murmur64a_array(arr).view(np.int64))
        else:
            # the estimator's own kernel casts the batch C-level
            self.est.add(items)

    def _maybe_tip(self) -> None:
        if self.elements is not None and len(self.elements) > self.tipping_point:
            self.est, self.etype = self._build_estimator()
            self._offer_into_est(sorted(self.elements))
            self.elements = None

    # ---------------------------------------------------------- update

    @property
    def tipped(self) -> bool:
        return self.elements is None

    def update_batch(self, items: np.ndarray, counts: np.ndarray | None = None):
        # RAW-string semantics (code-review r6 #2): no fixed-width U
        # cast here — numpy's U storage strips trailing U+0000, which
        # would collapse distinct raw items ('x\x00' vs 'x') and
        # diverge from what the JVM reference stores.  The shared
        # cms_wire coercion keeps the rules in ONE place: lists/bytes →
        # object + str() reprs (container-independent state), numeric
        # batches C-cast (their reprs can't contain NUL).
        from .cms_wire import _as_str_objects, _coerce_batch

        arr = _coerce_batch(items)
        if arr.dtype.kind == "O":
            vals = _as_str_objects(arr).tolist()
        elif arr.dtype.kind == "U":
            vals = arr.tolist()
        else:
            vals = arr.astype("U").tolist()
        if self.tipped:
            self._offer_into_est(vals)
        else:
            self.elements.update(vals)
            self._maybe_tip()
        return self

    def cardinality(self) -> float:
        if not self.tipped:
            return float(len(self.elements))
        return float(self.est.cardinality())

    # ----------------------------------------------------------- merge

    def merge(self, other: "ReferenceFamilyCTE") -> "ReferenceFamilyCTE":
        if (self.builder, self._builder_args()) != (other.builder,
                                                    other._builder_args()):
            raise SketchMergeError("ReferenceFamilyCTE builder/param mismatch")
        # the TIPPED wire carries no tipping point (the JVM discards it
        # at tip() too), so the threshold is only comparable — and only
        # matters — while both sides still count exactly
        if (not self.tipped and not other.tipped
                and self.tipping_point != other.tipping_point):
            raise SketchMergeError("ReferenceFamilyCTE tipping_point mismatch")
        if not self.tipped and not other.tipped:
            self.elements |= other.elements
            self._maybe_tip()
        elif self.tipped and other.tipped:
            self.est.merge(other.est)
        elif self.tipped:
            self._offer_into_est(sorted(other.elements))
        else:
            import copy

            # COPY other's estimator before folding our elements into it:
            # adopting by reference would silently mutate the `other`
            # argument (every merge in this library leaves other intact)
            mine = self.elements
            self.est, self.etype = copy.deepcopy(other.est), other.etype
            self.elements = None
            self._offer_into_est(sorted(mine))
        return self

    # ----------------------------------------------------------- bytes

    def _as_reference_cte(self):
        from .cte_wire import TYPE_HLPC, ReferenceCTE

        if not self.tipped:
            cls, _ = _CTE_BUILDERS[self.builder]
            args = self._builder_args()
            if self.builder == "hlc":
                # the JVM Builder serializes only `rsd` (log2m is
                # transient, restored by Builder.readObject)
                args = {"rsd": _hll_classic_rsd(args["log2m"])}
            return ReferenceCTE(False, tipping_point=self.tipping_point,
                                builder_class=cls, builder_args=args,
                                elements=sorted(self.elements))
        if self.etype == TYPE_HLPC:
            from .hll_wire import to_reference_bytes as hll_bytes

            est_bytes = hll_bytes(self.est)
        else:
            est_bytes = self.est.to_bytes()
        return ReferenceCTE(True, estimator_type=self.etype,
                            estimator_bytes=est_bytes)

    def to_reference_bytes(self) -> bytes:
        from .cte_wire import to_reference_bytes

        if not self.tipped and self.builder == "llc":
            # parity with the JVM's own behavior: LogLog.Builder
            # implements only IBuilder (not Serializable), so the
            # reference ITSELF cannot writeExternal an untipped
            # LogLog-builder CountThenEstimate (NotSerializableException,
            # LogLog.java:200).  Our internal partial-state frame
            # (`to_bytes`) still round-trips; only the JVM export is
            # refused, matching the JVM.
            raise ValueError(
                "untipped llc CountThenEstimate has no JVM wire form "
                "(LogLog.Builder is not Serializable in the reference); "
                "export after tipping, or use builder='adaptive'")
        return to_reference_bytes(self._as_reference_cte())

    def to_bytes(self) -> bytes:
        from .cte_wire import to_reference_bytes

        # internal state frame: same JOS layout for every builder
        # (untipped llc uses the sentinel LogLog$Builder descriptor that
        # only our parser accepts — see cte_wire._CLASSES note)
        return pack_header(KIND_CTE_REF) + to_reference_bytes(self._as_reference_cte())

    def _restore(self, parsed) -> None:
        from .cte_wire import TYPE_HLPC

        if not parsed.tipped:
            kind = _BUILDER_TO_KIND.get(parsed.builder_class)
            if kind is None:
                raise ValueError(f"unsupported builder {parsed.builder_class!r}")
            self.builder = kind
            if kind == "hlc":
                # wire carries rsd; restore log2m like Builder.readObject,
                # then normalize to the serialization fixpoint so OUR
                # re-export is stable even for JVM blobs carrying an
                # unstable rsd (the JVM itself would drift the same way)
                self.bparams["log2m"] = _stable_log2m(
                    _hll_classic_log2m(parsed.builder_args["rsd"]))
            else:
                self.bparams.update(parsed.builder_args)
            self.tipping_point = parsed.tipping_point
            self.elements = {str(e) for e in parsed.elements}
            self.est = self.etype = None
            return
        self.elements = None
        self.etype = parsed.estimator_type
        if parsed.estimator_type == TYPE_HLPC:
            from .hll_wire import from_reference_bytes

            self.est = from_reference_bytes(parsed.estimator_bytes)
            self.builder = "hllpp"
            self.bparams.update({"p": self.est.p, "sp": self.est.sp})
        else:
            parsed_est = parsed.estimator()
            self.est = parsed_est
            from .cte_wire import TYPE_AC, TYPE_HLC, TYPE_LC, TYPE_LLC

            if parsed.estimator_type == TYPE_LC:
                self.builder = "lc"
                self.bparams["size"] = len(parsed_est.bitmap)
            elif parsed.estimator_type == TYPE_AC:
                self.builder = "adaptive"
                self.bparams["k"] = parsed_est.k
            elif parsed.estimator_type == TYPE_LLC:
                self.builder = "llc"
                self.bparams["k"] = parsed_est.k
            elif parsed.estimator_type == TYPE_HLC:
                self.builder = "hlc"
                self.bparams["log2m"] = parsed_est.log2m
            else:
                raise ValueError(
                    f"unsupported tipped estimator type {parsed.estimator_type}")

    @classmethod
    def from_bytes(cls, data: bytes) -> "ReferenceFamilyCTE":
        from .cte_wire import parse_reference_bytes

        _, kind = unpack_header(data)
        if kind != KIND_CTE_REF:
            raise ValueError(f"not a reference-family CTE blob (kind {kind})")
        return cls(_parsed=parse_reference_bytes(data[HEADER_SIZE:]))
