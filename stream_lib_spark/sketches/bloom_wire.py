"""Reference BloomFilter interop (``membership/BloomFilter.java``):
parse the serialized form (int32 hashCount + a Java-object-serialized
``java.util.BitSet``), answer membership EXACTLY as the reference's
deserialized filter would, OR-merge, and re-serialize.

The BitSet payload is Java Object Serialization, but of one fixed
class: the byte stream is a constant 68-byte template (stream magic,
``java.util.BitSet`` class descriptor with its pinned serialVersionUID,
the ``bits [J`` field descriptor and the ``[J`` array class descriptor)
followed by the int32 word count, the big-endian longs, and a single
TC_ENDBLOCKDATA — verified against javac-compiled reference output in
``tests/test_bloom_wire.py``.

Membership parity quirk inherited from the reference: the bucket
modulus is ``BitSet.size()`` = 64 × word count, and Java's BitSet
TRIMS trailing zero words on serialization — so a filter can answer
differently before and after a round trip.  We implement the
DESERIALIZED filter's semantics (the import use case) and therefore
match the reference for any filter that came off the wire.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import SketchMergeError
from .cms_wire import string_hash_buckets

# Fixed JOS template for a serialized java.util.BitSet (see module doc).
_BITSET_PREFIX = bytes.fromhex(
    "aced0005"                  # stream magic + version
    "7372"                      # TC_OBJECT, TC_CLASSDESC
    "00106a6176612e7574696c2e426974536574"  # "java.util.BitSet"
    "6efd887e3934ab21"          # serialVersionUID (pinned by the JDK)
    "03"                        # SC_WRITE_METHOD | SC_SERIALIZABLE
    "0001"                      # one field
    "5b00046269747374"          # array field "bits", type string tag
    "00025b4a"                  # "[J"
    "7870"                      # end class annotation, no superclass
    "757200025b4a"              # TC_ARRAY, TC_CLASSDESC "[J"
    "782004b512b17593"          # long[] serialVersionUID
    "0200007870"                # no fields, end annotation, no super
)
_BITSET_SUFFIX = b"\x78"  # TC_ENDBLOCKDATA (BitSet has writeObject)


# --- BloomCalculations replica (membership/BloomCalculations.java) ---
# The reference's probs[b][k] table is (1 - e^{-k/b})^k rounded to 3
# significant figures — verified cell-by-cell against the source, with
# ONE exception: probs[5][3] is 0.092 there (rounded to 3 decimals, not
# 3 significant figures).  We reproduce the table including that quirk
# so computeBucketsAndK picks identical (K, bucketsPerElement) at every
# fpp, which the javac golden sweep in tests/test_bloom_wire.py pins.
_OPT_K_PER_BUCKETS = [1, 1, 1, 2, 3, 3, 4, 5, 5, 6, 7, 8, 8, 9, 10, 10,
                      11, 12, 12, 13, 14]
_MIN_BUCKETS, _MAX_BUCKETS, _MIN_K, _MAX_K = 2, 15, 1, 8


def _sig3(x: float) -> float:
    import math

    return round(x, 2 - int(math.floor(math.log10(abs(x))))) if x else 0.0


def _prob(b: int, k: int) -> float:
    import math

    if k == 0:
        return 1.0
    if (b, k) == (5, 3):
        return 0.092  # the reference's one 3-decimal rounding
    return _sig3((1.0 - math.exp(-k / b)) ** k)


def compute_best_k(buckets_per_element: int) -> int:
    if buckets_per_element >= len(_OPT_K_PER_BUCKETS):
        return _OPT_K_PER_BUCKETS[-1]
    return _OPT_K_PER_BUCKETS[buckets_per_element]


def compute_buckets_and_k(max_fpp: float) -> tuple[int, int]:
    """(K, bucketsPerElement) — BloomCalculations.computeBucketsAndK,
    including the reference's SWAPPED constructor arguments in the
    loose-fpp trivial case (``new BloomSpecification(2,
    optKPerBuckets[2])`` passes 2 as K and 1 as bucketsPerElement —
    pinned by the Golden11 javac sweep in bloom_calc_golden.csv)."""
    if max_fpp >= _prob(_MIN_BUCKETS, _MIN_K):
        return 2, _OPT_K_PER_BUCKETS[2]
    if max_fpp < _prob(_MAX_BUCKETS, _MAX_K):
        return _MAX_K, _MAX_BUCKETS
    bpe = 2
    k = _OPT_K_PER_BUCKETS[2]
    while _prob(bpe, k) > max_fpp:
        bpe += 1
        k = _OPT_K_PER_BUCKETS[bpe]
    while _prob(bpe, k - 1) <= max_fpp:
        k -= 1
    return k, bpe


class ReferenceBloom:
    def __init__(self, hash_count: int, words: np.ndarray):
        self.hash_count = hash_count
        self.words = words.astype(np.int64)  # big-endian longs as signed ints

    @classmethod
    def create(cls, num_elements: int, buckets_per_element: int | None = None,
               fpp: float | None = None) -> "ReferenceBloom":
        """Build an EMPTY reference-family filter exactly as the JVM
        constructors would (``BloomFilter.java:37-46``): hashCount from
        BloomCalculations, BitSet sized ``numElements*bpe + 20`` bits →
        ``ceil(nbits/64)`` words.  ``to_bytes`` writes the word array
        UNTRIMMED, so the deserialized JVM filter keeps the same
        ``BitSet.size()`` modulus and answers every key identically
        (the reference's own serialize TRIMS trailing zero words, which
        can change the modulus — our export avoids that asymmetry)."""
        if buckets_per_element is None:
            if fpp is None:
                raise ValueError("need buckets_per_element or fpp")
            hash_count, buckets_per_element = compute_buckets_and_k(fpp)
        else:
            hash_count = compute_best_k(buckets_per_element)
        n_bits = num_elements * buckets_per_element + 20
        n_words = (max(n_bits, 1) + 63) >> 6
        return cls(hash_count, np.zeros(n_words, dtype=np.int64))

    @property
    def n_bits(self) -> int:
        """The bucket modulus: BitSet.size() of the deserialized set."""
        return 64 * len(self.words)

    def _bits(self) -> np.ndarray:
        # java.util.BitSet: bit i lives in word i>>6 at position i&63
        return (
            (self.words.view(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(bool).reshape(-1)

    def is_present(self, items) -> np.ndarray:
        buckets = string_hash_buckets(items, self.hash_count, self.n_bits)
        bits = self._bits()
        return bits[buckets].all(axis=1)

    def add(self, items) -> "ReferenceBloom":
        buckets = string_hash_buckets(items, self.hash_count, self.n_bits)
        flat = np.unique(buckets.reshape(-1))
        w = self.words.view(np.uint64)
        np.bitwise_or.at(w, flat >> 6, np.uint64(1) << (flat & 63).astype(np.uint64))
        return self

    def merge(self, other: "ReferenceBloom") -> "ReferenceBloom":
        if self.hash_count != other.hash_count or len(self.words) != len(other.words):
            raise SketchMergeError("ReferenceBloom hashCount/size mismatch")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def to_bytes(self) -> bytes:
        return (
            struct.pack(">i", self.hash_count)
            + _BITSET_PREFIX
            + struct.pack(">i", len(self.words))
            + self.words.astype(">i8").tobytes()
            + _BITSET_SUFFIX
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "ReferenceBloom":
        (hash_count,) = struct.unpack_from(">i", data, 0)
        off = 4
        if data[off : off + len(_BITSET_PREFIX)] != _BITSET_PREFIX:
            raise ValueError("unrecognized serialized BitSet layout")
        off += len(_BITSET_PREFIX)
        (n_words,) = struct.unpack_from(">i", data, off)
        off += 4
        words = np.frombuffer(data, dtype=">i8", count=n_words, offset=off).astype(np.int64)
        return cls(hash_count, words)
