"""Bottom-k sample — the mergeable rebuild of StochasticTopper.

The reference's StochasticTopper (``stream/StochasticTopper.java:31-78``
over ``stream/SampleSet.java:25-209``) keeps a reservoir sample and
reports top-k from sample counts.  Classic reservoir sampling is
RNG-order-dependent and doesn't merge; the rebuild uses the standard
*bottom-k (min-hash) sample*: keep the k items with the smallest 64-bit
hash.  That is a uniform-without-replacement sample of the DISTINCT
items that is deterministic, order-insensitive, and a true monoid
(merge = union, keep k smallest) — byte-identical under any grouping.
Alongside each sampled item we keep its observed count, summed on
merge, so ``top_k`` reports the heaviest items *within the sample*
(the StochasticTopper contract: approximate top-k from a bounded
sample) and the sample supports distinct-count estimation via the
k-th smallest hash (bottom-k estimator: (k-1) * 2^64 / h_(k)).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import HEADER_SIZE, SketchMergeError, pack_header, unpack_header

KIND_BOTTOMK = 11

U64 = np.uint64


class BottomKSample:
    def __init__(self, k: int = 256):
        self.k = k
        self.hashes = np.empty(0, dtype=U64)  # sorted ascending
        self.items: list[str] = []            # aligned with hashes
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0

    def update_batch(self, items: np.ndarray, counts: np.ndarray) -> "BottomKSample":
        """Fold an exact (item, count) table (items hashed here via
        xxhash-free path: caller supplies strings; we hash with murmur
        for determinism across engines)."""
        from ..hashing import murmur64a_array

        self.n += int(counts.sum())
        h = murmur64a_array(items.astype(object))
        return self._fold(h, items, counts.astype(np.int64))

    def _fold(self, h: np.ndarray, items: np.ndarray, counts: np.ndarray) -> "BottomKSample":
        all_h = np.concatenate([self.hashes, h])
        all_items = np.array(self.items + [str(x) for x in items], dtype=object)
        all_counts = np.concatenate([self.counts, counts])
        # combine duplicates (same hash ⇒ same item), sum counts
        order = np.argsort(all_h, kind="stable")
        all_h, all_items, all_counts = all_h[order], all_items[order], all_counts[order]
        uniq_mask = np.empty(len(all_h), dtype=bool)
        if len(all_h):
            uniq_mask[0] = True
            uniq_mask[1:] = all_h[1:] != all_h[:-1]
        group_ids = np.cumsum(uniq_mask) - 1
        summed = np.zeros(group_ids[-1] + 1 if len(group_ids) else 0, dtype=np.int64)
        np.add.at(summed, group_ids, all_counts)
        keep_h = all_h[uniq_mask][: self.k]
        self.hashes = keep_h
        self.items = all_items[uniq_mask][: self.k].tolist()
        self.counts = summed[: len(keep_h)]  # summed is per-unique, hash-ordered
        return self

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        if self.k != other.k:
            raise SketchMergeError("BottomKSample k mismatch")
        self.n += other.n
        return self._fold(other.hashes, np.array(other.items, dtype=object), other.counts)

    def top_k(self, k: int) -> list[tuple[str, int]]:
        order = sorted(range(len(self.items)), key=lambda i: (-int(self.counts[i]), self.items[i]))
        return [(self.items[i], int(self.counts[i])) for i in order[:k]]

    def distinct_estimate(self) -> float:
        """Bottom-k distinct estimator: (k-1) * 2^64 / h_(k)."""
        if len(self.hashes) < self.k:
            return float(len(self.hashes))  # sample is exhaustive
        return (self.k - 1) * (2.0 ** 64) / float(self.hashes[self.k - 1])

    def to_bytes(self) -> bytes:
        head = pack_header(KIND_BOTTOMK) + struct.pack("<IIq", self.k, len(self.items), self.n)
        parts = [head, self.hashes.tobytes(), self.counts.tobytes()]
        for it in self.items:
            b = it.encode("utf-8")
            parts.append(struct.pack("<I", len(b)) + b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "BottomKSample":
        _, kind = unpack_header(data)
        if kind != KIND_BOTTOMK:
            raise ValueError(f"not a BottomKSample blob (kind={kind})")
        k, m, n = struct.unpack_from("<IIq", data, HEADER_SIZE)
        off = HEADER_SIZE + struct.calcsize("<IIq")
        sk = cls(k=k)
        sk.n = n
        sk.hashes = np.frombuffer(data, dtype=U64, count=m, offset=off).copy()
        off += 8 * m
        sk.counts = np.frombuffer(data, dtype=np.int64, count=m, offset=off).copy()
        off += 8 * m
        items = []
        for _ in range(m):
            (blen,) = struct.unpack_from("<I", data, off)
            off += 4
            items.append(data[off : off + blen].decode("utf-8"))
            off += blen
        sk.items = items
        return sk
