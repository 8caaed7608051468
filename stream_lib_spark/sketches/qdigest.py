"""Q-Digest (Shrivastava et al., SenSys'04) over numpy node arrays —
the rebuild of the reference's ``quantile/QDigest.java:51-371``.

Contract carried over (``QDigest.java:22-27``, ``QDigestTest.java:42-60``):
the actual rank of ``quantile(q)`` lies in ``q ± eps`` with
``eps = logCapacity / compression_factor``, where logCapacity is the
tree depth for the currently-seen value range (the digest grows its
universe dynamically, like the reference's rebuildToCapacity); two
digests with the same compression factor union losslessly
(``QDigest.java:154-183``).

Design departures from the Java original (Spark-first, not a port):
state is a pair of sorted numpy arrays (node ids uint64, counts int64)
instead of a Long2LongOpenHashMap; batch updates fold an exact
value_counts table with one ``np.unique`` pass; compression is a
bottom-up LEVEL sweep, each level vectorized (group children by parent,
family-total test, fold) rather than per-node hash-map navigation.

Node encoding (standard heap numbering): root = 1, children of v are
2v and 2v+1; at tree depth L (universe sigma = 2^L) the leaf for value
x is sigma + x; the node at depth d with id v covers values
[(v - 2^d) << (L-d), ((v - 2^d + 1) << (L-d)) - 1].
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import clz64
from .base import HEADER_SIZE, SketchMergeError, pack_header, unpack_header

KIND_QDIGEST = 12

U64 = np.uint64


class QDigest:
    def __init__(self, compression_factor: float = 1024.0):
        if compression_factor < 1:
            raise ValueError("compression_factor must be >= 1")
        self.k = float(compression_factor)
        self.log_cap = 1  # tree depth L; universe = [0, 2^L)
        self.ids = np.empty(0, dtype=U64)     # sorted ascending
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0

    # ------------------------------------------------------------ properties

    @property
    def eps(self) -> float:
        """Published rank-error bound for the CURRENT capacity."""
        return self.log_cap / self.k

    # ---------------------------------------------------------------- update

    def update_batch(self, values: np.ndarray, counts: np.ndarray | None = None) -> "QDigest":
        """Fold an exact (value, count) table.  Values must be
        non-negative int64 (the reference only supports x >= 0,
        ``QDigest.java:110-113``)."""
        v = np.asarray(values, dtype=np.int64)
        if len(v) == 0:
            return self
        if counts is None:
            counts = np.ones(len(v), dtype=np.int64)
        counts = np.asarray(counts, dtype=np.int64)
        if int(v.min()) < 0:
            raise ValueError("QDigest only supports non-negative values")
        self._grow(int(v.max()))
        leaf_ids = (U64(1) << U64(self.log_cap)) + v.view(U64)
        self._fold(leaf_ids, counts)
        self.n += int(counts.sum())
        self._compress()
        return self

    def add_values(self, values: np.ndarray) -> "QDigest":
        v = np.asarray(values)
        u, c = np.unique(v.astype(np.int64), return_counts=True)
        return self.update_batch(u, c)

    # ---------------------------------------------------------------- sizing

    def _grow(self, max_value: int) -> None:
        need = max(1, int(max_value).bit_length())
        if need <= self.log_cap:
            return
        d_l = need - self.log_cap
        if len(self.ids):
            # re-root: node '1 p1..pd' at depth d becomes '1 0^dL p1..pd'
            # (same value range in the larger universe)
            depth = (U64(63) - clz64(self.ids).astype(U64)).astype(U64)
            path = self.ids & ((U64(1) << depth) - U64(1))
            self.ids = (U64(1) << (depth + U64(d_l))) | path
            order = np.argsort(self.ids, kind="stable")
            self.ids, self.counts = self.ids[order], self.counts[order]
        self.log_cap = need

    def _fold(self, new_ids: np.ndarray, new_counts: np.ndarray) -> None:
        ids = np.concatenate([self.ids, new_ids])
        cnts = np.concatenate([self.counts, new_counts])
        uniq, inv = np.unique(ids, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, cnts)
        self.ids, self.counts = uniq, summed

    # -------------------------------------------------------------- compress

    def _compress(self) -> None:
        """Bottom-up level sweep: fold every family (children + parent)
        whose total is <= floor(n/k) into the parent.  Restores the
        q-digest property; each level is one vectorized pass.

        Because ``ids`` is sorted, the nodes of a level are one
        CONTIGUOUS slice ([2^l, 2^{l+1})) and folded parents land only
        in the prefix below it — so each level merges two sorted runs
        instead of re-sorting the whole node array (the hot path when a
        fresh 64k-unique batch is folded in)."""
        threshold = int(self.n // self.k)
        if threshold <= 0 or not len(self.ids):
            return
        ids, counts = self.ids, self.counts
        for level in range(self.log_cap, 0, -1):
            lo = int(np.searchsorted(ids, U64(1) << U64(level)))
            # level 63's upper bound 2^64 overflows uint64 (1<<64 == 0,
            # which would empty the slice or crash) — the top level's
            # nodes simply run to the end of the sorted id array
            hi = (len(ids) if level >= 63
                  else int(np.searchsorted(ids, U64(1) << U64(level + 1))))
            if lo == hi:
                continue
            child_ids = ids[lo:hi]
            child_cnts = counts[lo:hi]
            parents = child_ids >> U64(1)  # sorted, since children are
            new_fam = np.empty(len(parents), dtype=bool)
            new_fam[0] = True
            new_fam[1:] = parents[1:] != parents[:-1]
            fam_idx = np.cumsum(new_fam) - 1
            uniq_p = parents[new_fam]
            fam = np.zeros(len(uniq_p), dtype=np.int64)
            np.add.at(fam, fam_idx, child_cnts)
            if lo:
                pos = np.minimum(np.searchsorted(ids[:lo], uniq_p), lo - 1)
                has_parent = ids[pos] == uniq_p
                pcnt = np.where(has_parent, counts[pos], 0)
            else:
                pcnt = np.zeros(len(uniq_p), dtype=np.int64)
            merge_fam = (fam + pcnt) <= threshold
            if not merge_fam.any():
                continue
            drop_children = merge_fam[fam_idx]
            add_ids = uniq_p[merge_fam]
            add_cnts = fam[merge_fam]  # parent's own count survives in prefix
            pre_ids = np.concatenate([ids[:lo], add_ids])
            pre_cnts = np.concatenate([counts[:lo], add_cnts])
            order = np.argsort(pre_ids, kind="stable")
            pre_ids, pre_cnts = pre_ids[order], pre_cnts[order]
            uniq_mask = np.empty(len(pre_ids), dtype=bool)
            uniq_mask[0] = True
            uniq_mask[1:] = pre_ids[1:] != pre_ids[:-1]
            gid = np.cumsum(uniq_mask) - 1
            summed = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
            np.add.at(summed, gid, pre_cnts)
            ids = np.concatenate([pre_ids[uniq_mask], child_ids[~drop_children], ids[hi:]])
            counts = np.concatenate([summed, child_cnts[~drop_children], counts[hi:]])
        self.ids, self.counts = ids, counts

    # ----------------------------------------------------------------- query

    def _ranges(self) -> tuple[np.ndarray, np.ndarray]:
        depth = (U64(63) - clz64(self.ids).astype(U64)).astype(U64)
        shift = U64(self.log_cap) - depth
        base = (self.ids - (U64(1) << depth)) << shift
        hi = base + (U64(1) << shift) - U64(1)
        return base.astype(np.int64), hi.astype(np.int64)

    def quantile(self, q: float) -> float:
        """Value whose actual rank is within ``eps`` of q
        (``QDigestTest.java:55-60`` window check)."""
        if not len(self.ids):
            return float("nan")
        lo, hi = self._ranges()
        # post-order: ascending upper bound, larger ranges first on ties
        order = np.lexsort((lo, hi))
        cum = np.cumsum(self.counts[order])
        target = q * self.n
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(cum) - 1)
        return float(hi[order][idx])

    # ---------------------------------------------------------------- merge

    def merge(self, other: "QDigest") -> "QDigest":
        if self.k != other.k:
            raise SketchMergeError(
                f"QDigest compression mismatch: {self.k} vs {other.k}"
            )
        if other.log_cap > self.log_cap:
            # grow to the larger universe first (max_value of that cap)
            self._grow((1 << other.log_cap) - 1)
        o_ids, o_log = other.ids, other.log_cap
        if o_log < self.log_cap and len(o_ids):
            d_l = self.log_cap - o_log
            depth = (U64(63) - clz64(o_ids).astype(U64)).astype(U64)
            path = o_ids & ((U64(1) << depth) - U64(1))
            o_ids = (U64(1) << (depth + U64(d_l))) | path
            order = np.argsort(o_ids, kind="stable")
            o_ids = o_ids[order]
            o_cnts = other.counts[order]
        else:
            o_cnts = other.counts
        self._fold(o_ids, o_cnts)
        self.n += other.n
        self._compress()
        return self

    # ---------------------------------------------------------------- bytes

    def to_bytes(self) -> bytes:
        head = pack_header(KIND_QDIGEST) + struct.pack(
            "<dBqI", self.k, self.log_cap, self.n, len(self.ids)
        )
        return head + self.ids.tobytes() + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "QDigest":
        _, kind = unpack_header(data)
        if kind != KIND_QDIGEST:
            raise ValueError(f"not a QDigest blob (kind={kind})")
        k, log_cap, n, m = struct.unpack_from("<dBqI", data, HEADER_SIZE)
        off = HEADER_SIZE + struct.calcsize("<dBqI")
        sk = cls(compression_factor=k)
        sk.log_cap = log_cap
        sk.n = n
        sk.ids = np.frombuffer(data, dtype=U64, count=m, offset=off).copy()
        sk.counts = np.frombuffer(data, dtype=np.int64, count=m, offset=off + 8 * m).copy()
        return sk
