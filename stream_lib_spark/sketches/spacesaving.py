"""Space-Saving top-k summary (Metwally et al.), mergeable.

The reference's StreamSummary (``stream/StreamSummary.java:43-298``)
keeps a capacity-bound counter list: a new item evicts the min-count
counter and inherits its count as ``error`` (``StreamSummary.java:117-124``).
It has **no merge** (single-stream only).  The rebuild adds the
mergeable-summaries semantics of Agarwal et al. ("Mergeable Summaries",
PODS'12): merge = sum counts/errors of common items; items present in
only one summary inherit the other's min-count as additional error;
then truncate back to capacity by (count desc, key asc), DROPPING the
evicted tail entries outright.

Invariants the truncation preserves (the actual contract, validated in
tests/test_bloom_topk.py): for every surviving item,
``count(x) >= true_count(x)`` and ``count(x) - error(x) <=
true_count(x)`` — dropping other entries never changes a survivor's
bookkeeping.  What truncation weakens is the floor used by FUTURE
inserts/merges: a later arrival of a dropped item re-enters at the
current min-count, exactly like the classic eviction inheritance.  The
heavy-hitter guarantee (any item with true frequency > N/capacity is
present) holds because such an item's count always exceeds the
capacity-th largest count at every truncation point.

Batch update is vectorized: a pandas/numpy ``value_counts`` of the batch
is an *exact* frequency table, folded into the summary in one pass —
far better than per-item offer loops, and it preserves the Space-Saving
invariants: ``count(x) >= true_count(x)`` and
``count(x) - error(x) <= true_count(x)``.

Guarantee carried over from the reference tests
(``stream/TestStreamSummary.java:43-127``): any item with true frequency
> N/capacity is in the summary; per-item overcount <= error.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import HEADER_SIZE, KIND_SPACESAVING, SketchMergeError, pack_header, unpack_header


class SpaceSaving:
    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counts: dict[object, int] = {}
        self.errors: dict[object, int] = {}
        self.n = 0

    # ---------------------------------------------------------------- update

    def update_batch(self, items: np.ndarray, counts: np.ndarray) -> "SpaceSaving":
        """Fold an exact (item, count) frequency table into the summary.

        Bulk form of the mergeable-summaries fold (the batch table is an
        exact summary with zero error): untracked items enter at
        ``floor + c`` where ``floor`` is the current min count (an upper
        bound on their pre-batch frequency, exactly the classic
        Space-Saving eviction inheritance, ``StreamSummary.java:117-124``),
        then one sorted truncation back to capacity.

        Vectorized: membership via one hashed ``pd.Index.isin`` probe,
        and when the batch has more new uniques than capacity they are
        pre-truncated with a numpy lexsort on (count desc, key asc) —
        provably the only new items that can survive the final
        truncation, so the result is identical to the naive fold while
        the Python-loop work is bounded by O(capacity), not O(uniques).
        """
        import pandas as pd

        counts = np.asarray(counts, dtype=np.int64)
        self.n += int(counts.sum())
        floor = min(self.counts.values()) if len(self.counts) >= self.capacity else 0
        s_items = np.asarray(items, dtype=object)
        if self.counts:
            in_existing = pd.Index(s_items).isin(self.counts.keys())
        else:
            in_existing = np.zeros(len(s_items), dtype=bool)
        for it, c in zip(s_items[in_existing].tolist(), counts[in_existing].tolist()):
            self.counts[it] += int(c)
        new_items, new_counts = s_items[~in_existing], counts[~in_existing]
        if len(new_items) > self.capacity:
            # (count desc, key asc) — same comparator as the final
            # truncation; anything past capacity here is past capacity
            # there too, since all new items share the same floor offset
            order = np.lexsort((new_items.astype("U"), -new_counts))[: self.capacity]
            new_items, new_counts = new_items[order], new_counts[order]
        for it, c in zip(new_items.tolist(), new_counts.tolist()):
            self.counts[it] = int(c) + floor
            self.errors[it] = floor
        if len(self.counts) > self.capacity:
            ranked = sorted(self.counts.items(), key=lambda kv: (-kv[1], _key(kv[0])))
            self.counts = dict(ranked[: self.capacity])
            self.errors = {k: self.errors.get(k, 0) for k in self.counts}
        return self

    # ---------------------------------------------------------------- merge

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if self.capacity != other.capacity:
            raise SketchMergeError("SpaceSaving capacity mismatch")
        min_a = min(self.counts.values(), default=0) if len(self.counts) >= self.capacity else 0
        min_b = min(other.counts.values(), default=0) if len(other.counts) >= other.capacity else 0
        merged_c: dict[object, int] = {}
        merged_e: dict[object, int] = {}
        for item, c in self.counts.items():
            if item in other.counts:
                merged_c[item] = c + other.counts[item]
                merged_e[item] = self.errors.get(item, 0) + other.errors.get(item, 0)
            else:
                merged_c[item] = c + min_b
                merged_e[item] = self.errors.get(item, 0) + min_b
        for item, c in other.counts.items():
            if item not in self.counts:
                merged_c[item] = c + min_a
                merged_e[item] = other.errors.get(item, 0) + min_a
        # truncate to capacity by (count desc, key asc) — deterministic
        if len(merged_c) > self.capacity:
            ranked = sorted(merged_c.items(), key=lambda kv: (-kv[1], _key(kv[0])))
            merged_c = dict(ranked[: self.capacity])
            merged_e = {k: merged_e[k] for k in merged_c}
        self.counts, self.errors = merged_c, merged_e
        self.n += other.n
        return self

    # ---------------------------------------------------------------- query

    def top_k(self, k: int) -> list[tuple[object, int, int]]:
        """[(item, count, error)] sorted by (count desc, item asc)."""
        ranked = sorted(self.counts.items(), key=lambda kv: (-kv[1], _key(kv[0])))
        return [(item, c, self.errors.get(item, 0)) for item, c in ranked[:k]]

    # ---------------------------------------------------------------- bytes

    def to_bytes(self) -> bytes:
        """Version-2 blob: items carry a TYPE tag (0=str utf-8, 1=int64)
        so a round trip preserves identity — the v1 codec stringified
        every key, so a deserialized summary double-tracked non-string
        items against the original on further updates and silently
        collapsed ('1' vs 1) on re-serialization."""
        items = sorted(self.counts.items(), key=lambda kv: _key(kv[0]))
        parts = [pack_header(KIND_SPACESAVING, version=2),
                 struct.pack("<IIq", self.capacity, len(items), self.n)]
        for item, c in items:
            if isinstance(item, (int, np.integer)) and not isinstance(item, bool)                     and -(1 << 63) <= int(item) < (1 << 63):
                parts.append(struct.pack("<BIqq", 1, 8, c, self.errors.get(item, 0)))
                parts.append(struct.pack("<q", int(item)))
            else:
                b = str(item).encode("utf-8")
                parts.append(struct.pack("<BIqq", 0, len(b), c, self.errors.get(item, 0)))
                parts.append(b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "SpaceSaving":
        version, kind = unpack_header(data)
        if kind != KIND_SPACESAVING:
            raise ValueError(f"not a SpaceSaving blob (kind={kind})")
        capacity, n_items, n = struct.unpack_from("<IIq", data, HEADER_SIZE)
        off = HEADER_SIZE + struct.calcsize("<IIq")
        sk = cls(capacity)
        sk.n = n
        for _ in range(n_items):
            if version >= 2:
                tag, blen, c, e = struct.unpack_from("<BIqq", data, off)
                off += struct.calcsize("<BIqq")
            else:  # legacy v1: untagged utf-8 strings
                tag = 0
                blen, c, e = struct.unpack_from("<Iqq", data, off)
                off += struct.calcsize("<Iqq")
            if tag == 1:
                (item,) = struct.unpack_from("<q", data, off)
                item = int(item)
            else:
                item = data[off: off + blen].decode("utf-8")
            off += blen
            sk.counts[item] = c
            sk.errors[item] = e
        return sk


def _key(x: object) -> str:
    return str(x)
