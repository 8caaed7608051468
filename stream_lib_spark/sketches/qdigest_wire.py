"""Reference QDigest interop (``quantile/QDigest.java:314-371``).

Wire format (big-endian DataOutputStream):

    long   size                 # total count of offered values
    double compressionFactor
    long   capacity             # universe size, a power of two
    int    node_count
    node_count x (long node_id, long count)

Node ids use the same heap numbering as our rebuild (root = 1, children
2v/2v+1, leaf for value x = capacity + x — ``QDigest.java:85-116``), so
conversion is a direct (ids, counts) transplant.  The reference emits
nodes in its hash map's iteration order and its deserializer accepts
any order (``QDigest.java:343-363``), so the parser here is
order-insensitive and our serializer emits sorted ids — a canonical,
reference-readable form.

``reference_quantile`` replicates ``QDigest.getQuantile``
(``QDigest.java:289-309``): sort ranges by (rangeRight, range length),
walk the cumulative count until it exceeds q*size, return that range's
right endpoint.  Golden-tested in ``tests/test_qdigest_wire.py``.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import clz64
from .qdigest import QDigest

U64 = np.uint64


def parse_reference_bytes(data: bytes) -> tuple[int, float, int, np.ndarray, np.ndarray]:
    """-> (size, compression_factor, capacity, ids sorted, counts)."""
    size, cf, capacity, n_nodes = struct.unpack_from(">qdqi", data, 0)
    off = struct.calcsize(">qdqi")
    pairs = np.frombuffer(data, dtype=">i8", count=2 * n_nodes, offset=off).astype(np.int64)
    ids, counts = pairs[0::2].view(U64), pairs[1::2]
    order = np.argsort(ids, kind="stable")
    return size, cf, capacity, ids[order], counts[order].copy()


def to_reference_bytes(qd: QDigest) -> bytes:
    """Serialize a native QDigest in the reference's byte format
    (sorted node ids — any order is valid to the reference reader)."""
    capacity = 1 << qd.log_cap
    out = bytearray(struct.pack(">qdqi", qd.n, qd.k, capacity, len(qd.ids)))
    pairs = np.empty(2 * len(qd.ids), dtype=np.int64)
    pairs[0::2] = qd.ids.view(np.int64)
    pairs[1::2] = qd.counts
    out += pairs.astype(">i8").tobytes()
    return bytes(out)


def from_reference_bytes(data: bytes) -> QDigest:
    """Reference blob -> native QDigest (same tree, same counts)."""
    size, cf, capacity, ids, counts = parse_reference_bytes(data)
    qd = QDigest(compression_factor=cf)
    qd.log_cap = max(1, int(capacity).bit_length() - 1)
    qd.ids, qd.counts, qd.n = ids, counts, size
    return qd


def reference_quantile(data_or_qd, q: float) -> int:
    """Exact replica of the reference's getQuantile over a wire blob or
    a native QDigest (``QDigest.java:289-309``)."""
    if isinstance(data_or_qd, QDigest):
        qd = data_or_qd
        size, capacity = qd.n, 1 << qd.log_cap
        ids, counts = qd.ids, qd.counts
    else:
        size, _cf, capacity, ids, counts = parse_reference_bytes(data_or_qd)
    if not len(ids):
        raise ValueError("empty q-digest")
    # range endpoints: node v at depth d covers leaves [v<<(L-d), ...)
    depth = (63 - clz64(ids)).astype(np.int64)  # floor(log2(id)), exact
    log_cap = int(capacity).bit_length() - 1
    shift = (log_cap - depth).astype(U64)
    left = (ids << shift).astype(np.int64) - capacity
    right = (((ids + U64(1)) << shift).astype(np.int64) - 1) - capacity
    length = right - left
    order = np.lexsort((length, right))  # RANGES_COMPARATOR: right, then size
    csum = np.cumsum(counts[order])
    idx = int(np.searchsorted(csum, q * size, side="right"))
    if idx >= len(order):
        idx = len(order) - 1
    return int(right[order[idx]])
