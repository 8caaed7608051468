"""Reference StreamSummary (Space-Saving) wire interop.

``StreamSummary.toBytes()`` (``stream/StreamSummary.java:297-299`` via
``util/ExternalizableUtil.java:10-16``) wraps ``writeExternal``
(``StreamSummary.java:262-272``) in a bare ``ObjectOutputStream``, so
the blob is a Java Object Serialization stream:

    ACED 0005                          # stream magic + version
    blockdata [ int capacity, int size ]
    size x OBJECT Counter              # ascending count order:
                                       #   writeExternal walks
                                       #   bucketList.tail()->next and
                                       #   tail is the min-count bucket
                                       #   (offer() enqueues Bucket(0)
                                       #   at the tail, Java:115)

Each ``Counter`` (``stream/Counter.java:86-92``) is Externalizable, so
its object record is

    TC_OBJECT classdesc("...stream.Counter", SUID, flags
        SC_EXTERNALIZABLE|SC_BLOCK_DATA, 0 fields)      # then TC_REFERENCE
    <external contents, block-data mode>:
        writeObject(item)    -> TC_STRING (new handle)
        blockdata [ long count, long error ]
    TC_ENDBLOCKDATA

``readExternal`` (``StreamSummary.java:240-260``) rebuilds buckets by
grouping CONSECUTIVE equal counts and appends each new bucket at the
head, and ``topK`` walks head->prev expecting descending counts
(``StreamSummary.java:189-202``) — so a writer MUST emit counters in
ascending count order with equal counts adjacent, which both directions
here preserve.  The SUID below is Java's computed (not declared) value,
pinned by the javac-compiled golden vectors
(``tools/golden/spacesaving_wire_golden.csv``, generator
``Golden10.java``); byte-exact round trips are asserted in
``tests/test_spacesaving_wire.py`` and the reference reads OUR bytes in
``tests/test_cte_readback.py`` — the interop
``TestStreamSummary.testByteSerialization`` (``src/test/java/.../
TestStreamSummary.java:169-186``) exercises JVM-side.

The JOS layer is the mini-codec from ``cte_wire`` extended with the
Externalizable object form (flags 0x0C) this grammar needs.
"""

from __future__ import annotations

import struct

import numpy as np

from .cte_wire import (
    _BASE_HANDLE,
    _SC_SERIALIZABLE,
    _TC_BLOCKDATA,
    _TC_CLASSDESC,
    _TC_ENDBLOCKDATA,
    _TC_NULL,
    _TC_OBJECT,
    _TC_REFERENCE,
    _TC_STRING,
    _JosReader,
    _JosWriter,
)

_SC_BLOCK_DATA = 0x08
_SC_EXTERNALIZABLE = 0x04

COUNTER_CLASS = "com.clearspring.analytics.stream.Counter"
# Java's computed serialVersionUID (Counter declares none); pinned by
# the golden vectors.
COUNTER_SUID = -436825287462081092


class _ExtReader(_JosReader):
    """JOS reader extended with the Externalizable Counter record."""

    def read_counter(self):
        if self.block_left:
            raise ValueError("object token inside unread block data")
        tok = self._u1()
        if tok != _TC_OBJECT:
            raise ValueError(f"expected Counter object, got token 0x{tok:02x}")
        tok = self._u1()
        if tok == _TC_CLASSDESC:
            name = self._utf()
            (suid,) = struct.unpack(">q", self._raw(8))
            if name != COUNTER_CLASS or suid != COUNTER_SUID:
                raise ValueError(f"unexpected class {name} (suid={suid})")
            self.handles.append({"name": name, "suid": suid})
            flags = self._u1()
            if not flags & _SC_EXTERNALIZABLE:
                raise ValueError("Counter descriptor not externalizable")
            if not flags & _SC_BLOCK_DATA:
                raise ValueError("pre-protocol-2 external data not supported")
            (n_fields,) = struct.unpack(">H", self._raw(2))
            if n_fields:
                raise ValueError("Counter declares no serializable fields")
            if self._u1() != _TC_ENDBLOCKDATA:
                raise ValueError("class annotations not supported")
            if self._u1() != _TC_NULL:
                raise ValueError("Counter has no serializable superclass")
        elif tok == _TC_REFERENCE:
            (h,) = struct.unpack(">i", self._raw(4))
            d = self.handles[h - _BASE_HANDLE]
            if not (isinstance(d, dict) and d.get("name") == COUNTER_CLASS):
                raise ValueError("class back-reference is not the Counter descriptor")
        else:
            raise ValueError(f"expected class descriptor, got 0x{tok:02x}")
        self.handles.append(None)  # handle slot for the Counter object itself
        # external contents, block-data mode (protocol 2)
        item = self.read_object()
        if isinstance(item, dict):  # boxed Integer/Long item
            item = item["fields"]["value"]
        count, error = struct.unpack(">qq", self.prim(16))
        if self._u1() != _TC_ENDBLOCKDATA:
            raise ValueError("unterminated external Counter data")
        return item, count, error


class _ExtWriter(_JosWriter):
    """JOS writer extended with the Externalizable Counter record."""

    def write_counter(self, item, count: int, error: int) -> None:
        self._drain()
        self.out.append(_TC_OBJECT)
        if COUNTER_CLASS in self.class_handles:
            self.out += struct.pack(">Bi", _TC_REFERENCE, self.class_handles[COUNTER_CLASS])
        else:
            self.out.append(_TC_CLASSDESC)
            self._utf(COUNTER_CLASS)
            self.out += struct.pack(">q", COUNTER_SUID)
            self.class_handles[COUNTER_CLASS] = _BASE_HANDLE + self.n_handles
            self.n_handles += 1
            self.out.append(_SC_EXTERNALIZABLE | _SC_BLOCK_DATA)
            self.out += struct.pack(">H", 0)
            self.out.append(_TC_ENDBLOCKDATA)
            self.out.append(_TC_NULL)
        self.n_handles += 1  # the Counter object
        if isinstance(item, str):
            self.write_string(item)
        elif isinstance(item, int):  # boxed, like the reference's generic T
            cls = "java.lang.Integer" if -(1 << 31) <= item < (1 << 31) else "java.lang.Long"
            self.write_object(cls, {"value": item})
        else:
            raise ValueError(f"unsupported item type {type(item)}")
        self.prim(struct.pack(">qq", count, error))
        self._drain()
        self.out.append(_TC_ENDBLOCKDATA)


class ReferenceStreamSummary:
    """Parsed reference StreamSummary state: capacity plus counters in
    the stream's ascending-count order."""

    def __init__(self, capacity: int, counters: list[tuple[str, int, int]]):
        self.capacity = capacity
        self.counters = counters  # [(item, count, error)] ascending count

    def top_k(self, k: int) -> list[tuple[str, int, int]]:
        """(count desc, stream order) — the reference's head->prev walk
        visits the highest bucket first; within a bucket order follows
        the stream, which a stable descending sort preserves."""
        return sorted(self.counters, key=lambda t: -t[1])[:k]

    def to_native(self):
        from .spacesaving import SpaceSaving

        sk = SpaceSaving(self.capacity)
        for item, count, error in self.counters:
            sk.counts[item] = count
            sk.errors[item] = error
        sk.n = sum(c for _, c, _ in self.counters)
        return sk


def parse_reference_bytes(data: bytes) -> ReferenceStreamSummary:
    rd = _ExtReader(data)
    capacity, size = struct.unpack(">ii", rd.prim(8))
    counters = [rd.read_counter() for _ in range(size)]
    return ReferenceStreamSummary(capacity, counters)


def to_reference_bytes(ss: ReferenceStreamSummary) -> bytes:
    counters = ss.counters
    if any(counters[i][1] > counters[i + 1][1] for i in range(len(counters) - 1)):
        # non-ascending counts would scramble the reference's bucket
        # rebuild (readExternal groups consecutive equal counts)
        counters = sorted(counters, key=lambda t: t[1])
    wr = _ExtWriter()
    wr.prim(struct.pack(">ii", ss.capacity, len(counters)))
    for item, count, error in counters:
        wr.write_counter(item, count, error)
    return wr.bytes()


def from_native(sk) -> ReferenceStreamSummary:
    """Our SpaceSaving summary -> reference wire state (ascending count,
    key-ascending within ties for determinism).  Item TYPE is preserved:
    a summary built over a numeric column exports boxed Integer/Long
    items (the ``_ExtWriter`` boxed paths), so a JVM consumer offering
    Integers against the import gets counter hits — stringifying here
    would silently strand them as '123' strings."""

    def _item(k):
        if isinstance(k, bool):  # bool is an int subclass; not a wire type
            return str(k)
        if isinstance(k, (int, np.integer)):
            return int(k)
        return str(k)

    counters = sorted(
        ((_item(k), int(c), int(sk.errors.get(k, 0))) for k, c in sk.counts.items()),
        key=lambda t: (t[1], str(t[0])),
    )
    return ReferenceStreamSummary(sk.capacity, counters)
