"""Reference CountThenEstimate interop (``cardinality/CountThenEstimate.java:174-252``).

``CountThenEstimate.getBytes()`` wraps ``writeExternal`` in a bare
``ObjectOutputStream`` (``util/ExternalizableUtil.java:10-16``), so the
wire bytes are a Java Object Serialization stream (grammar from the
public JOS specification):

    ACED 0005                       # stream magic + version
    tipped:
      blockdata [ bool(1) type(1) int(4) estimator_bytes ]
        type: 1=LinearCounting 2=AdaptiveCounting 3=HyperLogLog
              4=LogLog 5=HyperLogLogPlus   (CountThenEstimate.java:45-49)
    untipped:
      blockdata [ bool(0) int tippingPoint ]
      OBJECT <builder>              # one of the four Builder classes
      blockdata [ int count ]
      count x OBJECT|STRING element # the exact counter set

The JOS layer here is a MINIMAL reader/writer for exactly the grammar
this stream uses (block data, class descriptors, strings, boxed
primitives, handles/back-references) — primitives are big-endian, block
data drains in <=1024-byte chunks (0x7A header above 255 bytes, 0x77
below), handles count up from 0x7E0000.  Builder field layouts and
serialVersionUIDs are taken from the reference sources (LinearCounting
.java:203-220, AdaptiveCounting.java:126-136, HyperLogLog.java:305-319,
HyperLogLogPlus.java:908-914).  Golden-tested byte-for-byte against the
javac-compiled reference in ``tests/test_cte_wire.py``.
"""

from __future__ import annotations

import struct

# estimator type markers (CountThenEstimate.java:45-49)
TYPE_LC, TYPE_AC, TYPE_HLC, TYPE_LLC, TYPE_HLPC = 1, 2, 3, 4, 5
TYPE_NAMES = {TYPE_LC: "lc", TYPE_AC: "ac", TYPE_HLC: "hlc", TYPE_LLC: "llc", TYPE_HLPC: "hlpc"}

_MAGIC = b"\xac\xed\x00\x05"
_TC_NULL, _TC_REFERENCE, _TC_CLASSDESC, _TC_OBJECT = 0x70, 0x71, 0x72, 0x73
_TC_STRING, _TC_BLOCKDATA, _TC_ENDBLOCKDATA, _TC_BLOCKDATALONG = 0x74, 0x77, 0x78, 0x7A
_TC_LONGSTRING = 0x7C  # writeObject(String) switches here above 65535 bytes
_SC_SERIALIZABLE = 0x02
_BASE_HANDLE = 0x7E0000
_BLOCK_MAX = 1024

# (class name, serialVersionUID, ordered (typecode, field) list) for the
# classes a CountThenEstimate stream can carry.  Field order follows the
# JOS canonical order (primitives sorted by name).
_CLASSES = {
    "com.clearspring.analytics.stream.cardinality.LinearCounting$Builder":
        (-4245416224034648428, [("I", "size")], None),
    "com.clearspring.analytics.stream.cardinality.AdaptiveCounting$Builder":
        (2205437102378081334, [("I", "k")], None),
    "com.clearspring.analytics.stream.cardinality.HyperLogLog$Builder":
        (-2567898469253021883, [("D", "rsd")], None),
    # LogLog$Builder is NOT Serializable in the reference (it implements
    # only IBuilder, LogLog.java:200) — the JVM throws
    # NotSerializableException on an untipped llc CountThenEstimate, so
    # there is no real serialVersionUID to pin.  This sentinel descriptor
    # (suid 0) exists ONLY for our internal partial-state frames; the
    # JVM-export path refuses untipped llc to match the JVM's own
    # behavior (ReferenceFamilyCTE.to_reference_bytes).
    "com.clearspring.analytics.stream.cardinality.LogLog$Builder":
        (0, [("I", "k")], None),
    "com.clearspring.analytics.stream.cardinality.HyperLogLogPlus$Builder":
        (-14775219914128662, [("I", "p"), ("I", "sp")], None),
    "java.lang.Number": (-8742448824652078965, [], None),
    "java.lang.Integer": (1360826667806852920, [("I", "value")], "java.lang.Number"),
    "java.lang.Long": (4290774380558885855, [("J", "value")], "java.lang.Number"),
}

_PRIM_FMT = {"I": ">i", "J": ">q", "D": ">d", "F": ">f", "S": ">h", "B": ">b", "Z": ">?", "C": ">H"}


def _mutf8_encode(s: str) -> bytes:
    """Java modified UTF-8 (DataOutputStream.writeUTF): every UTF-16
    code unit encoded independently — astral chars become CESU-8-style
    3+3-byte surrogate pairs, NUL becomes C0 80.  Plain UTF-8 for BMP
    text, but the difference matters for emoji-bearing tokens."""
    units = s.encode("utf-16-be")
    out = bytearray()
    for i in range(0, len(units), 2):
        u = (units[i] << 8) | units[i + 1]
        if 1 <= u < 0x80:
            out.append(u)
        elif u < 0x800:  # includes U+0000
            out += bytes([0xC0 | (u >> 6), 0x80 | (u & 0x3F)])
        else:
            out += bytes([0xE0 | (u >> 12), 0x80 | ((u >> 6) & 0x3F), 0x80 | (u & 0x3F)])
    return bytes(out)


def _mutf8_decode(b: bytes) -> str:
    units = []
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c < 0x80:
            units.append(c)
            i += 1
        elif c >> 5 == 0b110:
            units.append(((c & 0x1F) << 6) | (b[i + 1] & 0x3F))
            i += 2
        elif c >> 4 == 0b1110:
            units.append(((c & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6) | (b[i + 2] & 0x3F))
            i += 3
        else:
            raise ValueError(f"bad modified-UTF8 lead byte 0x{c:02x}")
    return struct.pack(f">{len(units)}H", *units).decode("utf-16-be")


class _JosReader:
    """Minimal JOS stream reader for the CountThenEstimate grammar."""

    def __init__(self, data: bytes):
        if data[:4] != _MAGIC:
            raise ValueError("not a Java object-serialization stream")
        self.data, self.pos = data, 4
        self.block_left = 0          # bytes left in the current block segment
        self.handles: list = []

    # --------------------------------------------------------- low level

    def _u1(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def _raw(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) != n:
            raise ValueError("truncated stream")
        self.pos += n
        return out

    # ------------------------------------------------------- block data

    def prim(self, n: int) -> bytes:
        """Read n bytes of primitive data, consuming block headers."""
        out = bytearray()
        while n:
            if self.block_left == 0:
                tok = self._u1()
                if tok == _TC_BLOCKDATA:
                    self.block_left = self._u1()
                elif tok == _TC_BLOCKDATALONG:
                    (self.block_left,) = struct.unpack(">i", self._raw(4))
                else:
                    raise ValueError(f"expected block data, got token 0x{tok:02x}")
            take = min(n, self.block_left)
            out += self._raw(take)
            self.block_left -= take
            n -= take
        return bytes(out)

    def prim_value(self, typecode: str):
        fmt = _PRIM_FMT[typecode]
        return struct.unpack(fmt, self.prim(struct.calcsize(fmt)))[0]

    # ----------------------------------------------------------- objects

    def _utf(self) -> str:
        (n,) = struct.unpack(">H", self._raw(2))
        return _mutf8_decode(self._raw(n))

    def _classdesc(self):
        tok = self._u1()
        if tok == _TC_NULL:
            return None
        if tok == _TC_REFERENCE:
            (h,) = struct.unpack(">i", self._raw(4))
            return self.handles[h - _BASE_HANDLE]
        if tok != _TC_CLASSDESC:
            raise ValueError(f"expected class descriptor, got 0x{tok:02x}")
        name = self._utf()
        (suid,) = struct.unpack(">q", self._raw(8))
        desc = {"name": name, "suid": suid, "fields": []}
        self.handles.append(desc)
        flags = self._u1()
        if not flags & _SC_SERIALIZABLE:
            raise ValueError(f"class {name}: only SC_SERIALIZABLE supported")
        (n_fields,) = struct.unpack(">H", self._raw(2))
        for _ in range(n_fields):
            tc = chr(self._u1())
            fname = self._utf()
            if tc in ("L", "["):
                self.read_object()  # the field's type-name string
            desc["fields"].append((tc, fname))
        if self._u1() != _TC_ENDBLOCKDATA:
            raise ValueError("class annotations not supported")
        desc["super"] = self._classdesc()
        return desc

    def read_object(self):
        if self.block_left:
            raise ValueError("object token inside unread block data")
        tok = self._u1()
        if tok == _TC_NULL:
            return None
        if tok == _TC_STRING:
            s = self._utf()
            self.handles.append(s)
            return s
        if tok == _TC_LONGSTRING:
            (n,) = struct.unpack(">q", self._raw(8))
            s = _mutf8_decode(self._raw(n))
            self.handles.append(s)
            return s
        if tok == _TC_REFERENCE:
            (h,) = struct.unpack(">i", self._raw(4))
            return self.handles[h - _BASE_HANDLE]
        if tok != _TC_OBJECT:
            raise ValueError(f"unsupported object token 0x{tok:02x}")
        desc = self._classdesc()
        obj = {"class": desc["name"], "fields": {}}
        self.handles.append(obj)
        chain = []
        d = desc
        while d is not None:
            chain.append(d)
            d = d.get("super")
        for d in reversed(chain):  # superclass data first
            for tc, fname in d["fields"]:
                fmt = _PRIM_FMT.get(tc)
                if fmt is None:
                    raise ValueError(f"object field {fname} not supported")
                (obj["fields"][fname],) = struct.unpack(fmt, self._raw(struct.calcsize(fmt)))
        return obj


class _JosWriter:
    """Minimal JOS writer: buffers primitives, drains <=1024-byte block
    chunks exactly like ObjectOutputStream's BlockDataOutputStream."""

    def __init__(self):
        self.out = bytearray(_MAGIC)
        self.buf = bytearray()
        self.n_handles = 0
        self.class_handles: dict[str, int] = {}

    def prim(self, data: bytes) -> None:
        self.buf += data

    def prim_value(self, typecode: str, v) -> None:
        self.prim(struct.pack(_PRIM_FMT[typecode], v))

    def _drain(self) -> None:
        buf = self.buf
        while buf:
            chunk, buf = buf[:_BLOCK_MAX], buf[_BLOCK_MAX:]
            if len(chunk) > 255:
                self.out += struct.pack(">Bi", _TC_BLOCKDATALONG, len(chunk))
            else:
                self.out += struct.pack(">BB", _TC_BLOCKDATA, len(chunk))
            self.out += chunk
        self.buf = bytearray()

    def _utf(self, s: str) -> None:
        b = _mutf8_encode(s)
        self.out += struct.pack(">H", len(b)) + b

    def write_string(self, s: str) -> None:
        self._drain()
        b = _mutf8_encode(s)
        if len(b) > 0xFFFF:
            self.out.append(_TC_LONGSTRING)
            self.out += struct.pack(">q", len(b)) + b
        else:
            self.out.append(_TC_STRING)
            self.out += struct.pack(">H", len(b)) + b
        self.n_handles += 1

    def write_object(self, class_name: str, values: dict) -> None:
        """Write a TC_OBJECT of one of the known classes (fresh class
        descriptors each time — correct, if not maximally compact; the
        reference reader resolves either form)."""
        self._drain()
        self.out.append(_TC_OBJECT)
        chain = []
        name = class_name
        while name is not None:
            suid, fields, sup = _CLASSES[name]
            chain.append((name, suid, fields))
            name = sup
        emitted_ref = False
        for cname, suid, fields in chain:  # descriptors: subclass first
            if emitted_ref:
                break  # a referenced descriptor carries its whole super chain
            if cname in self.class_handles:
                # repeated class: back-reference, like ObjectOutputStream
                self.out += struct.pack(">Bi", _TC_REFERENCE, self.class_handles[cname])
                emitted_ref = True
                continue
            self.out.append(_TC_CLASSDESC)
            self._utf(cname)
            self.out += struct.pack(">q", suid)
            self.class_handles[cname] = _BASE_HANDLE + self.n_handles
            self.n_handles += 1
            self.out.append(_SC_SERIALIZABLE)
            self.out += struct.pack(">H", len(fields))
            for tc, fname in fields:
                self.out.append(ord(tc))
                self._utf(fname)
            self.out.append(_TC_ENDBLOCKDATA)
        if not emitted_ref:
            self.out.append(_TC_NULL)  # top of the super chain
        self.n_handles += 1  # the object itself
        for cname, suid, fields in reversed(chain):  # data: superclass first
            for tc, fname in fields:
                self.out += struct.pack(_PRIM_FMT[tc], values[fname])

    def bytes(self) -> bytes:
        self._drain()
        return bytes(self.out)


# ------------------------------------------------------------------ public

class JavaLong(int):
    """An int element that serialized as java.lang.Long: preserves the
    boxed class across a parse→re-serialize round trip (Integer(5) and
    Long(5) are DIFFERENT elements to the JVM — Integer(5).equals(
    Long(5)) is false, so collapsing them double-counts on merge)."""

    __slots__ = ()


class ReferenceCTE:
    """Parsed reference CountThenEstimate wire state."""

    def __init__(self, tipped: bool, estimator_type: int | None = None,
                 estimator_bytes: bytes | None = None,
                 tipping_point: int | None = None,
                 builder_class: str | None = None, builder_args: dict | None = None,
                 elements: list | None = None):
        self.tipped = tipped
        self.estimator_type = estimator_type
        self.estimator_bytes = estimator_bytes
        self.tipping_point = tipping_point
        self.builder_class = builder_class
        self.builder_args = builder_args
        self.elements = elements

    def cardinality(self) -> float:
        if not self.tipped:
            return float(len(set(self.elements)))
        return float(self.estimator().cardinality())

    def estimator(self):
        """Parse the tipped estimator bytes with the matching wire codec."""
        if not self.tipped:
            raise ValueError("untipped CountThenEstimate has no estimator")
        t, b = self.estimator_type, self.estimator_bytes
        if t == TYPE_LC:
            import numpy as np

            from .lc_wire import ReferenceLC
            return ReferenceLC(np.frombuffer(b, dtype=np.uint8).copy())
        if t == TYPE_LLC:
            from .loglog_wire import ReferenceLogLog
            return ReferenceLogLog(b)
        if t == TYPE_AC:
            from .loglog_wire import ReferenceAdaptiveCounting
            return ReferenceAdaptiveCounting(b)
        if t == TYPE_HLPC:
            from .hll_wire import from_reference_bytes
            return from_reference_bytes(b)
        if t == TYPE_HLC:
            from .loglog_wire import ReferenceHyperLogLog
            return ReferenceHyperLogLog.from_bytes(b)
        raise ValueError(f"unsupported estimator type {t}")


def parse_reference_bytes(data: bytes) -> ReferenceCTE:
    rd = _JosReader(data)
    tipped = rd.prim(1) != b"\x00"
    if tipped:
        etype = rd.prim(1)[0]
        (length,) = struct.unpack(">i", rd.prim(4))
        return ReferenceCTE(True, estimator_type=etype, estimator_bytes=rd.prim(length))
    (tipping_point,) = struct.unpack(">i", rd.prim(4))
    builder = rd.read_object()
    (count,) = struct.unpack(">i", rd.prim(4))
    elements = []
    for _ in range(count):
        el = rd.read_object()
        if isinstance(el, dict):  # boxed primitive — keep the class
            v = el["fields"]["value"]
            el = JavaLong(v) if el.get("class") == "java.lang.Long" else v
        elements.append(el)
    return ReferenceCTE(False, tipping_point=tipping_point,
                        builder_class=builder["class"], builder_args=builder["fields"],
                        elements=elements)


def to_reference_bytes(cte: ReferenceCTE) -> bytes:
    wr = _JosWriter()
    wr.prim(b"\x01" if cte.tipped else b"\x00")
    if cte.tipped:
        wr.prim(bytes([cte.estimator_type]))
        wr.prim(struct.pack(">i", len(cte.estimator_bytes)))
        wr.prim(cte.estimator_bytes)
        return wr.bytes()
    wr.prim(struct.pack(">i", cte.tipping_point))
    wr.write_object(cte.builder_class, cte.builder_args)
    wr.prim(struct.pack(">i", len(cte.elements)))
    for el in cte.elements:
        if isinstance(el, str):
            wr.write_string(el)
        elif isinstance(el, int):
            # JavaLong round-trips as Long even when it fits in 32 bits
            if isinstance(el, JavaLong) or not -(1 << 31) <= el < (1 << 31):
                cls = "java.lang.Long"
            else:
                cls = "java.lang.Integer"
            wr.write_object(cls, {"value": int(el)})
        else:
            raise ValueError(f"unsupported element type {type(el)}")
    return wr.bytes()


def to_native(cte: ReferenceCTE, tipping_point: int | None = None,
              p: int = 14, sp: int = 25):
    """Reference CTE -> our native CountThenEstimate.  Untipped sets
    fold the raw elements through our murmur64 item hashing; tipped
    HLL++ states transplant registers directly (other estimator types
    stay queryable via ``ReferenceCTE.estimator()``)."""
    import numpy as np

    from ..hashing import murmur64a_array
    from .countthenestimate import CountThenEstimate

    if not cte.tipped:
        out = CountThenEstimate(tipping_point=tipping_point or cte.tipping_point, p=p, sp=sp)
        items = np.array([str(e) for e in cte.elements], dtype=object)
        if len(items):
            out.update_hashed(murmur64a_array(items).view(np.int64))
        return out
    if cte.estimator_type != TYPE_HLPC:
        raise ValueError("only HyperLogLogPlus-tipped states convert to native")
    from .hll_wire import from_reference_bytes

    sk = from_reference_bytes(cte.estimator_bytes)
    out = CountThenEstimate(tipping_point=tipping_point or 0, p=sk.p, sp=sk.sp)
    out.exact = None
    out.sketch = sk
    return out
