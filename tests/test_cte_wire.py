"""Reference CountThenEstimate interop vs javac-compiled goldens: parse
the Java object-serialization wire bytes (tipped and untipped forms),
match the reference's own cardinality answers, re-serialize
BYTE-FOR-BYTE, and convert to the native sketch."""

import base64
import csv
import math
import os

from stream_lib_spark.sketches.cte_wire import (
    TYPE_HLPC,
    parse_reference_bytes,
    to_native,
    to_reference_bytes,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "cte_wire_golden.csv")


def _rows():
    with open(GOLDEN) as f:
        for name, n, tipped, card, b64 in csv.reader(f):
            yield name, int(n), tipped == "true", float(card), base64.b64decode(b64)


def test_parse_flags_and_byte_roundtrip():
    seen = 0
    for name, n, tipped, _card, blob in _rows():
        cte = parse_reference_bytes(blob)
        assert cte.tipped == tipped, name
        # re-serialization through our minimal JOS writer is byte-exact
        assert to_reference_bytes(cte) == blob, f"{name}: byte roundtrip"
        if not tipped:
            assert len(cte.elements) == n
        seen += 1
    assert seen >= 7


def test_cardinality_parity():
    for name, n, tipped, ref_card, blob in _rows():
        cte = parse_reference_bytes(blob)
        if not tipped:
            assert cte.cardinality() == ref_card == n
        elif cte.estimator_type == TYPE_HLPC:
            # our HLL++ uses the Ertl estimator (deliberate departure);
            # parity here is the published error bound, not bit-equality
            p = cte.estimator().p
            rse = 1.04 / math.sqrt(1 << p)
            assert abs(cte.cardinality() - ref_card) <= 5 * rse * max(ref_card, 1)
        else:
            # LC / AC / LLC / HLC replicas are estimate-exact
            est = cte.estimator().cardinality()
            assert math.floor(est + 0.5) == ref_card or int(est) == ref_card, name


def test_untipped_elements_round_trip_values():
    for name, _n, tipped, _card, blob in _rows():
        if tipped:
            continue
        cte = parse_reference_bytes(blob)
        # element ORDER is the reference HashSet's iteration order (and
        # round-trips byte-exactly above); VALUES are the exact set
        if "ints" in name:
            assert set(cte.elements) == {i * 7 for i in range(30)}
            assert cte.builder_args == {"size": 1024}
        elif "unicode" in name:
            # astral + accented + CJK elements: Java writeUTF is MODIFIED
            # UTF-8 (CESU-8 surrogates) — exact value parity proves the
            # codec decodes/encodes it, not plain UTF-8
            assert set(cte.elements) == {"😀", "café", "日本語", "a🚀b"}
        else:
            assert set(cte.elements) == {f"item-{i}" for i in range(len(cte.elements))}
        assert cte.tipping_point == 1000


def test_to_native():
    for name, n, tipped, ref_card, blob in _rows():
        cte = parse_reference_bytes(blob)
        if not tipped:
            native = to_native(cte)
            assert native.cardinality() == n
            # folding the same elements again is idempotent (a set)
            native.merge(to_native(cte))
            assert native.cardinality() == n
        elif cte.estimator_type == TYPE_HLPC:
            native = to_native(cte)
            assert native.tipped
            assert abs(native.cardinality() - ref_card) / max(ref_card, 1) < 0.1


def test_modified_utf8_matches_java_writeutf():
    """Pinned vector from DataOutputStream.writeUTF (compiled + run with
    Java 17): astral char as a CESU-8 surrogate pair, NUL as C0 80."""
    import struct

    from stream_lib_spark.sketches.cte_wire import _mutf8_decode, _mutf8_encode

    s = "a\U0001F600b\x00cé日"
    b = _mutf8_encode(s)
    assert (struct.pack(">H", len(b)) + b).hex() == "001061eda0bdedb88062c08063c3a9e697a5"
    assert _mutf8_decode(b) == s


def test_longstring_roundtrip():
    """Elements over 65535 modified-UTF8 bytes use TC_LONGSTRING (what
    the JVM's writeObject(String) emits) — byte round trip + JVM
    read-back direction covered by cte readback fixtures elsewhere."""
    from stream_lib_spark.sketches.cte_wire import (
        ReferenceCTE,
        parse_reference_bytes,
        to_reference_bytes,
    )

    big = "x" * 70_000 + "😀"
    cte = ReferenceCTE(False, tipping_point=1000,
                       builder_class="com.clearspring.analytics.stream.cardinality.LinearCounting$Builder",
                       builder_args={"size": 1024}, elements=["small", big])
    blob = to_reference_bytes(cte)
    back = parse_reference_bytes(blob)
    assert back.elements == ["small", big]
    assert to_reference_bytes(back) == blob
