"""Reference LogLog / AdaptiveCounting interop vs javac-compiled
goldens: the rebuilt update paths (murmur2-32 and lookup3ycs64 register
addressing) must reproduce the reference's register array BYTE-FOR-BYTE
and match its estimate exactly; merge is register-max."""

import base64
import csv
import os

from stream_lib_spark.sketches.loglog_wire import (
    ReferenceAdaptiveCounting,
    ReferenceLogLog,
    lookup3ycs64,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "loglog_wire_golden.csv")


def _rows():
    with open(GOLDEN) as f:
        for kind, k, n, card, b64 in csv.reader(f):
            yield kind, int(k), int(n), int(card), base64.b64decode(b64)


def _cls(kind):
    return ReferenceLogLog if kind == "loglog" else ReferenceAdaptiveCounting


def test_register_and_estimate_parity():
    seen = 0
    for kind, k, n, ref_card, blob in _rows():
        mine = _cls(kind).new(k)
        mine.add([f"item-{i}" for i in range(n)])
        assert mine.to_bytes() == blob, f"{kind} k={k} n={n} register mismatch"
        # import + estimate parity (wire format IS the register array)
        imported = _cls(kind)(blob)
        assert imported.cardinality() == ref_card
        assert imported.to_bytes() == blob
        seen += 1
    assert seen >= 6


def test_split_merge_equals_whole():
    for kind, k, n, _card, blob in _rows():
        if n < 100:
            continue
        parts = [_cls(kind).new(k) for _ in range(4)]
        for i in range(n):
            parts[i % 4].add([f"item-{i}"])
        merged = parts[0]
        for p in parts[1:]:
            merged.merge(p)
        assert merged.to_bytes() == blob
        break


def test_lookup3ycs64_matches_spec_identities():
    # distinct inputs hash distinctly and deterministically
    vals = {lookup3ycs64(f"item-{i}") for i in range(1000)}
    assert len(vals) == 1000
    assert lookup3ycs64("") == lookup3ycs64("")
    # unicode (non-BMP) goes through the code-point path without error
    assert isinstance(lookup3ycs64("héllo \U0001F600"), int)
