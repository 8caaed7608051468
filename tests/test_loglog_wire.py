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


HLLC_GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                           "hllc_wire_golden.csv")


def test_classic_hll_register_and_estimate_parity():
    from stream_lib_spark.sketches.loglog_wire import ReferenceHyperLogLog

    seen = 0
    for log2m, n, card, b64 in csv.reader(open(HLLC_GOLDEN)):
        blob = base64.b64decode(b64)
        mine = ReferenceHyperLogLog.new(int(log2m))
        mine.add([f"item-{i}" for i in range(int(n))])
        assert mine.to_bytes() == blob, f"log2m={log2m} register mismatch"
        imported = ReferenceHyperLogLog.from_bytes(blob)
        assert imported.cardinality() == int(card)
        assert imported.to_bytes() == blob
        # split/merge = whole
        parts = [ReferenceHyperLogLog.new(int(log2m)) for _ in range(3)]
        for i in range(int(n)):
            parts[i % 3].add([f"item-{i}"])
        merged = parts[0].merge(parts[1]).merge(parts[2])
        assert merged.to_bytes() == blob
        seen += 1
    assert seen == 3
