"""StreamSummary (Space-Saving) wire interop vs the javac-compiled
reference: byte-exact round trips of the Externalizable stream
(``stream/StreamSummary.java:240-302``) against golden vectors, native
transplant, our-bytes export, and the reference reading bytes WE
generate (matching ``TestStreamSummary.testByteSerialization``,
``src/test/java/.../TestStreamSummary.java:169-186``)."""

import base64
import csv
import os
import shutil
import subprocess

import numpy as np
import pytest

from stream_lib_spark.sketches.spacesaving import SpaceSaving
from stream_lib_spark.sketches.spacesaving_wire import (
    ReferenceStreamSummary,
    from_native,
    parse_reference_bytes,
    to_reference_bytes,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tools", "golden")
CLASSES = "/tmp/ref_readback2_classes"


def _golden_rows():
    with open(os.path.join(GOLDEN_DIR, "spacesaving_wire_golden.csv")) as f:
        for cap, n, topk, b64 in csv.reader(f):
            expected = []
            if topk:
                for part in topk.split(";"):
                    item, count, error = part.rsplit(":", 2)
                    # boxed-Integer case: items parse as ints in the blob
                    expected.append((int(item) if item.isdigit() else item,
                                     int(count), int(error)))
            yield int(cap), int(n), expected, base64.b64decode(b64)


def test_golden_byte_roundtrip():
    rows = list(_golden_rows())
    assert len(rows) == 7
    for cap, _n, _topk, blob in rows:
        ss = parse_reference_bytes(blob)
        assert ss.capacity == cap
        assert to_reference_bytes(ss) == blob


def test_golden_topk_parity():
    """Our head->prev replica reproduces the reference's own topK rows
    exactly (same items, counts, errors, same order)."""
    for cap, _n, expected, blob in _golden_rows():
        ss = parse_reference_bytes(blob)
        assert ss.top_k(cap) == expected


def test_golden_counts_ascending():
    for _cap, _n, _topk, blob in _golden_rows():
        counts = [c for _, c, _ in parse_reference_bytes(blob).counters]
        assert counts == sorted(counts)


def test_native_transplant():
    for cap, n, expected, blob in _golden_rows():
        sk = parse_reference_bytes(blob).to_native()
        assert sk.capacity == cap and sk.n == n
        got = sk.top_k(cap)
        assert {(i, c) for i, c, _ in got} == {(i, c) for i, c, _ in expected}
        assert {i: e for i, _, e in got} == {i: e for i, _, e in expected}


def test_our_summary_exports():
    """SpaceSaving built by our batch fold exports a stream the codec
    round-trips byte-exactly, ascending-count with ties adjacent."""
    sk = SpaceSaving(8)
    items = np.array([f"w{i % 12}" for i in range(60)], dtype=object)
    uniq, counts = np.unique(items.astype("U"), return_counts=True)
    sk.update_batch(uniq.astype(object), counts)
    ss = from_native(sk)
    blob = to_reference_bytes(ss)
    back = parse_reference_bytes(blob)
    assert back.counters == ss.counters
    assert to_reference_bytes(back) == blob


def test_unsorted_counters_are_sorted_on_write():
    ss = ReferenceStreamSummary(4, [("b", 9, 0), ("a", 2, 1), ("c", 9, 3)])
    back = parse_reference_bytes(to_reference_bytes(ss))
    assert [c for _, c, _ in back.counters] == [2, 9, 9]


# ------------------------------------------------------------- read-back

@pytest.fixture(scope="module")
def readback2():
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available")
    if not os.path.exists(os.path.join(CLASSES, "ReadBack2.class")):
        os.makedirs(CLASSES, exist_ok=True)
        src = "/root/reference/src/main/java"
        r = subprocess.run(
            ["javac", "-encoding", "UTF-8", "-d", CLASSES, "-sourcepath", src,
             f"{src}/com/clearspring/analytics/stream/StreamSummary.java",
             os.path.join(GOLDEN_DIR, "ReadBack2.java")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"reference compile failed: {r.stderr[:300]}")

    def run(blobs):
        inp = "\n".join(base64.b64encode(b).decode() for b in blobs)
        out = subprocess.run(["java", "-cp", CLASSES, "ReadBack2"],
                             input=inp, capture_output=True, text=True, check=True)
        return out.stdout.strip().splitlines()

    return run


def test_reference_reads_our_bytes(readback2):
    """Store-in-Python, read-in-JVM: the compiled reference deserializes
    summaries our codec wrote and reports the same topK."""
    ss = ReferenceStreamSummary(
        5, [("low", 1, 0), ("mid-a", 4, 1), ("mid-b", 4, 0), ("high", 11, 2)])
    sk = SpaceSaving(6)
    items = np.array([f"tok{i % 9}" for i in range(45)], dtype=object)
    uniq, counts = np.unique(items.astype("U"), return_counts=True)
    sk.update_batch(uniq.astype(object), counts)
    blobs = [to_reference_bytes(ss), to_reference_bytes(from_native(sk))]
    lines = readback2(blobs)

    cap, *rows = lines[0].split(",")
    assert int(cap) == 5
    got = [tuple(r.rsplit(":", 2)) for r in rows]
    assert [(i, int(c), int(e)) for i, c, e in got] == ss.top_k(5)

    cap, *rows = lines[1].split(",")
    assert int(cap) == 6
    got = {r.rsplit(":", 2)[0]: tuple(map(int, r.rsplit(":", 2)[1:])) for r in rows}
    assert got == {str(k): (c, sk.errors.get(k, 0)) for k, c in sk.counts.items()}


def test_from_native_preserves_int_items():
    """A summary built over a NUMERIC column exports boxed Integer/Long
    items (not '123' strings), so a JVM consumer offering Integers gets
    counter hits; the wire round-trip returns them as ints."""
    sk = SpaceSaving(8)
    ids = np.array([101, 101, 102, 103, 103, 103, 1 << 40], dtype=object)
    uniq, counts = np.unique(ids.astype(np.int64), return_counts=True)
    sk.update_batch(uniq.astype(object), counts)  # numpy int64 items
    ss = from_native(sk)
    assert all(isinstance(i, int) for i, _, _ in ss.counters)
    back = parse_reference_bytes(to_reference_bytes(ss))
    assert back.counters == ss.counters  # ints survive the wire
    assert {i for i, _, _ in back.counters} == {101, 102, 103, 1 << 40}
