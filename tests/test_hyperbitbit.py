"""HyperBitBit state parity vs the javac-compiled reference class on
identical streams — (lgN, sketch, sketch2, cardinality) must match
EXACTLY at every probed stream length, covering the sparse start, the
first swap, and deep multi-swap regimes."""

import os
import shutil
import subprocess

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tools", "golden")
CLASSES = "/tmp/ref_hbb_classes"


@pytest.fixture(scope="module")
def hbb_golden():
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available")
    if not os.path.exists(os.path.join(
            CLASSES, "com/clearspring/experimental/stream/cardinality/HbbGolden.class")):
        os.makedirs(CLASSES, exist_ok=True)
        src = "/root/reference/src/main/java"
        r = subprocess.run(
            ["javac", "-encoding", "UTF-8", "-d", CLASSES, "-sourcepath", src,
             os.path.join(GOLDEN_DIR, "HbbGolden.java")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"reference compile failed: {r.stderr[:300]}")

    def run(cases):
        inp = "\n".join(f"{prefix},{n}" for prefix, n in cases)
        out = subprocess.run(
            ["java", "-cp", CLASSES,
             "com.clearspring.experimental.stream.cardinality.HbbGolden"],
            input=inp, capture_output=True, text=True, check=True)
        rows = []
        for line in out.stdout.strip().splitlines():
            lgn, s1, s2, card = line.split(",")
            rows.append((int(lgn), int(s1) & (2**64 - 1),
                         int(s2) & (2**64 - 1), float(card)))
        return rows

    return run


CASES = [("item-", n) for n in (0, 1, 10, 100, 1000, 20000, 100000)] + [
    ("x", 5000), ("longer-prefix-value-", 3000)]


def test_state_parity_with_reference(hbb_golden):
    from stream_lib_spark.sketches.hyperbitbit import HyperBitBit

    want = hbb_golden(CASES)
    for (prefix, n), (lgn, s1, s2, card) in zip(CASES, want):
        hbb = HyperBitBit()
        hbb.update(np.array([f"{prefix}{i}" for i in range(n)], dtype=object))
        # the reference truncates its estimate to long; state exact,
        # estimate compared under the same cast
        got = (hbb.lgN, hbb.sketch, hbb.sketch2, float(int(hbb.cardinality())))
        assert got == (lgn, s1, s2, card), (prefix, n, got, (lgn, s1, s2, card))


def test_chunked_updates_equal_one_shot(hbb_golden):
    """Feeding the stream in arbitrary chunk sizes must land the same
    state as one update call — the chunk-vectorized fold is exact."""
    from stream_lib_spark.sketches.hyperbitbit import HyperBitBit

    items = np.array([f"item-{i}" for i in range(20000)], dtype=object)
    one = HyperBitBit().update(items)
    rng = np.random.default_rng(3)
    cuts = np.sort(rng.choice(np.arange(1, len(items)), 37, replace=False))
    many = HyperBitBit()
    for part in np.split(items, cuts):
        many.update(part)
    assert (many.lgN, many.sketch, many.sketch2) == (one.lgN, one.sketch, one.sketch2)


def test_merge_refuses():
    from stream_lib_spark.sketches.base import SketchMergeError
    from stream_lib_spark.sketches.hyperbitbit import HyperBitBit

    with pytest.raises(SketchMergeError):
        HyperBitBit().merge(HyperBitBit())


def test_accuracy_ballpark():
    """The talk claims ~10% on practical data; the reference header
    admits the 5.4 constant is rough and small cardinalities are
    broken.  Assert the implementation tracks the algorithm's own
    realistic envelope at larger n (this is a property of the
    ALGORITHM shared with the reference — parity above is the real
    contract)."""
    from stream_lib_spark.sketches.hyperbitbit import HyperBitBit

    for n in (50_000, 200_000):
        hbb = HyperBitBit().update(
            np.array([f"acc-{n}-{i}" for i in range(n)], dtype=object))
        assert abs(hbb.cardinality() - n) / n < 0.35, (n, hbb.cardinality())
