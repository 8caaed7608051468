"""The REFERENCE reads bytes WE generate: serialize states through our
JOS writer, hand them to the javac-compiled CountThenEstimate, and
check it reports the cardinality we expect — the store-in-Python,
read-in-JVM migration direction the golden round-trips don't cover."""

import base64
import os
import shutil
import subprocess

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tools", "golden")
CLASSES = "/tmp/ref_readback_classes"


@pytest.fixture(scope="module")
def readback():
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("JDK not available")
    if not os.path.exists(os.path.join(CLASSES, "ReadBack.class")):
        os.makedirs(CLASSES, exist_ok=True)
        src = "/root/reference/src/main/java"
        r = subprocess.run(
            ["javac", "-encoding", "UTF-8", "-d", CLASSES, "-sourcepath", src,
             f"{src}/com/clearspring/analytics/stream/cardinality/CountThenEstimate.java",
             os.path.join(GOLDEN_DIR, "ReadBack.java")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"reference compile failed: {r.stderr[:300]}")

    def run(blobs: list[bytes]) -> list[tuple[bool, float]]:
        inp = "\n".join(base64.b64encode(b).decode() for b in blobs)
        out = subprocess.run(["java", "-cp", CLASSES, "ReadBack"],
                             input=inp, capture_output=True, text=True, check=True)
        rows = []
        for line in out.stdout.strip().splitlines():
            t, c = line.split(",")
            rows.append((t == "true", float(c)))
        return rows

    return run


def test_reference_reads_our_untipped_bytes(readback):
    from stream_lib_spark.sketches.cte_wire import ReferenceCTE, to_reference_bytes

    strs = ReferenceCTE(False, tipping_point=500,
                        builder_class="com.clearspring.analytics.stream.cardinality.LinearCounting$Builder",
                        builder_args={"size": 1024},
                        elements=[f"item-{i}" for i in range(40)])
    ints = ReferenceCTE(False, tipping_point=500,
                        builder_class="com.clearspring.analytics.stream.cardinality.HyperLogLogPlus$Builder",
                        builder_args={"p": 14, "sp": 25},
                        elements=[i * 3 for i in range(25)])
    got = readback([to_reference_bytes(strs), to_reference_bytes(ints)])
    assert got == [(False, 40.0), (False, 25.0)]


def test_reference_reads_our_tipped_hllpp_bytes(readback):
    """Native HLL++ built in Spark-land → reference-format bytes →
    wrapped as a tipped CountThenEstimate → the JVM reference reports a
    cardinality inside the published HLL++ bound."""
    import numpy as np

    from stream_lib_spark.hashing import murmur64a_array
    from stream_lib_spark.sketches.cte_wire import TYPE_HLPC, ReferenceCTE, to_reference_bytes
    from stream_lib_spark.sketches.hll import HllPlusPlus
    from stream_lib_spark.sketches.hll_wire import to_reference_bytes as hll_to

    n = 5000
    sk = HllPlusPlus.new(p=14, sp=25)
    items = np.array([f"user-{i}" for i in range(n)], dtype=object)
    sk.update_hashed(murmur64a_array(items).view(np.int64))
    blob = to_reference_bytes(ReferenceCTE(True, estimator_type=TYPE_HLPC,
                                           estimator_bytes=hll_to(sk)))
    ((tipped, card),) = readback([blob])
    assert tipped
    rse = 1.04 / (1 << 14) ** 0.5
    assert abs(card - n) <= 4 * rse * n


def test_reference_reads_our_longstring_bytes(readback):
    """TC_LONGSTRING elements (>64 KB modified-UTF8): the JVM reference
    must parse the stream and see all 3 distinct elements.  Note the
    byte-constructor auto-tips when builder.sizeof() <= len(bytes)
    (CountThenEstimate.java fromBytes), so a 70 KB untipped blob loads
    TIPPED with the LC estimator reporting the exact 3."""
    from stream_lib_spark.sketches.cte_wire import ReferenceCTE, to_reference_bytes

    big = "x" * 70_000 + "END"
    cte = ReferenceCTE(False, tipping_point=1000,
                       builder_class="com.clearspring.analytics.stream.cardinality.LinearCounting$Builder",
                       builder_args={"size": 1024},
                       elements=["small", big, "third"])
    ((tipped, card),) = readback([to_reference_bytes(cte)])
    assert tipped and card == 3.0
