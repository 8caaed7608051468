"""Uniform wire import/export surface (sketches/wire_export.py): every
golden family loads through from_reference_wire; exportable kinds
round-trip native → reference → queryable with identical answers."""

import base64
import csv
import os
import sys

import numpy as np
import pytest

from stream_lib_spark.sketches.wire_export import (
    EXPORTABLE,
    from_reference_wire,
    to_reference_wire,
)

GD = os.path.join(os.path.dirname(__file__), "..", "tools", "golden")
csv.field_size_limit(sys.maxsize)


def _first_blob(csv_name, b64_col=-1):
    with open(os.path.join(GD, csv_name)) as f:
        return base64.b64decode(next(csv.reader(f))[b64_col])


@pytest.mark.parametrize("kind,csv_name", [
    ("hll", "hllpp_wire_golden.csv"),
    ("tdigest", "tdigest_wire_golden.csv"),
    ("qdigest", "qdigest_wire_golden.csv"),
    ("spacesaving", "spacesaving_wire_golden.csv"),
    ("cms", "cms_wire_golden.csv"),
    ("bloom", "bloom_wire_golden.csv"),
    ("linearcounting", "lc_wire_golden.csv"),
    ("hll_classic", "hllc_wire_golden.csv"),
    ("countthenestimate", "cte_wire_golden.csv"),
])
def test_every_family_imports(kind, csv_name):
    col = -1 if kind != "tdigest" else -2  # tdigest row: ..., big_b64, small_b64
    sk = from_reference_wire(kind, _first_blob(csv_name, col))
    assert sk is not None


def test_loglog_families_import():
    with open(os.path.join(GD, "loglog_wire_golden.csv")) as f:
        for row in csv.reader(f):
            kind = "loglog" if row[0] == "loglog" else "adaptivecounting"
            sk = from_reference_wire(kind, base64.b64decode(row[-1]))
            assert sk.cardinality() == int(row[3])


def test_export_import_roundtrip_answers():
    """Native sketches → reference wire → import → same answers."""
    from stream_lib_spark.hashing import murmur64a_int64
    from stream_lib_spark.sketches.hll import HllPlusPlus
    from stream_lib_spark.sketches.qdigest import QDigest
    from stream_lib_spark.sketches.spacesaving import SpaceSaving
    from stream_lib_spark.sketches.tdigest import TDigest

    hll = HllPlusPlus.new(p=12)
    hll.update_hashed(murmur64a_int64(np.arange(5000, dtype=np.int64)))
    back = from_reference_wire("hll", to_reference_wire("hll", hll.to_bytes()))
    assert back.cardinality() == hll.cardinality()

    td = TDigest(compression=100.0)
    td.add_values(np.arange(10_000, dtype=np.float64))
    td.compress()
    back = from_reference_wire("tdigest", to_reference_wire("tdigest", td.to_bytes()))
    assert abs(back.quantile(0.5) - td.quantile(0.5)) < 1e-9

    qd = QDigest(compression_factor=256)
    vals = (np.arange(3000, dtype=np.int64) * 37) % 10_000
    u, c = np.unique(vals, return_counts=True)
    qd.update_batch(u, c)
    back = from_reference_wire("qdigest", to_reference_wire("qdigest", qd.to_bytes()))
    assert back.n == qd.n

    ss = SpaceSaving(16)
    items = np.array([f"t{i % 25}" for i in range(200)], dtype=object)
    u, c = np.unique(items.astype("U"), return_counts=True)
    ss.update_batch(u.astype(object), c)
    back = from_reference_wire("spacesaving", to_reference_wire("spacesaving", ss.to_bytes()))
    assert back.top_k(5) == ss.top_k(5)


def test_unsound_kinds_refused():
    for kind in ("kll", "bottomk"):
        with pytest.raises(ValueError, match="no sound reference export"):
            to_reference_wire(kind, b"")
    # cms/bloom are exportable since round 5 — but only for state BUILT
    # in the reference hash family; native-family blobs still refuse
    from stream_lib_spark.sketches.bloom import BloomFilter
    from stream_lib_spark.sketches.cms import CountMinSketch

    for kind, blob in (("cms", CountMinSketch.from_accuracy(eps=0.01, confidence=0.9).to_bytes()),
                       ("bloom", BloomFilter.for_capacity(100, 0.01).to_bytes())):
        with pytest.raises(ValueError, match="native hash family"):
            to_reference_wire(kind, blob)
    assert set(EXPORTABLE) == {"hll", "tdigest", "qdigest", "spacesaving",
                               "cms", "bloom", "linearcounting", "loglog",
                               "adaptivecounting", "countthenestimate", "hllc"}


def test_kind_vocabulary_symmetry_and_adaptive():
    """'hllc' and 'hll_classic' both work in BOTH directions; EXPORTABLE
    lists every kind to_reference_wire accepts."""
    import numpy as np

    from stream_lib_spark.sketches.loglog_wire import ReferenceHyperLogLog
    from stream_lib_spark.sketches.reference_family import (
        ReferenceFamilyAdaptiveCounting,
        ReferenceFamilyHLLClassic,
    )

    sk = ReferenceFamilyHLLClassic(log2m=6)
    sk.update_batch(np.array([f"x{i}" for i in range(40)], dtype=object))
    raw1 = to_reference_wire("hllc", sk.to_bytes())
    raw2 = to_reference_wire("hll_classic", sk.to_bytes())
    assert raw1 == raw2
    assert from_reference_wire("hllc", raw1).to_bytes() == raw1
    assert from_reference_wire("hll_classic", raw1).to_bytes() == raw1
    assert "adaptivecounting" in EXPORTABLE
    alc = ReferenceFamilyAdaptiveCounting(k=6)
    assert to_reference_wire("adaptivecounting", alc.to_bytes()) == alc.to_reference_bytes()


def test_hllc_no_zero_registers_matches_jvm_long_max():
    """Classic-HLL small-range branch with zero empty registers: the JVM
    returns Math.round(Infinity) = Long.MAX_VALUE, not a crash."""
    import numpy as np

    from stream_lib_spark.sketches.loglog_wire import ReferenceHyperLogLog

    sk = ReferenceHyperLogLog(4, np.ones(16, dtype=np.uint8))
    assert sk.cardinality() == (1 << 63) - 1


def test_cte_long_elements_round_trip():
    """java.lang.Long elements re-export as Long (Integer(5) != Long(5)
    to the JVM), preserving byte round trips of Long-element streams."""
    from stream_lib_spark.sketches.cte_wire import (
        JavaLong,
        ReferenceCTE,
        parse_reference_bytes,
        to_reference_bytes,
    )

    cte = ReferenceCTE(
        False, tipping_point=100,
        builder_class="com.clearspring.analytics.stream.cardinality.LinearCounting$Builder",
        builder_args={"size": 64},
        elements=[JavaLong(5), 7, "s"])
    blob = to_reference_bytes(cte)
    back = parse_reference_bytes(blob)
    assert isinstance(back.elements[0], JavaLong)
    assert type(back.elements[1]) is int
    assert to_reference_bytes(back) == blob  # byte-exact round trip
