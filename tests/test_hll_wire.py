"""Wire-compatibility of HLL++ serialization against GOLDEN byte
vectors produced by the actual reference implementation
(/root/reference compiled with javac; generator tools/golden/ — see
hll_wire.py module doc).  For each (p, sp, n) config the reference
offered "item-0".."item-{n-1}"; we hash the same strings with our
murmur64a (seed 0xe17a1465, the reference's hash64 dispatch) and must
produce byte-identical getBytes output, parse the reference's bytes
back to identical state, and round-trip them exactly."""

import base64
import csv
import math
import os

import numpy as np
import pytest

from stream_lib_spark.hashing import murmur64a_array
from stream_lib_spark.sketches.hll import FORMAT_DENSE, FORMAT_SPARSE, HllPlusPlus
from stream_lib_spark.sketches.hll_wire import from_reference_bytes, to_reference_bytes

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "hllpp_wire_golden.csv")


def _golden_rows():
    with open(GOLDEN) as f:
        for p, sp, n, card, b64 in csv.reader(f):
            yield int(p), int(sp), int(n), float(card), base64.b64decode(b64)


def _build(p, sp, n):
    sk = HllPlusPlus(p=p, sp=sp)
    if n:
        items = np.array([f"item-{i}" for i in range(n)], dtype=object)
        sk.update_hashed(murmur64a_array(items).view(np.int64))
    return sk


@pytest.mark.parametrize("p,sp,n,ref_card,blob", list(_golden_rows()),
                         ids=lambda v: str(v)[:24])
def test_wire_bytes_match_reference(p, sp, n, ref_card, blob):
    sk = _build(p, sp, n)
    assert to_reference_bytes(sk) == blob


def test_parse_reference_bytes_state_and_roundtrip():
    for p, sp, n, ref_card, blob in _golden_rows():
        sk = from_reference_bytes(blob)
        assert (sk.p, sk.sp) == (p, sp)
        ours = _build(p, sp, n)
        assert sk.fmt == ours.fmt
        if sk.fmt == FORMAT_DENSE:
            # registers identical up to the 5-bit wire clamp
            assert (sk.registers == np.minimum(ours.registers, 31)).all()
        else:
            # same sparse indices and (for flagged entries) run lengths
            assert to_reference_bytes(sk) == to_reference_bytes(ours)
        # byte-exact round trip of the reference's own blob
        assert to_reference_bytes(sk) == blob
        # estimates agree with the reference within the published bound
        if n:
            assert abs(sk.cardinality() - n) <= max(3 * 1.04 / math.sqrt(1 << p) * n, 1)


def test_cross_impl_merge_equivalence():
    # import two reference blobs, merge with our monoid, export: equals
    # building the union natively (sparse regime keeps full fidelity)
    rows = {(p, sp, n): blob for p, sp, n, _c, blob in _golden_rows()}
    a = from_reference_bytes(rows[(14, 25, 100)])
    b = _build(14, 25, 1500)
    merged = a.merge(b)  # items of 100 are a prefix of 1500's
    assert to_reference_bytes(merged) == rows[(14, 25, 1500)]
