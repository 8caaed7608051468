"""t-digest wire interop against golden vectors from the javac-compiled
reference.  The raw value stream is regenerated with a bit-exact
java.util.Random replica so rank accuracy can be checked without
shipping 10k values in the CSV."""

import base64
import csv
import os
import sys

import numpy as np

from stream_lib_spark.sketches.tdigest import TDigest
from stream_lib_spark.sketches.tdigest_wire import from_reference_bytes, to_reference_bytes

csv.field_size_limit(sys.maxsize)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "tdigest_wire_golden.csv")


class JavaRandom:
    """Bit-exact java.util.Random (48-bit LCG)."""

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)


def _golden_values(n: int) -> np.ndarray:
    r = JavaRandom(42)
    # matches the generator: Math.round(nextDouble()*1e6)/1e3
    return np.array([round(r.next_double() * 1e6) / 1e3 for _ in range(n)])


def _rows():
    with open(GOLDEN) as f:
        for comp, n, qs, big_b64, small_b64 in csv.reader(f):
            ref_qs = [float(x) for x in qs.split(";") if x] if qs else []
            yield (float(comp), int(n), ref_qs,
                   base64.b64decode(big_b64), base64.b64decode(small_b64))


def test_parse_roundtrip_both_encodings():
    for comp, n, ref_qs, big, small in _rows():
        tv = from_reference_bytes(big)
        ts = from_reference_bytes(small)
        assert tv.compression == ts.compression == comp
        assert tv.total == ts.total == n
        # byte-exact round trips
        assert to_reference_bytes(tv) == big
        assert to_reference_bytes(ts, small=True) == small
        # SMALL means equal VERBOSE means within float32 delta error
        assert np.allclose(ts.means, tv.means, rtol=0, atol=1e-1)
        assert (ts.weights == tv.weights).all()


def test_imported_digest_quantiles_rank_accurate():
    for comp, n, ref_qs, big, small in _rows():
        if n < 100:
            continue
        vals = np.sort(_golden_values(n))
        td = from_reference_bytes(big)
        for q, ref_q in zip((0.01, 0.1, 0.5, 0.9, 0.99), ref_qs):
            est = td.quantile(q)
            rank = np.searchsorted(vals, est, side="right") / n
            assert abs(rank - q) <= 0.03, (comp, n, q, est, rank)
            # and we agree with the reference's own answer to within a
            # few rank-percent (interpolation differs, distribution same)
            ref_rank = np.searchsorted(vals, ref_q, side="right") / n
            assert abs(rank - ref_rank) <= 0.03


def test_export_native_digest_for_reference_readers():
    vals = _golden_values(5000)
    td = TDigest.from_values(vals, 100.0)
    td.compress()
    blob = to_reference_bytes(td)
    back = from_reference_bytes(blob)
    assert back.total == td.total
    assert np.allclose(back.means, td.means)
    small = to_reference_bytes(td, small=True)
    back2 = from_reference_bytes(small)
    assert abs(back2.quantile(0.5) - td.quantile(0.5)) <= 1e-3 * max(abs(td.quantile(0.5)), 1)
