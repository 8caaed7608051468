"""Reference QDigest interop vs javac-compiled goldens: parse the
reference blob, reproduce the reference's own getQuantile answers
exactly, convert to the native QDigest (same tree), and re-serialize to
a byte-identical canonical form (sorted node ids — the reference reader
is order-insensitive, ours sorts)."""

import base64
import csv
import os

import numpy as np

from stream_lib_spark.sketches.qdigest import QDigest
from stream_lib_spark.sketches.qdigest_wire import (
    from_reference_bytes,
    parse_reference_bytes,
    reference_quantile,
    to_reference_bytes,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "qdigest_wire_golden.csv")


def _rows():
    with open(GOLDEN) as f:
        for cf, n, q05, q50, q95, b64 in csv.reader(f):
            yield float(cf), int(n), (int(q05), int(q50), int(q95)), base64.b64decode(b64)


def test_parse_and_quantile_parity():
    for cf, n, ref_qs, blob in _rows():
        size, got_cf, capacity, ids, counts = parse_reference_bytes(blob)
        assert size == n and got_cf == cf
        assert int(counts.sum()) == n  # reference invariant: counts total the size
        for q, ref in zip((0.05, 0.5, 0.95), ref_qs):
            assert reference_quantile(blob, q) == ref, f"cf={cf} q={q}"


def test_native_roundtrip():
    for cf, n, ref_qs, blob in _rows():
        qd = from_reference_bytes(blob)
        assert qd.n == n
        # same tree -> same reference-quantile answers through the native object
        for q, ref in zip((0.05, 0.5, 0.95), ref_qs):
            assert reference_quantile(qd, q) == ref
        # reparse of our canonical serialization = identical content
        size2, cf2, cap2, ids2, counts2 = parse_reference_bytes(to_reference_bytes(qd))
        size1, cf1, cap1, ids1, counts1 = parse_reference_bytes(blob)
        assert (size2, cf2, cap2) == (size1, cf1, cap1)
        assert np.array_equal(ids2, ids1) and np.array_equal(counts2, counts1)
        # and our serializer is a fixpoint (canonical form)
        assert to_reference_bytes(from_reference_bytes(to_reference_bytes(qd))) == to_reference_bytes(qd)


def test_native_quantile_within_bound_of_reference():
    """The native QDigest's own quantile answers on an imported tree
    stay within the published rank bound (eps = log_cap / k)."""
    for cf, n, _ref_qs, blob in _rows():
        if n < 100:
            continue
        qd = from_reference_bytes(blob)
        values = np.sort((np.arange(n, dtype=np.int64) * 37) % 100000)
        for q in (0.05, 0.5, 0.95):
            est = qd.quantile(q)
            rank = np.searchsorted(values, est, side="right")
            assert abs(rank / n - q) <= qd.eps + 1.0 / n, (cf, q)
