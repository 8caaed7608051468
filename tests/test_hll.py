"""HLL++ contract tests mirroring the reference's
TestHyperLogLogPlus.java / TestHyperLogLog.java bounds (SURVEY.md §5)."""

import math

import numpy as np
import pytest

from stream_lib_spark.hashing import murmur64a_array, murmur64a_int64
from stream_lib_spark.sketches.hll import FORMAT_DENSE, FORMAT_SPARSE, HllPlusPlus
from stream_lib_spark.sketches.base import SketchMergeError


def _hashes(n, start=0):
    return murmur64a_int64(np.arange(start, start + n, dtype=np.int64))


def test_within_3_sigma_at_70k_p14():
    # TestHyperLogLogPlus.java:139-154
    n = 70_000
    sk = HllPlusPlus.new(p=14).update_hashed(_hashes(n))
    sigma = n * 1.04 / math.sqrt(1 << 14)
    assert abs(sk.cardinality() - n) <= 3 * sigma


def test_repeated_inserts_dont_inflate():
    # TestHyperLogLogPlus.java:156-176
    n = 15_000
    h = _hashes(n)
    sk = HllPlusPlus.new(p=14)
    for _ in range(3):
        sk.update_hashed(h)
    sigma = n * 1.04 / math.sqrt(1 << 14)
    assert abs(sk.cardinality() - n) <= 3 * sigma


def test_small_set_sparse_exact():
    # TestHyperLogLogPlus.java:488-515 — sparse mode is set-exact
    sk = HllPlusPlus.new(p=11, sp=16)
    sk.update_hashed(_hashes(14))
    sk.update_hashed(_hashes(14))  # duplicates
    assert sk.fmt == FORMAT_SPARSE
    assert round(sk.cardinality()) == 14


def test_single_element():
    # TestHyperLogLogPlus.java:304-309
    sk = HllPlusPlus.new(p=14).update_hashed(_hashes(1))
    assert round(sk.cardinality()) == 1


def test_large_n_under_10pct():
    # scaled version of TestHyperLogLogPlus.java:228-241 (1M vs 10M)
    n = 1_000_000
    sk = HllPlusPlus.new(p=14).update_hashed(_hashes(n))
    assert abs(sk.cardinality() - n) / n < 0.10


def test_string_inputs():
    strs = np.array([f"user-{i}" for i in range(20_000)], dtype=object)
    sk = HllPlusPlus.new(p=14).update_hashed(murmur64a_array(strs))
    sigma = 20_000 * 1.04 / math.sqrt(1 << 14)
    assert abs(sk.cardinality() - 20_000) <= 3 * sigma


def test_merge_equals_single_pass_bytes():
    # TestHyperLogLog.java:109-139 — merged == baseline exactly; we
    # assert the stronger byte-identity (north rule)
    n, parts = 50_000, 5
    h = _hashes(n)
    single = HllPlusPlus.new(p=12).update_hashed(h)
    merged = HllPlusPlus.new(p=12)
    for i in range(parts):
        merged.merge(HllPlusPlus.new(p=12).update_hashed(h[i::parts]))
    assert merged.to_bytes() == single.to_bytes()
    assert merged.cardinality() == single.cardinality()


def test_merge_any_grouping_byte_identical():
    # north-rule associativity (generalizes TestHyperLogLogPlus.java:67-102)
    parts = [HllPlusPlus.new(p=12).update_hashed(_hashes(5000, start=i * 5000)) for i in range(8)]
    blobs = [p.to_bytes() for p in parts]

    def fold(order, split):
        left = HllPlusPlus.from_bytes(blobs[order[0]])
        for i in order[1:split]:
            left.merge(HllPlusPlus.from_bytes(blobs[i]))
        right = HllPlusPlus.from_bytes(blobs[order[split]])
        for i in order[split + 1 :]:
            right.merge(HllPlusPlus.from_bytes(blobs[i]))
        return left.merge(right).to_bytes()

    rng = np.random.RandomState(7)
    base = fold(list(range(8)), 4)
    for _ in range(5):
        order = rng.permutation(8).tolist()
        split = rng.randint(1, 7)
        assert fold(order, split) == base


def test_sparse_dense_mixed_merge():
    # HyperLogLogPlus.java:819-864 — 4-way format merge
    small = HllPlusPlus.new(p=11, sp=18).update_hashed(_hashes(20))
    big = HllPlusPlus.new(p=11, sp=18).update_hashed(_hashes(10_000, start=100))
    assert small.fmt == FORMAT_SPARSE and big.fmt == FORMAT_DENSE
    est_union = HllPlusPlus.from_bytes(big.to_bytes()).merge(small).cardinality()
    est_union2 = HllPlusPlus.from_bytes(small.to_bytes()).merge(big).cardinality()
    true = 10_020
    sigma = true * 1.04 / math.sqrt(1 << 11)
    assert abs(est_union - true) <= 3 * sigma
    assert abs(est_union2 - true) <= 3 * sigma


def test_sparse_to_dense_conversion_preserves_estimate():
    n = 30_000
    h = _hashes(n)
    sparse_first = HllPlusPlus.new(p=14, sp=25).update_hashed(h)  # converts mid-way
    dense_only = HllPlusPlus(p=14, sp=0).update_hashed(h)
    assert sparse_first.fmt == FORMAT_DENSE
    assert sparse_first.to_bytes()[8:] == dense_only.to_bytes()[8:]  # same registers


def test_serialization_roundtrip():
    # TestHyperLogLogPlus.java:178-211 — estimate invariant under bytes
    for n in (10, 1000, 100_000):
        sk = HllPlusPlus.new(p=13).update_hashed(_hashes(n))
        rt = HllPlusPlus.from_bytes(sk.to_bytes())
        assert rt.cardinality() == sk.cardinality()
        assert rt.to_bytes() == sk.to_bytes()


def test_merge_p_mismatch_raises():
    # HyperLogLogPlus.java:819-822
    with pytest.raises(SketchMergeError):
        HllPlusPlus.new(p=12).merge(HllPlusPlus.new(p=14))


def test_classic_estimator_bounds():
    # HyperLogLog.java:174-194 path (alphaMM + linear counting)
    n = 40_000
    sk = HllPlusPlus(p=12, sp=0, estimator="classic").update_hashed(_hashes(n))
    sigma = n * 1.04 / math.sqrt(1 << 12)
    assert abs(sk.cardinality() - n) <= 3 * sigma


def test_count_then_estimate():
    # CountThenEstimate.java:43-317 — exact until tipping point, then HLL++
    from stream_lib_spark.sketches.countthenestimate import CountThenEstimate

    sk = CountThenEstimate(tipping_point=100, p=12)
    sk.update_hashed(_hashes(50))
    assert not sk.tipped and sk.cardinality() == 50.0
    # duplicates don't advance toward tipping
    sk.update_hashed(_hashes(50))
    assert not sk.tipped and sk.cardinality() == 50.0
    sk.update_hashed(_hashes(5000))
    assert sk.tipped
    sigma = 5000 * 1.04 / math.sqrt(1 << 12)
    assert abs(sk.cardinality() - 5000) <= 3 * sigma
    # merges: exact×exact stays exact & byte-associative; exact×tipped folds
    a = CountThenEstimate(tipping_point=100, p=12).update_hashed(_hashes(30))
    b = CountThenEstimate(tipping_point=100, p=12).update_hashed(_hashes(30, start=10))
    ab = CountThenEstimate.from_bytes(a.to_bytes()).merge(b)
    ba = CountThenEstimate.from_bytes(b.to_bytes()).merge(a)
    assert ab.to_bytes() == ba.to_bytes() and ab.cardinality() == 40.0  # |0..29 ∪ 10..39|
    big = CountThenEstimate(tipping_point=100, p=12).update_hashed(_hashes(2000))
    merged = CountThenEstimate.from_bytes(a.to_bytes()).merge(big)
    assert merged.tipped
    assert abs(merged.cardinality() - 2000) <= 3 * 2000 * 1.04 / math.sqrt(1 << 12)
    rt = CountThenEstimate.from_bytes(merged.to_bytes())
    assert rt.to_bytes() == merged.to_bytes()


def test_sparse_intersection_exact_like_reference():
    """Replicates TestHyperLogLogPlus.testMerge_SparseIntersection
    (TestHyperLogLogPlus.java:489-515) with our hashing: in the
    sparse-exact regime inclusion-exclusion recovers the intersection
    EXACTLY (sets {12,13,22,34,38,40,41,46,49} and {2,6,19,29,41,48}
    share only 41)."""
    import numpy as np

    from stream_lib_spark.functions import hll_intersection_estimate
    from stream_lib_spark.hashing import murmur64a_int64
    from stream_lib_spark.sketches.hll import HllPlusPlus

    a_in = np.array([12, 13, 22, 34, 38, 40, 41, 46, 49], dtype=np.int64)
    b_in = np.array([2, 6, 19, 29, 41, 48], dtype=np.int64)
    a = HllPlusPlus.new(p=11, sp=16)
    b = HllPlusPlus.new(p=11, sp=16)
    a.update_hashed(murmur64a_int64(a_in))
    b.update_hashed(murmur64a_int64(b_in))
    # the reference's long cardinality() rounds the linear-counting
    # estimate (9.0006... -> 9); match by rounding
    assert round(a.cardinality()) == 9 and round(b.cardinality()) == 6
    assert round(hll_intersection_estimate(a, b)) == 1
    assert abs(hll_intersection_estimate(a, b) - 1.0) < 0.01
    # inputs not mutated by the union inside
    assert round(a.cardinality()) == 9 and round(b.cardinality()) == 6
