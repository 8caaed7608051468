"""t-digest + KLL contract tests mirroring TDigestTest.java bounds
(rank error <= 0.012 single, < 0.015 merged; centroid count < 10·delta)
over the reference's stress distributions."""

import math

import numpy as np
import pytest

from stream_lib_spark.sketches.kll import KLL
from stream_lib_spark.sketches.tdigest import TDigest

QS = [0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]


def rank_errors(sketch, sorted_vals, qs=QS):
    n = len(sorted_vals)
    errs = []
    for q in qs:
        est = sketch.quantile(q)
        eps = abs(est) * 1e-9 + 1e-12
        lo = np.searchsorted(sorted_vals, est - eps, side="left") / n
        hi = np.searchsorted(sorted_vals, est + eps, side="right") / n
        errs.append(0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q)))
    return np.array(errs)


def distributions(n=100_000, seed=42):
    # TDigestTest.java:90-200 generator shapes
    rng = np.random.RandomState(seed)
    return {
        "uniform": rng.rand(n),
        "gamma": rng.gamma(0.1, 0.1, n),
        "narrow_mixture": np.concatenate([rng.normal(0, 1e-5, n // 2), rng.uniform(-1, 1, n // 2)]),
        "sequential": np.arange(n) * math.pi * 1e-5,
        "repeated": np.round(rng.rand(n) * 10) / 10,
    }


@pytest.mark.parametrize("name", ["uniform", "gamma", "narrow_mixture", "sequential", "repeated"])
def test_tdigest_rank_error(name):
    vals = distributions()[name]
    td = TDigest.from_values(vals, 100.0)
    errs = rank_errors(td, np.sort(vals))
    assert errs.max() <= 0.012, (name, errs)
    assert td.centroid_count() < 10 * 100  # TDigestTest.java:426


def test_tdigest_cdf_error():
    # TDigestTest.java:433 — cdf error <= 0.005
    rng = np.random.RandomState(42)
    vals = rng.rand(100_000)
    td = TDigest.from_values(vals, 100.0)
    for x in np.linspace(0.001, 0.999, 50):
        assert abs(td.cdf(float(x)) - np.mean(vals <= x)) <= 0.005


@pytest.mark.parametrize("parts", [2, 5, 20, 50, 100])
def test_tdigest_merged_rank_error(parts):
    # TDigestTest.java:465-533 — merged from 2..100 parts, delta=50
    rng = np.random.RandomState(42)
    vals = rng.rand(100_000)
    merged = TDigest(compression=50.0)
    for i in range(parts):
        merged.merge(TDigest.from_values(vals[i::parts], 50.0))
    merged.compress()
    errs = rank_errors(merged, np.sort(vals))
    assert errs.max() < 0.015, (parts, errs)


def test_tdigest_merge_grouping_byte_identical():
    rng = np.random.RandomState(1)
    vals = rng.rand(50_000)
    parts = [TDigest.from_values(vals[i::10], 100.0) for i in range(10)]
    blobs = [p.to_bytes() for p in parts]

    def fold(order):
        acc = TDigest.from_bytes(blobs[order[0]])
        for i in order[1:]:
            acc.merge(TDigest.from_bytes(blobs[i]))
        return acc.to_bytes()

    base = fold(list(range(10)))
    for _ in range(4):
        assert fold(rng.permutation(10).tolist()) == base


def test_tdigest_order_insensitive():
    # generalizes TestHyperLogLogPlus.java:67-102 order-insensitivity to
    # quantile sketches: batch build over any input order is identical
    rng = np.random.RandomState(3)
    vals = rng.rand(10_000)
    a = TDigest.from_values(vals, 100.0)
    b = TDigest.from_values(vals[::-1].copy(), 100.0)
    assert a.to_bytes() == b.to_bytes()


def test_tdigest_roundtrip():
    td = TDigest.from_values(np.random.RandomState(5).rand(10_000), 100.0)
    rt = TDigest.from_bytes(td.to_bytes())
    assert rt.to_bytes() == td.to_bytes()
    assert rt.quantile(0.5) == td.quantile(0.5)


@pytest.mark.parametrize("name", ["uniform", "gamma", "narrow_mixture", "sequential", "repeated"])
def test_kll_rank_error(name):
    vals = distributions()[name]
    sk = KLL(200)
    for i in range(0, len(vals), 10_000):
        sk.add_values(vals[i : i + 10_000])
    errs = rank_errors(sk, np.sort(vals))
    assert errs.max() <= 0.012, (name, errs)
    assert sk.n == len(vals)


@pytest.mark.parametrize("parts", [2, 10, 50])
def test_kll_merged_rank_error(parts):
    rng = np.random.RandomState(42)
    vals = rng.rand(100_000)
    merged = KLL(200)
    for i in range(parts):
        merged.merge(KLL(200).add_values(vals[i::parts]))
    errs = rank_errors(merged, np.sort(vals))
    assert errs.max() < 0.015, (parts, errs)
    assert merged.n == len(vals)


def test_kll_roundtrip():
    sk = KLL(200).add_values(np.random.RandomState(5).rand(50_000))
    rt = KLL.from_bytes(sk.to_bytes())
    assert rt.to_bytes() == sk.to_bytes()
    assert rt.quantile(0.5) == sk.quantile(0.5)


def test_kll_memory_bounded():
    sk = KLL(200)
    rng = np.random.RandomState(0)
    for _ in range(50):
        sk.add_values(rng.rand(20_000))
    assert sum(len(lv) for lv in sk.levels) < 1500  # sublinear in n=1M
