"""Bloom filter + Space-Saving contract tests mirroring
BloomFilterTest.java / TestStreamSummary.java."""

import numpy as np
import pytest

from stream_lib_spark.hashing import murmur64a_array
from stream_lib_spark.sketches.base import SketchMergeError
from stream_lib_spark.sketches.bloom import BloomFilter, analytic_fpp, bits_for_fpp, optimal_k
from stream_lib_spark.sketches.spacesaving import SpaceSaving


def _keys(n, prefix="key"):
    return murmur64a_array(np.array([f"{prefix}-{i}" for i in range(n)], dtype=object))


def test_no_false_negatives():
    bf = BloomFilter.for_capacity(1000, 0.01)
    h = _keys(1000)
    bf.add_hashed(h)
    assert bf.contains_hashed(h).all()


@pytest.mark.parametrize("buckets_per_elt", [10, 15, 20])
def test_fp_rate_within_001_of_analytic(buckets_per_elt):
    # BloomFilterTest.java:149-180 — 100 keys, 100k probes
    n = 100
    m = n * buckets_per_elt
    bf = BloomFilter(m_bits=m, k=optimal_k(m, n))
    bf.add_hashed(_keys(n))
    fp = bf.contains_hashed(_keys(100_000, prefix="absent")).mean()
    assert abs(fp - analytic_fpp(bf.m_bits, bf.k, n)) < 0.01


def test_sizing_from_fpp():
    # BloomCalculations.java:91-151 shape: more bits for lower fpp
    assert bits_for_fpp(1000, 0.01) > bits_for_fpp(1000, 0.1)
    bf = BloomFilter.for_capacity(10_000, 0.03)
    bf.add_hashed(_keys(10_000))
    fp = bf.contains_hashed(_keys(50_000, prefix="absent")).mean()
    assert fp < 0.05


def test_merge_or_byte_identical():
    # BloomFilter.java:121-127
    h = _keys(2000)
    full = BloomFilter(30_000, 7).add_hashed(h)
    a = BloomFilter(30_000, 7).add_hashed(h[:1000])
    b = BloomFilter(30_000, 7).add_hashed(h[1000:])
    assert a.merge(b).bits.tobytes() == full.bits.tobytes()
    with pytest.raises(SketchMergeError):
        a.merge(BloomFilter(10_000, 7))


def test_bloom_roundtrip():
    bf = BloomFilter.for_capacity(500, 0.01).add_hashed(_keys(500))
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert rt.to_bytes() == bf.to_bytes()
    assert rt.contains_hashed(_keys(500)).all()


def test_spacesaving_deterministic_stream():
    # TestStreamSummary.java:57-67: stream, cap 3 ⇒ top-3 {A, C, X}
    stream = ["X", "X", "Y", "Z", "A", "B", "C", "X", "X", "A", "C", "A", "A"]
    ss = SpaceSaving(3)
    for item in stream:
        ss.update_batch(np.array([item], dtype=object), np.array([1]))
    assert {t[0] for t in ss.top_k(3)} == {"A", "C", "X"}


def test_spacesaving_error_bookkeeping():
    # StreamSummary.java:117-124: count - error <= true <= count
    rng = np.random.RandomState(42)
    vals = rng.geometric(0.25, 100_000)
    ss = SpaceSaving(20)
    for i in range(0, len(vals), 10_000):
        u, c = np.unique(vals[i : i + 10_000], return_counts=True)
        ss.update_batch(u.astype(object), c)
    uniq, counts = np.unique(vals, return_counts=True)
    truth = dict(zip(uniq.astype(str), counts))
    for item, cnt, err in ss.top_k(10):
        t = int(truth[str(item)])
        assert cnt - err <= t <= cnt


def test_spacesaving_merged_exact_topk_on_skew():
    # mergeable-summaries semantics: any item with freq > N/cap survives
    rng = np.random.RandomState(1)
    vals = rng.geometric(0.25, 100_000)
    parts = []
    for i in range(8):
        u, c = np.unique(vals[i::8], return_counts=True)
        parts.append(SpaceSaving(50).update_batch(u.astype(object), c))
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    uniq, counts = np.unique(vals, return_counts=True)
    true_top = set(uniq[np.argsort(-counts)][:10].astype(str))
    got = {str(t[0]) for t in merged.top_k(10)}
    assert got == true_top
    assert merged.n == len(vals)


def test_spacesaving_roundtrip():
    ss = SpaceSaving(5)
    ss.update_batch(np.array(["a", "b", "a"], dtype=object), np.array([3, 2, 1]))
    rt = SpaceSaving.from_bytes(ss.to_bytes())
    assert rt.to_bytes() == ss.to_bytes()
    assert rt.top_k(2) == ss.top_k(2)


def test_bottomk_sample_monoid_and_topk():
    # StochasticTopper rebuild (stream/StochasticTopper.java:31-78) as a
    # deterministic mergeable bottom-k sample
    from stream_lib_spark.sketches.bottomk import BottomKSample

    rng = np.random.RandomState(0)
    vals = rng.geometric(0.3, 100_000).astype(str)

    def build(v):
        sk = BottomKSample(256)
        u, c = np.unique(v, return_counts=True)
        return sk.update_batch(u.astype(object), c)

    single = build(vals)
    merged = build(vals[0::4])
    for i in (1, 2, 3):
        merged.merge(BottomKSample.from_bytes(build(vals[i::4]).to_bytes()))
    assert merged.to_bytes() == single.to_bytes()  # byte-associative
    u, c = np.unique(vals, return_counts=True)
    true_top = [str(x) for x in u[np.argsort(-c)][:5]]
    assert [t[0] for t in merged.top_k(5)] == true_top
    assert merged.n == len(vals)
    # low-card sample is exhaustive → exact distinct
    assert merged.distinct_estimate() == len(u)


def test_bottomk_distinct_estimator_high_card():
    from stream_lib_spark.sketches.bottomk import BottomKSample

    vals = np.arange(50_000).astype(str)
    sk = BottomKSample(512)
    u, c = np.unique(vals, return_counts=True)
    sk.update_batch(u.astype(object), c)
    est = sk.distinct_estimate()
    assert abs(est - 50_000) / 50_000 < 0.15  # ~1/sqrt(k) rse


def test_bottomk_overlap_planted():
    """Planted overlap: |A|=3000, |B|=2000, |A∩B|=1000 (J=0.25) —
    bottom-k coordinated samples recover Jaccard within 3σ and the
    exhaustive-sample case is exact."""
    import numpy as np

    from stream_lib_spark.functions import bottomk_overlap_estimate
    from stream_lib_spark.sketches.bottomk import BottomKSample

    a_items = np.array([f"u{i}" for i in range(3000)], dtype=object)
    b_items = np.array([f"u{i}" for i in range(2000, 4000)], dtype=object)
    k = 512
    a = BottomKSample(k=k).update_batch(a_items, np.ones(3000, dtype=np.int64))
    b = BottomKSample(k=k).update_batch(b_items, np.ones(2000, dtype=np.int64))
    est = bottomk_overlap_estimate(a, b)
    true_j = 1000 / 4000
    se = (true_j * (1 - true_j) / k) ** 0.5
    assert abs(est["jaccard"] - true_j) <= 3 * se
    assert abs(est["union"] - 4000) <= 3 * 4000 / k ** 0.5
    assert abs(est["intersection"] - 1000) <= (3 * se + 3 / k ** 0.5) * 4000

    # exhaustive regime (both sets smaller than k): exact
    sa = BottomKSample(k=512).update_batch(a_items[:100], np.ones(100, dtype=np.int64))
    sb = BottomKSample(k=512).update_batch(a_items[50:150], np.ones(100, dtype=np.int64))
    est = bottomk_overlap_estimate(sa, sb)
    assert est["union"] == 150.0 and est["intersection"] == 50.0
    assert abs(est["jaccard"] - 50 / 150) < 1e-12


def test_bloom_probe_null_values_answer_null(spark):
    """NULL probe rows answer NULL (the build dropped nulls), never the
    bit pattern at xxhash64(NULL)."""
    from stream_lib_spark.functions import bloom_build, bloom_probe

    src = spark.createDataFrame([(i,) for i in range(100)], ["v"])
    bf = bloom_build(src, "v", n_elements=128, fpp=0.01)
    # NOTE: probe column type must match the BUILD column type —
    # xxhash64 is type-sensitive (hash(int 1) != hash(bigint 1))
    probes = spark.createDataFrame([(1,), (None,), (999999,)], "v long")
    got = {r["v"]: r["might_contain"] for r in bloom_probe(bf, probes, "v").collect()}
    assert got[1] is True
    assert got[None] is None
    assert got[999999] in (False, True)  # fpp-bounded, usually False


def test_cms_probe_uncastable_and_null(spark):
    """Uncastable string probes against a numeric-column CMS report 0
    (they can never equal a column item); DataFrame probes with NULL
    report NULL."""
    from pyspark.sql import functions as F

    from stream_lib_spark.functions import cms_frequencies, cms_frequencies_df

    src = spark.createDataFrame([(i % 10,) for i in range(1000)], ["v"])
    out = {r["item"]: r["est_count"]
           for r in cms_frequencies(src, "v", ["3", "abc", "xyz"], eps=1e-3).collect()}
    assert out["3"] >= 100
    assert out["abc"] == 0 and out["xyz"] == 0

    probes = spark.createDataFrame([("3",), (None,), ("abc",)], "item string")
    got = {r["item"]: r["est_count"]
           for r in cms_frequencies_df(src, "v", probes, "item", eps=1e-3).collect()}
    assert got["3"] >= 100
    assert got[None] is None and got["abc"] is None
