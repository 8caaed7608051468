"""CMS contract tests mirroring CountMinSketchTest.java /
ConservativeAddSketchTest.java."""

import numpy as np
import pytest

from stream_lib_spark.hashing import murmur64a_array, murmur64a_int64
from stream_lib_spark.sketches.base import SketchMergeError
from stream_lib_spark.sketches.cms import CountMinSketch, dims_from_accuracy


def _zipfish(n, seed=7364181, max_scale=20):
    # CountMinSketchTest.java:80-97 distribution shape
    rng = np.random.RandomState(seed)
    scales = rng.randint(1, max_scale + 1, n)
    return (rng.randint(0, 1 << 30, n) % (1 << scales)).astype(np.int64)


def test_dims_formulas():
    # CountMinSketch.java:59-67
    d, w = dims_from_accuracy(1e-4, 0.99)
    assert w == 20_000 and d == 7


def test_eps_delta_guarantee_longs():
    # CountMinSketchTest.java:79-115
    eps, conf, n = 1e-4, 0.99, 1_000_000
    vals = _zipfish(n)
    cms = CountMinSketch.from_accuracy(eps, conf).update_hashed(murmur64a_int64(vals))
    uniq, true = np.unique(vals, return_counts=True)
    est = cms.estimate_hashed(murmur64a_int64(uniq))
    err = est - true
    assert (err >= 0).all()  # CMS never undercounts
    assert np.mean(err > eps * n) < 1 - conf
    assert cms.size == n


def test_eps_delta_guarantee_strings_and_absent():
    # CountMinSketchTest.java:117-171
    eps, conf, n = 5e-4, 0.99, 200_000
    rng = np.random.RandomState(7364181)
    vals = rng.randint(0, 5000, n)
    items = np.array([f"item-{v}" for v in vals], dtype=object)
    cms = CountMinSketch.from_accuracy(eps, conf).update_hashed(murmur64a_array(items))
    uniq, true = np.unique(items, return_counts=True)
    est = cms.estimate_hashed(murmur64a_array(uniq))
    assert (est >= true).all()
    assert np.mean((est - true) > eps * n) < 1 - conf
    absent = murmur64a_array(np.array([f"absent-{i}" for i in range(10_000)], dtype=object))
    est_absent = cms.estimate_hashed(absent)
    assert np.mean(est_absent > eps * n) < 1 - conf


def test_merge_equals_single_pass_bytes():
    # CountMinSketch.java:260-296 — sum merge, byte-identical
    vals = _zipfish(200_000)
    h = murmur64a_int64(vals)
    single = CountMinSketch.from_accuracy(1e-3, 0.99).update_hashed(h)
    parts = [CountMinSketch.from_accuracy(1e-3, 0.99).update_hashed(h[i::8]) for i in range(8)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.to_bytes() == single.to_bytes()


def test_conservative_never_undercounts_and_beats_plain():
    # ConservativeAddSketchTest.java:32-81
    eps, conf = 7.5e-4, 0.99
    rng = np.random.RandomState(7364181)
    vals = rng.randint(0, 15_000, 1_000_000).astype(np.int64)
    h = murmur64a_int64(vals)
    cons = CountMinSketch.from_accuracy(eps, conf, conservative=True)
    plain = CountMinSketch.from_accuracy(eps, conf)
    for i in range(0, len(h), 100_000):
        cons.update_hashed(h[i : i + 100_000])
        plain.update_hashed(h[i : i + 100_000])
    uniq, true = np.unique(vals, return_counts=True)
    hu = murmur64a_int64(uniq)
    e_cons, e_plain = cons.estimate_hashed(hu), plain.estimate_hashed(hu)
    assert (e_cons >= true).all()
    assert np.mean(e_cons <= e_plain) > 0.9
    assert np.mean((e_cons - true) > eps * len(vals)) < 1 - conf


def test_weighted_updates():
    cms = CountMinSketch.from_accuracy(1e-3, 0.99)
    h = murmur64a_int64(np.array([1, 2, 1], dtype=np.int64))
    cms.update_hashed(h, np.array([5, 3, 2], dtype=np.int64))
    est = cms.estimate_hashed(murmur64a_int64(np.array([1, 2], dtype=np.int64)))
    assert est[0] >= 7 and est[1] >= 3
    assert cms.size == 10


def test_merge_mismatch_raises():
    # CountMinSketch.java:271-279
    a = CountMinSketch.from_accuracy(1e-3, 0.99)
    b = CountMinSketch.from_accuracy(1e-3, 0.99, seed=99)
    with pytest.raises(SketchMergeError):
        a.merge(b)


def test_serialization_roundtrip():
    vals = _zipfish(10_000)
    cms = CountMinSketch.from_accuracy(1e-3, 0.99).update_hashed(murmur64a_int64(vals))
    rt = CountMinSketch.from_bytes(cms.to_bytes())
    assert rt.to_bytes() == cms.to_bytes()
    assert rt.size == cms.size


def test_cms_frequencies_df_matches_driver_probe(spark):
    """The DataFrame-native probe column route returns the same
    estimates as the driver-side probe list for the same sketch, and
    the probe table never collects (pure column pipeline)."""
    from pyspark.sql import functions as F

    from stream_lib_spark.functions import cms_frequencies, cms_frequencies_df

    df = spark.range(20_000).select((F.col("id") % 500).alias("k"))
    probe_vals = list(range(0, 500, 25)) + [9_999_999]
    driver_side = {
        r["item"]: r["est_count"]
        for r in cms_frequencies(df, "k", probe_vals, eps=1e-3).collect()
    }
    probes = spark.createDataFrame([(v,) for v in probe_vals], "item long")
    df_side = {
        str(r["item"]): r["est_count"]
        for r in cms_frequencies_df(df, "k", probes, "item", eps=1e-3).collect()
    }
    assert df_side == driver_side
    # present keys are exact here (40 each, far under any collision)
    assert df_side["0"] == 40 and df_side["9999999"] <= 20


def test_cms_frequencies_df_plan_is_driver_free(spark):
    """Plan-shape pin for the probe ROUTE: probing is a single scan +
    Arrow-batched pandas UDF over the broadcast blob — no shuffle
    exchange, no per-row Python UDF, nothing returns to the driver."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from stream_lib_spark.functions import cms_frequencies_df

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    probes = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        F.col("p_partkey").alias("item"))
    out = cms_frequencies_df(df, "l_partkey", probes, "item", eps=1e-3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" in plan          # vectorized probe UDF
    assert "Exchange" not in plan             # probe column never shuffles
    assert "BatchEvalPython" not in plan      # no row-at-a-time Python
    # column pruning reached the probe scan
    assert "ReadSchema: struct<p_partkey" in plan
