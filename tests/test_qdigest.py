"""QDigest contract tests mirroring QDigestTest.java: actual rank of
quantile(q) within q ± eps where eps = logCapacity/compression_factor,
including unions across digests and across different capacities."""

import numpy as np
import pytest

from stream_lib_spark.sketches.base import SketchMergeError
from stream_lib_spark.sketches.qdigest import QDigest


def _rank_window(values_sorted: np.ndarray, v: float) -> tuple[float, float]:
    n = len(values_sorted)
    lo = np.searchsorted(values_sorted, v, side="left") / n
    hi = np.searchsorted(values_sorted, v, side="right") / n
    return lo, hi


def _assert_quantiles_within_eps(qd: QDigest, values: np.ndarray):
    s = np.sort(values)
    eps = qd.eps
    for q in np.arange(0.0, 1.001, 0.05):
        v = qd.quantile(float(q))
        lo, hi = _rank_window(s, v)
        assert lo - eps <= q <= hi + eps, f"q={q} v={v} window=({lo},{hi}) eps={eps}"


DISTS = {
    "uniform": lambda rng: rng.randint(0, 50_000, 20_000),
    "zipfish": lambda rng: (rng.zipf(1.5, 20_000) % 100_000),
    "clustered": lambda rng: np.concatenate([
        rng.randint(0, 100, 10_000), rng.randint(90_000, 90_200, 10_000)
    ]),
    "constant": lambda rng: np.full(5_000, 1234),
}


@pytest.mark.parametrize("dist", sorted(DISTS))
@pytest.mark.parametrize("k", [256, 1024])
def test_rank_bound_single_digest(dist, k):
    rng = np.random.RandomState(7)
    vals = DISTS[dist](rng).astype(np.int64)
    qd = QDigest(compression_factor=k)
    for i in range(0, len(vals), 4096):
        qd.add_values(vals[i : i + 4096])
    assert qd.n == len(vals)
    # state bounded: O(k log sigma) nodes after compression
    assert len(qd.ids) <= 3 * k + 64
    _assert_quantiles_within_eps(qd, vals)


def test_union_preserves_bound_and_n():
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 1_000_000, 50_000).astype(np.int64)
    parts = []
    for i in range(8):
        qd = QDigest(compression_factor=512)
        qd.add_values(vals[i::8])
        parts.append(QDigest.from_bytes(qd.to_bytes()))  # through serde
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == len(vals)
    _assert_quantiles_within_eps(merged, vals)


def test_union_across_capacities():
    # small-universe digest merged into large-universe digest and back
    a = QDigest(compression_factor=256)
    a.add_values(np.arange(0, 16))           # log_cap 4
    b = QDigest(compression_factor=256)
    b.add_values(np.arange(100_000, 100_016))  # log_cap 17
    ab = QDigest.from_bytes(a.to_bytes()).merge(b)
    ba = QDigest.from_bytes(b.to_bytes()).merge(QDigest.from_bytes(a.to_bytes()))
    vals = np.concatenate([np.arange(0, 16), np.arange(100_000, 100_016)])
    assert ab.n == ba.n == 32
    _assert_quantiles_within_eps(ab, vals)
    _assert_quantiles_within_eps(ba, vals)


def test_roundtrip_and_merge_guard():
    qd = QDigest(compression_factor=128)
    qd.add_values(np.random.RandomState(3).randint(0, 10_000, 5_000))
    rt = QDigest.from_bytes(qd.to_bytes())
    assert rt.to_bytes() == qd.to_bytes()
    assert rt.quantile(0.5) == qd.quantile(0.5)
    with pytest.raises(SketchMergeError):
        qd.merge(QDigest(compression_factor=64))
    with pytest.raises(ValueError):
        QDigest(64).add_values(np.array([-1]))


def test_spark_qdigest_agg(spark):
    from pyspark.sql import functions as F

    from stream_lib_spark.agg import SketchSpec, collect_sketch, sketch_agg

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cents = li.select((F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    qd = collect_sketch(sketch_agg(cents.repartition(6), [], "cents", SketchSpec("qdigest", compression_factor=1024)))
    vals = np.sort(np.array([r[0] for r in cents.collect()], dtype=np.int64))
    assert qd.n == len(vals)
    eps = qd.eps
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        v = qd.quantile(q)
        lo = np.searchsorted(vals, v, side="left") / len(vals)
        hi = np.searchsorted(vals, v, side="right") / len(vals)
        assert lo - eps <= q <= hi + eps


def test_ivalue_counts_survive_murmur_mode_and_keyed_multi(spark):
    # regression: ivalue batches must fold EXACT frequencies, not the
    # distinct-value set, in every path (incl. hash_mode='murmur64')
    from pyspark.sql import functions as F

    from stream_lib_spark.agg import (
        SketchSpec, collect_sketch, multi_sketch_agg, sketch_agg, sketch_from_bytes,
    )

    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 7).alias("v"),
    ).repartition(4)
    spec = SketchSpec("qdigest", compression_factor=256)
    for hm in ("xxhash64", "murmur64"):
        rows = multi_sketch_agg(df, {"q": ("v", spec)}, keys=["g"], hash_mode=hm).collect()
        for r in rows:
            sk = sketch_from_bytes(bytes(r["q"]))
            assert sk.n == 1000, (hm, r["g"], sk.n)  # weight = rows, not distincts
        glob = multi_sketch_agg(df, {"q": ("v", spec)}, hash_mode=hm).collect()[0]
        assert sketch_from_bytes(bytes(glob["q"])).n == 3000
    sk = collect_sketch(sketch_agg(df, [], "v", spec))
    assert sk.n == 3000 and sk.quantile(0.5) in (2.0, 3.0)


def test_ivalue_failed_cast_is_skipped(spark):
    from pyspark.sql import functions as F

    from stream_lib_spark.agg import SketchSpec, collect_sketch, sketch_agg

    df = spark.createDataFrame(
        [("1",), ("2",), ("notanumber",), (None,), ("3",)], ["s"]
    )
    sk = collect_sketch(sketch_agg(df, [], "s", SketchSpec("qdigest", compression_factor=64)))
    assert sk.n == 3  # only the three castable rows counted


def test_ivalue_empty_and_allnull_inputs(spark):
    from pyspark.sql import functions as F

    from stream_lib_spark.agg import SketchSpec, collect_sketch, sketch_agg

    spec = SketchSpec("qdigest", compression_factor=64)
    empty = spark.range(0).select(F.col("id").alias("v"))
    sk = collect_sketch(sketch_agg(empty, [], "v", spec))
    assert sk.n == 0
    allnull = spark.range(10).select(F.lit(None).cast("long").alias("v"))
    sk = collect_sketch(sketch_agg(allnull, [], "v", spec))
    assert sk.n == 0
