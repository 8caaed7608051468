"""Round-8 direct parquet row-group scan path (agg._direct_parquet_partials).

Contract under test:
  * ``xxhash64_long`` is bit-parity with Spark's ``F.xxhash64`` over
    LongType (golden literals + random fuzz);
  * for the monoid-invariant kinds (hll, plain cms) the direct path's
    merged sketch is BYTE-identical to the classic Arrow-feed path,
    including on multi-row-group files with nulls (partial grouping
    differs; the merge is a commutative monoid);
  * for the batching-sensitive quantile kinds (tdigest, kll) the direct
    path is deterministic and its estimates sit within the same
    published rank bound the gates assert (no declared query exposes
    digest bytes — quantile gates output within_bound booleans);
  * every ineligible shape (filter/project above the scan, non-xxhash64
    hash mode, non-long hash column, non-whitelisted kind, conservative
    CMS, kill switch) falls back to the classic path.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from stream_lib_spark.agg import (
    SketchSpec,
    _direct_parquet_partials,
    collect_sketch,
    sketch_agg,
)
from stream_lib_spark.hashing import xxhash64_long

SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(autouse=True)
def _engage_at_any_size():
    """The fixtures here are far below the production row threshold;
    pin the MECHANISM with the threshold lowered (the threshold itself
    is covered by test_min_rows_threshold)."""
    os.environ["SPARK_GRAFT_DIRECT_SCAN_MIN_ROWS"] = "0"
    yield
    os.environ.pop("SPARK_GRAFT_DIRECT_SCAN_MIN_ROWS", None)


def _both(df, col, spec, hash_mode="xxhash64"):
    old = os.environ.get("SPARK_GRAFT_DIRECT_SCAN")
    try:
        os.environ["SPARK_GRAFT_DIRECT_SCAN"] = "1"
        direct = collect_sketch(sketch_agg(df, [], col, spec, hash_mode))
        os.environ["SPARK_GRAFT_DIRECT_SCAN"] = "0"
        classic = collect_sketch(sketch_agg(df, [], col, spec, hash_mode))
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_DIRECT_SCAN", None)
        else:
            os.environ["SPARK_GRAFT_DIRECT_SCAN"] = old
    return direct, classic


def test_min_rows_threshold(spark, sf_dir):
    """Below SPARK_GRAFT_DIRECT_SCAN_MIN_ROWS the constant cost of the
    path exceeds the per-row feed saving; it must disengage."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hll = SketchSpec("hll", p=12)
    os.environ["SPARK_GRAFT_DIRECT_SCAN_MIN_ROWS"] = str(10**12)
    try:
        assert _direct_parquet_partials(li, [], "l_orderkey", hll, "xxhash64") is None
    finally:
        os.environ["SPARK_GRAFT_DIRECT_SCAN_MIN_ROWS"] = "0"
    assert _direct_parquet_partials(li, [], "l_orderkey", hll, "xxhash64") is not None


def test_xxhash64_long_golden_and_fuzz(spark):
    vals = [0, 1, -1, 2**63 - 1, -(2**63), 123456789, 42, -42]
    # literals captured from F.xxhash64 on this Spark build (4.1.2)
    golden = [-5252525462095825812, -7001672635703045582, 3858142552250413010,
              -3246596055638297850, -8619748838626508300, 3415128141240069951,
              -6876166290308861218, -6086559926526557199]
    assert xxhash64_long(np.array(vals, dtype=np.int64)).tolist() == golden
    rng = np.random.default_rng(20260822)
    rv = rng.integers(-2**63, 2**63 - 1, size=5000, dtype=np.int64)
    jvm = np.array(
        [r.h for r in spark.createDataFrame([(int(v),) for v in rv], "v long")
         .select(F.xxhash64("v").alias("h")).collect()],
        dtype=np.int64)
    assert (xxhash64_long(rv) == jvm).all()


@pytest.mark.parametrize("col,spec", [
    ("l_orderkey", SketchSpec("hll", p=14)),
    ("l_orderkey", SketchSpec("hll", p=12, sp=0, estimator="classic")),
    ("l_partkey", SketchSpec("cms", eps=1e-3, confidence=0.99)),
    ("l_partkey", SketchSpec("bloom", n_elements=50_000, fpp=0.01)),
])
def test_monoid_kinds_byte_identical(spark, sf_dir, col, spec):
    for d in (sf_dir, SF_CORRECTNESS):  # sparse AND denser HLL regimes
        df = spark.read.parquet(f"{d}/lineitem.parquet")
        assert _direct_parquet_partials(df, [], col, spec, "xxhash64") is not None
        direct, classic = _both(df, col, spec)
        assert direct.to_bytes() == classic.to_bytes()


def test_multi_row_group_file_with_nulls(spark, tmp_path):
    """Partial grouping differs between the paths (one partial per row
    group vs per scan split); the merged monoid state must not."""
    rng = np.random.default_rng(7)
    n = 50_000
    ids = rng.integers(0, 10_000, size=n)
    mask = rng.random(n) < 0.05
    vals = pa.array([None if m else int(v) for v, m in zip(ids, mask)],
                    type=pa.int64())
    path = str(tmp_path / "multi_rg.parquet")
    pq.write_table(pa.table({"k": vals}), path, row_group_size=7_000)
    assert pq.ParquetFile(path).metadata.num_row_groups > 4
    df = spark.read.parquet(path)
    spec = SketchSpec("hll", p=12)
    tasks = _direct_parquet_partials(df, [], "k", spec, "xxhash64")
    assert tasks is not None
    direct, classic = _both(df, "k", spec)
    assert direct.to_bytes() == classic.to_bytes()
    cms = SketchSpec("cms", eps=1e-3, confidence=0.99)
    direct, classic = _both(df, "k", cms)
    assert direct.to_bytes() == classic.to_bytes()


def test_quantile_kinds_deterministic_and_within_bound(spark):
    df = spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet")
    col = "l_extendedprice"
    n = df.where(F.col(col).isNotNull()).count()
    for spec, q, bound in [
        (SketchSpec("tdigest", compression=100.0), 0.99, 0.012),
        (SketchSpec("kll", k=200), 0.5, 0.015),
    ]:
        direct, classic = _both(df, col, spec)
        d2, _ = _both(df, col, spec)
        assert direct.to_bytes() == d2.to_bytes()  # deterministic
        for sk in (direct, classic):
            est = float(sk.quantile(q))
            rank = df.where(F.col(col) <= est).count() / n
            assert abs(rank - q) <= bound


def test_many_row_groups_fan_in_and_no_footer_mode(spark, tmp_path):
    """Above 64 tasks the direct partials go through the auto fan-in
    merge level (sized from the exact task count); above the footer
    budget each file becomes one whole-file task.  Both must stay
    byte-identical to the classic path."""
    rng = np.random.default_rng(3)
    vals = pa.array(rng.integers(0, 5_000, size=70_000), type=pa.int64())
    path = str(tmp_path / "many_rg.parquet")
    pq.write_table(pa.table({"k": vals}), path, row_group_size=1_000)
    assert pq.ParquetFile(path).metadata.num_row_groups == 70  # > 64 tasks
    df = spark.read.parquet(path)
    spec = SketchSpec("hll", p=12)
    partials = _direct_parquet_partials(df, [], "k", spec, "xxhash64")
    assert partials is not None and partials._slp_n_partials == 70
    direct, classic = _both(df, "k", spec)
    assert direct.to_bytes() == classic.to_bytes()

    # no-footer mode: file count above the driver's footer budget →
    # one whole-file task, row threshold waived (scale implied)
    ddir = tmp_path / "two_files.parquet"
    ddir.mkdir()
    pq.write_table(pa.table({"k": vals[:30_000]}), str(ddir / "a.parquet"))
    pq.write_table(pa.table({"k": vals[30_000:]}), str(ddir / "b.parquet"))
    df2 = spark.read.parquet(str(ddir))
    os.environ["SPARK_GRAFT_DIRECT_SCAN_MAX_FOOTERS"] = "1"
    try:
        partials = _direct_parquet_partials(df2, [], "k", spec, "xxhash64")
        assert partials is not None and partials._slp_n_partials == 2
        direct, _ = _both(df2, "k", spec)
    finally:
        os.environ.pop("SPARK_GRAFT_DIRECT_SCAN_MAX_FOOTERS", None)
    _, classic = _both(df2, "k", spec)
    assert direct.to_bytes() == classic.to_bytes()


def _both_keyed(df, keys, col, spec):
    def run():
        out = sketch_agg(df, keys, col, spec).toPandas()
        out["sketch"] = out["sketch"].map(bytes)
        return out.sort_values(keys, na_position="first",
                               ignore_index=True)
    os.environ["SPARK_GRAFT_DIRECT_SCAN"] = "1"
    direct = run()
    os.environ["SPARK_GRAFT_DIRECT_SCAN"] = "0"
    classic = run()
    os.environ.pop("SPARK_GRAFT_DIRECT_SCAN", None)
    return direct, classic


def test_keyed_byte_identical(spark, sf_dir):
    """Keyed direct build (string keys, hash-mode long value): per-key
    merged state must be byte-identical to the classic keyed path."""
    ev = spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
    for spec in (SketchSpec("hll", p=12),
                 SketchSpec("cms", eps=1e-3, confidence=0.99)):
        assert _direct_parquet_partials(
            ev, ["event_type"], "user_id", spec, "xxhash64") is not None
        direct, classic = _both_keyed(ev, ["event_type"], "user_id", spec)
        assert direct.equals(classic)


def test_keyed_null_keys_and_values(spark, tmp_path):
    """Null KEYS form their own group (dropna=False) and null VALUES
    are dropped before grouping — identical to the classic path, on a
    multi-row-group file so partial boundaries differ."""
    rng = np.random.default_rng(11)
    n = 30_000
    keys = pa.array([None if r < 0.1 else f"k{int(r * 4)}"
                     for r in rng.random(n)], type=pa.string())
    vals = pa.array([None if r < 0.07 else int(r * 10_000)
                     for r in rng.random(n)], type=pa.int64())
    path = str(tmp_path / "keyed_rg.parquet")
    pq.write_table(pa.table({"k": keys, "v": vals}), path,
                   row_group_size=4_000)
    df = spark.read.parquet(path)
    spec = SketchSpec("hll", p=12)
    assert _direct_parquet_partials(df, ["k"], "v", spec, "xxhash64") is not None
    direct, classic = _both_keyed(df, ["k"], "v", spec)
    assert direct.equals(classic)
    assert direct["k"].isna().any()  # the null-key group survived


def test_keyed_ineligible_shapes(spark, sf_dir):
    ev = spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
    # long key column: the keyed build groups via pandas, string keys only
    assert _direct_parquet_partials(
        ev, ["user_id"], "event_id", SketchSpec("hll", p=12), "xxhash64") is None
    # keyed quantile kinds expose per-key estimates: excluded
    assert _direct_parquet_partials(
        ev, ["event_type"], "value",
        SketchSpec("tdigest", compression=100.0), "xxhash64") is None


def test_ineligible_shapes_fall_back(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hll = SketchSpec("hll", p=12)
    assert _direct_parquet_partials(li.where(F.col("l_orderkey") > 5), [],
                                    "l_orderkey", hll, "xxhash64") is None
    assert _direct_parquet_partials(li.select("l_orderkey"), [],
                                    "l_orderkey", hll, "xxhash64") is None
    assert _direct_parquet_partials(li.limit(10), [],
                                    "l_orderkey", hll, "xxhash64") is None
    assert _direct_parquet_partials(li, [], "l_orderkey", hll, "murmur64") is None
    assert _direct_parquet_partials(li, [], "l_returnflag", hll, "xxhash64") is None
    assert _direct_parquet_partials(li, [], "l_quantity", SketchSpec("qdigest", compression_factor=64),
        "xxhash64") is None
    assert _direct_parquet_partials(li, [], "l_partkey",
        SketchSpec("cms", eps=1e-3, confidence=0.99, conservative=True),
        "xxhash64") is None
    os.environ["SPARK_GRAFT_DIRECT_SCAN"] = "0"
    try:
        assert _direct_parquet_partials(li, [], "l_orderkey", hll, "xxhash64") is None
    finally:
        os.environ.pop("SPARK_GRAFT_DIRECT_SCAN", None)
    # and the fallback computes the same bytes as the engaged path
    direct, classic = _both(li, "l_orderkey", hll)
    assert direct.to_bytes() == classic.to_bytes()
