"""asof_join: parity with pandas merge_asof (the reference semantics),
inclusive bound, tolerance, no-match nulls, determinism under
partitioning, and the single-shuffle plan contract."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stream_lib_spark.temporal import asof_join


def _fixture(seed=3, n_left=400, n_right=150, n_keys=7):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "lid": np.arange(n_left),
        "k": rng.integers(0, n_keys, n_left),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**9, n_left), unit="us"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**9, n_right), unit="us"),
        "v": rng.normal(size=n_right).round(3),
    })
    # plant an exact-tie pair: left row at the same ts as a right row
    left.loc[0, ["k", "ts"]] = [0, base]
    right.loc[0, ["k", "ts", "v"]] = [0, base, 42.0]
    return left, right


def _oracle(left, right, tolerance=None):
    kw = {"tolerance": pd.Timedelta(microseconds=tolerance)} if tolerance else {}
    return (pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(
            columns={"ts": "asof_ts", "v": "asof_v"}),
        left_on="ts", right_on="asof_ts", by="k",
        direction="backward", allow_exact_matches=True, **kw)
        .sort_values("lid").reset_index(drop=True))


def _got(spark, left, right, **kw):
    out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    ["k"], "ts", ["v"], **kw)
    return out.toPandas().sort_values("lid").reset_index(drop=True)


def test_asof_matches_pandas_merge_asof(spark):
    left, right = _fixture()
    got, exp = _got(spark, left, right), _oracle(left, right)
    assert len(got) == len(left)
    pd.testing.assert_series_equal(got["asof_v"], exp["asof_v"],
                                   check_names=False)
    pd.testing.assert_series_equal(got["asof_ts"], exp["asof_ts"],
                                   check_names=False)
    # the planted exact tie matched (inclusive bound)
    assert got.loc[got["lid"] == 0, "asof_v"].iloc[0] == 42.0
    # and some rows genuinely have no earlier right row
    assert got["asof_v"].isna().any()


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _fixture(seed=5)
    tol = 50_000_000  # 50s in us
    got = _got(spark, left, right, tolerance_us=tol)
    exp = _oracle(left, right, tolerance=tol)
    pd.testing.assert_series_equal(got["asof_v"], exp["asof_v"],
                                   check_names=False)
    # tolerance must strictly reduce (or keep) the match count
    assert got["asof_v"].notna().sum() <= _got(
        spark, left, right)["asof_v"].notna().sum()


def test_asof_deterministic_across_partitioning(spark):
    left, right = _fixture(seed=9)
    a = _got(spark, left, right)
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    b = (asof_join(ldf.repartition(13), rdf.repartition(5), ["k"], "ts", ["v"])
         .toPandas().sort_values("lid").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["lid", "asof_v"]], b[["lid", "asof_v"]])


def test_asof_null_ts_rows_dropped_and_validation(spark):
    left, right = _fixture(seed=11, n_left=20, n_right=10)
    left.loc[3, "ts"] = pd.NaT
    got = _got(spark, left, right)
    assert len(got) == 19 and 3 not in set(got["lid"])
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    with pytest.raises(ValueError, match="at least one column"):
        asof_join(ldf, rdf, ["k"], "ts", [])
    with pytest.raises(ValueError, match="not in right side"):
        asof_join(ldf, rdf, ["k"], "ts", ["nope"])


def test_asof_plan_is_single_shuffle_no_pair_explosion(spark):
    """The scale contract: the plan must be union -> one hash shuffle
    on the key -> window — no BroadcastNestedLoopJoin / CartesianProduct
    (what a range-condition join degenerates to) anywhere."""
    left, right = _fixture(n_left=50, n_right=20)
    plan = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                     ["k"], "ts", ["v"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:800]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]
