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


def test_asof_null_keys_never_match(spark):
    """Equi-join semantics on the key: DuckDB ASOF JOIN and pandas
    merge_asof(by=...) treat NULL keys as matching nothing; a naive
    window partitionBy would group them together and fabricate a
    match."""
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({"lid": [0, 1], "k": pd.array([None, 1], dtype="Int64"),
                         "ts": [base + pd.Timedelta(seconds=9)] * 2})
    right = pd.DataFrame({"k": pd.array([None, 1], dtype="Int64"),
                          "ts": [base] * 2, "v": [7.0, 8.0]})
    got = _got(spark, left, right)
    # null-key left row kept but UNMATCHED; real key matches normally
    assert len(got) == 2
    assert pd.isna(got.loc[got["lid"] == 0, "asof_v"].iloc[0])
    assert got.loc[got["lid"] == 1, "asof_v"].iloc[0] == 8.0


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


def _rj_fixture(seed=7, n_pts=300, n_iv=60, n_keys=5):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    pts = pd.DataFrame({
        "pid": np.arange(n_pts),
        "k": rng.integers(0, n_keys, n_pts),
        "ts": base + pd.to_timedelta(rng.integers(0, 10**9, n_pts), unit="us"),
    })
    s = rng.integers(0, 10**9, n_iv)
    iv = pd.DataFrame({
        "iid": np.arange(n_iv),
        "k": rng.integers(0, n_keys, n_iv),
        "start": base + pd.to_timedelta(s, unit="us"),
        "end": base + pd.to_timedelta(s + rng.integers(0, 10**8, n_iv), unit="us"),
    })
    return pts, iv


def _rj_oracle(pts, iv):
    m = pts.merge(iv, on="k")
    m = m[(m["ts"] >= m["start"]) & (m["ts"] <= m["end"])]
    return set(zip(m["pid"], m["iid"]))


def test_range_join_matches_exact_oracle_any_bucket_size(spark):
    from stream_lib_spark.temporal import range_join

    pts, iv = _rj_fixture()
    exp = _rj_oracle(pts, iv)
    assert exp  # fixture produces matches
    pdf, idf = spark.createDataFrame(pts), spark.createDataFrame(iv)
    # result identical at any bucket_us — only cost moves; also proves
    # each qualifying pair appears EXACTLY once (set size == row count)
    for bucket_us in (10**6, 10**7, 10**8, 10**9):
        got = range_join(pdf, idf, ["k"], "ts", "start", "end",
                         bucket_us).toPandas()
        assert len(got) == len(exp), bucket_us
        assert set(zip(got["pid"], got["iid"])) == exp, bucket_us


def test_range_join_edges_and_validation(spark):
    from stream_lib_spark.temporal import range_join

    base = pd.Timestamp("2024-01-01")
    pts = pd.DataFrame({"pid": [0, 1, 2], "k": [1, 1, 1],
                        "ts": [base, base + pd.Timedelta(seconds=10), pd.NaT]})
    iv = pd.DataFrame({"iid": [0, 1], "k": [1, 1],
                       "start": [base, base + pd.Timedelta(seconds=30)],
                       "end": [base + pd.Timedelta(seconds=10),
                               base + pd.Timedelta(seconds=20)]})  # inverted
    got = range_join(spark.createDataFrame(pts), spark.createDataFrame(iv),
                     ["k"], "ts", "start", "end", 10**6).toPandas()
    # inclusive both ends: pid 0 at start, pid 1 at end; NaT point and
    # the inverted interval drop
    assert set(zip(got["pid"], got["iid"])) == {(0, 0), (1, 0)}
    with pytest.raises(ValueError, match="bucket_us"):
        range_join(spark.createDataFrame(pts), spark.createDataFrame(iv),
                   ["k"], "ts", "start", "end", 0)
    with pytest.raises(ValueError, match="both sides"):
        range_join(spark.createDataFrame(pts),
                   spark.createDataFrame(iv.rename(columns={"iid": "pid"})),
                   ["k"], "ts", "start", "end", 10**6)


def test_range_join_plan_is_equi_join_and_span_counter(spark):
    from stream_lib_spark.temporal import range_join, range_join_bucket_span

    pts, iv = _rj_fixture(seed=13)
    pdf, idf = spark.createDataFrame(pts), spark.createDataFrame(iv)
    plan = range_join(pdf, idf, ["k"], "ts", "start", "end",
                      10**8)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:800]
    # the work counter: spans shrink as bucket_us grows; total_rows is
    # the exact explode row count the join shuffles
    wide = range_join_bucket_span(idf, "start", "end", 10**8)
    narrow = range_join_bucket_span(idf, "start", "end", 10**6)
    assert narrow["mean"] > wide["mean"] >= 1.0
    assert narrow["total_rows"] > wide["total_rows"] >= len(iv)
