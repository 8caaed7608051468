"""Property tests for the round-7 operators: asof_join vs pandas
merge_asof, range_join vs a brute-force filter, and the weighted-sample
merge law — on RANDOM small tables, not just the fixed fixtures, so the
semantics hold across tie patterns, empty keys, and degenerate sizes
the handwritten cases don't reach.  Spark jobs per example are tiny;
max_examples kept low to bound runtime (repo convention,
tests/test_properties.py)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from stream_lib_spark.sampling import weighted_sample
from stream_lib_spark.temporal import asof_join, range_join

BASE = pd.Timestamp("2024-01-01")

# coarse microsecond offsets make equal-ts ties LIKELY, probing the
# inclusive-bound and tie paths merge_asof defines
_us = st.integers(min_value=0, max_value=40)
_key = st.integers(min_value=0, max_value=2)


@st.composite
def _events(draw, max_rows=12):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    rows = [(i, draw(_key), draw(_us)) for i in range(n)]
    return rows


def _pdf(rows, ids_name):
    return pd.DataFrame({
        ids_name: [r[0] for r in rows],
        "k": [r[1] for r in rows],
        "ts": [BASE + pd.Timedelta(microseconds=r[2]) for r in rows],
    })


@settings(max_examples=12, deadline=None)
@given(lrows=_events(), rrows=_events())
def test_asof_join_matches_merge_asof_on_random_tables(spark, lrows, rrows):
    left = _pdf(lrows, "lid")
    right = _pdf(rrows, "rid")
    # merge_asof is undefined for duplicate (k, ts) on the right (no
    # deterministic winner — documented in asof_join too): dedup
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    right["v"] = right["rid"].astype(float)
    if left.empty or right.empty:
        return
    got = (asof_join(spark.createDataFrame(left),
                     spark.createDataFrame(right), ["k"], "ts", ["v"])
           .toPandas().sort_values("lid").reset_index(drop=True))
    exp = (pd.merge_asof(
        left.sort_values(["ts", "lid"], kind="stable"),
        right.sort_values("ts", kind="stable")[["k", "ts", "v"]],
        on="ts", by="k", direction="backward", allow_exact_matches=True)
        .sort_values("lid").reset_index(drop=True))
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["asof_v"], exp["v"],
                                   check_names=False)


@settings(max_examples=12, deadline=None)
@given(prows=_events(), irows=_events(),
       length=st.integers(min_value=0, max_value=15),
       bucket=st.sampled_from([1, 3, 7, 64]))
def test_range_join_matches_brute_force_on_random_tables(
        spark, prows, irows, length, bucket):
    pts = _pdf(prows, "pid")
    iv = _pdf(irows, "iid").rename(columns={"ts": "start"})
    if pts.empty or iv.empty:  # before the end column: empty + Timedelta
        return                 # is a pandas TypeError, not a Spark case
    iv["end"] = iv["start"] + pd.Timedelta(microseconds=length)
    got = range_join(spark.createDataFrame(pts), spark.createDataFrame(iv),
                     ["k"], "ts", "start", "end", bucket).toPandas()
    m = pts.merge(iv, on="k")
    exp = m[(m["ts"] >= m["start"]) & (m["ts"] <= m["end"])]
    assert len(got) == len(exp)  # exactly-once per qualifying pair
    assert (set(zip(got["pid"], got["iid"]))
            == set(zip(exp["pid"], exp["iid"])))


@settings(max_examples=10, deadline=None)
@given(n=st.integers(min_value=1, max_value=40),
       k=st.integers(min_value=1, max_value=12),
       shards=st.integers(min_value=2, max_value=4))
def test_weighted_sample_merge_law_random(spark, n, k, shards):
    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(n)],
        "w": [float(1 + (i * 7) % 5) for i in range(n)],
    })
    df = spark.createDataFrame(pdf)
    full = set(weighted_sample(df, k, "w", id_col="doc_id")
               .toPandas()["doc_id"])
    partials = [
        weighted_sample(
            df.where(F.pmod(F.xxhash64("doc_id"), F.lit(shards)) == i),
            k, "w", id_col="doc_id")
        for i in range(shards)
    ]
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    merged = set(u.orderBy("ws_key", "doc_id").limit(k)
                 .toPandas()["doc_id"])
    assert merged == full
    assert len(full) == min(k, n)
