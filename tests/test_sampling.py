"""Deterministic sampling operators: Efraimidis–Spirakis weighted
sample (merge law, weight bias, determinism under partitioning) and
per-source quota caps (append stability, null keys)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stream_lib_spark.sampling import source_capped_sample, weighted_sample


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_weighted_sample_deterministic_across_partitioning(spark, docs):
    a = weighted_sample(docs, 50, "n_chars").select("doc_id").toPandas()
    b = (weighted_sample(docs.repartition(17), 50, "n_chars")
         .select("doc_id").toPandas())
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert len(a) == 50


def test_weighted_sample_merge_law(spark, docs):
    """Top-k of the union of per-shard top-k partials == global top-k —
    the monoid law that lets shards be sampled independently."""
    full = weighted_sample(docs, 40, "n_chars").select("doc_id").toPandas()
    shards = [docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i)
              for i in range(3)]
    partials = [weighted_sample(s, 40, "n_chars") for s in shards]
    merged = (partials[0].unionByName(partials[1]).unionByName(partials[2])
              .orderBy("ws_key", "doc_id").limit(40).select("doc_id").toPandas())
    assert sorted(full["doc_id"]) == sorted(merged["doc_id"])


def test_weighted_sample_bias_follows_weights(spark):
    """Rows with 9x the weight must be drawn far more often than light
    rows (E-S inclusion scales with weight): with 100 heavy (w=9) and
    900 light (w=1) rows, a k=100 sample is majority-heavy in
    expectation (~50 heavy vs ~11 under uniform sampling)."""
    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(1000)],
        "w": [9.0] * 100 + [1.0] * 900,
    })
    df = spark.createDataFrame(pdf)
    got = weighted_sample(df, 100, "w", id_col="doc_id").toPandas()
    n_heavy = int((got["w"] == 9.0).sum())
    assert n_heavy > 25, f"only {n_heavy} heavy rows drawn — weights ignored?"


def test_weighted_sample_excludes_nonpositive_weights(spark):
    pdf = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d", "e"],
        # NaN matters separately from null: Spark orders NaN > any
        # number, so a bare `w > 0` filter would let it through
        "w": [1.0, 0.0, -2.0, None, float("nan")],
    })
    got = weighted_sample(spark.createDataFrame(pdf), 10, "w",
                          id_col="doc_id").toPandas()
    assert list(got["doc_id"]) == ["a"]
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample(spark.createDataFrame(pdf), 0, "w")
    with pytest.raises(ValueError, match="ws_key"):
        weighted_sample(spark.createDataFrame(pdf).withColumn(
            "ws_key", F.lit(1)), 5, "w", id_col="doc_id")


def test_source_capped_sample_caps_and_is_append_stable(spark, docs):
    capped = source_capped_sample(docs, 25, "source", "doc_id")
    per = capped.groupBy("source").count().toPandas()
    assert (per["count"] <= 25).all()
    # below-cap sources keep every row
    orig = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    for _, row in per.iterrows():
        assert row["count"] == min(25, int(orig[row["source"]]))
    # append stability: the kept set on a PREFIX of the data is kept on
    # the full data too, unless the cap binds (here it binds, so check
    # the exact property: kept(full) restricted to the prefix ==
    # kept(prefix) with the same rows competing — use a below-cap slice)
    # materialize the slice ONCE: limit(10) without orderBy may pick
    # different rows per job, so evaluating it twice is order-fragile
    sub_pdf = (docs.where(F.col("source") == orig.index[0]).limit(10)
               .toPandas())
    sub = spark.createDataFrame(sub_pdf)
    kept_sub = set(source_capped_sample(sub, 25, "source", "doc_id")
                   .toPandas()["doc_id"])
    assert kept_sub == set(sub_pdf["doc_id"])  # 10 <= cap: all kept


def test_source_capped_sample_null_keys_form_a_group(spark):
    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(8)],
        "source": [None] * 5 + ["s"] * 3,
    })
    got = source_capped_sample(spark.createDataFrame(pdf), 2, "source",
                               "doc_id").toPandas()
    assert int(got["source"].isna().sum()) == 2  # nulls capped too
    assert int((got["source"] == "s").sum()) == 2
    with pytest.raises(ValueError, match="cap must be positive"):
        source_capped_sample(spark.createDataFrame(pdf), 0, "source", "doc_id")


def test_weighted_sample_plan_is_take_ordered(spark, docs):
    """The scale contract: orderBy(key).limit(k) must compile to
    TakeOrderedAndProject (per-partition partial top-k + k-row merge),
    NOT a global Sort — a full sort of 10^12 rows to pick 10^5 would be
    the classic scale bug."""
    plan = weighted_sample(docs, 50, "n_chars")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]
