"""Regression tests for the nullable-hash → float64 corruption bug:
a single null in a batch used to turn the pandas hash column float64,
rounding int64 hashes to 53-bit precision — the same item then hashed
differently in null-containing vs null-free batches, inflating HLL
counts and corrupting per-key streaming state."""

import math
import os

import pytest
from pyspark.sql import functions as F

from stream_lib_spark.agg import SketchSpec, multi_sketch_agg, sketch_from_bytes


def _nully_df(spark, n=4000, nulls_every=7):
    # large 63-bit values: any float64 rounding visibly changes the hash
    return (
        spark.range(n)
        .select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.when(F.col("id") % nulls_every != 0,
                   (F.col("id") * F.lit(2654435761) + F.lit((1 << 62) + 12345)).cast("long"))
            .alias("v"),
            F.when(F.col("id") % 5 != 0, F.rand(7)).alias("x"),
        )
        .repartition(4)
    )


def test_keyed_multi_sketch_nulls_do_not_corrupt_hashes(spark):
    df = _nully_df(spark)
    sketches = {
        "h": ("v", SketchSpec("hll", p=13)),
        "t": ("x", SketchSpec("tdigest", compression=100.0)),
    }
    with_nulls = {r["g"]: r for r in multi_sketch_agg(df, sketches, keys=["g"]).collect()}
    # HLL state must be byte-identical to a pre-filtered run: nulls are
    # skipped, never hashed, and surviving hashes are not mangled
    # through float64 (compare per sketch so each filter is per-column)
    no_null_h = {
        r["g"]: bytes(r["h"])
        for r in multi_sketch_agg(
            df.where(F.col("v").isNotNull()), {"h": sketches["h"]}, keys=["g"]
        ).collect()
    }
    for g in with_nulls:
        assert bytes(with_nulls[g]["h"]) == no_null_h[g]
    exact = dict(
        df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    )
    for g, row in with_nulls.items():
        est = sketch_from_bytes(bytes(row["h"])).cardinality()
        bound = max(3 * 1.04 / math.sqrt(1 << 13) * exact[g], 2)
        assert abs(est - exact[g]) <= bound
    # t-digest weight counts only non-null values
    n_x = df.where(F.col("x").isNotNull()).count()
    assert sum(sketch_from_bytes(bytes(r["t"])).total for r in with_nulls.values()) == n_x


def test_keyed_streaming_sketch_nulls(spark, tmp_path):
    from stream_lib_spark.streaming import keyed_streaming_sketch

    src = str(tmp_path / "src")
    _nully_df(spark, n=3000).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = keyed_streaming_sketch(stream, ["g"], "v", SketchSpec("hll", p=13))
    q = (
        out.writeStream.format("memory")
        .queryName("nulltest")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["g"]: r["estimate"] for r in spark.sql("select * from nulltest").collect()}
    exact = dict(
        spark.read.parquet(src).groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    )
    assert set(got) == set(exact)
    for g in exact:
        bound = max(3 * 1.04 / math.sqrt(1 << 13) * exact[g], 2)
        assert abs(got[g] - exact[g]) <= bound
