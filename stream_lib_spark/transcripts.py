"""Deterministic synthetic transcript table (the north-rule input shape).

Schema per BASELINE.json ``input_hint``:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Generated **Spark-natively** from ``spark.range`` with xxhash64-derived
columns — no driver-side data, no RNG state, fully deterministic given
(n_convs, seed), and embarrassingly parallel, so the same generator
scales from the 6k-row smoke table to a 10^12-turn cluster run (the
sandbox stand-in for the Iceberg transcript table).

Skew is built in deliberately (FIXTURES.md F1): the first
``hot_convs`` conversations are orders of magnitude longer than the
Zipf-ish tail, and tool names follow a power-law — the hot keys the
salting / two-level-merge paths must absorb.

Everything is built from JVM-side expressions (whole-stage codegen);
per-turn latency gaps are log-normal via Box-Muller over two
xxhash64-derived uniforms, accumulated with a window cumsum to give
``ts`` the "stable turn ordering" invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _u(col, salt: int, seed: int):
    """Deterministic uniform(0,1) from xxhash64 of (col, salt, seed)."""
    h = F.xxhash64(col, F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0)


def generate_transcripts(spark: SparkSession, n_convs: int = 2000, seed: int = 42,
                         hot_convs: int = 5, hot_turns: int = 2000,
                         partitions: int | None = None) -> DataFrame:
    """~50 turns/conv Zipf-ish tail + ``hot_convs`` hot conversations of
    ``hot_turns`` turns each (skewed conv_id distribution)."""
    conv = spark.range(n_convs, numPartitions=partitions)
    # tail: 3..120 turns, power-law-ish via u^2; hot convs fixed large
    u_len = _u(F.col("id"), 1, seed)
    n_turns = F.when(F.col("id") < hot_convs, F.lit(hot_turns)).otherwise(
        (F.lit(3) + F.pow(u_len, 2.0) * F.lit(117)).cast("int")
    )
    df = (
        conv.select(
            F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
            F.col("id").alias("_cid"),
            F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
        )
    )
    tkey = F.xxhash64("_cid", "turn_idx", F.lit(seed))
    u_role = _u(tkey, 2, seed)
    role = (
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .when(u_role < 0.3, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    # tool names: power law over ~200 tools (tool-0 hottest), only on tool turns
    u_tool = _u(tkey, 3, seed)
    tool = F.when(
        role == "tool", F.concat(F.lit("tool-"), F.floor(F.pow(u_tool, 4.0) * 200).cast("int"))
    ).otherwise(F.lit(None).cast("string"))
    # text: 5..85 Zipf-ish vocab tokens (heavy hitters + high-card tail)
    n_words = (F.lit(5) + F.pmod(tkey, F.lit(81))).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(
            F.lit("tok"),
            F.floor(F.pow(_u(F.xxhash64(tkey, i), 4, seed), 6.0) * 50_000).cast("int"),
        ),
    )
    text = F.array_join(words, " ")
    # per-turn latency gap: log-normal(mu=0.5, sigma=1.5) seconds via Box-Muller
    u1 = _u(tkey, 5, seed)
    u2 = _u(tkey, 6, seed)
    z = F.sqrt(-2.0 * F.log(u1 + F.lit(1e-12))) * F.cos(F.lit(6.283185307179586) * u2)
    gap = F.exp(F.lit(0.5) + F.lit(1.5) * z)
    # conv start: uniform over 30 days from 2026-01-01
    start_s = (_u(F.col("_cid"), 7, seed) * F.lit(30 * 86400.0))
    w = Window.partitionBy("_cid").orderBy("turn_idx")
    df = (
        df.withColumn("role", role)
        .withColumn("tool", tool)
        .withColumn("text", text)
        .withColumn("_gap", gap)
        .withColumn("_off", F.sum("_gap").over(w))
        .withColumn(
            "ts",
            F.timestamp_seconds(
                # numeric epoch of 2026-01-01T00:00:00Z: unix_timestamp on
                # a string literal parses in the SESSION timezone, which
                # would shift every ts on a non-UTC session and break the
                # documented determinism from (n_convs, seed)
                F.lit(1767225600) + start_s + F.col("_off")
            ),
        )
        .select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "role", "text", "tool", "ts")
    )
    return df


def turn_latencies(transcripts: DataFrame) -> DataFrame:
    """Per-turn latency (seconds since previous turn in the same
    conversation) via window lag under stable (conv_id, turn_idx)
    ordering — the input to the quantile-sketch queries (FIXTURES.md F1)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag(F.col("ts")).over(w)
    return (
        transcripts.withColumn(
            "latency_s",
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).cast("double") / 1e6,
        )
        .where(F.col("latency_s").isNotNull())
    )
