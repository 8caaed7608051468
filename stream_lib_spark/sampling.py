"""Deterministic distributed sampling for training-data mixtures.

Two operators a 100-TB corpus pipeline needs between dedup and packing:

- ``weighted_sample`` — a weighted random sample WITHOUT replacement
  (Efraimidis–Spirakis exponential race, "Weighted random sampling
  with a reservoir", IPL 2006): the sample is the k smallest values of
  ``key = -ln(u)/w``.  Because each row's key is a pure function of
  (salt, id, weight), the selection is a MERGEABLE MONOID — the global
  top-k equals the top-k of any union of per-shard top-k partials — so
  shards/tables can be sampled independently and merged, and the result
  is identical across runs, engines, partitionings, and data order.
- ``source_capped_sample`` — at most ``cap`` rows per key (domain/
  source quota): the standard anti-boilerplate mixing guard.  Which
  rows survive is decided by the same stable md5 order, so adding new
  documents later never evicts previously-kept ones until the cap
  binds, and re-runs keep the exact same rows.

Neither uses ``rand()``: a random-seeded sample changes under retries,
speculative tasks, and partition count — all three happen constantly
at cluster scale.  The md5-uniform trick is shared with
``deterministic_split`` (``textops._md5_bucket32``), and is
SQL-portable, so the correctness gate's DuckDB oracle reproduces the
exact same sample.

Scale shape:

- ``weighted_sample`` is ``orderBy(key).limit(k)``, which Spark
  compiles to TakeOrderedAndProject: each partition keeps only its
  local k smallest keys and a single reducer merges #partitions × k
  rows — no global sort, no full shuffle.  At 10^12 rows with k=10^5
  the merge input is tiny regardless of input size.
- ``source_capped_sample`` is one window (hash-partitioned by the
  quota key) — a single shuffle on the key; a hot key costs its own
  partition only, and the filter drops rows before anything downstream.

The reference library has no sampling operator; the nearest analog is
its StochasticTopper (rebuilt here as ``sketches/bottomk.py``), which
samples ITEMS uniformly.  ``weighted_sample`` generalizes to weighted
row sampling, which bottom-k cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import _md5_bucket32


def _stable_uniform(id_col: str, salt: str):
    """u ∈ (0, 1): (32-bit md5 bucket + 0.5) / 2^32 — the +0.5 keeps u
    strictly inside the open interval so ln(u) is finite, and the value
    is exactly representable, so DuckDB computes the identical double."""
    return (_md5_bucket32(id_col, salt).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 32))


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", salt: str = "ws-v1") -> DataFrame:
    """Weighted sample without replacement: the k rows with the
    smallest ``-ln(u)/w`` (u stable per (salt, id)) — each row's
    inclusion probability scales with its weight, exactly the
    Efraimidis–Spirakis reservoir draw, computed as a batch top-k.

    Rows with null, NaN, zero, or negative weight are excluded (they
    have no defined race time; a zero-weight row must never be drawn).

    Returns the sampled rows with their race time attached as
    ``ws_key`` (callers drop it if unwanted; an input column of that
    name raises); deterministic: a pure function of
    (salt, ids, weights) — partitioning, order, and retries cannot
    change the sample.  Merge law: ``weighted_sample(union of shards)``
    == top-k of the union of each shard's ``weighted_sample`` (tested).

    Cross-engine note: u is exactly representable, but ``ln`` is only
    1-ulp-accurate and libms differ, so two ENGINES (JVM vs DuckDB)
    could in principle order two keys differently when they agree to
    within 1 ulp AND straddle the k boundary — vanishingly unlikely for
    random keys, and within one engine the sample is always stable.
    """
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")
    if "ws_key" in df.columns:
        raise ValueError("input already has a 'ws_key' column — rename it")
    w = F.col(weight_col).cast("double")
    key = (-F.log(_stable_uniform(id_col, salt)) / w).alias("ws_key")
    return (
        # NaN check matters: Spark orders NaN greater than any number,
        # so `w > 0` alone would let NaN-weight rows through
        df.where(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .select("*", key)
        # id tiebreak: equal keys (a 32-bit bucket collision between
        # equal-weight rows) must not make the k-boundary row depend on
        # partition order
        .orderBy("ws_key", id_col)
        .limit(k)
    )


def source_capped_sample(df: DataFrame, cap: int, key_col: str = "source",
                         id_col: str = "doc_id",
                         salt: str = "cap-v1") -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col`` value, chosen by the
    stable md5 order of (salt, id) — the per-domain quota that stops
    one crawl domain from dominating a training mixture.

    Deterministic and *append-stable*: a kept row is evicted only when
    enough smaller-bucket rows of the same key arrive to fill the cap —
    re-running on the same data always keeps the identical rows.  Null
    keys form their own quota group (they'd otherwise pass every cap).
    """
    if cap <= 0:
        raise ValueError(f"per-key cap must be positive, got {cap}")
    # conv() yields a STRING column — cast to long or the window sorts
    # buckets lexicographically ("10" < "9") and keeps different rows
    # than the numeric-ordering contract (and the SQL oracle) says
    order = _md5_bucket32(id_col, salt).cast("long")
    rn = F.row_number().over(
        Window.partitionBy(key_col).orderBy(order.asc(),
                                            F.col(id_col).asc()))
    return (df.withColumn("__rn", rn)
            .where(F.col("__rn") <= cap)
            .drop("__rn"))
