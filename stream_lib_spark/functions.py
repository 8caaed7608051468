"""High-level sketch query functions + finalize UDFs.

The finalize step of every sketch (estimate / quantile / membership) is
exposed two ways:

- as vectorized pandas UDFs over the BinaryType state column (for
  keyed results that stay distributed), and
- as driver-side helpers on collected global sketches (one small blob).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .agg import SketchSpec, collect_sketch, sketch_agg, sketch_from_bytes


@F.pandas_udf(T.DoubleType())
def hll_cardinality(state: pd.Series) -> pd.Series:
    return state.map(lambda b: float(sketch_from_bytes(bytes(b)).cardinality()))


@F.pandas_udf(T.LongType())
def sketch_weight(state: pd.Series) -> pd.Series:
    """Total observed weight (CMS.size / tdigest.total / KLL.n)."""
    def w(b):
        sk = sketch_from_bytes(bytes(b))
        for attr in ("size", "total", "n", "count"):
            if hasattr(sk, attr):
                return int(getattr(sk, attr))
        return -1
    return state.map(w)


def quantile_udf(q: float):
    @F.pandas_udf(T.DoubleType())
    def _q(state: pd.Series) -> pd.Series:
        return state.map(lambda b: float(sketch_from_bytes(bytes(b)).quantile(q)))
    return _q


def approx_count_distinct(df: DataFrame, col: str, keys: list[str] | None = None,
                          p: int = 14, **kw) -> DataFrame:
    """HLL++ distinct count → (keys..., approx_distinct double)."""
    keys = keys or []
    merged = sketch_agg(df, keys, col, SketchSpec("hll", p=p), **kw)
    if not keys and hasattr(merged, "_slp_driver_fold"):
        # r8: global finalize driver-side (collect_sketch fast path) —
        # skips the merge exchange/stage AND the ArrowEvalPython
        # finalize stage; value identical (same sketch bytes)
        sk = collect_sketch(merged)
        return df.sparkSession.createDataFrame(
            [(float(sk.cardinality()),)],
            T.StructType([T.StructField("approx_distinct", T.DoubleType())]))
    return merged.select(*keys, hll_cardinality(F.col("sketch")).alias("approx_distinct"))


def approx_quantiles(df: DataFrame, col: str, qs: list[float],
                     keys: list[str] | None = None, kind: str = "tdigest", **kw) -> DataFrame:
    """t-digest / KLL quantiles → (keys..., q_<x> double ...)."""
    keys = keys or []
    spec = SketchSpec(kind, compression=100.0) if kind == "tdigest" else SketchSpec(kind, k=200)
    merged = sketch_agg(df, keys, col, spec, **kw)
    names = [f"q_{str(q).replace('.', '_')}" for q in qs]
    if not keys and hasattr(merged, "_slp_driver_fold"):
        # r8: same driver-side global finalize as approx_count_distinct
        sk = collect_sketch(merged)
        return df.sparkSession.createDataFrame(
            [tuple(float(sk.quantile(q)) for q in qs)],
            T.StructType([T.StructField(n, T.DoubleType()) for n in names]))
    cols = [quantile_udf(q)(F.col("sketch")).alias(n) for q, n in zip(qs, names)]
    return merged.select(*keys, *cols)


def approx_topk(df: DataFrame, col: str, k: int, capacity: int | None = None,
                keys: list[str] | None = None, **kw) -> DataFrame:
    """Space-Saving top-k → (keys..., item, count, error, rank)."""
    keys = keys or []
    cap = capacity or max(4 * k, 64)
    merged = sketch_agg(df, keys, col, SketchSpec("spacesaving", capacity=cap), **kw)
    if not keys and hasattr(merged, "_slp_driver_fold"):
        # r8: global finalize driver-side — the merged sketch is one
        # blob and the explode is k rows; skips merge + explode stages
        sk = collect_sketch(merged)
        rows = [(str(item), int(cnt), int(err), i)
                for i, (item, cnt, err) in enumerate(sk.top_k(k), 1)]
        schema = T.StructType([
            T.StructField("item", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("error", T.LongType()),
            T.StructField("rank", T.IntegerType()),
        ])
        return df.sparkSession.createDataFrame(rows, schema)

    out_fields = [merged.schema[kk] for kk in keys] + [
        T.StructField("item", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("error", T.LongType()),
        T.StructField("rank", T.IntegerType()),
    ]

    def explode_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for *kvals, blob in zip(*(pdf[c] for c in keys + ["sketch"])):
            ss = sketch_from_bytes(bytes(blob))
            for i, (item, cnt, err) in enumerate(ss.top_k(k), 1):
                rows.append(list(kvals) + [str(item), cnt, err, i])
        return pd.DataFrame(rows, columns=keys + ["item", "count", "error", "rank"])

    # merged already has exactly ONE row per key, so the keyed case needs
    # no extra shuffle or per-group Arrow round trip either — explode_topk
    # iterates rows, so one mapInPandas stream per partition covers both
    return merged.mapInPandas(lambda it: (explode_topk(pdf) for pdf in it), T.StructType(out_fields))


def cms_frequencies(df: DataFrame, col: str, probe_items: list, eps: float = 1e-4,
                    confidence: float = 0.99, **kw) -> DataFrame:
    """Global CMS over df[col], probed at probe_items →
    (item string, est_count long).  Probe hashing reuses the exact same
    JVM xxhash64 the update path used."""
    spark = df.sparkSession
    cms = collect_sketch(sketch_agg(df, [], col, SketchSpec("cms", eps=eps, confidence=confidence), **kw))
    probes = spark.createDataFrame([(str(i),) for i in probe_items], ["item"])
    # hash probe items the same way the update path hashed df[col]; a
    # probe that cannot cast to the column's type can never equal any
    # item of the column, so its exact count is 0 — report that instead
    # of probing at the pseudo-hash of NULL (every uncastable probe
    # would otherwise alias to xxhash64(NULL) and share a garbage count)
    field = dict(df.dtypes)[col]
    cast_col = F.col("item").try_cast(field)
    hashed = probes.select(
        "item", F.when(cast_col.isNotNull(), F.xxhash64(cast_col)).alias("h")
    ).collect()
    import numpy as np

    items = [r["item"] for r in hashed]
    hs = [r["h"] for r in hashed]
    valid = np.array([h is not None for h in hs], dtype=bool)
    est = np.zeros(len(items), dtype=np.int64)
    if valid.any():
        est[valid] = cms.estimate_hashed(
            np.array([h for h in hs if h is not None], dtype=np.int64))
    return spark.createDataFrame(list(zip(items, [int(e) for e in est])), ["item", "est_count"])


def hll_intersection_estimate(sk_a, sk_b) -> float:
    """|A ∩ B| by inclusion-exclusion over HLL estimates:
    |A| + |B| − |A ∪ B| (union = non-mutating register merge).

    The reference exercises exactly this algebra in
    ``TestHyperLogLogPlus.testMerge_SparseIntersection``
    (``src/test/java/.../TestHyperLogLogPlus.java:489-515``): in the
    sparse-exact regime the result is EXACT; in the dense regime the
    error compounds to ~rse·(|A| + |B| + |A∪B|), so small overlaps of
    large sets drown in noise — callers wanting guaranteed overlap
    accuracy should intersect bottom-k samples instead.  Inputs are not
    mutated (the union merges a deserialized copy)."""
    union = sketch_from_bytes(sk_a.to_bytes()).merge(sk_b)
    return float(sk_a.cardinality() + sk_b.cardinality() - union.cardinality())


def bottomk_overlap_estimate(sk_a, sk_b) -> dict:
    """Set overlap from two bottom-k samples over the SAME hash
    function (the guaranteed-accuracy alternative the HLL
    inclusion-exclusion docstring points at): take the k smallest
    hashes of the UNION; the fraction of those present in BOTH samples
    is an unbiased Jaccard estimator with s.e. ≈ √(J(1−J)/k)
    (classic MinHash/bottom-k coordination), and
    |A∩B| ≈ J · |A∪B|_bottom-k.

    Works because a hash in the union's bottom-k that belongs to A is
    necessarily in A's bottom-k too (it is smaller than A's k-th
    smallest) — so membership tests against the two samples are exact.
    Returns {jaccard, intersection, union} estimates."""
    import numpy as np

    if sk_a.k != sk_b.k:
        raise ValueError("bottom-k overlap needs equal k")
    union = type(sk_a).from_bytes(sk_a.to_bytes()).merge(sk_b)
    uh = union.hashes  # sorted ascending, truncated to k
    in_a = np.isin(uh, sk_a.hashes)
    in_b = np.isin(uh, sk_b.hashes)
    both = int((in_a & in_b).sum())
    j = both / len(uh) if len(uh) else 0.0
    u_est = union.distinct_estimate()
    return {"jaccard": float(j), "intersection": float(j * u_est), "union": float(u_est)}


def cms_frequencies_df(df: DataFrame, col: str, probes: DataFrame,
                       probe_col: str | None = None, eps: float = 1e-4,
                       confidence: float = 0.99, conservative: bool = False,
                       **kw) -> DataFrame:
    """DataFrame-native CMS probe: build the global sketch over
    ``df[col]``, then probe a probe COLUMN executor-side → ``probes``
    plus ``est_count`` long.

    Unlike ``cms_frequencies`` (driver-side probe list, fine for small
    ad-hoc sets), the probe table here never touches the driver: the
    collected sketch blob ships via a cached ``SparkContext.broadcast``
    and each Arrow batch of probes is estimated with the vectorized
    kernel — so a 10^9-row candidate list (e.g. decontamination
    candidates probed against a corpus CMS) is a plain scan + pandas
    UDF, no collect anywhere.  Probe hashing reuses the exact JVM
    xxhash64-of-``df[col]``'s-type the update path used."""
    probe_col = probe_col or col
    cms = collect_sketch(sketch_agg(
        df, [], col,
        SketchSpec("cms", eps=eps, confidence=confidence, conservative=conservative), **kw))
    bc, tok = _broadcast_blob(probes.sparkSession, cms.to_bytes())

    @F.pandas_udf(T.LongType())
    def est(h: pd.Series) -> pd.Series:
        import numpy as np

        from .sketches.cms import CountMinSketch

        sk = _parsed_sketch(tok, bc, CountMinSketch.from_bytes)
        return pd.Series(sk.estimate_hashed(h.to_numpy().astype(np.int64)).astype(np.int64))

    field = dict(df.dtypes)[col]
    # null / uncastable probes get a NULL estimate, not the count at the
    # pseudo-hash of NULL (the build path dropped nulls, so membership
    # of such probes is undefined/zero, never hash(NULL)'s bucket)
    cast_col = F.col(probe_col).try_cast(field)
    return probes.withColumn(
        "est_count", F.when(cast_col.isNotNull(), est(F.xxhash64(cast_col))))


def bloom_build(df: DataFrame, col: str, n_elements: int, fpp: float = 0.01, **kw):
    """Distributed Bloom build → driver-side BloomFilter."""
    return collect_sketch(
        sketch_agg(df, [], col, SketchSpec("bloom", n_elements=n_elements, fpp=fpp), **kw)
    )


_blob_bcasts: dict = {}  # (app_id, blob_sha) -> Broadcast, see bloom_probe

# Executor-side cache of PARSED probe sketches: a pandas UDF body runs
# once per Arrow batch, and re-parsing a ~24 MB Bloom/CMS blob per
# batch is a pointless memcpy.  Keyed by a driver-generated token
# closed into the UDF (worker-side Broadcast objects expose no stable
# id) and bounded to the last few sketches a worker process probed.
_parsed_cache: dict = {}
_PARSED_CACHE_MAX = 4


def _parsed_sketch(token: str, bc, parse):
    sk = _parsed_cache.get(token)
    if sk is None:
        if len(_parsed_cache) >= _PARSED_CACHE_MAX:
            _parsed_cache.pop(next(iter(_parsed_cache)))
        sk = _parsed_cache[token] = parse(bc.value)
    return sk


def _broadcast_blob(spark, blob: bytes):
    """Cached ``SparkContext.broadcast`` of a sketch blob: torrent-
    distributed once per executor, NOT closure-serialized per task;
    cached per (app, content) so repeated probes reuse one broadcast.
    Returns (broadcast, content-token) — the token keys the executor-
    side parsed-sketch cache."""
    import hashlib

    sha = hashlib.sha256(blob).hexdigest()
    key = (spark.sparkContext.applicationId, sha)
    bc = _blob_bcasts.get(key)
    if bc is None:
        bc = _blob_bcasts[key] = spark.sparkContext.broadcast(blob)
    return bc, sha


def bloom_probe(bf, df: DataFrame, col: str) -> DataFrame:
    """Probe a DataFrame column against a driver-side Bloom filter →
    adds boolean ``might_contain`` (JVM-side xxhash64 + Arrow batch probe).

    The probe column's TYPE must match the build column's type —
    ``xxhash64`` is type-sensitive (``hash(1 AS INT) != hash(1 AS
    BIGINT)``); cast the probe column first if they differ
    (``cms_frequencies_df`` does this internally via the source df).

    The filter blob ships via ``SparkContext.broadcast`` — once per
    executor, torrent-distributed — NOT in the UDF closure, which would
    re-serialize it with every task (a 20M-element filter is ~24 MB).
    Broadcasts are cached per (app, filter-content) so repeated probes
    of the same filter reuse one broadcast; they live for the app's
    lifetime because the returned DataFrame is lazy (an eager destroy
    would break later executions).  Long-lived apps cycling through many
    DISTINCT filters should call ``bloom_probe.clear_cache(destroy=True)``
    between generations once prior results are materialized."""
    bc, tok = _broadcast_blob(df.sparkSession, bf.to_bytes())

    @F.pandas_udf(T.BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        import numpy as np

        from .sketches.bloom import BloomFilter

        filt = _parsed_sketch(tok, bc, BloomFilter.from_bytes)
        return pd.Series(filt.contains_hashed(h.to_numpy().astype(np.int64)))

    # NULL probe values were never added (the build path drops nulls),
    # so answer NULL, not the bit pattern at xxhash64(NULL)
    return df.withColumn(
        "might_contain",
        F.when(F.col(col).isNotNull(), probe(F.xxhash64(F.col(col)))))


def _bloom_clear_cache(destroy: bool = False) -> int:
    """Drop (and optionally destroy on executors) all cached blob
    broadcasts (Bloom + CMS).  Only call destroy=True after every
    DataFrame returned by bloom_probe / cms_frequencies_df has been
    fully materialized."""
    n = len(_blob_bcasts)
    for bc in _blob_bcasts.values():
        if destroy:
            bc.destroy()
        else:
            bc.unpersist()
    _blob_bcasts.clear()
    return n


bloom_probe.clear_cache = _bloom_clear_cache
