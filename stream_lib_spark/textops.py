"""Text-analysis & deduplication operators for the documents table —
the training-data-pipeline layer (exact dedup, MinHash-LSH / SimHash
near-dup, language ID, quality scoring, token counting, fingerprints).

Design rule: everything that CAN be a built-in JVM expression IS one
(whole-stage codegen, pushdown-friendly); Python appears only in the
MinHash/SimHash kernels, as Arrow-vectorized ``mapInPandas`` over numpy.
Each exact operator has a matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` so the DuckDB gate checks values, not
just shapes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .hashing import murmur64a_array, splitmix64

# --------------------------------------------------------------------- exact

def normalized_text(col="text"):
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def doc_fingerprint(col="text"):
    """128-bit content fingerprint of the normalized text (md5 — same
    builtin exists in DuckDB for the oracle)."""
    return F.md5(normalized_text(col))


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Per source: docs, distinct normalized texts, duplicate count."""
    return (
        docs.withColumn("fp", doc_fingerprint())
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
            (F.count("*") - F.countDistinct("fp")).alias("n_dups"),
        )
        .orderBy("source")
    )


def token_count(col="text"):
    """Whitespace token count (JVM-side)."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+"))


def token_stats(docs: DataFrame) -> DataFrame:
    return (
        docs.withColumn("n_tokens", token_count())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def quality_score(col="text"):
    """Deterministic quality heuristic in pure SQL expressions:
    length score + stopword-hit score − punctuation-density penalty.
    (The standard length/punct/stopword-ratio recipe, kept
    SQL-expressible so DuckDB can mirror it exactly.)"""
    t = F.lower(F.col(col))
    n_chars = F.length(t)
    n_tok = token_count(col)
    stop_hits = sum(
        (F.when(t.like(f"% {w} %"), 1).otherwise(0)) for w in _STOPWORDS
    )
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    return (
        F.when(n_tok >= 20, 1.0).otherwise(0.0)
        + F.when(stop_hits >= 2, 1.0).otherwise(0.0)
        - F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(1.0)
    )


def quality_buckets(docs: DataFrame) -> DataFrame:
    return (
        docs.withColumn("q", F.round(quality_score(), 1))
        .groupBy("q")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("q")
    )


_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "los", "que"],
}


def langid_heuristic(col="text"):
    """Stopword-marker language ID — deliberately SQL-expressible
    (same CASE ladder runs in DuckDB as the oracle)."""
    t = F.concat(F.lit(" "), F.lower(F.col(col)), F.lit(" "))
    scores = {
        lang: sum((F.when(t.like(f"% {w} %"), 1).otherwise(0)) for w in words)
        for lang, words in _LANG_MARKERS.items()
    }
    expr = F.lit("unknown")
    best = F.lit(0)
    # deterministic priority: en > de > fr > es, strict improvement wins
    for lang in ("en", "de", "fr", "es"):
        cond = scores[lang] > best
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
        best = F.when(cond, scores[lang]).otherwise(best)
    return expr


# --------------------------------------------------------------- near-dup

def _shingle_hashes(texts: np.ndarray, n: int = 5) -> list[np.ndarray]:
    """Per doc: uint64 hashes of word n-gram shingles (vectorized
    murmur64 over the concatenated shingle strings)."""
    all_shingles: list[str] = []
    offsets = [0]
    for t in texts:
        words = ("" if t is None else str(t)).lower().split()
        sh = [" ".join(words[i : i + n]) for i in range(max(len(words) - n + 1, 0))] or [" ".join(words)]
        all_shingles.extend(sh)
        offsets.append(len(all_shingles))
    hashes = murmur64a_array(np.array(all_shingles, dtype=object))
    return [np.unique(hashes[offsets[i] : offsets[i + 1]]) for i in range(len(texts))]


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, shingle: int = 5,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, signature array<long>) — MinHash over word-shingle sets.
    One permutation family via splitmix64(shingle_hash ^ seed_i);
    vectorized: (num_hashes, n_shingles) min-reduce per doc."""
    seeds = splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64))

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("signature", T.ArrayType(T.LongType())),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sh = _shingle_hashes(pdf[text_col].to_numpy(), shingle)
            sigs = []
            with np.errstate(over="ignore"):
                for h in sh:
                    if len(h) == 0:
                        sigs.append(np.zeros(num_hashes, dtype=np.int64))
                        continue
                    perms = splitmix64(h[None, :] ^ seeds[:, None])  # (k, n)
                    sigs.append(perms.min(axis=1).view(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "signature": [s.tolist() for s in sigs]})

    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 64, bands: int = 16,
                      shingle: int = 5, threshold: float = 0.7,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-duplicate pairs via banded LSH + exact signature-similarity
    verify.  Scale path: candidate generation is a self-join on
    (band_idx, band_hash) — co-hashed buckets, no cross product; Spark
    shuffles only (doc, band) rows, never pairs outside shared buckets.
    """
    sigs = minhash_signatures(docs, num_hashes, shingle, id_col, text_col)
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        id_col,
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.slice("signature", b * rows_per_band + 1, rows_per_band)).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "signature", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est_sim = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_hashes))
    )
    return (
        cand.withColumn("est_jaccard", est_sim)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
        .orderBy("id_a", "id_b")
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash long): 64-bit SimHash over word hashes — bit-majority
    of murmur64(word), vectorized with an unpacked bit matrix."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("simhash", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.uint64)
            for i, t in enumerate(pdf[text_col].to_numpy()):
                words = ("" if t is None else str(t)).lower().split()
                if not words:
                    continue
                h = murmur64a_array(np.array(words, dtype=object))
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
                maj = (2 * bits - 1).sum(axis=0) > 0
                out[i] = np.sum(maj.astype(np.uint64) << np.arange(64, dtype=np.uint64))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "simhash": out.view(np.int64)})

    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def simhash_near_dups(docs: DataFrame, hamming_max: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= hamming_max, using the
    4-block pigeonhole trick: any pair within distance 3 agrees on at
    least one of four 16-bit blocks → block-equality self-join buckets
    candidates, exact popcount verifies (no cross product)."""
    sh = simhash64(docs, id_col, text_col)
    blocks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("simhash", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bv").alias("bv"))
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["blk", "bv"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= hamming_max)
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact word n-gram Jaccard over candidate pairs sharing at least
    one n-gram (explode→co-group join; SQL-expressible for the oracle).
    Quadratic only within shared-shingle buckets."""
    grams = docs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) - (n - 1), F.lit(1)),
                ),
                lambda i: F.array_join(
                    F.slice(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), i, n), " "
                ),
            )
        ).alias("gram"),
    ).distinct()
    counts = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    a = grams.withColumnRenamed(id_col, "id_a")
    b = grams.withColumnRenamed(id_col, "id_b")
    inter = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_grams", "ga")
    cb = counts.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_grams", "gb")
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("ga") + F.col("gb") - F.col("n_inter")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------------------- tokenization

# BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct splits,
# restricted to ASCII classes so Java-regex (Spark) and RE2 (DuckDB)
# agree byte-for-byte — the oracle runs the same pattern).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_token_count(col="text"):
    """Token count under the BPE-ish pre-tokenizer (JVM-side regex)."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    return (
        docs.withColumn("n_bpe", bpe_ish_token_count())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.max("n_bpe").cast("long").alias("max_bpe_tokens"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------- winnowing

def winnowing_fingerprints(docs: DataFrame, k: int = 5, window: int = 4,
                           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03): rolling hash over character k-grams, keep the minimum
    hash of every sliding window → a compact, position-robust
    fingerprint set.  Vectorized: one murmur pass over all k-grams of a
    doc (stride-tricks windowing), sliding-window minimum via a
    (n_windows, window) strided min — no per-gram Python.

    Returns (id, fingerprint long) exploded rows — the join key for
    plagiarism/near-dup detection at corpus scale."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            out_ids, out_fps = [], []
            for did, t in zip(pdf[id_col].to_numpy(), pdf[text_col].to_numpy()):
                b = np.frombuffer(("" if t is None else str(t)).lower().encode("utf-8"), dtype=np.uint8)
                if len(b) < k:
                    continue
                grams = sliding_window_view(b, k)  # (n-k+1, k)
                h = _hash_kgrams(grams)
                if len(h) < window:
                    mins = np.array([h.min()])
                else:
                    mins = np.unique(sliding_window_view(h, window).min(axis=1))
                out_ids.extend([did] * len(mins))
                out_fps.extend(mins.view(np.int64).tolist())
            yield pd.DataFrame({id_col: out_ids, "fingerprint": out_fps})

    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def _hash_kgrams(grams: np.ndarray) -> np.ndarray:
    """murmur64 of fixed-width k-gram byte rows, fully vectorized."""
    from .hashing import _murmur64a_fixed

    return _murmur64a_fixed(np.ascontiguousarray(grams), grams.shape[1], np.uint64(0xE17A1465))


def winnowing_similar_pairs(docs: DataFrame, k: int = 5, window: int = 4,
                            min_shared: int = 10,
                            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Doc pairs sharing >= min_shared winnowing fingerprints (equi-join
    on fingerprint → co-group count; no cross product)."""
    fp = winnowing_fingerprints(docs, k, window, id_col, text_col)
    a = fp.withColumnRenamed(id_col, "id_a")
    b = fp.withColumnRenamed(id_col, "id_b")
    return (
        a.join(b, "fingerprint")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= min_shared)
        .orderBy("id_a", "id_b")
    )
