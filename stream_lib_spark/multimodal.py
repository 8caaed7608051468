"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container — see ``DecoderUnavailable``), with a deterministic fake
decoder so the Spark-side plumbing — schema, batch shape, partitioning,
Arrow transfer — is real and tested end-to-end.  Swapping in Pillow /
torchaudio at deploy time means replacing ``_decode_image_stub`` only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])


class DecoderUnavailable(NotImplementedError):
    """Raised by the real decode path: media codecs are not installed
    in this environment. Use deterministic_fake=True for testing the
    distributed plumbing."""


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table.  ``kind`` cycles by
    ``media_id % 3`` and ``payload`` is the UTF-8 bytes of
    ``sha256('payload-<id>')`` hex — both SQL-expressible, so the gate
    oracle can re-derive the exact table in DuckDB."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit("payload-"), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1080)) + 16).cast("int").alias("height"),
        # arithmetic (not hashed) so the DuckDB gate oracle can re-derive
        # frame schedules exactly
        ((F.col("id") * 9973) % 600000 + 100).cast("int").alias("duration_ms"),
    )
    return df


def _decode_image_stub(payload: bytes, width: int, height: int,
                       deterministic_fake: bool) -> np.ndarray:
    if not deterministic_fake:
        raise DecoderUnavailable(
            "image codecs not installed in this container; "
            "pass deterministic_fake=True or deploy with Pillow"
        )
    # deterministic fake: tile the payload bytes into an (8, 8, 3) "image"
    buf = np.frombuffer(payload or b"\0", dtype=np.uint8)
    reps = int(np.ceil(8 * 8 * 3 / len(buf)))
    return np.tile(buf, reps)[: 8 * 8 * 3].reshape(8, 8, 3)


FEATURE_COLS = [f"f{i}" for i in range(8)]


def extract_image_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Decode → 8 scalar feature columns, batched via mapInPandas:
    f0-f2 per-channel pixel means, f3-f5 per-channel population
    variances, f6/f7 global min/max.

    The real-world shape: payloads arrive as Arrow binary buffers; the
    decode loop is per-row by necessity (codecs are).  Stats are
    computed from integer pixel sums and divided by powers of two, so
    every double is binary-exact — the DuckDB gate oracle reproduces
    them bit-for-bit.  Scalar (sortable) columns, not an array: the
    driver's canonicalizer sorts every output column."""
    schema = T.StructType(
        [T.StructField("media_id", T.LongType())]
        + [T.StructField(c, T.DoubleType()) for c in FEATURE_COLS]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = _decode_image_stub(payload, w, h, deterministic_fake).astype(np.int64)
                npix = img.shape[0] * img.shape[1]
                s = img.sum(axis=(0, 1))
                ss = (img * img).sum(axis=(0, 1))
                means = s / float(npix)
                variances = (npix * ss - s * s) / float(npix * npix)
                rows.append(
                    [int(mid)] + means.tolist() + variances.tolist()
                    + [float(img.min()), float(img.max())]
                )
            yield pd.DataFrame(rows, columns=["media_id"] + FEATURE_COLS)

    return media.where(F.col("kind") == "image").mapInPandas(gen, schema=schema)


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        deterministic_fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (the real decoder would emit the frame bytes; the fake emits a
    deterministic frame fingerprint).  The fingerprint is the first 15
    hex chars of md5(media_id ':' frame_idx) — 60 bits, so it is
    non-negative in both Spark's signed long and DuckDB's parse, making
    the operator oracle-checkable end-to-end."""
    if not deterministic_fake:
        raise DecoderUnavailable("video codecs not installed in this container")
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
        ).alias("frame_idx"),
    )
    key = F.concat(F.col("media_id").cast("string"), F.lit(":"),
                   F.col("frame_idx").cast("string"))
    return frames.withColumn(
        "frame_fingerprint", F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    )


def _decode_audio_stub(payload: bytes, deterministic_fake: bool) -> np.ndarray:
    if not deterministic_fake:
        raise DecoderUnavailable(
            "audio codecs not installed in this container; "
            "pass deterministic_fake=True or deploy with torchaudio/soundfile"
        )
    # deterministic fake: view the payload bytes as 16-bit LE amplitudes;
    # a null or sub-2-byte payload decodes to one silent sample (the
    # odd-byte trim must never yield a ZERO-sample waveform — callers
    # divide by the sample count and take min/max)
    buf = np.frombuffer(payload or b"\0\0", dtype=np.uint8)
    if len(buf) % 2:
        buf = buf[:-1]
    if len(buf) == 0:
        buf = np.zeros(2, dtype=np.uint8)
    return buf.view("<u2").astype(np.int64)


def extract_audio_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Decode → waveform summary per audio row, batched via mapInPandas
    (per-row decode is inherent to codecs; everything after is numpy).
    Outputs are exact integers plus one power-of-two-divided mean, so
    the DuckDB gate oracle reproduces every value bit-for-bit."""
    schema = ("media_id long, n_samples long, amp_sum long, "
              "amp_min long, amp_max long, mean_amp double")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # guard BEFORE bytes(): a null payload must take the
                # stub's fallback, not TypeError in the executor
                w = _decode_audio_stub(bytes(payload) if payload is not None else None,
                                       deterministic_fake)
                n = len(w)
                s = int(w.sum())
                rows.append([int(mid), n, s, int(w.min()), int(w.max()), s / float(n)])
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "amp_sum",
                                              "amp_min", "amp_max", "mean_amp"])

    return media.where(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(gen, schema=schema)
