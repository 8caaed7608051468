"""Multimodal plumbing tests: schema, batch shape, deterministic fake
decode, and exactness of the integer-sum feature math."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_lib_spark.multimodal import (
    FEATURE_COLS,
    DecoderUnavailable,
    _decode_image_stub,
    extract_image_features,
    sample_video_frames,
    synthesize_media,
)


def test_decode_stub_gates_real_path():
    with pytest.raises(DecoderUnavailable):
        _decode_image_stub(b"\x01\x02", 8, 8, deterministic_fake=False)
    img = _decode_image_stub(b"abcdef", 8, 8, deterministic_fake=True)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_extract_image_features_exact(spark):
    media = synthesize_media(spark, n=60)
    out = extract_image_features(media).toPandas().set_index("media_id")
    assert list(out.columns) == FEATURE_COLS
    img_ids = [r["media_id"] for r in media.where(F.col("kind") == "image").collect()]
    assert sorted(out.index) == sorted(img_ids)
    # recompute one row exactly from the known payload derivation
    payloads = {r["media_id"]: bytes(r["payload"])
                for r in media.where(F.col("kind") == "image").collect()}
    mid = img_ids[0]
    b = np.frombuffer(payloads[mid], dtype=np.uint8).astype(np.int64)
    assert len(b) == 64  # sha256 hex chars
    s, ss = int(b.sum()), int((b * b).sum())
    assert out.loc[mid, "f0"] == s / 64.0
    assert out.loc[mid, "f3"] == (64 * ss - s * s) / 4096.0
    assert out.loc[mid, "f6"] == float(b.min()) and out.loc[mid, "f7"] == float(b.max())


def test_video_frame_sampling_counts(spark):
    media = synthesize_media(spark, n=60)
    frames = sample_video_frames(media, every_ms=1000)
    expected = (
        media.where(F.col("kind") == "video")
        .select((F.floor(F.col("duration_ms") / 1000) + 1).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert frames.count() == expected
    assert frames.select("media_id", "frame_idx").distinct().count() == frames.count()
