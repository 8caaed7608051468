"""Multimodal plumbing tests: schema, batch shape, deterministic fake
decode, and exactness of the integer-sum feature math."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_lib_spark.multimodal import (
    FEATURE_COLS,
    DecoderUnavailable,
    _decode_audio,
    _decode_image,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_image_features,
    sample_video_frames,
    synthesize_media,
    synthesize_real_media,
)


def test_unknown_formats_raise_decoder_unavailable():
    with pytest.raises(DecoderUnavailable):
        _decode_image(b"\x89PNG\r\n", 8, 8, deterministic_fake=False)
    with pytest.raises(DecoderUnavailable):
        _decode_audio(b"fLaC\0\0", deterministic_fake=False)
    img = _decode_image(b"abcdef", 8, 8, deterministic_fake=True)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


def test_ppm_roundtrip_and_header_grammar():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # full header grammar: comments and arbitrary whitespace; raster
    # whose FIRST byte is whitespace-valued (0x0A) must survive
    img2 = img.copy()
    img2[0, 0] = (0x0A, 0x20, 0x09)
    hdr = b"P6 # comment\n#another\n 9\t5\n# last\n255\n"
    assert (decode_ppm(hdr + img2.tobytes()) == img2).all()
    with pytest.raises(DecoderUnavailable):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\0" * 24)  # 16-bit maxval
    with pytest.raises(DecoderUnavailable):
        decode_ppm(b"P6\n4 4\n255\n\0\0")  # truncated raster
    # corrupt headers must surface as DecoderUnavailable, not raw numpy
    # errors escaping from an executor: negative dims parse as valid
    # ints and non-numeric tokens don't
    with pytest.raises(DecoderUnavailable):
        decode_ppm(b"P6\n-3 -5\n255\n" + b"\0" * 45)
    with pytest.raises(DecoderUnavailable):
        decode_ppm(b"P6\n0 4\n255\n")
    with pytest.raises(DecoderUnavailable):
        decode_ppm(b"P6\nab 4\n255\n" + b"\0" * 48)


def test_wav_roundtrip_and_chunk_walk():
    samples = (np.arange(-100, 100, dtype=np.int16) * 163).astype(np.int16)
    payload = encode_wav(samples, sample_rate=16000)
    out, rate = decode_wav(payload)
    assert rate == 16000 and (out == samples).all()
    # a LIST chunk (odd-sized, so word-alignment matters) before data
    # must be skipped, as real writers emit metadata chunks
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = samples.astype("<i2").tobytes()
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"  # pad byte
            + b"data" + struct.pack("<I", len(data)) + data)
    out2, rate2 = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate2 == 8000 and (out2 == samples).all()
    with pytest.raises(DecoderUnavailable):
        decode_wav(encode_wav(samples)[:20])  # no data chunk survives
    # stereo folds to channel-mean mono
    stereo = np.column_stack([samples, samples + 2]).reshape(-1)
    out3, _ = decode_wav(encode_wav(stereo).replace(
        struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
        struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)))
    assert (out3 == samples + 1).all()


def test_real_media_features_match_formula(spark):
    """The REAL decode path end-to-end: PPM/WAV payloads encoded by the
    fixture, decoded by the extractors, features equal to the closed-
    form derivation (the same one the gate oracle uses)."""
    from stream_lib_spark.multimodal import extract_audio_features

    media = synthesize_real_media(spark, n=24)
    imgs = extract_image_features(media, deterministic_fake=False) \
        .toPandas().set_index("media_id")
    for mid in imgs.index:
        y, x, c = np.ogrid[0:8, 0:8, 0:3]
        px = ((int(mid) + 7 * y + 13 * x + 31 * c) % 256).astype(np.int64)
        s, ss = px.sum(axis=(0, 1)), (px * px).sum(axis=(0, 1))
        assert list(imgs.loc[mid, ["f0", "f1", "f2"]]) == list(s / 64.0)
        assert list(imgs.loc[mid, ["f3", "f4", "f5"]]) == list((64 * ss - s * s) / 4096.0)
        assert imgs.loc[mid, "f6"] == px.min() and imgs.loc[mid, "f7"] == px.max()
    auds = {r["media_id"]: r for r in
            extract_audio_features(media, deterministic_fake=False).collect()}
    for mid, r in auds.items():
        j = np.arange(64 + mid % 64, dtype=np.int64)
        w = (mid * 31 + j * 7) % 65536 - 32768
        assert r["n_samples"] == len(w) and r["amp_sum"] == int(w.sum())
        assert (r["amp_min"], r["amp_max"]) == (int(w.min()), int(w.max()))
        assert r["mean_amp"] == w.sum() / float(len(w))


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


def test_y4m_roundtrip_and_header_grammar():
    from stream_lib_spark.multimodal import decode_y4m, encode_y4m

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(4, 3, 6, 10), dtype=np.uint8)
    out, num, den = decode_y4m(encode_y4m(frames, fps=(30000, 1001)))
    assert (out == frames).all() and (num, den) == (30000, 1001)
    # real-world grammar: reordered/extra header params, X comment tag,
    # and FRAME lines carrying their own parameters
    raw = (b"YUV4MPEG2 C444 Ip F25:1 A1:1 Xcomment H2 W3\n"
           + b"FRAME Ixyz\n" + bytes(range(18))
           + b"FRAME\n" + bytes(range(100, 118)))
    out, num, den = decode_y4m(raw)
    assert out.shape == (2, 3, 2, 3) and num == 25
    assert out[1].ravel().tolist() == list(range(100, 118))
    with pytest.raises(DecoderUnavailable):
        decode_y4m(b"YUV4MPEG2 W4 H4 C420jpeg\n" + b"FRAME\n" + b"\0" * 24)
    # C444alpha is 4 planes/frame and C444p10 is 16-bit — a startswith
    # check would accept both and mis-slice the raster
    with pytest.raises(DecoderUnavailable):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444alpha\n" + b"FRAME\n" + b"\0" * 16)
    with pytest.raises(DecoderUnavailable):
        decode_y4m(b"YUV4MPEG2 W-4 H4 F25:1\n" + b"FRAME\n" + b"\0" * 48)
    with pytest.raises(DecoderUnavailable):
        decode_y4m(b"YUV4MPEG2 W4 H4\nFRAME\n\0\0")  # truncated frame
    with pytest.raises(DecoderUnavailable):
        decode_y4m(b"RIFF....")
    # zero-frame stream decodes to an empty stack, not an error
    out, _, _ = decode_y4m(b"YUV4MPEG2 W4 H4 F25:1\n")
    assert out.shape == (0, 3, 4, 4)


def test_y4m_roundtrip_property():
    """Property: encode->decode is identity for every frame-count /
    plane-shape / fps combination (the container stores raw planar
    bytes, so nothing may be lost or reordered)."""
    from hypothesis import given, settings, strategies as st

    from stream_lib_spark.multimodal import decode_y4m, encode_y4m

    @settings(max_examples=30, deadline=None)
    @given(n=st.integers(0, 5), h=st.integers(1, 12), w=st.integers(1, 12),
           num=st.integers(1, 60000), den=st.integers(1, 1001),
           seed=st.integers(0, 2**31 - 1))
    def check(n, h, w, num, den, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, size=(n, 3, h, w), dtype=np.uint8)
        out, gn, gd = decode_y4m(encode_y4m(frames, fps=(num, den)))
        assert out.shape == frames.shape and (out == frames).all()
        assert (gn, gd) == (num, den)

    check()


def test_video_real_sampling_matches_formula(spark):
    """Real y4m path end-to-end: decode genuinely encoded frames, and
    the plane-byte-sum fingerprints must equal the generation formula
    recomputed in numpy (every 2nd frame at every_ms=80, 25 fps)."""
    media = synthesize_real_media(spark, n=30)
    got = {(r["media_id"], r["frame_idx"]): r["frame_fingerprint"]
           for r in sample_video_frames(media, every_ms=80,
                                        deterministic_fake=False).collect()}
    want = {}
    for mid in range(30):
        if mid % 3 != 2:
            continue
        for idx in range(0, 2 + mid % 4, 2):
            p, y, x = np.ogrid[0:3, 0:8, 0:8]
            want[(mid, idx)] = int(
                ((mid + 17 * idx + 7 * y + 13 * x + 31 * p) % 256).sum())
    assert got == want


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


def test_audio_features_exact(spark):
    import hashlib

    from stream_lib_spark.multimodal import extract_audio_features

    media = synthesize_media(spark, n=30)
    out = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert set(out) == {i for i in range(30) if i % 3 == 1}
    # recompute one waveform independently from the payload definition
    mid = 1
    h = hashlib.sha256(f"payload-{mid}".encode()).hexdigest().encode()
    w = np.frombuffer(h, dtype=np.uint8).astype(np.int64)
    samples = w[0::2] + 256 * w[1::2]
    r = out[mid]
    assert r["n_samples"] == 32
    assert r["amp_sum"] == int(samples.sum())
    assert (r["amp_min"], r["amp_max"]) == (int(samples.min()), int(samples.max()))
    assert r["mean_amp"] == samples.sum() / 32.0


def test_decoder_unavailable_raises(spark):
    from stream_lib_spark.multimodal import DecoderUnavailable, extract_audio_features

    media = synthesize_media(spark, n=6)  # sha-hex payloads: not RIFF
    try:
        extract_audio_features(media, deterministic_fake=False).collect()
        raise AssertionError("expected decode failure")
    except Exception as e:  # Spark wraps the executor-side exception
        assert "DecoderUnavailable" in str(type(e)) or "no codec" in str(e)
