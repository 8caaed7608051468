"""Reference-CMS interop against golden vectors from the javac-compiled
reference (tools/golden/cms_wire_golden.csv): each row carries the
serialized blob plus the reference's own exact point estimates for a
probe set — parse, query-parity, round-trip, split-merge."""

import base64
import csv
import os
import sys

import numpy as np

csv.field_size_limit(sys.maxsize)  # the dense blob rows exceed the default

from stream_lib_spark.sketches.cms_wire import ReferenceCMS

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tools", "golden",
                      "cms_wire_golden.csv")

LONG_PROBES = np.array([i * 2654435761 for i in range(15)] + [999999999999],
                       dtype=np.int64)
STR_PROBES = [f"tok-{i}" for i in range(10)] + ["absent-key"]


def _rows():
    with open(GOLDEN) as f:
        for depth, width, seed, size, ests, b64 in csv.reader(f):
            yield (int(depth), int(width), int(seed), int(size),
                   [int(x) for x in ests.split(";")], base64.b64decode(b64))


def test_parse_query_parity_and_roundtrip():
    for depth, width, seed, size, ests, blob in _rows():
        cms = ReferenceCMS.from_bytes(blob)
        assert (cms.depth, cms.width, cms.size) == (depth, width, size)
        got_long = cms.estimate_long(LONG_PROBES[:15])
        got_str = cms.estimate_string(STR_PROBES[:10])
        absent_s = cms.estimate_string(["absent-key"])[0]
        absent_l = cms.estimate_long(LONG_PROBES[15:])[0]
        expect = ests
        assert got_long.tolist() == expect[:15]
        assert got_str.tolist() == expect[15:25]
        assert absent_s == expect[25] and absent_l == expect[26]
        assert cms.to_bytes() == blob  # byte-exact round trip


def test_rebuild_matches_reference_table():
    # replay the golden generator's exact input stream with OUR update
    # path into an empty table (reference hashA from the parsed blob):
    # the resulting table must be byte-identical to the reference's
    for depth, width, seed, size, ests, blob in _rows():
        ref = ReferenceCMS.from_bytes(blob)
        mine = ReferenceCMS(depth, width, ref.hash_a,
                            np.zeros((depth, width), dtype=np.int64))
        i = np.arange(5000, dtype=np.int64)
        mine.add_long(i * 2654435761, (i % 5) + 1)
        toks = [f"tok-{int(x) % 700}" for x in i]
        mine.add_string(toks, np.ones(5000, dtype=np.int64))
        assert (mine.table == ref.table).all()
        assert mine.to_bytes() == blob


def test_split_merge_equals_whole():
    depth, width, seed, size, ests, blob = next(_rows())
    ref = ReferenceCMS.from_bytes(blob)
    parts = []
    i = np.arange(5000, dtype=np.int64)
    for s in range(4):
        part = ReferenceCMS(ref.depth, ref.width, ref.hash_a,
                            np.zeros((ref.depth, ref.width), dtype=np.int64))
        sel = i[s::4]
        part.add_long(sel * 2654435761, (sel % 5) + 1)
        part.add_string([f"tok-{int(x) % 700}" for x in sel],
                        np.ones(len(sel), dtype=np.int64))
        parts.append(part)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.to_bytes() == blob


def test_encoded_matrix_edge_parity():
    """Round 6: the vectorized UCS4-view encoder must agree byte-for-
    byte with per-item codecs on every edge that ever bit us — trailing
    NUL (numpy U storage strips it without the sentinel), interior NUL,
    U+0100 (UTF-16-BE low byte 0x00), astral chars (surrogate pairs via
    the slow-row fallback), CJK, empty strings, and numeric coercion."""
    from stream_lib_spark.sketches.cms_wire import encoded_matrix

    tricky = ["", "a", "abĀ", "Ā", "x\x00", "\x00", "inner\x00nul",
              "emoji \U0001F600 mixed", "Ā˂Ȁ", "plain", "Ā" * 7,
              "ünïcødé", "日本語テキスト"]
    items = np.array(tricky + [f"user-{i}" for i in range(200)], dtype=object)

    for encoding, prefix in (("utf-16-be", b"\xfe\xff"), ("utf-8", b"")):
        mat, lengths = encoded_matrix(items, encoding, prefix=prefix)
        for i, s in enumerate(items):
            want = prefix + str(s).encode(encoding)
            got = mat[i, : lengths[i]].tobytes()
            assert got == want, (encoding, i, s, got, want)

    # numeric arrays coerce like str()
    mat, lengths = encoded_matrix(np.arange(50, dtype=np.int64), "utf-8")
    assert mat[7, : lengths[7]].tobytes() == b"7"
    assert mat[42, : lengths[42]].tobytes() == b"42"

    # lone surrogate: real codec raises, matching the old per-item path
    import pytest as _pytest

    with _pytest.raises(UnicodeEncodeError):
        encoded_matrix(np.array(["bad\ud800tail"], dtype=object), "utf-16-be")


def test_encoded_buckets_long_tail_split_and_scalar_murmur():
    """Code-review r6 #5: one huge item in a large batch must not
    inflate the padded-UCS4 matrix (O(n*max_len*4)) — long items split
    into the per-item codec tail, and the murmur kernel's scalar
    big-int path handles long few-row buckets.  Parity vs the per-item
    reference on a mixed batch; scalar==vector parity on random rows."""
    from stream_lib_spark.sketches.cms_wire import (
        _murmur2_32_py,
        encoded_buckets,
        murmur2_32_fixed,
        string_hash_buckets,
    )

    rng = np.random.RandomState(11)
    for L in (4096, 4097, 10001):
        buf = rng.randint(0, 256, size=(2, L)).astype(np.uint8)
        big = np.vstack([buf] * 201)  # 402 rows -> vector path
        for seed in (-1, 0, 987654321):
            vec = murmur2_32_fixed(big, L, seed)
            sc = murmur2_32_fixed(buf, L, seed)  # 2 rows -> scalar path
            assert (sc == vec[:2]).all()

    items = np.array(
        [f"user-{i}" for i in range(5000)] + ["長い" * 40_000, "x" * 99_999],
        dtype=object)
    got = string_hash_buckets(items, 4, 100_003)
    want = np.empty_like(got)
    rows32 = np.arange(4, dtype=np.int32)
    for i, s in enumerate(items):
        b = b"\xfe\xff" + str(s).encode("utf-16-be")
        h1 = _murmur2_32_py(b, len(b), 0)
        h2 = _murmur2_32_py(b, len(b), h1)
        with np.errstate(over="ignore"):
            v = np.int32(h1) + rows32 * np.int32(h2)
        want[i] = np.abs(v.astype(np.int64)) % 100_003
    assert (got == want).all()
    # the generator actually split: some bucket came from the tail path
    Ls = [L for _, _, L in encoded_buckets(items, "utf-16-be", prefix=b"\xfe\xff")]
    assert max(Ls) > 100_000
