"""Property test for the state-store commit protocol: under an
arbitrary interleaving of torn PUTs (data files or markers), a reader
always sees a complete, parseable latest version — the protocol never
depends on atomic rename."""

import numpy as np
from hypothesis import given, settings, strategies as st

from stream_lib_spark.agg import SketchSpec
from stream_lib_spark.fs import FakeRemoteFS
from stream_lib_spark.hashing import murmur64a_int64
from stream_lib_spark.streaming import SketchStateStore


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from([None, "data/", "_versions"]), min_size=1, max_size=8))
def test_store_consistent_under_torn_puts(tears):
    """One tear target per commit (or None): every committed version is
    readable, estimates monotone, history complete."""
    fs = FakeRemoteFS()
    store = SketchStateStore("s3://b/state", fs=fs)
    spec = SketchSpec("hll", p=10)
    sk = spec.new()
    lo = 0
    for batch_id, tear in enumerate(tears):
        sk.update_hashed(murmur64a_int64(np.arange(lo, lo + 200, dtype=np.int64)))
        lo += 200
        fs.tear_next_matching = tear
        store.write(sk, batch_id)
        got, bid = store.read()
        assert bid == batch_id
        assert got.to_bytes() == sk.to_bytes()
    assert store.versions() == list(range(len(tears)))
    # every historical version still parses
    for v in store.versions():
        got, bid = store.read(version=v)
        assert bid == v and got.cardinality() > 0


class _VanishingReadFS(FakeRemoteFS):
    """PUT reports success but the first verify read finds no object —
    the eventual-consistency failure ADVICE flagged: publish must treat
    a raising verify read like a content mismatch (delete + one retry),
    not propagate."""

    def __init__(self):
        super().__init__()
        self.vanish_next_read = False

    def write_bytes(self, path, data):
        super().write_bytes(path, data)
        if self.vanish_next_read:
            self.vanish_next_read = False
            del self.objects[path]  # object "missing" at verify time


def test_publish_retries_when_verify_read_raises():
    fs = _VanishingReadFS()
    fs.vanish_next_read = True
    fs.publish("b/k", b"payload")
    assert fs.objects["b/k"] == b"payload"
    assert fs.publish_attempts == 2  # vanished PUT + verified rewrite


def test_hadoop_scheme_classification():
    """hdfs-family schemes commit via atomic rename; object stores via
    PUT+verify.  Classification is pure string logic — no JVM needed."""
    from stream_lib_spark.fs import _RENAME_ATOMIC_SCHEMES

    for scheme in ("hdfs", "file", "viewfs", "webhdfs"):
        assert scheme in _RENAME_ATOMIC_SCHEMES
    for scheme in ("s3a", "s3", "gs", "abfs", "abfss", "wasb", "oss", "cos"):
        assert scheme not in _RENAME_ATOMIC_SCHEMES
