"""Filesystem abstraction for the versioned sketch state store.

``SketchStateStore`` (streaming.py) publishes immutable snapshot files
plus tiny commit markers.  The commit protocol has one FS-dependent
step — making a marker atomically VISIBLE — and the right mechanism
differs by store:

  LocalFS    POSIX rename is atomic: stage to ``<name>.tmp`` then
             ``os.replace`` (what rounds 1-3 hard-coded).
  HadoopFS   any Hadoop-supported scheme through the live JVM's
             FileSystem API, with a per-scheme commit mechanism:
             rename-atomic filesystems (hdfs://, file://, viewfs://,
             webhdfs://) stage to ``<name>.tmp`` — a suffix every
             reader ignores (markers are listed by ``.json`` suffix,
             data files only via committed markers) — then
             ``FileSystem.rename``, so a concurrent reader can never
             observe a half-written object under the final name.
             Object stores (s3a://, gs://, abfs://, ...) have atomic
             single-object PUT but NOT atomic rename, so ``publish``
             there PUTs directly and VERIFIES by reading the object
             back — sound under the single-writer Structured Streaming
             guarantee (one driver per query); multi-writer
             coordination would additionally need put-if-absent (a
             Delta-LogStore-style service), which this store's
             contract deliberately does not require.  A torn/failed
             PUT (write raised, verify read raised, or content
             mismatch) is retried once via delete + rewrite.
  FakeRemoteFS  test double with NO rename concept at all and optional
             torn-write injection, proving the store protocol never
             depends on atomic rename (tests/test_streaming.py).

Only small control-plane objects flow through this layer (markers and
one-blob parquet snapshots); bulk data still moves through Spark's own
readers/writers, which are Hadoop-FS-native already.
"""

from __future__ import annotations

import os


class StateFS:
    """Minimal FS surface the state store needs."""

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """File NAMES under path ([] if the path doesn't exist)."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        """Staging write — atomicity NOT required; never a commit point."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def publish(self, path: str, data: bytes) -> None:
        """Atomic-visibility commit write: after this returns, every
        reader sees the complete payload or (on raise) the store is
        known unpublished.  Default: write-then-verify with one
        delete+rewrite retry — correct on stores with atomic
        single-object PUT and a single writer (Structured Streaming
        guarantees one driver per query)."""
        for attempt in (0, 1):
            try:
                self.write_bytes(path, data)
                # the verify read can itself raise (PUT reported success
                # but the object is missing/unreadable) — treat that
                # exactly like a content mismatch: delete + retry once
                ok = self.read_bytes(path) == data
            except Exception:
                if attempt:
                    raise
                self.delete(path)
                continue
            if ok:
                return
            self.delete(path)
        raise IOError(f"publish verify failed twice for {path}")

    def join(self, *parts: str) -> str:
        return "/".join(p.rstrip("/") for p in parts)


class LocalFS(StateFS):
    """POSIX local FS: commit = stage + atomic rename."""

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:
            f.write(data)

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def publish(self, path: str, data: bytes) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # the atomic commit point

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)


#: Hadoop schemes whose ``FileSystem.rename`` is atomic (real
#: filesystems, not object stores).  Everything else — s3a, gs, abfs,
#: wasb, oss, cos, ... — takes the write-then-verify PUT path.
_RENAME_ATOMIC_SCHEMES = frozenset({"hdfs", "file", "viewfs", "webhdfs", "har"})


class HadoopFS(StateFS):
    """Hadoop FileSystem through the live Spark JVM — works for any
    scheme the cluster's Hadoop conf supports.  ``publish`` is
    per-scheme: rename-atomic filesystems (hdfs://, file://, ...) stage
    to ``<name>.tmp`` then rename; object stores use the base-class
    write-then-verify PUT protocol (atomic PUT, no atomic rename)."""

    def __init__(self, base_uri: str, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError("HadoopFS needs a live SparkSession")
        self._jvm = spark._jvm
        jpath = self._jvm.org.apache.hadoop.fs.Path(base_uri)
        self._fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        # classify by the RESOLVED filesystem's scheme, not by string
        # parsing of base_uri: a scheme-less path on a cluster whose
        # fs.defaultFS is hdfs://nn must take the rename-atomic path
        scheme = (self._fs.getUri().getScheme() or "").lower()
        self._rename_atomic = scheme in _RENAME_ATOMIC_SCHEMES

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs.open(self._p(path))
        try:
            return bytes(self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def delete(self, path: str) -> None:
        self._fs.delete(self._p(path), False)

    def publish(self, path: str, data: bytes) -> None:
        if not self._rename_atomic:
            super().publish(path, data)  # object store: PUT + verify
            return
        # HDFS-family: create() makes the name visible immediately with
        # partial content, so a direct PUT would let a reader pick a
        # half-written marker as the latest committed version.  Stage
        # under a ``.tmp`` suffix (invisible to versions(): markers are
        # listed by ``.json`` suffix, data files only via committed
        # markers) and rename — atomic on these schemes.
        tmp = path + ".tmp"
        self.write_bytes(tmp, data)
        dst = self._p(path)
        if self._fs.exists(dst):  # crash-retry leftover; single writer
            self._fs.delete(dst, False)
        if not self._fs.rename(self._p(tmp), dst):
            raise IOError(f"atomic rename commit failed for {path}")


class FakeRemoteFS(StateFS):
    """In-memory object store WITHOUT rename: the only write primitive
    is a whole-object PUT, like S3.  ``tear_next_publish`` makes the
    next commit write a truncated object (a torn PUT), which the
    write-then-verify protocol must detect and repair."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.tear_next_matching: str | None = None  # substring of the path to tear
        self.publish_attempts = 0

    def mkdirs(self, path: str) -> None:
        pass  # object stores have no directories

    def listdir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        return sorted({k[len(prefix):].split("/")[0]
                       for k in self.objects if k.startswith(prefix)})

    def exists(self, path: str) -> bool:
        prefix = path.rstrip("/") + "/"
        return path in self.objects or any(k.startswith(prefix) for k in self.objects)

    def read_bytes(self, path: str) -> bytes:
        return self.objects[path]

    def write_bytes(self, path: str, data: bytes) -> None:
        self.publish_attempts += 1
        if self.tear_next_matching is not None and self.tear_next_matching in path:
            self.tear_next_matching = None
            self.objects[path] = data[: max(0, len(data) // 2)]  # torn PUT
            return
        self.objects[path] = data

    def delete(self, path: str) -> None:
        self.objects.pop(path, None)


def resolve_fs(path: str, spark=None) -> StateFS:
    """Scheme-less paths -> LocalFS; anything with a URI scheme goes
    through the Hadoop FileSystem of the live session."""
    if "://" not in path:
        return LocalFS()
    # file:// included: it exercises the same JVM FileSystem code path
    # the cluster schemes use (RawLocalFileSystem)
    return HadoopFS(path, spark=spark)
