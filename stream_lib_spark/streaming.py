"""Structured Streaming ingestion into sketch state.

The reference consumes unbounded streams through ``offer()`` one item
at a time (``cardinality/ICardinality.java:22-72``).  The Spark-native
equivalent: a Structured Streaming query whose micro-batches fold into
a persisted sketch state via the same two-level monoid merge —
``foreachBatch`` runs the batch-mode ``sketch_agg`` on each micro-batch
and merges the result into a versioned state store.

Exactly-once: the state store records the last applied ``batch_id``;
replayed micro-batches (restart after failure, which Structured
Streaming guarantees to re-deliver with the same batch_id) are skipped,
so the final state equals the uninterrupted run byte-for-byte — the
streaming twin of jobs/checkpoint.py.

``streaming_sketch_query`` returns the StreamingQuery; use
``read_state`` to get the current sketch at any time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .agg import SketchSpec, sketch_from_bytes, sketch_agg


class SketchStateStore:
    """Versioned PARQUET state table (the Delta/Iceberg-shaped deploy
    story, same single-writer commit protocol):

        <path>/data/v<batch_id>.parquet   immutable snapshot
                                          (blob binary, batch_id long)
        <path>/_versions/<batch_id>.json  commit marker

    A commit writes the immutable snapshot data file first, then
    atomically publishes the version marker (tmp + rename) — a reader
    resolves MAX(committed version) and can never observe a half-written
    snapshot, exactly the manifest-pointer protocol of an Iceberg/Delta
    commit (and the same emulation ``jobs/checkpoint.py`` uses for
    snapshot-pinned reads).  All IO goes through a ``StateFS`` (fs.py):
    local paths use atomic rename, hdfs://-s3a://-style URIs go through
    the JVM Hadoop FileSystem with a write-then-verify commit that never
    assumes atomic rename — ``publish`` is the single FS-dependent
    commit step either way.  History is retained, so any past state is
    still queryable by version; snapshots are plain parquet, readable by
    Spark/DuckDB/any engine, not just this library.  Structured
    Streaming guarantees one driver per query, so the single-writer
    assumption holds per state path; the stored ``batch_id`` makes
    replayed micro-batches idempotent."""

    def __init__(self, path: str, fs=None):
        from .fs import resolve_fs

        self.path = path
        self.fs = fs if fs is not None else resolve_fs(path)
        self._data_dir = self.fs.join(path, "data")
        self._vdir = self.fs.join(path, "_versions")
        self.fs.mkdirs(self._data_dir)
        self.fs.mkdirs(self._vdir)

    def versions(self) -> list[int]:
        return sorted(
            int(f[:-5]) for f in self.fs.listdir(self._vdir) if f.endswith(".json")
        )

    def read(self, version: int | None = None) -> tuple[object | None, int]:
        """Latest committed (sketch, batch_id), or a pinned ``version``."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        committed = self.versions()
        if not committed:
            return None, -1
        batch_id = committed[-1] if version is None else version
        if batch_id not in committed:
            raise ValueError(f"version {batch_id} not committed (have {committed})")
        snap = json.loads(self.fs.read_bytes(self.fs.join(self._vdir, f"{batch_id:020d}.json")))
        tbl = pq.read_table(pa.BufferReader(self.fs.read_bytes(self.fs.join(self.path, snap["file"]))))
        return sketch_from_bytes(tbl.column("blob")[0].as_py()), batch_id

    def write(self, sketch, batch_id: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rel = f"data/v{batch_id}.parquet"
        tbl = pa.table({
            "blob": pa.array([sketch.to_bytes()], type=pa.binary()),
            "batch_id": pa.array([batch_id], type=pa.int64()),
        })
        sink = pa.BufferOutputStream()
        pq.write_table(tbl, sink)
        # snapshot in place, NOT yet committed — but verified: the
        # marker commit below makes this file load-bearing, so a torn
        # PUT here must be caught BEFORE the marker publishes it
        self.fs.publish(self.fs.join(self.path, rel), sink.getvalue().to_pybytes())
        marker = self.fs.join(self._vdir, f"{batch_id:020d}.json")
        payload = json.dumps({"batch_id": batch_id, "file": rel}).encode()
        self.fs.publish(marker, payload)  # the atomic commit point


def streaming_sketch_query(stream_df: DataFrame, col: str, spec: SketchSpec,
                           state_dir: str, checkpoint_dir: str,
                           trigger_available_now: bool = True,
                           processing_time: str | None = None, fs=None):
    """Fold a streaming DataFrame's column into a persisted sketch.

    Each micro-batch: batch-mode two-level sketch_agg (partition
    partials → merge) → monoid-merge into the stored state.  Restart
    safety: batches with id <= stored batch_id are no-ops.
    ``fs``: explicit StateFS (default: resolved from state_dir scheme).
    Trigger: availableNow replay by default; pass
    ``processing_time='1 seconds'`` (with ``trigger_available_now=
    False``) for a LIVE continuous micro-batch cadence — the versioned
    store commits one version per fired batch under either trigger
    (tests/test_streaming.py exercises both)."""
    if processing_time is not None and trigger_available_now:
        raise ValueError(
            "processing_time requires trigger_available_now=False — the "
            "availableNow default would silently win and the query would "
            "replay-and-terminate instead of firing on the clock")
    store = SketchStateStore(state_dir, fs=fs)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        current, last_id = store.read()
        if batch_id <= last_id:
            return  # replayed batch after restart — already applied
        rows = sketch_agg(batch_df, [], col, spec).collect()
        batch_sketch = sketch_from_bytes(bytes(rows[0]["sketch"]))
        merged = batch_sketch if current is None else current.merge(batch_sketch)
        store.write(merged, batch_id)

    writer = stream_df.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_state(state_dir: str, fs=None):
    """Current sketch from a streaming state store (None if empty)."""
    sketch, _ = SketchStateStore(state_dir, fs=fs).read()
    return sketch


def windowed_streaming_sketch(stream_df: DataFrame, ts_col: str, duration: str,
                              col: str, spec: SketchSpec,
                              watermark: str | None = None):
    """Event-time windowed sketch state: one sketch per tumbling
    ``duration`` window of ``ts_col``, updated in Update mode.  Late
    rows are handled by the monoid itself — a late arrival simply
    merges into its window's sketch.

    Without ``watermark`` this composes ``window()`` with the per-key
    stateful fold and window state lives FOREVER (only suitable for
    bounded window domains).  With ``watermark`` (e.g. ``'1 hour'``)
    the fold runs under an EVENT-TIME TIMEOUT: once the watermark
    passes a window's end (no more rows can arrive — the operator drops
    later ones), the window emits a final row (``is_final=true``) and
    its GroupState is REMOVED, so state size tracks the number of OPEN
    windows, not stream lifetime."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if watermark is None:
        df = stream_df.withColumn(
            "window_start", F.window(F.col(ts_col), duration)["start"].cast("string")
        )
        return keyed_streaming_sketch(df, ["window_start"], col, spec)

    mode = spec.input_mode
    c = F.col(col)
    if mode == "hash":
        in_col = F.xxhash64(c).alias("__in")
    elif mode == "value":
        in_col = c.cast("double").alias("__in")
    elif mode == "ivalue":
        c = c.try_cast("long")
        in_col = c.alias("__in")
    else:
        in_col = c.cast("string").alias("__in")
    win = F.window(F.col(ts_col), duration)
    prepared = (
        stream_df.withWatermark(ts_col, watermark)
        .where(c.isNotNull())
        .select(
            F.col(ts_col),  # keep the watermarked attribute in the plan
            win["start"].cast("string").alias("window_start"),
            win["end"].alias("__wend"),
            in_col,
        )
    )

    out_schema = "window_start string, sketch binary, estimate double, is_final boolean"

    def fold(key, pdfs, state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            # watermark passed window end: finalize and EVICT
            blob = bytes(state.get[0])
            state.remove()
            sk = sketch_from_bytes(blob)
            est = float(sk.cardinality()) if hasattr(sk, "cardinality") else float("nan")
            yield pd.DataFrame({"window_start": [key[0]], "sketch": [blob],
                                "estimate": [est], "is_final": [True]})
            return
        sk = sketch_from_bytes(bytes(state.get[0])) if state.exists else spec.new()
        wend_ms = None
        for pdf in pdfs:
            if wend_ms is None and len(pdf):
                wend_ms = int(pd.Timestamp(pdf["__wend"].iloc[0]).value // 1_000_000)
            arr = pdf["__in"].dropna()
            if len(arr) == 0:
                continue
            if mode in ("hash", "ivalue"):
                spec.update(sk, arr.to_numpy().astype(np.int64, copy=False))
            elif mode == "value":
                spec.update(sk, arr.to_numpy().astype(np.float64, copy=False))
            else:
                vc = arr.value_counts()
                spec.update(sk, vc.index.to_numpy(), vc.to_numpy())
        state.update((sk.to_bytes(),))
        if wend_ms is not None:
            # evict when the watermark passes the window end (must stay
            # strictly ahead of the current watermark)
            state.setTimeoutTimestamp(max(wend_ms, state.getCurrentWatermarkMs() + 1))
        est = float(sk.cardinality()) if hasattr(sk, "cardinality") else float("nan")
        yield pd.DataFrame({"window_start": [key[0]], "sketch": [sk.to_bytes()],
                            "estimate": [est], "is_final": [False]})

    return prepared.groupBy("window_start").applyInPandasWithState(
        fold, out_schema, "blob binary", "Update", GroupStateTimeout.EventTimeTimeout
    )


def _keyed_prepared(stream_df: DataFrame, keys: list[str], col: str,
                    spec: SketchSpec):
    """Shared input projection of both keyed stateful backends:
    (prepared df, input mode, output schema).  The value column is
    JVM-hashed / cast BEFORE the stateful operator so the Python side
    only ever folds typed numpy arrays."""
    from pyspark.sql import functions as F

    mode = spec.input_mode
    c = F.col(col)
    if mode == "hash":
        in_col = F.xxhash64(c).alias("__in")
    elif mode == "value":
        in_col = c.cast("double").alias("__in")
    elif mode == "ivalue":
        c = c.try_cast("long")  # ANSI-safe; filter below masks failed casts
        in_col = c.alias("__in")
    else:
        in_col = c.cast("string").alias("__in")
    # offer(null) is a no-op — and filtering BEFORE the stateful operator
    # keeps the hash column non-null so its pandas dtype stays int64.
    # (A nullable long arrives as float64 and rounds hashes to 53 bits,
    # silently corrupting per-key state across micro-batches.)
    prepared = stream_df.where(c.isNotNull()).select(*[F.col(k) for k in keys], in_col)
    out_schema = ", ".join(f"{k} string" for k in keys) + ", sketch binary, estimate double"
    return prepared, mode, out_schema


def _fold_pdfs(sk, pdfs, mode: str, spec: SketchSpec):
    """Fold an iterator of micro-batch pandas frames into sketch ``sk``
    — the single update loop both stateful backends run."""
    import numpy as np

    for pdf in pdfs:
        arr = pdf["__in"].dropna()  # defensive; input is pre-filtered
        if len(arr) == 0:
            continue
        if mode in ("hash", "ivalue"):
            spec.update(sk, arr.to_numpy().astype(np.int64, copy=False))
        elif mode == "value":
            spec.update(sk, arr.to_numpy().astype(np.float64, copy=False))
        else:
            vc = arr.value_counts()
            spec.update(sk, vc.index.to_numpy(), vc.to_numpy())
    return sk


def keyed_streaming_sketch(stream_df: DataFrame, keys: list[str], col: str,
                           spec: SketchSpec):
    """Per-key streaming sketch state via ``applyInPandasWithState``:
    each key group holds its serialized sketch as GroupState; every
    micro-batch folds the group's new rows (JVM-hashed, Arrow-batched)
    into the state and emits (keys..., sketch, estimate) in Update mode.

    This is the reference's per-stream ``offer()`` loop as a native
    Spark stateful operator — state lives in the state store
    (RocksDB/HDFS-backed on a cluster), so it survives restarts with
    Structured Streaming's exactly-once guarantees.

    See ``keyed_streaming_sketch_tws`` for the same operator on the
    Spark 4 ``transformWithStateInPandas`` engine — state bytes are
    identical between the two backends (byte-parity tested).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepared, mode, out_schema = _keyed_prepared(stream_df, keys, col, spec)
    state_schema = "blob binary"

    def fold(key, pdfs, state: GroupState):
        if state.exists:
            sk = sketch_from_bytes(bytes(state.get[0]))
        else:
            sk = spec.new()
        _fold_pdfs(sk, pdfs, mode, spec)
        state.update((sk.to_bytes(),))
        est = float(sk.cardinality()) if hasattr(sk, "cardinality") else float("nan")
        yield pd.DataFrame({**{k: [str(v)] for k, v in zip(keys, key)},
                            "sketch": [sk.to_bytes()], "estimate": [est]})

    return prepared.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "Update", GroupStateTimeout.NoTimeout
    )


def keyed_streaming_sketch_tws(stream_df: DataFrame, keys: list[str], col: str,
                               spec: SketchSpec):
    """``keyed_streaming_sketch`` on the Spark 4
    ``transformWithStateInPandas`` engine (SPARK-49564): the same
    prepared projection and the same fold loop, with per-key sketch
    bytes in a named ``ValueState`` instead of the legacy GroupState
    tuple.  Output schema and state BYTES are identical to the classic
    backend — the sketches are exactly associative, so backend choice
    can never change a stored estimate (parity-tested both ways).

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider``) — transformWithState is only
    implemented there; the HDFS-backed default store raises at query
    start.  The engine's Python state-server protocol additionally
    needs ``protobuf`` at runtime (any real PySpark deployment has it;
    this sandbox does not, so the end-to-end engine test auto-skips
    and the processor's fold/state logic is byte-parity-tested against
    the classic backend through a state-protocol fake instead).
    Prefer this backend on Spark 4+: state schema evolution, TTL,
    timers, and multiple named state variables come with the new
    engine, none of which the legacy operator offers."""
    prepared, mode, out_schema = _keyed_prepared(stream_df, keys, col, spec)
    return prepared.groupBy(*keys).transformWithStateInPandas(
        make_sketch_processor(keys, mode, spec), outputStructType=out_schema,
        outputMode="Update", timeMode="None",
    )


def make_sketch_processor(keys: list[str], mode: str, spec: SketchSpec):
    """The ``StatefulProcessor`` behind ``keyed_streaming_sketch_tws``,
    exposed so its fold/state logic is testable without the TWS engine
    (whose Python protocol needs protobuf): anything implementing
    ``getValueState(name, schema) -> {get(), update(tuple)}`` drives it."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _SketchProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("sketch_blob", "blob binary")

        def handleInputRows(self, key, rows, timerValues):
            prior = self._state.get()
            sk = sketch_from_bytes(bytes(prior[0])) if prior is not None else spec.new()
            _fold_pdfs(sk, rows, mode, spec)
            self._state.update((sk.to_bytes(),))
            est = float(sk.cardinality()) if hasattr(sk, "cardinality") else float("nan")
            yield pd.DataFrame({**{k: [str(v)] for k, v in zip(keys, key)},
                                "sketch": [sk.to_bytes()], "estimate": [est]})

        def close(self) -> None:
            pass

    return _SketchProcessor()
