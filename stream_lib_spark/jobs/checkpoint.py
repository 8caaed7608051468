"""Checkpointed, resumable sketch jobs with per-partition lineage.

North-rule contract: a job over a huge (10^12-turn) table must be
resumable from a snapshot checkpoint, with per-partition lineage and
metrics rows, and the resumed result must be byte-identical to an
uninterrupted run.

Mechanism (Iceberg-ready, parquet-backed in the sandbox):

- rows are assigned to ``n_buckets`` deterministic lineage buckets by a
  stable row key expression (default: xxhash64 of all columns — for the
  transcript table use ``(conv_id, turn_idx)``).  Buckets play the role
  of Iceberg file/partition manifests: content-stable across runs, so
  "which work is done" is a set of bucket ids.
- phase A builds one partial-sketch row per (bucket, keys...) and
  appends it to the checkpoint table together with lineage metrics
  (snapshot_id, bucket, rows_seen, state_sha256, wall_ms).  A resumed
  run lists finished buckets and processes only the complement —
  already-persisted partials are never recomputed.
- phase B folds all bucket partials with the sketch monoid in
  deterministic bucket order.  Because bucket contents are pure
  functions of the table snapshot and merges are commutative monoids,
  the final state is byte-identical however many times the job was
  interrupted (tested in tests/test_checkpoint.py).

Swapping parquet for Iceberg at deploy time = replacing ``_read_done``
/ append with catalog operations on a metrics table; the lineage model
is unchanged (SURVEY.md §7).
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from ..agg import STATE_COL, SketchSpec, sketch_from_bytes
from ..sketches.kll import KLL
from ..sketches.tdigest import TDigest


@dataclass
class CheckpointedSketchJob:
    spark: SparkSession
    spec: SketchSpec
    col: str
    keys: list[str] = field(default_factory=list)
    n_buckets: int = 64
    checkpoint_dir: str = "/tmp/sketch_checkpoints"
    snapshot_id: str = "snap-0"
    bucket_cols: list[str] | None = None  # stable row identity; None = all cols

    # ------------------------------------------------------------ paths

    @property
    def partials_path(self) -> str:
        return os.path.join(self.checkpoint_dir, self.snapshot_id, "partials")

    # ------------------------------------------------------------ lineage

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        cols = self.bucket_cols or df.columns
        return df.withColumn(
            "__bucket", F.pmod(F.xxhash64(*cols), F.lit(self.n_buckets)).cast("int")
        )

    def _done_buckets(self) -> set[int]:
        """Finished bucket ids from the checkpoint table.  Only a
        missing checkpoint path means "nothing done"; any OTHER read
        failure must propagate — treating a transient error as an empty
        set would recompute and append every bucket as a duplicate,
        double-counting sum-monoid state on final_merge."""
        from pyspark.errors import AnalysisException

        try:
            partials = self.spark.read.parquet(self.partials_path)
        except AnalysisException as e:
            get_cls = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
            cls = get_cls() if callable(get_cls) else None
            if (cls and "PATH_NOT_FOUND" in cls) or "Path does not exist" in str(e):
                return set()
            raise
        rows = partials.select("bucket").distinct().collect()
        return {r["bucket"] for r in rows}

    # ------------------------------------------------------------ phase A

    def build_partials(self, df: DataFrame, max_buckets: int | None = None) -> int:
        """Compute + persist partials for buckets not yet checkpointed.
        ``max_buckets`` caps work for this invocation (used by tests to
        simulate a killed job).  Returns #buckets written."""
        done = self._done_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        if max_buckets is not None:
            todo = todo[:max_buckets]
        if not todo:
            return 0
        spec, keys, col = self.spec, self.keys, self.col
        bucketed = self._with_bucket(df).where(F.col("__bucket").isin(todo))
        prepared = _prepare(bucketed, keys, col, spec)

        key_fields = [prepared.schema[k] for k in keys]
        out_schema = T.StructType(
            [T.StructField("bucket", T.IntegerType())]
            + key_fields
            + [
                T.StructField(STATE_COL, T.BinaryType()),
                T.StructField("rows_seen", T.LongType()),
                T.StructField("state_sha256", T.StringType()),
                T.StructField("wall_ms", T.LongType()),
            ]
        )

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bucket = int(pdf["__bucket"].iloc[0])
            rows = []
            groups = pdf.groupby(keys, dropna=False, sort=True) if keys else [((), pdf)]
            for key, sub in groups:
                t0 = time.time()  # per-KEY wall, not cumulative since bucket start
                sk = _update_from_pdf(spec, sub["__in"])
                blob = sk.to_bytes()
                rows.append(
                    [bucket]
                    + list(key if isinstance(key, tuple) else (key,))
                    + [blob, len(sub), hashlib.sha256(blob).hexdigest(),
                       int((time.time() - t0) * 1000)]
                )
            return pd.DataFrame(rows, columns=["bucket"] + keys + [STATE_COL, "rows_seen", "state_sha256", "wall_ms"])

        partials = prepared.groupBy("__bucket").applyInPandas(build, schema=out_schema)
        partials.write.mode("append").parquet(self.partials_path)
        # buckets with ZERO matching rows produce no applyInPandas group
        # and hence no partial row — without a marker they would never be
        # "done" and every resume would re-scan the full input for them
        # forever.  Append an empty-sketch marker row (rows_seen=0, keys
        # null) for each; the keyed final_merge filters markers out, the
        # global path folds them as the monoid identity.
        covered = self._done_buckets()
        missing = [b for b in todo if b not in covered]
        if missing:
            blob = spec.new().to_bytes()
            digest = hashlib.sha256(blob).hexdigest()
            marker_rows = [
                tuple([b] + [None] * len(keys) + [blob, 0, digest, 0])
                for b in missing
            ]
            # key fields may be non-nullable in the source schema; the
            # markers deliberately carry null keys, so relax nullability
            marker_schema = T.StructType([
                T.StructField(f.name, f.dataType, True) for f in out_schema.fields
            ])
            (self.spark.createDataFrame(marker_rows, schema=marker_schema)
             .write.mode("append").parquet(self.partials_path))
        return len(todo)

    # ------------------------------------------------------------ phase B

    def final_merge(self) -> DataFrame:
        """Fold all checkpointed partials in deterministic bucket order
        → one row per key group: (keys..., sketch, rows_seen)."""
        partials = self.spark.read.parquet(self.partials_path)
        spec, keys = self.spec, self.keys
        key_fields = [partials.schema[k] for k in keys]
        out_schema = T.StructType(
            key_fields
            + [T.StructField(STATE_COL, T.BinaryType()), T.StructField("rows_seen", T.LongType())]
        )

        def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("bucket")  # deterministic fold order
            sk = None
            for b in pdf[STATE_COL]:
                s = sketch_from_bytes(bytes(b))
                sk = s if sk is None else sk.merge(s)
            if sk is None:  # empty partials table (nothing built yet)
                sk = spec.new()
            if isinstance(sk, (TDigest, KLL)):
                # same canonicalization as agg.merge_partials: KLL's
                # level-0 array is in fold order, so skipping compress()
                # here would make the final bytes (and state_sha256)
                # depend on shuffle arrival — breaking the byte-identical
                # resume contract for quantile sketches
                sk.compress()
            head = pdf[keys].iloc[:1].reset_index(drop=True) if keys else pd.DataFrame(index=[0])
            head[STATE_COL] = [sk.to_bytes()]
            head["rows_seen"] = [int(pdf["rows_seen"].sum())]
            return head

        if keys:
            # drop the empty-bucket marker rows (null keys, rows_seen=0):
            # they exist only to mark lineage coverage, not key groups
            real = partials.where(F.col("rows_seen") > 0)
            return real.groupBy(*keys).applyInPandas(merge_fn, schema=out_schema)
        def merge_stream(it):
            batches = list(it)
            pdf = (pd.concat(batches) if batches
                   else pd.DataFrame(columns=["bucket", STATE_COL, "rows_seen"]))
            yield merge_fn(pdf)

        return partials.repartition(1).mapInPandas(merge_stream, schema=out_schema)

    def run(self, df: DataFrame) -> DataFrame:
        """Build any missing partials, then merge. Safe to re-invoke
        after a kill at any point."""
        self.build_partials(df)
        return self.final_merge()

    def metrics(self) -> DataFrame:
        """Per-bucket lineage/metrics rows (the ops surface)."""
        return self.spark.read.parquet(self.partials_path).select(
            "bucket", *self.keys, "rows_seen", "state_sha256", "wall_ms"
        )


def _prepare(df: DataFrame, keys: list[str], col: str, spec: SketchSpec) -> DataFrame:
    from ..agg import _prepare_input

    prepared, python_hash = _prepare_input(df, keys + ["__bucket"], col, spec)
    assert not python_hash
    return prepared


def _update_from_pdf(spec: SketchSpec, series: pd.Series):
    import numpy as np

    sk = spec.new()
    arr = series.to_numpy()
    if spec.input_mode in ("hash", "ivalue"):
        spec.update(sk, arr.astype(np.int64, copy=False))
    elif spec.input_mode == "value":
        spec.update(sk, arr.astype(np.float64, copy=False))
    else:
        vc = pd.Series(arr).value_counts()
        spec.update(sk, vc.index.to_numpy(), vc.to_numpy())
    return sk
