"""Temporal joins over event streams.

``asof_join`` — the backward as-of join (each left row picks the
LATEST right row with ``right.ts <= left.ts`` for the same key, the
semantics of pandas ``merge_asof`` / DuckDB ``ASOF JOIN``): the
standard primitive for "state at the time of the event" questions —
last error before each click, last config push before each request,
last quote before each trade.

Spark has no ASOF JOIN operator, and the naive encodings are scale
bugs: a range-condition join (``l.key = r.key AND r.ts <= l.ts``)
explodes to every (left, earlier-right) pair before aggregating the
max, and a windowed subquery per left row is quadratic in hot keys.

This implementation is the UNION-AND-CARRY encoding — the one shape
whose cost matches a plain equi-join:

1. union the two sides, right rows carrying their payload in ONE
   struct column (null on left rows), tagged so equal-timestamp right
   rows sort BEFORE the left rows they should match (inclusive bound);
2. one window per key, ordered by (ts, side), running
   ``last(payload, ignorenulls=True)`` — each row sees the latest
   right payload at-or-before it;
3. keep the left rows, unpack the struct.

Cost: ONE hash shuffle of |L| + |R| rows on the key plus the per-key
sort the window needs — identical shuffle volume to an inner join on
the same key, no pair explosion, and a hot key costs its own
partition's sort only (the same skew profile as any keyed window; salt
upstream if one key is a material fraction of the stream).  The whole
plan is JVM expressions — no Python in the path.

The payload travels as a struct so ``ignorenulls`` skips exactly
non-right rows: a right row whose payload FIELDS are null is still a
match (``last(col, ignorenulls)`` per column would wrongly reach past
it to an older row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              ts_col: str, right_cols: list[str],
              tolerance_us: int | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Backward as-of join: every ``left`` row, plus ``right_cols`` from
    the latest ``right`` row with ``right.ts <= left.ts`` on the same
    ``key_cols`` (inclusive — DuckDB ``ASOF JOIN ON l.ts >= r.ts`` /
    pandas ``merge_asof`` semantics); null-filled when no right row
    precedes.  ``tolerance_us``: matches older than this many
    microseconds are nulled out (pandas ``tolerance``).

    Output columns: all of ``left``, then ``{prefix}{c}`` for each
    requested right column and ``{prefix}ts`` (the matched right row's
    timestamp) — so lag math is one ``unix_micros`` subtraction.

    Ties: left rows at the same ts as a right row DO see it (inclusive
    bound).  Two RIGHT rows on the same (key, ts) have no defined
    winner — the sort is stable only per partition — so dedup the right
    side on (key, ts) upstream when that can occur.  Rows with a null
    ``ts`` on either side are dropped (no defined position on the time
    axis), and null-KEY right rows never match anything (equi-join
    semantics: DuckDB ``ASOF JOIN ON l.k = r.k`` and pandas
    ``merge_asof(by=...)`` both treat NULL != NULL; a window
    partitionBy would silently group them together instead) — null-key
    left rows are kept, unmatched.
    """
    if not right_cols:
        raise ValueError("right_cols must name at least one column to carry")
    missing = [c for c in right_cols if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right side: {missing}")
    key_ok = None
    for c in key_cols:
        cond = F.col(c).isNotNull()
        key_ok = cond if key_ok is None else (key_ok & cond)
    right = right.where(key_ok)
    payload = F.struct(
        F.col(ts_col).alias("__rts"),
        *[F.col(c).alias(c) for c in right_cols]).alias("__payload")
    others = [c for c in left.columns if c not in key_cols]
    # side 0 sorts before side 1 at equal ts -> inclusive bound
    r = (right.where(F.col(ts_col).isNotNull())
         .select(*key_cols, F.col(ts_col).alias("__ts"),
                 F.lit(0).alias("__side"), payload,
                 *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                   for c in others]))
    l = (left.where(F.col(ts_col).isNotNull())
         .select(*key_cols, F.col(ts_col).alias("__ts"),
                 F.lit(1).alias("__side"),
                 F.lit(None).cast(r.schema["__payload"].dataType
                                  ).alias("__payload"),
                 *others))
    w = (Window.partitionBy(*key_cols).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r.unionByName(l)
               .withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
               .where(F.col("__side") == 1))
    if tolerance_us is not None:
        # cast: fixture timestamps are TIMESTAMP_NTZ and unix_micros
        # only takes TIMESTAMP (session tz is pinned UTC, so the cast
        # preserves the instant)
        in_tol = (F.unix_micros(F.col("__ts").cast("timestamp"))
                  - F.unix_micros(F.col("__m.__rts").cast("timestamp"))
                  ) <= F.lit(tolerance_us)
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m")))
    out_cols = [*left.columns,
                F.col("__m.__rts").alias(f"{prefix}ts"),
                *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols]]
    return matched.select(*out_cols)


def range_join(points: DataFrame, intervals: DataFrame, key_cols: list[str],
               ts_col: str, start_col: str, end_col: str,
               bucket_us: int) -> DataFrame:
    """Interval join — every (point, interval) pair on the same key with
    ``start <= point.ts <= end`` (inclusive both ends) — encoded as a
    BUCKETED equi-join, the shape that survives scale.

    Spark's optimizer turns a raw inequality join into
    BroadcastNestedLoopJoin (per-key quadratic; a hot key with 10^5
    points and 10^4 intervals compares 10^9 pairs).  Bucketing makes it
    an equi-join: each point lands in the single time bucket
    ``floor(us(ts)/bucket_us)``; each interval explodes to every bucket
    it overlaps; join on (key, bucket), then apply the exact range
    predicate.  Because a point belongs to EXACTLY ONE bucket, each
    qualifying pair is produced exactly once — no dedup shuffle.

    Cost: |points| + Σ per-interval bucket spans shuffled once on
    (key, bucket).  ``bucket_us`` is a scale-tiered parameter and part
    of the cost contract: pick it near the TYPICAL interval length —
    too small and intervals explode to many rows; too large and each
    bucket mixes many intervals, pushing work into the post-join
    filter.  Either way the result is identical; only the cost moves.
    ``range_join_bucket_span`` is the deterministic work counter for
    the choice (mean/max explode factor) — run it when sizing
    bucket_us for a new corpus; keep the mean span O(1), a few buckets.

    Output: the key columns, all other ``points`` columns, then all
    other ``intervals`` columns (callers project/rename upstream if
    names collide — a collision raises here).  Null ``ts``/bounds rows
    drop (no position on the time axis); intervals with
    ``end < start`` are empty by definition and drop too.
    """
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    p_others = [c for c in points.columns if c not in key_cols]
    i_others = [c for c in intervals.columns if c not in key_cols]
    clash = sorted(set(p_others) & set(i_others))
    if clash:
        raise ValueError(
            f"column names on both sides: {clash} — rename one side")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    b = (points.where(F.col(ts_col).isNotNull())
         .withColumn("__bucket", F.floor(us(ts_col) / bucket_us)))
    iv = (intervals
          .where(F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
                 & (F.col(end_col) >= F.col(start_col)))
          .withColumn("__bucket", F.explode(F.sequence(
              F.floor(us(start_col) / bucket_us),
              F.floor(us(end_col) / bucket_us)))))
    out = (b.join(iv, [*key_cols, "__bucket"])
           .where(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
           .drop("__bucket"))
    return out.select(*key_cols, *p_others, *i_others)


def range_join_bucket_span(intervals: DataFrame, start_col: str,
                           end_col: str, bucket_us: int) -> dict:
    """Deterministic WORK COUNTER for ``range_join``'s bucket_us choice:
    the explode factor each interval pays — ``{'mean': ..., 'max': ...,
    'total_rows': ...}`` over buckets spanned per interval.  Mean near 1
    and a bounded max mean the bucketed join shuffles ~|intervals| rows;
    a mean of hundreds says bucket_us is far below the typical interval
    length and should be raised (the RESULT is identical either way —
    this measures cost, not correctness).  A driver-side single-row
    aggregate, same pattern as the dedup-family work counters."""
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    spans = (intervals
             .where(F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
                    & (F.col(end_col) >= F.col(start_col)))
             .select((F.floor(us(end_col) / bucket_us)
                      - F.floor(us(start_col) / bucket_us) + 1).alias("span")))
    row = spans.agg(F.avg("span").alias("mean"), F.max("span").alias("max"),
                    F.sum("span").alias("total_rows")).collect()[0]
    return {"mean": float(row["mean"] or 0), "max": int(row["max"] or 0),
            "total_rows": int(row["total_rows"] or 0)}
