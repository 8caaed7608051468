"""Planted hot-key skew bench (SURVEY §7 / north rule: skew handled
explicitly).

Synthesizes a transcript-shaped input where ONE conv_id owns ~30% of
all rows, then runs the same keyed HLL aggregation three ways:

  row_shuffle          rows are shuffled BY KEY before any aggregation
                       (the plan a plain ``groupBy(key).applyInPandas``
                       executes) — the reducer that owns the hot key
                       receives ~30% of all rows and straggles;
  row_shuffle_salted   same topology through ``salted_split``: rows
                       shuffle by (key, salt) so the hot key spreads
                       over ``salts`` reducers, partials then merge by
                       key (blobs only);
  two_level            the library default ``sketch_agg``: partition-
                       local partials absorb value skew entirely — every
                       input partition emits at most ONE blob per key,
                       so no reducer ever sees the hot key's rows.

Per-reducer evidence comes from Spark's own task metrics (REST API of a
UI-enabled session): for each path we report the build/merge stage's
max and median task durations and their ratio.  The pass criterion is
that salting/two-level collapse the straggler ratio AND all three paths
produce byte-identical per-key sketch state (merge associativity).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_ROWS = int(os.environ.get("SPARK_SKEW_ROWS", "20000000"))
HOT_SHARE = 0.3
N_COLD_KEYS = 1000
REDUCERS = 32
SALTS = 32
UI_PORT = 4050


def skew_input(spark, n_rows: int = N_ROWS):
    """Deterministic skewed shard: rows with id%10<3 all belong to
    ``conv-hot`` (30%), the rest spread evenly over N_COLD_KEYS keys."""
    return spark.range(n_rows, numPartitions=64).select(
        F.when(F.pmod("id", 10) < int(HOT_SHARE * 10), F.lit("conv-hot"))
        .otherwise(F.concat(F.lit("conv-"),
                            F.pmod((F.col("id") / 10).cast("long"), F.lit(N_COLD_KEYS))))
        .alias("conv_id"),
        F.concat(F.lit("tok-"), F.pmod(F.col("id") * 2654435761, F.lit(1000000)))
        .alias("text"),
    )


# ------------------------------------------------------------- REST metrics

def _api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _app_id(port: int) -> str:
    return _api(port, "applications")[0]["id"]


def _stage_ids(port: int, app: str) -> set[tuple[int, int]] | None:
    """None (NOT empty set) on a REST failure: a failed BEFORE snapshot
    must disable attribution for that path — treating it as empty would
    attribute every historical stage (typically an earlier path's
    straggler-laden one) to the current path and record wrong evidence."""
    try:
        return {(s["stageId"], s["attemptId"])
                for s in _api(port, f"applications/{app}/stages")}
    except Exception:
        return None


def _heaviest_stage_tasks(port: int, app: str, new_stages: set[tuple[int, int]]) -> list[float]:
    """Task durations (sec) of the new stage with the largest total
    executor run time — the aggregation stage for every path here.
    Metric reads are best-effort: a REST hiccup degrades the artifact to
    walls-only instead of killing the whole bench."""
    try:
        best, best_run = None, -1
        for s in _api(port, f"applications/{app}/stages?status=COMPLETE"):
            key = (s["stageId"], s["attemptId"])
            if key in new_stages and s.get("executorRunTime", 0) > best_run:
                best, best_run = key, s["executorRunTime"]
        if best is None:
            return []
        tasks = _api(port, f"applications/{app}/stages/{best[0]}/{best[1]}/taskList?length=5000")
        return sorted(t["duration"] / 1000.0 for t in tasks if "duration" in t)
    except Exception:
        return []


# ------------------------------------------------------------------- paths

def _states(df) -> dict:
    return {r["conv_id"]: bytes(r["sketch"]) for r in df.collect()}


def _spec():
    from stream_lib_spark.agg import SketchSpec

    return SketchSpec("hll", p=12)


def path_row_shuffle(spark, df):
    from stream_lib_spark.agg import sketch_partials

    # every row of a key lands on one reducer (classic groupBy plan);
    # with one partition per key-hash, the partial build IS the final state
    return _states(sketch_partials(df.repartition(REDUCERS, "conv_id"),
                                   ["conv_id"], "text", _spec()))


def path_row_shuffle_salted(spark, df):
    from stream_lib_spark.agg import merge_partials, salted_split, sketch_partials

    salted = salted_split(df, "conv_id", SALTS)
    partials = sketch_partials(salted.repartition(REDUCERS, "conv_id", "__salt"),
                               ["conv_id"], "text", _spec())
    return _states(merge_partials(partials, ["conv_id"], _spec()))


def path_two_level(spark, df):
    from stream_lib_spark.agg import sketch_agg

    return _states(sketch_agg(df, ["conv_id"], "text", _spec()))


def orchestrate(spark=None) -> dict:
    own_session = spark is None
    if own_session:
        from stream_lib_spark.jobs.session import get_spark

        spark = get_spark("bench-skew", extra_conf={
            "spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)})
    # read the port from the BOUND UI, not the conf: if the requested
    # port is occupied, Spark binds port+1 via spark.port.maxRetries and
    # the conf value would point the REST reads at a DIFFERENT app
    ui_url = spark.sparkContext.uiWebUrl
    port = (int(ui_url.rsplit(":", 1)[1]) if ui_url
            else int(spark.sparkContext.getConf().get("spark.ui.port", str(UI_PORT))))
    try:
        app = _app_id(port)
    except Exception:
        app = None  # UI unreachable: record walls + byte-identity only
    df = skew_input(spark)
    df.count()  # warm the scan + codegen before any timed path

    out = {"n_rows": N_ROWS, "hot_key_share": HOT_SHARE, "reducers": REDUCERS,
           "salts": SALTS, "paths": {}}
    results = {}
    for name, fn in [("row_shuffle", path_row_shuffle),
                     ("row_shuffle_salted", path_row_shuffle_salted),
                     ("two_level", path_two_level)]:
        before = _stage_ids(port, app) if app else None
        t0 = time.time()
        results[name] = fn(spark, df)
        wall = time.time() - t0
        after = _stage_ids(port, app) if app else None
        tasks = (_heaviest_stage_tasks(port, app, after - before)
                 if app and before is not None and after is not None else [])
        med = tasks[len(tasks) // 2] if tasks else 0.0
        out["paths"][name] = {
            "wall_sec": round(wall, 3),
            "agg_stage_tasks": len(tasks),
            "max_task_sec": round(tasks[-1], 3) if tasks else 0.0,
            "median_task_sec": round(med, 3),
            "straggler_ratio": round(tasks[-1] / med, 2) if tasks and med > 0 else None,
        }

    base = results["row_shuffle"]
    out["state_byte_identical"] = all(results[n] == base for n in results)
    out["n_keys"] = len(base)
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    # ONE line: bench.py subprocess-parses the last stdout line
    print(json.dumps(orchestrate()))
