"""Benchmark harness: headline sketch queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

By default the run also includes the N vs 4N executor-scaling pair
(isolated processes; see BENCH.md and tools/bench_scaling_multiproc.py,
skip with --no-scaling), the dedup scale-trend section (1x vs 10x
documents, tools/bench_scale_trend.py, skip with --no-trend), and the
planted hot-key skew section (tools/bench_skew.py, skip with
--no-skew).

TIMING POLICY (pinned since round 3 — compare rounds like-for-like):
  * every per-query number is the MIN of SPARK_BENCH_REPEATS (default 3)
    steady-state runs; the first-touch scan, Python-worker spin-up, JIT
    and Arrow-runner warm-up are paid ONCE up front by explicit warm-up
    statements and are excluded from every timing;
  * the scaling pair uses the same min-of-3 policy with barrier-
    synchronized, taskset-pinned single-core workers, and runs FIRST,
    before any other JVM exists in the process tree;
  * rounds 1-2 were single-shot timings — numbers from those rounds are
    NOT directly comparable to round >= 3 (this VM varies 1.5-4x run to
    run; see BENCH.md "sandbox performance envelope").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRANSCRIPT_PARQUET = "/tmp/bench_transcripts_v1.parquet"
BENCH_CONVS = 14_000  # ~600k turns, matching sf0.1 lineitem scale


def _sf() -> float:
    try:
        return float(SF_DIR.rstrip("/").split("sf")[-1])
    except ValueError:
        return -1.0


def materialize_transcripts(spark, n_convs=BENCH_CONVS, path=TRANSCRIPT_PARQUET):
    """Generate + persist the synthetic transcript table once (stands in
    for reading the Iceberg transcript table; generation excluded from
    timings)."""
    from stream_lib_spark.transcripts import generate_transcripts

    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_transcripts(spark, n_convs=n_convs, partitions=64).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def bench_queries(spark) -> tuple[dict, dict]:
    from stream_lib_spark.agg import SketchSpec, collect_sketch, sketch_agg
    from stream_lib_spark.functions import approx_quantiles, approx_topk, bloom_build, bloom_probe
    from stream_lib_spark.textops import minhash_lsh_pairs, winnowing_fingerprints
    from stream_lib_spark.transcripts import turn_latencies

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tr = materialize_transcripts(spark)
    n_turns = tr.count()  # warm the scan
    # warm the Python workers / Arrow runners / whole-stage codegen once
    # per pipeline SHAPE (a long-lived cluster app amortizes this across
    # queries; each timed query shouldn't re-pay JIT + worker spin-up)
    collect_sketch(sketch_agg(ev.limit(1000), [], "user_id", SketchSpec("hll", p=8)))
    minhash_lsh_pairs(docs.limit(50), threshold=0.5).count()
    winnowing_fingerprints(docs.limit(50)).count()
    approx_quantiles(turn_latencies(tr.limit(2000)), "latency_s", [0.5], kind="tdigest").collect()
    bloom_probe(bloom_build(ev.limit(500), "user_id", n_elements=512, fpp=0.01),
                spark.range(100), "id").count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    repeats = int(os.environ.get("SPARK_BENCH_REPEATS", "3"))

    def run(name, fn):
        # min-of-N steady state (this VM is 1.5-4x noisy run-to-run; the
        # scaling pair uses the same policy).  Every lambda rebuilds its
        # DataFrame, so each run has fresh lineage — no stage reuse.
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    run("hll_orders_global", lambda: collect_sketch(
        sketch_agg(li, [], "l_orderkey", SketchSpec("hll", p=14))).cardinality())
    run("hll_users_by_type", lambda: sketch_agg(
        ev, ["event_type"], "user_id", SketchSpec("hll", p=12)).collect())
    run("cms_partkey_freq", lambda: collect_sketch(
        sketch_agg(li, [], "l_partkey", SketchSpec("cms", eps=1e-4, confidence=0.99))))
    run("tdigest_price", lambda: collect_sketch(
        sketch_agg(li, [], "l_extendedprice", SketchSpec("tdigest", compression=100.0))).quantile(0.99))
    run("kll_price", lambda: collect_sketch(
        sketch_agg(li, [], "l_extendedprice", SketchSpec("kll", k=200))).quantile(0.5))
    cents = li.select((F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    run("qdigest_price", lambda: collect_sketch(
        sketch_agg(cents, [], "cents", SketchSpec("qdigest", compression_factor=2048))).quantile(0.5))
    run("topk_partkey", lambda: approx_topk(li, "l_partkey", k=20, capacity=2048).collect())

    def _bloom():
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        bf = bloom_build(orders, "o_custkey", n_elements=200_000, fpp=0.01)
        absent = spark.range(10_000_000, 10_100_000)
        bloom_probe(bf, absent, "id").agg(F.avg(F.col("might_contain").cast("double"))).collect()

    run("bloom_build_probe", _bloom)
    run("minhash_dedup_docs", lambda: minhash_lsh_pairs(docs, threshold=0.5).count())
    run("winnowing_fingerprints", lambda: winnowing_fingerprints(docs).count())

    # transcript sketch pass — the north-star workload; throughput metric
    def _transcript_pass():
        collect_sketch(sketch_agg(tr, [], "conv_id", SketchSpec("hll", p=14))).cardinality()

    run("transcript_hll_convs", _transcript_pass)
    extras["turns_per_sec"] = round(n_turns / timings["transcript_hll_convs"], 1)
    extras["n_turns"] = n_turns

    run("transcript_tool_hll", lambda: sketch_agg(
        tr.where(F.col("tool").isNotNull()), ["tool"], "conv_id", SketchSpec("hll", p=12)).count())
    run("transcript_latency_tdigest", lambda: approx_quantiles(
        turn_latencies(tr), "latency_s", [0.5, 0.9, 0.99], kind="tdigest").collect())
    run("q1_pricing", lambda: li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.count("*")).collect())

    # round-6 ops, timed as EXTRAS (excluded from the headline total so
    # rounds stay like-for-like comparable on the same 14 queries)
    from stream_lib_spark.textops import pii_screen, sequence_pack

    def _extra(name, fn):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        extras[name] = round(best, 3)

    _extra("pii_screen_sec", lambda: pii_screen(docs, with_redaction_delta=True)
           .agg(F.sum("n_email"), F.sum("redaction_char_delta")).collect())
    _extra("sequence_pack_sec", lambda: sequence_pack(docs, budget=2048)
           .agg(F.max("pack_id"), F.sum("n_tokens")).collect())
    return timings, extras


SF1_DIR = "/tmp/bench_sf1"
#: round 7 (judge r6 #1): the sf1 smoke runs the FULL registry — every
#: queries() entry executes at 10x and compares against its exact
#: DuckDB oracle, except the two entries below whose full oracle is
#: brute-force quadratic at 10x (all-pairs cosine / all-pairs Hamming —
#: hours of DuckDB).  Those two get a PARTIAL oracle instead of a
#: rows-only pass: the Spark output is registered as a DuckDB view
#: (``spark_out``) and checked linearly — every output pair re-verified
#: from raw data (precision exact), plus a recall term (all planted
#: pairs for embeddings; a deterministic doc sample brute-forced
#: in-sample for simhash).  Every row of the partial-oracle result must
#: be TRUE.
def _sf1_partial_oracles() -> dict:
    import __spark_entry__ as entrymod

    ham = entrymod._SIMHASH_HAM_SQL
    return {
        "embedding_near_dups": (
            "precision: every output pair re-scored from raw vectors must be >= 0.7; "
            "recall: all 50 planted (id, id+1e6) pairs present",
            "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), "
            "planted AS (SELECT vec_id + 1000000 AS vec_id, "
            "  list_prepend(e[1] + 0.2, e[2:64]) AS e FROM base WHERE vec_id < 50), "
            "allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted) "
            "SELECT "
            "(SELECT COUNT(*) = 0 FROM spark_out o "
            "   JOIN allv a ON o.id_a = a.vec_id JOIN allv b ON o.id_b = b.vec_id "
            "   WHERE list_cosine_similarity(a.e, b.e) < 0.7) AS precision_ok, "
            "(SELECT COUNT(*) = 0 FROM "
            "   (SELECT vec_id AS id_a, vec_id + 1000000 AS id_b FROM base WHERE vec_id < 50) p "
            "   LEFT JOIN spark_out o USING (id_a, id_b) WHERE o.id_a IS NULL) AS planted_recall_ok",
        ),
        "simhash_near_dups": (
            "precision: every output pair's Hamming recomputed from raw text must be <= 3 "
            "and equal the reported value; recall: all in-sample pairs of a deterministic "
            "~1% doc sample (doc_id % 97 = 0) brute-forced and required present",
            f"WITH {entrymod._simhash_hash_cte_sql()}, "
            "samp AS (SELECT * FROM s WHERE doc_id % 97 = 0) "
            "SELECT "
            "(SELECT COUNT(*) = 0 FROM spark_out o "
            "   JOIN s a ON o.id_a = a.doc_id JOIN s b ON o.id_b = b.doc_id "
            f"  WHERE ({ham}) > 3 OR ({ham}) <> o.hamming) AS precision_ok, "
            "(SELECT COUNT(*) = 0 FROM samp a JOIN samp b ON a.doc_id < b.doc_id "
            "   LEFT JOIN spark_out o ON o.id_a = a.doc_id AND o.id_b = b.doc_id "
            f"  WHERE ({ham}) <= 3 AND o.id_a IS NULL) AS sample_recall_ok",
        ),
    }


def materialize_sf1(spark, path: str = SF1_DIR) -> str:
    """Deterministic 10x blow-up of the sf0.1 tables (≈ sf1): ten
    key-shifted copies per fact table (foreign keys shifted together so
    joins stay consistent), token-suffixed documents (keeps near-dup
    structure linear — same construction as the scale-trend 10x), and
    coordinate-shifted embeddings.  Dimensions copy through unchanged.
    Generation is excluded from any timing and cached under /tmp."""
    marker = os.path.join(path, "_SF1_DONE")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    # shift by 1e9: far above any testdata key AND above the absent-probe
    # ranges gates use (e.g. bloom_custkey probes 10.0-10.02M as absent;
    # a 10M shift made those keys genuinely present at 10x — caught by
    # the first sf1 run)
    shift_cols = {
        "customer": ["c_custkey"], "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "region": [], "nation": [],
    }
    for table, keys in shift_cols.items():
        df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        if not keys:  # dimension: copy once, unchanged
            df.write.mode("overwrite").parquet(f"{path}/{table}.parquet")
            continue
        copies = None
        for k in range(10):
            c = df.select(*[
                (F.col(col) + k * 1_000_000_000).alias(col) if col in keys else F.col(col)
                for col in df.columns
            ])
            copies = c if copies is None else copies.unionByName(c)
        copies.repartition(32).write.mode("overwrite").parquet(f"{path}/{table}.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = None
    for k in range(10):
        c = docs.select(
            (F.col("doc_id") + k * 1_000_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1x{k}").alias("text"),
            "lang", "source",
        ).withColumn("n_chars", F.length("text").cast("long"))
        copies = c if copies is None else copies.unionByName(c)
    copies.repartition(32).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    copies = None
    for k in range(10):
        c = emb.select(
            (F.col("vec_id") + k * 1_000_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: (x + F.when(i == k % 64, 0.05 * (k + 1)).otherwise(0.0)).cast("float"),
            ).alias("embedding"),
            "label",
        )
        copies = c if copies is None else copies.unionByName(c)
    copies.repartition(32).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    with open(marker, "w") as f:
        f.write(SF_DIR)
    return path


def run_sf1_smoke(only: list[str] | None = None) -> dict:
    """--sf1-smoke (round 7, judge r6 #1 — extended from 13 gates to
    the FULL registry): one 10x-scale correctness pass — every
    queries() entry runs its Spark query AND its exact DuckDB oracle on
    the blown-up tables and must match value-for-value (same
    canonicalization as tools/check_gate, stricter than the driver's
    hash).  Catches plans that silently degrade with input size (e.g.
    AQE flipping a broadcast join to shuffle).  ``_sf1_partial_oracles``
    covers the only two entries whose full oracle is quadratic at 10x
    with a linear precision + recall check instead.  Fixture-based
    gates (multimodal, wire interop, streaming fixtures...) run
    identically at any sf — they're included so the artifact is one
    complete 47-gate pass, and cost little.  One-off disclosed run
    recorded in BENCH.md; not part of the default bench."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_gate import TABLES, compare

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only is not None:
        unknown = sorted(set(only) - set(qs))
        if unknown:
            # a typo'd --only must not yield a green zero-gate artifact
            # (fail BEFORE the expensive sf1 materialization)
            raise SystemExit(
                f"--only names not in the registry: {unknown} "
                f"(known: {sorted(qs)})")
    spark = _session(CPUS)
    materialize_sf1(spark)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF1_DIR}/{t}.parquet"
        if os.path.exists(p):
            # Spark writes each table as a parquet DIRECTORY; DuckDB
            # wants a glob over its part files
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    partial = _sf1_partial_oracles()
    names = [n for n in qs if only is None or n in only]
    gates, ok_all = {}, True
    for name in names:
        t0 = time.time()
        spark_pdf = None
        try:
            spark_pdf = qs[name](spark, SF1_DIR).toPandas()
            if name in partial:
                desc, sql = partial[name]
                con.register("spark_out", spark_pdf)
                checks = con.sql(sql).df()
                ok = bool(checks.all(axis=None))
                note = f"partial oracle ({desc}): " + ", ".join(
                    f"{c}={bool(checks[c].iloc[0])}" for c in checks.columns)
                con.unregister("spark_out")
            else:
                oracle_pdf = con.sql(oracles[name]).df()
                ok, note = compare(spark_pdf, oracle_pdf, name), None
        except Exception as e:  # noqa: BLE001 - recorded, run continues
            print(f"  [{name}] ERROR {e}")
            ok, note = False, f"error: {e}"
        ok_all &= ok
        rec = {"ok": bool(ok), "sec": round(time.time() - t0, 2),
               "rows": int(len(spark_pdf)) if spark_pdf is not None else None}
        if note:
            rec["note"] = note
        gates[name] = rec
        print(f"  [{name}] {'ok' if ok else 'FAIL'} {rec['sec']}s "
              f"rows={rec['rows']}", flush=True)
    spark.stop()
    return {"metric": "sf1_smoke", "sf": _sf() * 10, "all_ok": bool(ok_all),
            "n_gates": len(names),
            "partial_oracles": {k: v[0] for k, v in partial.items()},
            "gates": gates}


def run_scaling() -> dict:
    """N vs 4N executor scaling via isolated processes (primary evidence,
    see BENCH.md): N=1 vs 4N=4 single-core Spark processes over disjoint
    shards of the same input — within the sandbox's memory-bandwidth
    envelope, unlike wider local[K] configs."""
    from tools.bench_scaling_multiproc import INPUT, orchestrate

    if not os.path.exists(os.path.join(INPUT, "_SUCCESS")):
        # materialize the ~10M-turn scaling input in a SUBPROCESS
        # (excluded from timings): hosting the 16g py4j JVM in THIS
        # process right before the measurement would contradict the
        # scaling-runs-first policy — a stopped SparkContext's JVM stays
        # resident and skews the pinned workers
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        r = subprocess.run(
            [sys.executable, os.path.join(here, "tools", "bench_scaling.py"),
             "--materialize"], capture_output=True, text=True, timeout=1800)
        if r.returncode != 0:
            raise RuntimeError(f"scaling input materialization failed: {r.stderr[-500:]}")
    return orchestrate(levels=(1, 4))


def _session(cpus: int):
    from stream_lib_spark.jobs.session import get_spark

    return get_spark(f"bench-{cpus}", cpus=cpus, shuffle_partitions=max(cpus * 2, 16))


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    if "--sf1-smoke" in sys.argv:
        only = None
        for a in sys.argv:  # --only=gate1,gate2 reruns a subset while iterating
            if a.startswith("--only="):
                only = a[len("--only="):].split(",")
        print(json.dumps(run_sf1_smoke(only=only)))
        return
    # scaling pair runs by DEFAULT so the per-round bench artifact carries
    # the north-rule evidence (>=0.8 efficiency N→4N); skip with
    # --no-scaling when iterating locally.  It runs FIRST, before any
    # bench JVM exists in this process: a stopped SparkContext still
    # leaves the 16g py4j JVM (GC/compiler thread pools) alive, and its
    # background noise measurably skews the 4-worker level.
    scaling = "--no-scaling" not in sys.argv
    scaling_out = run_scaling() if scaling else None
    spark = _session(CPUS)
    timings, extras = bench_queries(spark)
    spark.stop()
    # Evidence sections run as SUBPROCESSES: a stopped SparkContext's
    # JVM stays resident in-process (GC/compiler pools keep burning
    # cycles — the round-3 scaling lesson), so in-process sections would
    # accumulate dead JVMs and skew each other 2-4x.  Each subprocess
    # exits completely before the next starts.  Best-effort: a failure
    # degrades the artifact (error string recorded), never kills the
    # headline.
    def _section(script: str) -> dict:
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        # the subprocess call sits INSIDE the try: a hung section
        # (TimeoutExpired) or spawn failure (OSError) degrades to an
        # error record like any other section failure — it never kills
        # the headline artifact
        try:
            r = subprocess.run([sys.executable, os.path.join(here, script)],
                               capture_output=True, text=True, timeout=1800)
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            return json.loads(lines[-1])
        except subprocess.TimeoutExpired:  # pragma: no cover
            return {"error": f"section {script} timed out after 1800s"}
        except Exception:  # pragma: no cover
            rc = getattr(locals().get("r"), "returncode", "spawn-failed")
            err = getattr(locals().get("r"), "stderr", "") or ""
            return {"error": f"rc={rc}: {err[-250:]}"}

    # dedup/ANN scale trend: 1x vs deterministic 10x; near-linear ratio
    # = no hidden quadratic term in the banded/bucketed joins
    trend_out = None if "--no-trend" in sys.argv else _section("tools/bench_scale_trend.py")
    # planted hot-key evidence (one conv_id owns 30% of rows): per-
    # reducer task times for row-shuffle vs salted vs two-level, plus
    # byte-identity of the merged state — see tools/bench_skew.py
    skew_out = None if "--no-skew" in sys.argv else _section("tools/bench_skew.py")
    # estimator error across cardinality decades 10^2..10^7 (reference
    # TestAndGraphResults analog, round 7) — pure numpy, no JVM
    sweep_out = None if "--no-sweep" in sys.argv else _section("tools/bench_error_sweep.py")
    out = {
        "metric": "sketch_bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf(),
        **extras,
    }
    if scaling_out is not None:
        out["scaling"] = scaling_out
    if trend_out is not None:
        out["scale_trend"] = trend_out
    if skew_out is not None:
        out["skew"] = skew_out
    if sweep_out is not None:
        out["error_sweep"] = sweep_out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
