"""End-to-end ``spark-submit --py-files`` launch (the north rule's
deploy mechanism, exercised for real): package the library into a zip,
submit the CLI job as a separate process with the package shipped via
--py-files, and check the sketch output parquet it writes."""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    from stream_lib_spark.jobs.session import package_zip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "sketch_out"
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="2g")
    r = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--py-files", package_zip(),
         os.path.join(repo, "stream_lib_spark", "jobs", "launch_sketches.py"),
         "--input", f"{SF}/events.parquet",
         "--ops", "hll:user_id:p=14", "tdigest:value:compression=100",
         "--output", str(out), "--cpus", "4"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["rows"] > 0

    # verify the job's output through the shared test session (do NOT
    # create-and-stop another one: getOrCreate() returns the fixture's
    # session, and stopping it would kill every later test)
    from stream_lib_spark.agg import sketch_from_bytes

    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = ev.select("user_id").distinct().count()
    amounts = np.sort(np.array([r2["value"] for r2 in ev.select("value").collect()], dtype=np.float64))
    row = spark.read.parquet(str(out)).collect()[0]
    hll = sketch_from_bytes(bytes(row["hll_user_id"]))
    rse = 1.04 / (1 << 14) ** 0.5
    assert abs(hll.cardinality() - exact) <= 4 * rse * max(exact, 1)
    td = sketch_from_bytes(bytes(row["tdigest_value"]))
    med = td.quantile(0.5)
    rank = np.searchsorted(amounts, med, side="right") / len(amounts)
    assert abs(rank - 0.5) <= 0.02 + 2.0 / len(amounts)
