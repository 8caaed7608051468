"""Local stand-in for the driver's correctness gate: run a
__spark_entry__ query and its DuckDB oracle side by side at a given sf
and compare rows / schema / values (columns sorted by name, rows sorted
by all columns, exact value equality — stricter than the driver's
hash, so green here implies green there).

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> bool:
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    ok = True
    if list(a.columns) != list(b.columns):
        print(f"  [{name}] SCHEMA mismatch: spark={list(a.columns)} oracle={list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"  [{name}] ROWS mismatch: spark={len(a)} oracle={len(b)}")
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        else:
            bad = np.array([str(x) != str(y) for x, y in zip(av, bv)])
        if bad.any():
            i = int(np.nonzero(bad)[0][0])
            print(f"  [{name}] VALUE mismatch in {c!r} at row {i}: "
                  f"spark={av[i]!r} oracle={bv[i]!r} ({int(bad.sum())} rows differ)")
            ok = False
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    names = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    import __spark_entry__ as entrymod
    from stream_lib_spark.jobs.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or [n for n in qs if n in oracles]

    spark = get_spark("check-gate", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_ok = 0
    unknown = [n for n in names if n not in qs]
    for n in unknown:
        print(f"{n}: ERROR unknown query (not in queries())")
    names = [n for n in names if n in qs]
    for name in names:
        # the WHOLE per-query path is best-effort: a failure in the
        # query, the oracle, or the compare itself (e.g. mixed-type
        # object columns in sort_values) degrades to an ERROR line and
        # the run continues to the remaining queries
        try:
            if name not in oracles:
                rows = qs[name](spark, sf_dir).count()
                print(f"{name}: rows-only ({rows} rows)")
                continue
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            oracle_pdf = con.sql(oracles[name]).df()
            if compare(spark_pdf, oracle_pdf, name):
                print(f"{name}: OK ({len(spark_pdf)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    n_total = len([n for n in names if n in oracles])
    print(f"-- {n_ok}/{n_total} oracle-checked queries green")
    spark.stop()
    sys.exit(0 if n_ok == n_total and not unknown else 1)


if __name__ == "__main__":
    main()
