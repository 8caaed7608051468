"""Static contract checks on __spark_entry__: every query has an
oracle (the round-2 bar: zero rows-only entries), names are stable,
and the oracle SQL parses in DuckDB against empty views."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

TABLES = {
    "region": "r_regionkey BIGINT, r_name VARCHAR",
    "nation": "n_nationkey BIGINT, n_name VARCHAR",
    "customer": "c_custkey BIGINT, c_name VARCHAR",
    "supplier": "s_suppkey BIGINT, s_name VARCHAR",
    "part": "p_partkey BIGINT, p_name VARCHAR",
    "orders": "o_orderkey BIGINT, o_custkey BIGINT",
    "lineitem": ("l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE, "
                 "l_extendedprice DOUBLE, l_discount DOUBLE, l_returnflag VARCHAR, "
                 "l_linestatus VARCHAR, l_shipdate TIMESTAMP"),
    "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR",
    "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding FLOAT[], label INTEGER",
}


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles), (
        f"rows-only queries: {set(qs) - set(oracles)}; "
        f"orphan oracles: {set(oracles) - set(qs)}"
    )
    assert len(qs) >= 37


def test_oracle_sql_parses_in_duckdb():
    con = duckdb.connect()
    for t, schema in TABLES.items():
        con.sql(f"CREATE TABLE {t} ({schema})")
    for name, sql in entry.oracle_sql().items():
        try:
            con.sql(sql).fetchall()  # empty tables — just parse + execute
        except Exception as e:  # pragma: no cover
            pytest.fail(f"oracle for {name!r} failed on empty tables: {e}")


def test_sf1_smoke_rejects_unknown_only_names():
    """A typo'd --only=<gate> must fail fast, not run zero gates and
    emit a green all_ok=true artifact (and it must fail BEFORE paying
    for the sf1 materialization)."""
    import pytest

    import bench

    with pytest.raises(SystemExit, match="not in the registry"):
        bench.run_sf1_smoke(only=["ann_topkk"])
