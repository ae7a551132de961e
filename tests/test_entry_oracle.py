"""Pre-validate the driver's correctness gate: every queries() entry vs its
oracle_sql() in DuckDB at sf0.01 — row count, column names, and
order-insensitive values must match."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    try:
        float_v = float(v)  # Decimal from duckdb round()
        if not isinstance(v, (str, bytes)) and not hasattr(v, "isoformat"):
            return f"{float_v:.6g}"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(sql)
    duck_cols = [c[0] for c in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mism}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_keys_aligned():
    # every oracle has a query; queries without an oracle (non-SQL-expressible
    # ops like xxhash64 simhash) get the driver's rows-only check
    assert set(entry_mod.oracle_sql().keys()) <= set(entry_mod.queries().keys())
    # every gate has an oracle — an accidental deregistration must fail loudly
    # instead of silently downgrading to the driver's rows-only check
    rows_only = set(entry_mod.queries().keys()) - set(entry_mod.oracle_sql().keys())
    assert rows_only == set()


def test_rows_only_queries_run(spark):
    for name in set(entry_mod.queries()) - set(entry_mod.oracle_sql()):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert df.count() >= 0
