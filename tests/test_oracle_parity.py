"""Mimics the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle SQL, compare row count, column names, and
order-insensitive values.  Runs at sf0.001 locally (driver uses sf0.01).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pgvecto_rs_spark import queries as Q

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(val):
    """Canonicalize a cell for comparison (Decimal -> float, float -> repr)."""
    import decimal

    if isinstance(val, decimal.Decimal):
        return float(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 9)
    return val


def _rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(Q.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    fn = Q.queries()[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    cur = con.execute(Q.oracle_sql()[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    assert _rows(spark_rows, spark_cols) == _rows(duck_rows, duck_cols), (
        f"{name}: values differ"
    )


def test_queries_all_run(spark, sf_dir):
    """Every registered query (incl. oracle-less ones) executes and has a
    stable schema."""
    for name, fn in Q.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    df = Q.entry(spark)
    assert len(df.collect()) > 0
