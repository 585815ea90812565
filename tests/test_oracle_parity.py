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
    """Canonicalize a cell for a *string-level* comparison, mimicking the
    driver's value-hash: ints and floats stay distinct (`131558` !=
    `131558.0` — the DuckDB HUGEINT->pandas-float64 drift that caused the
    r4 `doc_train_split` hash mismatch must FAIL here, not be hidden by
    Python's `int == float`)."""
    import datetime
    import decimal

    import numpy as np

    if val is None:
        return "NULL"
    if isinstance(val, (np.ndarray, list, tuple)):
        return tuple(_canon(x) for x in val)
    if type(val).__module__ == "numpy":
        val = val.item()
    if isinstance(val, decimal.Decimal):
        val = float(val)
    if isinstance(val, bool):
        return repr(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(round(val, 9))
    if isinstance(val, int):
        return repr(val)
    if isinstance(val, (datetime.datetime, datetime.date)):
        return val.isoformat()
    return repr(val)


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
    # Fetch through pandas like the driver does: DuckDB HUGEINT (from
    # SUM over BIGINT) materializes as float64 here, so an uncast oracle
    # aggregate produces `131558.0` vs Spark's `131558` and fails below.
    ddf = con.execute(Q.oracle_sql()[name]).df()
    duck_cols = list(ddf.columns)
    duck_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]

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
