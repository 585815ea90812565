"""COPY-analogue loader: CSV/TSV files with vector columns in the
reference's text literal formats.

Reference users bulk-load with Postgres ``COPY table FROM file`` where
vector columns arrive as text literals (``'[1, 2, 3]'``,
``'{0:1, 2:3}/4'``, ``'[0, 1, 1]'`` — src/datatype/text_vecf32.rs,
text_svecf32.rs, text_bvector.rs; exercised by the slt ``COPY`` /
insert-literal statements).  This module is that load path on Spark:
``spark.read.csv`` (distributed, splittable, schema-projected) plus the
already-oracle-checked text parsers from ``functions.text_format``
applied as Column expressions — parsing happens executor-side inside
the scan projection, no UDF, no driver round-trip, so a 100 TB COPY is
just a parquet-grade distributed read.

Every non-vector column keeps whatever type the caller's schema says;
vector columns are declared via ``vector_cols={"col": "vector" |
"svector" | "bvector"}``.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession

from pgvecto_rs_spark.functions import text_format as TF

__all__ = ["read_vectors_csv", "write_vectors_csv"]

_PARSERS = {
    "vector": TF.parse_vector,
    "svector": TF.parse_svector,
    "bvector": TF.parse_bvector,
}

_FORMATTERS = {
    "vector": TF.format_vector,
    "svector": TF.format_svector,
    "bvector": TF.format_bvector,
}


def read_vectors_csv(
    spark: SparkSession,
    path: str,
    vector_cols: Mapping[str, str],
    header: bool = True,
    sep: str = ",",
    quote: str = '"',
    schema: str | None = None,
    **reader_options,
) -> DataFrame:
    """Read a CSV/TSV export whose vector columns hold reference text
    literals, returning them parsed to the engine's native columns
    (``array<float>`` / sparse struct / binary words).

    ``schema`` (optional DDL string) types the NON-vector columns; the
    vector columns should be declared STRING there (they are parsed
    after the scan).  Without it, Spark infers non-vector columns and
    the vector columns land as strings anyway (a vector literal never
    looks numeric to the inferencer).

    Malformed vector literals error at parse time, matching the
    reference's COPY behavior (src/utils/parse.rs rejects, the load
    aborts) rather than silently nulling.
    """
    unknown = {k: v for k, v in vector_cols.items() if v not in _PARSERS}
    if unknown:
        raise ValueError(
            f"unknown vector column kinds: {unknown!r} "
            f"(expected one of {sorted(_PARSERS)})"
        )
    reader = spark.read.option("header", header).option("sep", sep).option(
        "quote", quote
    )
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    if schema is not None:
        df = reader.csv(path, schema=schema)
    else:
        df = reader.option("inferSchema", True).csv(path)
    missing = [c for c in vector_cols if c not in df.columns]
    if missing:
        raise ValueError(f"vector columns not present in the file: {missing}")
    for name, kind in vector_cols.items():
        df = df.withColumn(name, _PARSERS[kind](df[name].cast("string")))
    return df


def write_vectors_csv(
    df: DataFrame,
    path: str,
    vector_cols: Mapping[str, str],
    header: bool = True,
    sep: str = ",",
    mode: str = "error",
    **writer_options,
) -> None:
    """``COPY table TO file`` analogue: format the native vector
    columns back to the reference's text literals (shortest-repr f32,
    matching the slt goldens) and write a distributed CSV.  Round-trips
    with :func:`read_vectors_csv` — the formatters are the same
    Column expressions the ``text_roundtrip`` oracle query checks, so
    the export stays executor-side and codegen'd."""
    unknown = {k: v for k, v in vector_cols.items() if v not in _FORMATTERS}
    if unknown:
        raise ValueError(
            f"unknown vector column kinds: {unknown!r} "
            f"(expected one of {sorted(_FORMATTERS)})"
        )
    missing = [c for c in vector_cols if c not in df.columns]
    if missing:
        raise ValueError(f"vector columns not present in the DataFrame: {missing}")
    for name, kind in vector_cols.items():
        df = df.withColumn(name, _FORMATTERS[kind](df[name]))
    writer = df.write.option("header", header).option("sep", sep).mode(mode)
    for k, v in writer_options.items():
        writer = writer.option(k, v)
    writer.csv(path)
