"""Text parse/format for the three vector literal formats.

Reference formats (SURVEY.md §1.3):
- dense:  ``'[1, 2, 3]'``        src/datatype/text_vecf32.rs:10-42,
                                  parser src/utils/parse.rs:20
- sparse: ``'{0:1, 1:2, 2:3}/3'`` src/datatype/text_svecf32.rs:11-96
  (unsorted input sorted, duplicate indexes error, zeros dropped)
- binary: ``'[0, 1, 1]'``         src/datatype/text_bvector.rs:10-39
  (only 0/1 allowed)

Formatting note: the reference prints f32 values with Rust's shortest
round-trip representation; Java's ``Float.toString`` uses the same
shortest-repr contract, and integral values print without a trailing
``.0`` (matching the slt goldens like ``[1, 2, 3]``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions.binary import from_bits
from pgvecto_rs_spark.functions.sparse import to_svector

__all__ = [
    "format_svector",
    "format_vector",
    "parse_bvector",
    "parse_svector",
    "parse_vector",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _fmt_f32(x: Column) -> Column:
    """Float -> string without trailing .0 for integral values.

    try_cast, not cast: under ANSI mode (Spark 4 default) casting NaN,
    ±Inf, or |x| >= 2^63 to long throws CAST_OVERFLOW; the reference
    happily prints such values (cast.slt prints [NaN]), so they must
    fall through to the float-string branch (try_cast -> NULL -> the
    WHEN condition is not true)."""
    as_long = x.cast("double").try_cast("long")
    return F.when(
        (x.cast("double") == as_long.cast("double")) & (F.abs(x) < 1e15),
        as_long.cast("string"),
    ).otherwise(x.cast("float").cast("string"))


def parse_vector(text: Column | str) -> Column:
    """``'[1, 2, 3]' -> array<float>``; malformed input errors (the
    reference parser rejects it, src/utils/parse.rs:20)."""
    t = F.trim(_col(text))
    ok_shape = t.rlike(r"^\[.*\]$")
    body = F.trim(F.regexp_replace(t, r"^\[|\]$", ""))
    parts = F.when(F.length(body) == 0, F.array().cast("array<string>")).otherwise(
        F.split(body, ",")
    )
    vals = F.transform(parts, lambda p: F.trim(p).cast("float"))
    ok = ok_shape & ~F.exists(vals, lambda v: v.isNull()) & (F.size(vals) > 0)
    return F.when(ok, vals).otherwise(
        F.raise_error(F.concat(F.lit("malformed vector literal: "), t))
    )


def format_vector(vec: Column | str) -> Column:
    """``array<float> -> '[1, 2, 3]'`` (text_vecf32.rs:10-42 output)."""
    return F.concat(
        F.lit("["), F.array_join(F.transform(_col(vec), _fmt_f32), ", "), F.lit("]")
    )


def parse_svector(text: Column | str) -> Column:
    """``'{0:1, 1:2, 2:3}/3' -> svector struct`` with the constructor's
    validation (sorts, errors on duplicates/out-of-range, drops zeros —
    text_svecf32.rs:11-77)."""
    t = F.trim(_col(text))
    ok_shape = t.rlike(r"^\{.*\}\s*/\s*\d+$")
    dims = F.regexp_extract(t, r"/\s*(\d+)$", 1).cast("int")
    body = F.regexp_extract(t, r"^\{(.*)\}", 1)
    entries = F.when(
        F.length(F.trim(body)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(body, ","))
    idx = F.transform(entries, lambda e: F.trim(F.split_part(e, F.lit(":"), F.lit(1))).cast("int"))
    val = F.transform(entries, lambda e: F.trim(F.split_part(e, F.lit(":"), F.lit(2))).cast("float"))
    ok = ok_shape & dims.isNotNull()
    return F.when(ok, to_svector(dims, idx, val)).otherwise(
        F.raise_error(F.concat(F.lit("malformed svector literal: "), t))
    )


def format_svector(sv: Column | str) -> Column:
    """svector -> ``'{0:1, 1:2}/3'`` (text_svecf32.rs:79-96)."""
    sv = _col(sv)
    pairs = F.zip_with(
        sv["indexes"],
        sv["values"],
        lambda i, v: F.concat(i.cast("string"), F.lit(":"), _fmt_f32(v)),
    )
    return F.concat(
        F.lit("{"), F.array_join(pairs, ", "), F.lit("}/"), sv["dims"].cast("string")
    )


def parse_bvector(text: Column | str) -> Column:
    """``'[0, 1, 1]' -> bvector``; only 0/1 allowed (text_bvector.rs:10-39)."""
    t = F.trim(_col(text))
    ok_shape = t.rlike(r"^\[.*\]$")
    body = F.trim(F.regexp_replace(t, r"^\[|\]$", ""))
    bits = F.transform(F.split(body, ","), lambda p: F.trim(p).cast("int"))
    ok = ok_shape & (F.size(bits) > 0) & ~F.exists(bits, lambda b: b.isNull())
    return F.when(ok, from_bits(bits)).otherwise(
        F.raise_error(F.concat(F.lit("malformed bvector literal: "), t))
    )


def format_bvector(bv: Column | str) -> Column:
    """bvector -> ``'[0, 1, 1]'``."""
    from pgvecto_rs_spark.functions.binary import bvector_to_dense

    return F.concat(
        F.lit("["),
        F.array_join(
            F.transform(bvector_to_dense(_col(bv)), lambda x: x.cast("int").cast("string")),
            ", ",
        ),
        F.lit("]"),
    )
