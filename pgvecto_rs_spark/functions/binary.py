"""Binary-vector (``bvector``) kernels as native Spark Column expressions.

Layout: ``struct<dims:int, data:array<bigint>>`` — bit-packed
little-endian words, padding bits zero, mirroring the reference's
``BVectOwned {dims, data: Vec<u64>}`` (crates/base/src/vector/bvect.rs:11-45).

One deliberate deviation: we pack **32 bits per word** (stored in a
64-bit slot) instead of 64.  Spark 4 runs under ANSI SQL mode where
building a u64 word with bit 63 set overflows the signed long; 32-bit
words keep every intermediate exact and overflow-free while preserving
identical semantics (popcounts, bitwise ops, distances).

Parity targets:
- ``<->`` Hamming = popcount(x XOR y)        bvect.rs:165-167
- ``<#>`` = −popcount(x AND y)               bvect.rs:150-152
- ``<~>`` Jaccard = 1 − |AND|/|OR|           bvect.rs:169-173
- ``& | ^`` bitwise ops                      bvect.rs:192-208
  (NB the reference's ``operator_and`` at bvect.rs:194 is buggy — it
  computes ``self & self``; we implement the correct AND.)
- ``vector_norm`` = √popcount                bvect.rs:145-147
- ``binarize(vector)`` bit = (x > 0)         src/datatype/functions_bvector.rs:16-27
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "bvector_lt",
    "bvector_le",
    "bvector_gt",
    "bvector_ge",
    "BITS_PER_WORD",
    "binarize",
    "bvector",
    "bvector_and",
    "bvector_dims",
    "bvector_hamming_distance",
    "bvector_jaccard_distance",
    "bvector_neg_dot",
    "bvector_norm",
    "bvector_or",
    "bvector_popcount",
    "bvector_to_dense",
    "bvector_xor",
]

BITS_PER_WORD = 32

def _masks() -> Column:
    """Literal array of single-bit masks [1, 2, 4, ..., 2^31] for exact
    bit tests without runtime shifts (Spark's shiftleft needs a literal
    shift amount).  Built lazily — Column literals need a live session.
    """
    return F.array(*[F.lit(1 << k).cast("long") for k in range(BITS_PER_WORD)])


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bvector(dims: Column | int, data: Column) -> Column:
    d = F.lit(dims) if isinstance(dims, int) else dims
    return F.struct(d.cast("int").alias("dims"), data.cast("array<bigint>").alias("data"))


def _checked(a: Column, b: Column, result: Column) -> Column:
    return F.when(a["dims"] == b["dims"], result).otherwise(
        F.raise_error(
            F.format_string(
                "differently-dimensioned vectors: %d and %d", a["dims"], b["dims"]
            )
        )
    )


# ---------------------------------------------------------------------------
# construction / conversion
# ---------------------------------------------------------------------------

def binarize(vec: Column | str) -> Column:
    """``binarize(vector) -> bvector``: bit i = (v[i] > 0)
    (functions_bvector.rs:16-27)."""
    vec = _col(vec)
    d = F.size(vec)
    n_words = F.ceil(d / F.lit(BITS_PER_WORD)).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: F.aggregate(
            F.sequence(F.lit(0), F.lit(BITS_PER_WORD - 1)),
            F.lit(0).cast("long"),
            lambda acc, k: acc
            + F.when(
                (j * BITS_PER_WORD + k < d)
                & (F.element_at(vec, (j * BITS_PER_WORD + k + 1).cast("int")) > 0.0),
                F.element_at(_masks(), k + 1),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )
    return F.when(d > 0, bvector(d, words))


def bvector_to_dense(v: Column | str) -> Column:
    """bvector -> vector of 0.0/1.0 (src/datatype/casts.rs bvector->vecf32)."""
    v = _col(v)
    return F.transform(
        F.sequence(F.lit(0), v["dims"] - 1),
        lambda i: F.when(
            F.element_at(v["data"], (i / BITS_PER_WORD + 1).cast("int"))
            .bitwiseAND(F.element_at(_masks(), (i % BITS_PER_WORD + 1).cast("int")))
            != 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(0.0))
        .cast("float"),
    )


def from_bits(bits: Column | str) -> Column:
    """``array<int/boolean>`` of 0/1 -> bvector (text-format '[0,1,1]'
    ingestion path, src/datatype/text_bvector.rs:10-39)."""
    bits = _col(bits).cast("array<int>")
    ok = F.forall(bits, lambda b: (b == 0) | (b == 1))
    as_float = F.transform(bits, lambda b: b.cast("float"))
    return F.when(ok, binarize(as_float)).otherwise(
        F.raise_error(F.lit("bvector literal may contain only 0/1"))
    )


def bvector_slice(v: Column | str, start: Column | int | None, end: Column | int | None) -> Column:
    """``v[start:end]`` for bvector (bvect.rs:210-241 rebuilds the bit
    words): same bound rules as the dense slice.  Implemented via the
    dense 0/1 view + re-pack — correctness-first; the packed-shift
    version is an optimization for wide vectors."""
    from pgvecto_rs_spark.functions.dense import vector_slice

    sliced_bits = vector_slice(bvector_to_dense(_col(v)), start, end)
    return F.when(sliced_bits.isNotNull(), binarize(sliced_bits))


# ---------------------------------------------------------------------------
# popcount-based kernels
# ---------------------------------------------------------------------------

def bvector_popcount(v: Column | str) -> Column:
    v = _col(v)
    return F.aggregate(
        v["data"], F.lit(0).cast("long"), lambda acc, w: acc + F.bit_count(w)
    )


def _pop2(a: Column, b: Column, op) -> Column:
    """Σ bit_count(a.word OP b.word)."""
    return F.aggregate(
        F.zip_with(a["data"], b["data"], lambda x, y: F.bit_count(op(x, y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: acc + c,
    )


def bvector_hamming_distance(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <-> b`` = popcount(a XOR b) (bvect.rs:165-167)."""
    a, b = _col(a), _col(b)
    d = _pop2(a, b, lambda x, y: x.bitwiseXOR(y)).cast("double")
    return _checked(a, b, d) if check else d


def bvector_neg_dot(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <#> b`` = −popcount(a AND b) (bvect.rs:150-152)."""
    a, b = _col(a), _col(b)
    d = (-_pop2(a, b, lambda x, y: x.bitwiseAND(y))).cast("double")
    return _checked(a, b, d) if check else d


def bvector_jaccard_distance(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <~> b`` = 1 − popcount(AND)/popcount(OR) (bvect.rs:169-173)."""
    a, b = _col(a), _col(b)
    inter = _pop2(a, b, lambda x, y: x.bitwiseAND(y)).cast("double")
    union = _pop2(a, b, lambda x, y: x.bitwiseOR(y)).cast("double")
    d = F.lit(1.0) - inter / union
    return _checked(a, b, d) if check else d


# ---------------------------------------------------------------------------
# bitwise operators (correct AND — the reference's is buggy, bvect.rs:194)
# ---------------------------------------------------------------------------

def _bitop(a: Column, b: Column, op, check: bool) -> Column:
    r = bvector(a["dims"], F.zip_with(a["data"], b["data"], op))
    return _checked(a, b, r) if check else r


def bvector_and(a: Column | str, b: Column | str, check: bool = True) -> Column:
    return _bitop(_col(a), _col(b), lambda x, y: x.bitwiseAND(y), check)


def bvector_or(a: Column | str, b: Column | str, check: bool = True) -> Column:
    return _bitop(_col(a), _col(b), lambda x, y: x.bitwiseOR(y), check)


def bvector_xor(a: Column | str, b: Column | str, check: bool = True) -> Column:
    return _bitop(_col(a), _col(b), lambda x, y: x.bitwiseXOR(y), check)


# ---------------------------------------------------------------------------
# scalar functions
# ---------------------------------------------------------------------------

def bvector_dims(v: Column | str) -> Column:
    return _col(v)["dims"]


def bvector_norm(v: Column | str) -> Column:
    """``vector_norm(bvector)`` = √popcount (bvect.rs:145-147)."""
    return F.sqrt(bvector_popcount(_col(v)).cast("double"))


def _bvec_cmp(a: Column, b: Column) -> Column:
    """-1/0/1 comparison matching bvect.rs:260-276: the reference
    reverse_bits each word then compares unsigned, which makes bit 0
    (dimension 0) the most significant — i.e. lexicographic over the
    bits in dimension order, set bit > clear bit.  Here: on the first
    differing word, the lowest set bit of x XOR y is the first differing
    dimension; whichever side has that bit set is greater.  (``xor &
    -xor`` isolates the lowest set bit; words are 32-bit values in
    64-bit slots so the negation never overflows under ANSI mode.)"""
    # r13: one aggregate() pass with a sticky accumulator instead of
    # filter + a 6x-referenced try_element_at — HOF-bearing expressions
    # evaluate interpreted without subexpression reuse, so every extra
    # reference re-ran the zip/filter over the (possibly binarize(...))
    # operands per row.
    def _decide(acc: Column, p: Column) -> Column:
        xor = p["x"].bitwiseXOR(p["y"])
        return (
            F.when(acc != 0, acc)
            .when(xor == 0, F.lit(0))
            .when(p["x"].bitwiseAND(xor.bitwiseAND(-xor)) != 0, F.lit(1))
            .otherwise(F.lit(-1))
        )

    cmp = F.aggregate(
        F.zip_with(
            a["data"], b["data"],
            lambda x, y: F.struct(x.alias("x"), y.alias("y")),
        ),
        F.lit(0),
        _decide,
    )
    return _checked(a, b, cmp)


def bvector_lt(a: Column | str, b: Column | str) -> Column:
    """``a < b`` (finalize.sql bvector operator family; semantics
    bvect.rs:260-276 reverse_bits word compare)."""
    return _bvec_cmp(_col(a), _col(b)) < 0


def bvector_le(a: Column | str, b: Column | str) -> Column:
    return _bvec_cmp(_col(a), _col(b)) <= 0


def bvector_gt(a: Column | str, b: Column | str) -> Column:
    return _bvec_cmp(_col(a), _col(b)) > 0


def bvector_ge(a: Column | str, b: Column | str) -> Column:
    return _bvec_cmp(_col(a), _col(b)) >= 0
