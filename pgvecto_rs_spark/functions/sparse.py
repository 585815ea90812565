"""Sparse-vector (``svector``) kernels as native Spark Column expressions.

Layout: ``struct<dims:int, indexes:array<int>, values:array<float>>`` with
the reference invariants (crates/base/src/vector/svect.rs:21-41):
indexes strictly increasing, all in [0, dims), no stored zero values.

Parity targets:
- distances:  svect.rs:179-196 (``operator_dot`` :179-182 sorted-merge
  dot, ``operator_l2`` :185-188 squared L2 over the union,
  ``operator_cos`` :190-196)
- arithmetic: svect.rs:228-339 (add/sub = sorted merge dropping exact
  zeros, mul = intersection dropping zeros)
- norm/normalize: svect.rs:171-177, 208-226 (normalize drops zeros that
  appear after scaling)
- constructor ``to_svector``: src/datatype/functions_svecf32.rs:21-59
  (sorts, errors on duplicate/out-of-range index, drops zeros, rejects
  NULL elements)

Implementation notes.  Pairwise kernels use a map-lookup formulation
(``map_from_arrays`` + per-index lookup) rather than an imperative
sorted merge: for the nnz sizes svector targets (text/BM25-ish feature
spaces, nnz ~ 10²-10³) this stays inside whole-stage codegen and avoids
Python.  The *scale* path for sparse search is the inverted index
(pgvecto_rs_spark.indexes.sparse_inverted), which never evaluates
pairwise kernels row-by-row.

Σ(x−y)² is computed as Σx² + Σy² − 2Σxy (algebraically identical to the
reference's union merge; do NOT expect bit-identical f32 rounding — we
accumulate in f64 which is strictly more precise).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "svector_lt",
    "svector_le",
    "svector_gt",
    "svector_ge",
    "svector",
    "to_svector",
    "svector_add",
    "svector_cosine_distance",
    "svector_dims",
    "svector_dot",
    "svector_l2sq_distance",
    "svector_mul",
    "svector_neg_dot",
    "svector_norm",
    "svector_normalize",
    "svector_sub",
    "svector_to_dense",
    "dense_to_svector",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _vals_dbl(v: Column) -> Column:
    return v["values"].cast("array<double>")


def _lookup(v: Column, idx: Column) -> Column:
    """Value of sparse vector ``v`` at index ``idx`` (0.0 if absent).

    r13: array_position + a single-element cast instead of
    ``map_from_arrays(indexes, cast(values))`` — callers use this inside
    higher-order lambdas, which evaluate interpreted and re-evaluate
    captured subtrees PER ELEMENT, so the map (and the whole-array
    double cast) was being rebuilt for every looked-up index.  Same
    result: svector indexes are sorted-unique by construction."""
    p = F.array_position(v["indexes"], idx)
    return F.when(
        p > 0, F.element_at(v["values"], p.cast("int")).cast("double")
    ).otherwise(F.lit(0.0))


def _checked(a: Column, b: Column, result: Column) -> Column:
    """Dim mismatch errors (src/datatype/operators_svecf32.rs uses
    ``check_matched_dims`` like the dense operators)."""
    return F.when(a["dims"] == b["dims"], result).otherwise(
        F.raise_error(
            F.format_string(
                "differently-dimensioned vectors: %d and %d", a["dims"], b["dims"]
            )
        )
    )


def svector(dims: Column | int, indexes: Column, values: Column) -> Column:
    """Assemble the struct without validation (internal)."""
    d = F.lit(dims) if isinstance(dims, int) else dims
    return F.struct(
        d.cast("int").alias("dims"),
        indexes.cast("array<int>").alias("indexes"),
        values.cast("array<float>").alias("values"),
    )


# ---------------------------------------------------------------------------
# constructor & conversions
# ---------------------------------------------------------------------------

def to_svector(dims: Column | int, indexes: Column | str, values: Column | str) -> Column:
    """``to_svector(dims, indexes, values)`` (functions_svecf32.rs:21-59).

    Sorts by index, errors on duplicate or out-of-range indexes or
    mismatched lengths, rejects NULL elements, drops zero values.
    """
    d = (F.lit(dims) if isinstance(dims, int) else dims).cast("int")
    idx, val = _col(indexes).cast("array<int>"), _col(values).cast("array<float>")

    pairs = F.array_sort(
        F.zip_with(idx, val, lambda i, v: F.struct(i.alias("i"), v.alias("v")))
    )
    sorted_idx = F.transform(pairs, lambda p: p["i"])
    sorted_val = F.transform(pairs, lambda p: p["v"])

    ok = (
        (F.size(idx) == F.size(val))
        & ~F.exists(idx, lambda i: i.isNull() | (i < 0) | (i >= d))
        & ~F.exists(val, lambda v: v.isNull())
        & (F.size(F.array_distinct(idx)) == F.size(idx))
    )
    nonzero = F.filter(
        F.zip_with(sorted_idx, sorted_val, lambda i, v: F.struct(i.alias("i"), v.alias("v"))),
        lambda p: p["v"] != 0.0,
    )
    built = svector(
        d,
        F.transform(nonzero, lambda p: p["i"]),
        F.transform(nonzero, lambda p: p["v"]),
    )
    return F.when(ok, built).otherwise(
        F.raise_error(F.lit("to_svector: invalid indexes/values"))
    )


def svector_to_dense(v: Column | str) -> Column:
    """Cast svector -> vector (src/datatype/casts.rs sparse->dense)."""
    v = _col(v)
    m = F.map_from_arrays(v["indexes"], v["values"])
    return F.transform(
        F.sequence(F.lit(0), v["dims"] - 1),
        lambda i: F.coalesce(F.element_at(m, i), F.lit(0.0)).cast("float"),
    )


def dense_to_svector(vec: Column | str) -> Column:
    """Cast vector -> svector, dropping exact zeros (casts.rs dense->sparse)."""
    vec = _col(vec)
    pairs = F.filter(
        F.zip_with(
            F.sequence(F.lit(0), F.size(vec) - 1),
            vec,
            lambda i, x: F.struct(i.alias("i"), x.alias("v")),
        ),
        lambda p: p["v"] != 0.0,
    )
    return svector(
        F.size(vec),
        F.transform(pairs, lambda p: p["i"]),
        F.transform(pairs, lambda p: p["v"]),
    )


# ---------------------------------------------------------------------------
# distances (svect.rs:179-196)
# ---------------------------------------------------------------------------

def svector_dot(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """Σ x·y over the index intersection (svect.rs:179-182)."""
    a, b = _col(a), _col(b)
    d = F.aggregate(
        F.zip_with(a["indexes"], _vals_dbl(a), lambda i, v: F.struct(i.alias("i"), v.alias("v"))),
        F.lit(0.0),
        lambda acc, p: acc + p["v"] * _lookup(b, p["i"]),
    )
    return _checked(a, b, d) if check else d


def svector_neg_dot(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <#> b`` = −Σ x·y."""
    return -svector_dot(a, b, check=check)


def _norm_sq(v: Column) -> Column:
    return F.aggregate(_vals_dbl(v), F.lit(0.0), lambda acc, x: acc + x * x)


def svector_l2sq_distance(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <-> b`` squared L2 over the union (svect.rs:185-188),
    computed as Σx² + Σy² − 2Σxy."""
    a, b = _col(a), _col(b)
    d = _norm_sq(a) + _norm_sq(b) - 2.0 * svector_dot(a, b, check=False)
    return _checked(a, b, d) if check else d


def svector_cosine_distance(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <=> b`` = 1 − Σxy/√(Σx²Σy²) (svect.rs:190-196)."""
    a, b = _col(a), _col(b)
    d = F.lit(1.0) - svector_dot(a, b, check=False) / F.sqrt(_norm_sq(a) * _norm_sq(b))
    return _checked(a, b, d) if check else d


# ---------------------------------------------------------------------------
# scalar functions
# ---------------------------------------------------------------------------

def svector_dims(v: Column | str) -> Column:
    """``vector_dims(svector)`` returns the declared dims, not nnz
    (functions_svecf32.rs:5-9)."""
    return _col(v)["dims"]


def svector_norm(v: Column | str) -> Column:
    """``vector_norm(svector)`` = √Σx² over stored values (svect.rs:171-177)."""
    return F.sqrt(_norm_sq(_col(v)))


def svector_normalize(v: Column | str) -> Column:
    """``vector_normalize(svector)``: scale by 1/‖v‖, then drop values
    that became exactly zero in f32 (svect.rs:208-226)."""
    v = _col(v)
    n = svector_norm(v)
    scaled = F.zip_with(
        v["indexes"],
        v["values"],
        lambda i, x: F.struct(i.alias("i"), (x / n).cast("float").alias("v")),
    )
    kept = F.filter(scaled, lambda p: p["v"] != 0.0)
    return svector(
        v["dims"],
        F.transform(kept, lambda p: p["i"]),
        F.transform(kept, lambda p: p["v"]),
    )


def svector_slice(v: Column | str, start: Column | int | None, end: Column | int | None) -> Column:
    """``v[start:end]`` for svector (svect.rs:353-379): result dims =
    end−start, entries with start ≤ i < end reindexed to i−start; NULL
    when start ≥ end, end > dims, negative or NULL bounds.  An empty
    entry set is a valid (all-zero) svector."""
    v = _col(v)
    lo = F.lit(0) if start is None else (F.lit(start) if isinstance(start, int) else start)
    hi = v["dims"] if end is None else (F.lit(end) if isinstance(end, int) else end)
    valid = (
        lo.isNotNull() & hi.isNotNull() & (lo >= 0) & (hi >= 0)
        & (lo < hi) & (hi <= v["dims"])
    )
    kept = F.filter(
        F.zip_with(v["indexes"], v["values"], lambda i, x: F.struct(i.alias("i"), x.alias("v"))),
        lambda p: (p["i"] >= lo) & (p["i"] < hi),
    )
    sliced = svector(
        (hi - lo).cast("int"),
        F.transform(kept, lambda p: p["i"] - lo),
        F.transform(kept, lambda p: p["v"]),
    )
    return F.when(valid, sliced)


# ---------------------------------------------------------------------------
# arithmetic (sorted merge semantics, svect.rs:228-339)
# ---------------------------------------------------------------------------

def _merge(a: Column, b: Column, combine, union: bool) -> Column:
    """Shared add/sub/mul body.  ``union=True`` merges the union of
    indexes (add/sub); ``False`` the intersection (mul).  Zero results
    are dropped, mirroring the reference merge loops."""
    if union:
        idx = F.array_sort(F.array_union(a["indexes"], b["indexes"]))
    else:
        idx = F.array_intersect(a["indexes"], b["indexes"])  # stays sorted: a sorted
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("i"),
            combine(_lookup(a, i), _lookup(b, i)).cast("float").alias("v"),
        ),
    )
    kept = F.filter(pairs, lambda p: p["v"] != 0.0)
    return svector(
        a["dims"],
        F.transform(kept, lambda p: p["i"]),
        F.transform(kept, lambda p: p["v"]),
    )


def svector_add(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a + b`` sparse sorted-merge add, zeros dropped (svect.rs:228-264)."""
    a, b = _col(a), _col(b)
    r = _merge(a, b, lambda x, y: x + y, union=True)
    return _checked(a, b, r) if check else r


def svector_sub(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a - b`` (svect.rs:266-302)."""
    a, b = _col(a), _col(b)
    r = _merge(a, b, lambda x, y: x - y, union=True)
    return _checked(a, b, r) if check else r


def svector_mul(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a * b`` over the index intersection (svect.rs:304-339)."""
    a, b = _col(a), _col(b)
    r = _merge(a, b, lambda x, y: x * y, union=False)
    return _checked(a, b, r) if check else r


def _sv_cmp(a: Column, b: Column) -> Column:
    """-1/0/1 as-if-densified comparison (svect.rs:404-444): the
    reference merge-walks the sorted (index, value) streams, treating an
    absent index as 0 — exactly the lexicographic order of the densified
    vectors.  Here: the first index (over the sorted union of supports)
    whose looked-up values differ decides; equal everywhere -> 0.
    O(nnz^2) per row over the supports only, never densifies to ``dims``.

    r13 shape: ONE aggregate() pass with per-element lookups that touch
    only the operands' own arrays (array_position + a single-element
    cast).  The r12 form captured ``map_from_arrays(indexes,
    cast(values))`` inside HOF lambdas — higher-order lambdas evaluate
    interpreted and re-evaluate every captured subtree PER ELEMENT, so
    each union element rebuilt both maps (and, when the operand itself
    was an expression like dense_to_svector(...), the whole conversion)
    — measured 15 ms/row in vec_order_ops.  Sticky accumulator keeps
    first-difference semantics; CaseWhen branches evaluate lazily, so
    settled rows do no lookups."""
    union = F.array_sort(F.array_union(a["indexes"], b["indexes"]))

    def _val(v: Column, i: Column) -> Column:
        p = F.array_position(v["indexes"], i)
        return F.when(
            p > 0, F.element_at(v["values"], p.cast("int")).cast("double")
        ).otherwise(F.lit(0.0))

    cmp = F.aggregate(
        union,
        F.lit(0),
        lambda acc, i: F.when(acc != 0, acc)
        .when(_val(a, i) < _val(b, i), F.lit(-1))
        .when(_val(a, i) > _val(b, i), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return _checked(a, b, cmp)


def svector_lt(a: Column | str, b: Column | str) -> Column:
    """``a < b`` as-if-densified lexicographic (finalize.sql:248-406
    svector operator family; semantics svect.rs:404-444)."""
    return _sv_cmp(_col(a), _col(b)) < 0


def svector_le(a: Column | str, b: Column | str) -> Column:
    return _sv_cmp(_col(a), _col(b)) <= 0


def svector_gt(a: Column | str, b: Column | str) -> Column:
    return _sv_cmp(_col(a), _col(b)) > 0


def svector_ge(a: Column | str, b: Column | str) -> Column:
    return _sv_cmp(_col(a), _col(b)) >= 0
