"""SQL surface: register the vector kernel set as SQL scalar functions.

The reference's user surface IS SQL (operators/functions registered in
src/sql/finalize.sql).  Spark 4 SQL scalar UDFs (``CREATE FUNCTION …
RETURN <expr>``) let us expose the same surface as *pure SQL
expressions* — Catalyst inlines the body into the calling plan, so
these run identically to the Column-API kernels (no Python, full
optimizer visibility), and a user can literally write:

    SELECT * FROM items ORDER BY vec_l2sq(embedding, array(3,2,1)) LIMIT 5

Function set mirrors finalize.sql's operators/functions:
vec_l2sq (<->), vec_negdot (<#>), vec_cos (<=>), vec_norm,
vec_normalize, vec_dims, vec_add/sub/mul (+ - *), vec_slice (v[a:b]),
bit_hamming (<-> on bvector bit arrays), bit_jaccard (<~>),
svec_dot / svec_norm on the sparse struct.  Dim mismatches raise, like
``check_matched_dims``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_D = "CAST(a AS ARRAY<DOUBLE>)"
_E = "CAST(b AS ARRAY<DOUBLE>)"
_CHECK = (
    "CASE WHEN size(a) != size(b) THEN "
    "raise_error(printf('differently-dimensioned vectors: %d and %d', size(a), size(b))) "
    "ELSE {expr} END"
)

_FUNCTIONS: dict[str, str] = {
    # --- distances (finalize.sql:408-470)
    "vec_l2sq": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN {_CHECK.format(expr=f'''
        aggregate(zip_with({_D}, {_E}, (x, y) -> (x-y)*(x-y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)''')}""",
    "vec_negdot": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN {_CHECK.format(expr=f'''
        -aggregate(zip_with({_D}, {_E}, (x, y) -> x*y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)''')}""",
    "vec_cos": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN {_CHECK.format(expr=f'''
        1.0 - aggregate(zip_with({_D}, {_E}, (x, y) -> x*y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
            / sqrt(aggregate({_D}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x*x)
                 * aggregate({_E}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x*x))''')}""",
    # --- scalar functions (finalize.sql:601-632)
    "vec_norm": """(a ARRAY<FLOAT>) RETURNS DOUBLE RETURN
        sqrt(aggregate(CAST(a AS ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x*x))""",
    "vec_dims": "(a ARRAY<FLOAT>) RETURNS INT RETURN size(a)",
    "vec_normalize": """(a ARRAY<FLOAT>) RETURNS ARRAY<FLOAT> RETURN
        CAST(transform(CAST(a AS ARRAY<DOUBLE>),
             x -> x / sqrt(aggregate(CAST(a AS ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE), (acc, y) -> acc + y*y)))
             AS ARRAY<FLOAT>)""",
    # --- arithmetic (finalize.sql:90-148)
    "vec_add": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS ARRAY<FLOAT> RETURN {_CHECK.format(
        expr='zip_with(a, b, (x, y) -> x + y)')}""",
    "vec_sub": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS ARRAY<FLOAT> RETURN {_CHECK.format(
        expr='zip_with(a, b, (x, y) -> x - y)')}""",
    "vec_mul": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS ARRAY<FLOAT> RETURN {_CHECK.format(
        expr='zip_with(a, b, (x, y) -> x * y)')}""",
    # --- slice v[lo:hi] (0-based, end-exclusive, NULL-on-invalid —
    #     subscript_vecf32.rs semantics)
    "vec_slice": """(a ARRAY<FLOAT>, lo INT, hi INT) RETURNS ARRAY<FLOAT> RETURN
        CASE WHEN lo IS NULL OR hi IS NULL OR lo < 0 OR hi < 0 OR lo >= hi OR hi > size(a)
             THEN NULL ELSE slice(a, lo + 1, hi - lo) END""",
    # --- ordering operators (finalize.sql:248-406 operator families):
    #     dense lexicographic; sparse as-if-densified (svect.rs:404-444);
    #     bit-array bit-lex in dimension order (bvect.rs:260-276)
    "vec_cmp": f"""(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS INT RETURN {_CHECK.format(expr='''
        CASE WHEN try_element_at(filter(zip_with(a, b, (x, y) -> struct(x AS x, y AS y)), p -> p.x != p.y), 1) IS NULL THEN 0
             WHEN try_element_at(filter(zip_with(a, b, (x, y) -> struct(x AS x, y AS y)), p -> p.x != p.y), 1).x
                < try_element_at(filter(zip_with(a, b, (x, y) -> struct(x AS x, y AS y)), p -> p.x != p.y), 1).y
             THEN -1 ELSE 1 END''')}""",
    "vec_lt": "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS BOOLEAN RETURN vec_cmp(a, b) < 0",
    "vec_le": "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS BOOLEAN RETURN vec_cmp(a, b) <= 0",
    "vec_gt": "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS BOOLEAN RETURN vec_cmp(a, b) > 0",
    "vec_ge": "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS BOOLEAN RETURN vec_cmp(a, b) >= 0",
    "svec_cmp": """(a STRUCT<dims:INT, indexes:ARRAY<INT>, values:ARRAY<FLOAT>>,
                    b STRUCT<dims:INT, indexes:ARRAY<INT>, values:ARRAY<FLOAT>>) RETURNS INT RETURN
        CASE WHEN a.dims != b.dims THEN raise_error('differently-dimensioned vectors')
             WHEN try_element_at(filter(array_sort(array_union(a.indexes, b.indexes)),
                 i -> coalesce(element_at(map_from_arrays(a.indexes, CAST(a.values AS ARRAY<DOUBLE>)), i), 0.0D)
                   != coalesce(element_at(map_from_arrays(b.indexes, CAST(b.values AS ARRAY<DOUBLE>)), i), 0.0D)), 1) IS NULL
             THEN 0
             WHEN coalesce(element_at(map_from_arrays(a.indexes, CAST(a.values AS ARRAY<DOUBLE>)),
                     try_element_at(filter(array_sort(array_union(a.indexes, b.indexes)),
                       i -> coalesce(element_at(map_from_arrays(a.indexes, CAST(a.values AS ARRAY<DOUBLE>)), i), 0.0D)
                         != coalesce(element_at(map_from_arrays(b.indexes, CAST(b.values AS ARRAY<DOUBLE>)), i), 0.0D)), 1)), 0.0D)
                < coalesce(element_at(map_from_arrays(b.indexes, CAST(b.values AS ARRAY<DOUBLE>)),
                     try_element_at(filter(array_sort(array_union(a.indexes, b.indexes)),
                       i -> coalesce(element_at(map_from_arrays(a.indexes, CAST(a.values AS ARRAY<DOUBLE>)), i), 0.0D)
                         != coalesce(element_at(map_from_arrays(b.indexes, CAST(b.values AS ARRAY<DOUBLE>)), i), 0.0D)), 1)), 0.0D)
             THEN -1 ELSE 1 END""",
    "bit_cmp": f"""(a ARRAY<INT>, b ARRAY<INT>) RETURNS INT RETURN {_CHECK.format(expr='''
        CASE WHEN try_element_at(filter(zip_with(a, b, (x, y) -> struct(x AS x, y AS y)), p -> p.x != p.y), 1) IS NULL THEN 0
             WHEN try_element_at(filter(zip_with(a, b, (x, y) -> struct(x AS x, y AS y)), p -> p.x != p.y), 1).x = 1
             THEN 1 ELSE -1 END''')}""",
    # --- bit-vector kernels on the 0/1 array logical view
    "bit_hamming": f"""(a ARRAY<INT>, b ARRAY<INT>) RETURNS BIGINT RETURN {_CHECK.format(
        expr='size(filter(zip_with(a, b, (x, y) -> x != y), p -> p))')}""",
    "bit_jaccard": f"""(a ARRAY<INT>, b ARRAY<INT>) RETURNS DOUBLE RETURN {_CHECK.format(expr='''
        1.0 - CAST(size(filter(zip_with(a, b, (x, y) -> x = 1 AND y = 1), p -> p)) AS DOUBLE)
            / CAST(size(filter(zip_with(a, b, (x, y) -> x = 1 OR y = 1), p -> p)) AS DOUBLE)''')}""",
    # --- sparse struct kernels
    "svec_dot": """(a STRUCT<dims:INT, indexes:ARRAY<INT>, values:ARRAY<FLOAT>>,
                    b STRUCT<dims:INT, indexes:ARRAY<INT>, values:ARRAY<FLOAT>>) RETURNS DOUBLE RETURN
        CASE WHEN a.dims != b.dims THEN raise_error('differently-dimensioned vectors') ELSE
        aggregate(zip_with(a.indexes, CAST(a.values AS ARRAY<DOUBLE>), (i, v) -> struct(i AS i, v AS v)),
                  CAST(0.0 AS DOUBLE),
                  (acc, p) -> acc + p.v * coalesce(element_at(
                      map_from_arrays(b.indexes, CAST(b.values AS ARRAY<DOUBLE>)), p.i), 0.0)) END""",
    "svec_norm": """(a STRUCT<dims:INT, indexes:ARRAY<INT>, values:ARRAY<FLOAT>>) RETURNS DOUBLE RETURN
        sqrt(aggregate(CAST(a.values AS ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x*x))""",
}

# Text-analysis scalar surface (operators/textanalysis.py as SQL — the
# north-star LLM ops callable from plain SQL, Catalyst-inlined like the
# vector kernels).  Bodies are maintained together with the Column API.
def _text_functions() -> dict[str, str]:
    from pgvecto_rs_spark.operators.textanalysis import EN_STOPWORDS

    sw = "array(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"
    return {
        "doc_token_count": r"""(t STRING) RETURNS BIGINT RETURN
            CASE WHEN length(trim(t)) = 0 THEN 0L
                 ELSE CAST(size(split(trim(t), '\\s+')) AS BIGINT) END""",
        "doc_punct_ratio": r"""(t STRING) RETURNS DOUBLE RETURN
            CASE WHEN length(t) > 0
                 THEN CAST(length(regexp_replace(t, '[A-Za-z0-9\\s]', '')) AS DOUBLE) / length(t)
                 ELSE 0.0 END""",
        "doc_upper_ratio": r"""(t STRING) RETURNS DOUBLE RETURN
            CASE WHEN length(t) > 0
                 THEN CAST(length(regexp_replace(t, '[^A-Z]', '')) AS DOUBLE) / length(t)
                 ELSE 0.0 END""",
        "doc_stop_ratio": rf"""(t STRING) RETURNS DOUBLE RETURN
            CASE WHEN length(trim(t)) = 0 THEN 0.0 ELSE
              CAST(size(filter(split(trim(lower(t)), '\\s+'), w -> array_contains({sw}, w))) AS DOUBLE)
              / size(split(trim(lower(t)), '\\s+')) END""",
        "doc_lang_score": """(t STRING) RETURNS DOUBLE RETURN
            doc_stop_ratio(t) * (1.0 - doc_punct_ratio(t))""",
        "doc_fingerprint": r"""(t STRING) RETURNS STRING RETURN
            md5(regexp_replace(lower(trim(t)), '\\s+', ' '))""",
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create the temporary SQL functions; returns the function names.

    Besides the inlined SQL-UDF kernels, the binary send/recv codecs
    (pandas UDFs — the reference's `_vectors_*_send/recv` surface,
    src/datatype/binary_*.rs) register as vec_send/vec_recv,
    svec_send/svec_recv, bvec_send/bvec_recv."""
    text_fns = _text_functions()
    # dependency order: doc_lang_score's body calls the ratio functions
    for name, body in {**_FUNCTIONS, **text_fns}.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    from pgvecto_rs_spark.functions import wire as W

    codecs = {
        "vec_send": W._make_vector_send,
        "vec_recv": W._make_vector_recv,
        "svec_send": W._make_svector_send,
        "svec_recv": W._make_svector_recv,
        "bvec_send": W._make_bvector_send,
        "bvec_recv": W._make_bvector_recv,
    }
    for name, maker in codecs.items():
        spark.udf.register(name, W._udf(name, maker))
    return sorted(list(_FUNCTIONS) + list(text_fns) + list(codecs))
