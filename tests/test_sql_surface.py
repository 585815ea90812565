"""SQL-surface parity: the registered SQL functions behave exactly like
the Column-API kernels (the finalize.sql analogue)."""

from __future__ import annotations

import math

import pytest

from pgvecto_rs_spark.sql import register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = register_sql_functions(spark)
    assert "vec_l2sq" in names


def q1(spark, sql):
    return spark.sql(f"SELECT {sql} AS r").first()["r"]


def test_distances(spark):
    assert q1(spark, "vec_l2sq(array(1.0,2.0,3.0), array(3.0,2.0,1.0))") == 8.0
    assert q1(spark, "vec_negdot(array(1.0,2.0,3.0), array(4.0,5.0,6.0))") == -32.0
    got = q1(spark, "vec_cos(array(1.0,2.0,3.0), array(4.0,5.0,6.0))")
    assert got == pytest.approx(1 - 32 / math.sqrt(14 * 77), rel=1e-12)


def test_scalar_functions(spark):
    assert q1(spark, "vec_norm(array(3.0,4.0))") == 5.0
    assert q1(spark, "vec_dims(array(1.0,2.0))") == 2
    assert q1(spark, "vec_normalize(array(3.0,4.0))") == pytest.approx([0.6, 0.8])
    assert q1(spark, "vec_add(array(1.0,2.0), array(3.0,4.0))") == [4.0, 6.0]


def test_slice_null_semantics(spark):
    assert q1(spark, "vec_slice(array(0.0,1.0,2.0,3.0), 1, 3)") == [1.0, 2.0]
    assert q1(spark, "vec_slice(array(0.0,1.0), 5, 9)") is None
    assert q1(spark, "vec_slice(array(0.0,1.0), CAST(NULL AS INT), 1)") is None


def test_dim_mismatch_raises(spark):
    with pytest.raises(Exception) as ei:
        q1(spark, "vec_l2sq(array(1.0), array(1.0,2.0))")
    assert "differently-dimensioned" in str(ei.value)


def test_bits_and_sparse(spark):
    assert q1(spark, "bit_hamming(array(0,1,1), array(1,1,0))") == 2
    assert q1(spark, "bit_jaccard(array(1,1,0), array(0,1,1))") == pytest.approx(1 - 1 / 3)
    sv = "named_struct('dims', 3, 'indexes', array(0,2), 'values', array(CAST(1.0 AS FLOAT), CAST(3.0 AS FLOAT)))"
    sw = "named_struct('dims', 3, 'indexes', array(2), 'values', array(CAST(2.0 AS FLOAT)))"
    assert q1(spark, f"svec_dot({sv}, {sw})") == 6.0
    assert q1(spark, f"svec_norm({sv})") == pytest.approx(math.sqrt(10))


def test_full_sql_query_shape(spark, sf_dir):
    """README.md:118-121 quick-start, verbatim SQL over a view."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView("items")
    # NB Spark disallows SQL UDFs directly in ORDER BY — compute in a
    # subquery, sort the column (same plan after inlining)
    rows = spark.sql(
        """
        SELECT vec_id FROM (
          SELECT vec_id,
                 vec_l2sq(embedding, transform(sequence(1, 64), i -> CAST(0.1 AS FLOAT))) AS d
          FROM items
        ) ORDER BY d, vec_id LIMIT 5
        """
    ).collect()
    assert len(rows) == 5


def test_wire_codecs_via_sql(spark):
    """send/recv registered on the SQL surface (the reference's
    _vectors_*_send/recv function pairs)."""
    from pgvecto_rs_spark.sql import register_sql_functions

    names = register_sql_functions(spark)
    assert {"vec_send", "vec_recv", "svec_send", "bvec_recv"} <= set(names)
    row = spark.sql(
        "SELECT vec_recv(vec_send(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)))) AS v"
    ).collect()[0]
    assert row["v"] == [1.5, -2.0]


def test_text_analysis_sql_matches_column_api(spark, sf_dir):
    """The text-analysis scalars are SQL-callable (finalize.sql-style
    surface for the north-star ops) and agree exactly with the Column
    API over the documents table."""
    from pgvecto_rs_spark.operators import textanalysis as TA
    from pgvecto_rs_spark.sql import register_sql_functions

    names = register_sql_functions(spark)
    for fn in ["doc_token_count", "doc_stop_ratio", "doc_lang_score", "doc_fingerprint"]:
        assert fn in names
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("docs_sql_ta")
    got = spark.sql(
        """
        SELECT doc_id, doc_token_count(text) AS n, doc_punct_ratio(text) AS pr,
               doc_upper_ratio(text) AS ur, doc_stop_ratio(text) AS sr,
               doc_lang_score(text) AS ls, doc_fingerprint(text) AS fp
        FROM docs_sql_ta
        """
    ).collect()
    want = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            TA.token_count("text").alias("n"),
            TA.punct_ratio("text").alias("pr"),
            TA.uppercase_ratio("text").alias("ur"),
            TA.stopword_ratio("text").alias("sr"),
            TA.language_score("text").alias("ls"),
            TA.doc_fingerprint("text").alias("fp"),
        ).collect()
    }
    assert len(got) == len(want) > 0
    for g in got:
        w = want[g["doc_id"]]
        assert g["n"] == w["n"] and g["fp"] == w["fp"]
        for f in ("pr", "ur", "sr", "ls"):
            assert g[f] == w[f], (g["doc_id"], f, g[f], w[f])


def test_ordering_operators_sql(spark):
    """finalize.sql:248-406 operator families through the SQL surface:
    dense lexicographic, sparse as-if-densified, bit-lex in dim order."""
    from pgvecto_rs_spark.sql import register_sql_functions

    register_sql_functions(spark)
    r = spark.sql("""
        SELECT vec_cmp(array(1.0,2.0), array(2.0,2.0)) AS dlt,
               vec_cmp(array(1.0,2.0), array(1.0,2.0)) AS deq,
               vec_ge(array(1.0,3.0), array(1.0,2.0)) AS dge,
               svec_cmp(named_struct('dims',5,'indexes',array(0),'values',CAST(array(1.0) AS ARRAY<FLOAT>)),
                        named_struct('dims',5,'indexes',array(1),'values',CAST(array(9.0) AS ARRAY<FLOAT>))) AS s1,
               svec_cmp(named_struct('dims',4,'indexes',CAST(array() AS ARRAY<INT>),'values',CAST(array() AS ARRAY<FLOAT>)),
                        named_struct('dims',4,'indexes',array(0),'values',CAST(array(-1.0) AS ARRAY<FLOAT>))) AS s2,
               bit_cmp(array(0,1,0), array(0,0,1)) AS b1,
               bit_cmp(array(1,0), array(1,0)) AS b0
    """).first()
    assert tuple(r) == (-1, 0, True, 1, 1, 1, 0)
    import pytest as _pt

    with _pt.raises(Exception, match="differently-dimensioned"):
        spark.sql("SELECT vec_cmp(array(1.0), array(1.0, 2.0))").collect()
