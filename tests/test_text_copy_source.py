"""COPY-analogue CSV loader (sources/text_copy.py): vector text
literals -> native columns, executor-side parse, error on malformed."""

import os

import pytest


def _write(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


class TestReadVectorsCsv:
    def test_all_three_kinds(self, spark, tmp_path):
        path = _write(
            tmp_path,
            "t.csv",
            [
                "id,v,sv,bv,note",
                '1,"[1, 2, 3]","{0:1, 2:3}/4","[0, 1, 1]",alpha',
                '2,"[4, 5, 6]","{}/4","[1, 0, 0]",beta',
            ],
        )
        from pgvecto_rs_spark.sources import read_vectors_csv

        df = read_vectors_csv(
            spark,
            path,
            {"v": "vector", "sv": "svector", "bv": "bvector"},
            schema="id INT, v STRING, sv STRING, bv STRING, note STRING",
        )
        rows = {r["id"]: r for r in df.collect()}
        assert list(rows[1]["v"]) == [1.0, 2.0, 3.0]
        assert rows[1]["sv"]["dims"] == 4
        assert list(rows[1]["sv"]["indexes"]) == [0, 2]
        assert list(rows[1]["sv"]["values"]) == [1.0, 3.0]
        assert rows[2]["sv"]["dims"] == 4 and list(rows[2]["sv"]["indexes"]) == []
        assert rows[1]["note"] == "alpha" and rows[2]["note"] == "beta"
        # bvector round-trips through the formatter
        from pgvecto_rs_spark.functions import text_format as TF

        shown = [
            r[0]
            for r in df.orderBy("id").select(TF.format_bvector(df["bv"])).collect()
        ]
        assert shown == ["[0, 1, 1]", "[1, 0, 0]"]

    def test_parse_is_a_projection(self, spark, tmp_path):
        """No UDF / no extra exchange: the parse lives in the scan's
        projection so the distributed read stays a plain file scan."""
        path = _write(tmp_path, "p.csv", ["id,v", '1,"[1, 2]"'])
        from pgvecto_rs_spark.sources import read_vectors_csv

        df = read_vectors_csv(spark, path, {"v": "vector"}, schema="id INT, v STRING")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_malformed_vector_errors(self, spark, tmp_path):
        path = _write(tmp_path, "bad.csv", ["id,v", "1,not-a-vector"])
        from pgvecto_rs_spark.sources import read_vectors_csv

        df = read_vectors_csv(spark, path, {"v": "vector"}, schema="id INT, v STRING")
        with pytest.raises(Exception):
            df.collect()

    def test_unknown_kind_rejected(self, spark, tmp_path):
        path = _write(tmp_path, "k.csv", ["id,v", '1,"[1]"'])
        from pgvecto_rs_spark.sources import read_vectors_csv

        with pytest.raises(ValueError, match="unknown vector column kinds"):
            read_vectors_csv(spark, path, {"v": "vecf99"})

    def test_missing_column_rejected(self, spark, tmp_path):
        path = _write(tmp_path, "m.csv", ["id,v", '1,"[1]"'])
        from pgvecto_rs_spark.sources import read_vectors_csv

        with pytest.raises(ValueError, match="not present"):
            read_vectors_csv(spark, path, {"w": "vector"})

    def test_tsv_and_inferred_schema(self, spark, tmp_path):
        path = _write(tmp_path, "t.tsv", ["id\tv", "1\t[1, 2]"])
        from pgvecto_rs_spark.sources import read_vectors_csv

        df = read_vectors_csv(spark, path, {"v": "vector"}, sep="\t")
        r = df.collect()[0]
        assert r["id"] == 1 and list(r["v"]) == [1.0, 2.0]

    def test_write_read_round_trip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pgvecto_rs_spark.functions import text_format as TF
        from pgvecto_rs_spark.sources import read_vectors_csv
        from pgvecto_rs_spark.sources.text_copy import write_vectors_csv

        df = spark.createDataFrame(
            [(1, [1.5, -2.0]), (2, [0.0, 3.25])], "id INT, v array<float>"
        ).withColumn("sv", TF.parse_svector(F.lit("{1:2}/3")))
        out = str(tmp_path / "export")
        write_vectors_csv(df, out, {"v": "vector", "sv": "svector"})
        back = read_vectors_csv(
            spark, out, {"v": "vector", "sv": "svector"},
            schema="id INT, v STRING, sv STRING",
        )
        rows = {r["id"]: r for r in back.collect()}
        assert list(rows[1]["v"]) == [1.5, -2.0]
        assert list(rows[2]["v"]) == [0.0, 3.25]
        assert rows[1]["sv"]["dims"] == 3 and list(rows[1]["sv"]["values"]) == [2.0]
