"""Plan-audit utility (audit.py): the summary must reflect the plans
the operators were engineered to have."""

from __future__ import annotations

from pgvecto_rs_spark.audit import audit_plan, audit_query


class TestAudit:
    def test_topk_uses_take_ordered_no_shuffle(self, spark, sf_dir):
        a = audit_query(spark, "topk_l2", sf_dir)
        assert a["take_ordered"]
        assert a["shuffle_exchanges"] == 0

    def test_tpch_q1_pushes_filters_and_partial_aggs(self, spark, sf_dir):
        a = audit_query(spark, "tpch_q1", sf_dir)
        assert a["pushed_filters"]
        assert a["partial_aggregation"]
        assert a["wholestage_codegen_spans"] >= 1

    def test_plain_groupby_counts_one_shuffle(self, spark, sf_dir):
        df = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .groupBy("lang")
            .count()
        )
        df.collect()
        a = audit_plan(df)
        assert a["shuffle_exchanges"] == 1
        assert a["partial_aggregation"]
