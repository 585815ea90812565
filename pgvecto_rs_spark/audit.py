"""Physical-plan audit: the ``.explain("formatted")`` discipline as a
tool.

Every operator in this repo was tuned against its physical plan
(pushdown reaching the scan, partial aggregation before the exchange,
broadcast where a side is small, whole-stage codegen spans wide).  This
module turns that review into a reusable summary so a regression —
a filter that stops reaching parquet, a broadcast that silently becomes
a shuffle join, a new exchange — is visible in one line per query.

CLI::

    python -m pgvecto_rs_spark.audit topk_l2 tpch_q1 [--sf DIR]

prints per query: #shuffle exchanges, #broadcast exchanges,
#WholeStageCodegen spans, whether any parquet scan has PushedFilters,
and the TakeOrderedAndProject / partial-aggregation markers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["audit_plan", "audit_query"]


def audit_plan(df: DataFrame) -> dict:
    """Summarize the executed physical plan of ``df``."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # An executed AQE plan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — audit only the final (actually-run) one.
    final = plan.split("== Initial Plan ==")[0]
    shuffle = sum(
        1
        for line in final.splitlines()
        if line.strip(" +-*:(0123456789)").startswith("Exchange ")
        and "Broadcast" not in line
    )
    broadcast = sum(
        1 for line in final.splitlines() if "BroadcastExchange" in line
    )
    # whole-stage codegen stages print as "*(n) Operator" in toString
    spans = set(re.findall(r"\*\((\d+)\)", final)) | set(
        re.findall(r"WholeStageCodegen \((\d+)\)", final)
    )
    return {
        "shuffle_exchanges": shuffle,
        "broadcast_exchanges": broadcast,
        "wholestage_codegen_spans": len(spans),
        "pushed_filters": bool(re.search(r"PushedFilters: \[(?!\])", final)),
        "take_ordered": "TakeOrderedAndProject" in final,
        "partial_aggregation": "partial_" in final and "HashAggregate" in final,
        "plan": final,
    }


def audit_query(spark, name: str, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    """Audit a registered query by name (see ``queries.queries()``)."""
    from pgvecto_rs_spark import queries as Q

    df = Q.queries()[name](spark, sf_dir)
    df.collect()  # AQE finalizes the plan on execution
    return audit_plan(df)


def _main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("names", nargs="+")
    parser.add_argument("--sf", default="/root/testdata/sf0.001")
    args = parser.parse_args()

    from pgvecto_rs_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for n in args.names:
        a = audit_query(spark, n, args.sf)
        print(
            f"{n}: shuffles={a['shuffle_exchanges']} "
            f"broadcasts={a['broadcast_exchanges']} "
            f"codegen_spans={a['wholestage_codegen_spans']} "
            f"pushed_filters={a['pushed_filters']} "
            f"take_ordered={a['take_ordered']}"
        )


if __name__ == "__main__":
    _main()
