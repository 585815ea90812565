"""Relational substrate sanity: TPC-H query shapes answered by
Catalyst over the same parquet tables."""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import binary as VB
from pgvecto_rs_spark.functions import dense as VD
from pgvecto_rs_spark.functions import sparse as VS
from pgvecto_rs_spark.operators import asof as OA
from pgvecto_rs_spark.operators import clustering as CL
from pgvecto_rs_spark.operators import curation as CU
from pgvecto_rs_spark.operators import dedup as DD
from pgvecto_rs_spark.operators import retrieval as RT
from pgvecto_rs_spark.operators import search as SR
from pgvecto_rs_spark.operators import textanalysis as TA

from pgvecto_rs_spark.queries._core import (  # noqa: F401
    DIMS,
    Q64,
    Q64_SQL,
    SPARSE_THRESHOLD,
    RANGE_RADIUS,
    STOPWORDS_SQL,
    QueryFn,
    register,
    _REGISTRY,
    _q_col,
    _tune,
    _emb,
    _docs,
    _events,
    _r4,
    _r4t,
    _scaled_sum,
    _sorted_small,
    _SQL_L2,
    _SQL_DOT,
    _SQL_NORMSQ_E,
    _Q_NORM,
    _tmp_index_dir,
    _open_cached,
)




# ---------------------------------------------------------------------------
# 11. relational substrate sanity: TPC-H Q1 (Catalyst does the work)
# ---------------------------------------------------------------------------

@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
           CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_u,
           CAST(SUM(CAST(FLOOR(((l_extendedprice * (1 - l_discount)) * (1 + l_tax)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_u,
           FLOOR(CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
           FLOOR(CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_price,
           FLOOR(CAST(SUM(CAST(FLOOR(l_discount * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 over the double-typed lineitem parquet.  Money/quantity sums
    are scaled-integer (cents / micros) so partial aggregation order and
    decimal tie-rounding can never diverge between engines (see _scaled_sum);
    averages use the tie-free _r4t formula on identically-ordered IEEE ops."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    sum_qty_c = _scaled_sum(F.col("l_quantity"), 100.0)
    sum_price_c = _scaled_sum(F.col("l_extendedprice"), 100.0)
    sum_disc_u = _scaled_sum(F.col("l_discount"), 1000000.0)
    return (
        df.where(F.col("l_shipdate") <= F.lit("1998-09-02 23:59:59").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty_c.alias("sum_qty_c"),
            sum_price_c.alias("sum_base_price_c"),
            _scaled_sum(disc_price, 1000000.0).alias("sum_disc_price_u"),
            _scaled_sum(charge, 1000000.0).alias("sum_charge_u"),
            _r4t(sum_qty_c.cast("double") / F.lit(100.0) / cnt).alias("avg_qty"),
            _r4t(sum_price_c.cast("double") / F.lit(100.0) / cnt).alias("avg_price"),
            _r4t(sum_disc_u.cast("double") / F.lit(1000000.0) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "tpch_q6",
    """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change), dates shifted into the
    testdata's 1995-2001 range.  Pure scan + filter + scalar aggregate:
    every predicate reaches the parquet scan (PushedFilters) and the sum
    is a map-side partial — the shape that reads minimal bytes at 100 TB."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        df.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _scaled_sum(F.col("l_extendedprice") * F.col("l_discount"), 1000000.0).alias("revenue_u"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q3",
    """
    SELECT o_orderkey, o_date, o_orderpriority, revenue_u FROM (
      SELECT l_orderkey AS o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             o_orderpriority,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-01'
        AND l_shipdate > TIMESTAMP '1997-06-01'
      GROUP BY 1, 2, 3
    ) ORDER BY revenue_u DESC, o_orderkey LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority), adapted to the testdata schema
    (o_orderpriority for the absent o_shippriority; dates shifted).

    Scale shape: customer (filtered small dim) BROADCASTS into orders;
    orders⋈lineitem is the one big shuffle, keyed on orderkey; revenue
    aggregates partially before its shuffle; top-10 is TakeOrdered,
    not a global sort."""
    _tune(spark)
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
        .agg(
            _scaled_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 1000000.0
            ).alias("revenue_u")
        )
        .orderBy(F.desc("revenue_u"), "o_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    """
    SELECT n_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue_u DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-table star join.

    Scale shape: region→nation→supplier and customer are all dimension
    tables — each BROADCASTS into the fact-side pipeline, so the only
    big shuffles are orders⋈lineitem on orderkey and the final n_name
    aggregation (25 groups, map-side partial).  The c_nationkey =
    s_nationkey correlation rides the row, not a join."""
    _tune(spark)
    region = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nat = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            _scaled_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 1000000.0
            ).alias("revenue_u")
        )
        .transform(_sorted_small, F.desc("revenue_u"), "n_name")
    )


@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name, revenue_u, acctbal, n_name FROM (
      SELECT c_custkey, c_name,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u,
             FLOOR(CAST(c_acctbal AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS acctbal,
             n_name
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
    ) ORDER BY revenue_u DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in a quarter.

    Scale shape: nation broadcasts; customer joins the aggregated
    order-revenue stream on custkey; the one big shuffle is
    orders⋈lineitem; top-20 is TakeOrdered."""
    _tune(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _scaled_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 1000000.0
            ).alias("revenue_u")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue_u",
            _r4t(F.col("c_acctbal").cast("double")).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue_u"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14",
    """
    SELECT FLOOR((100.0 * CAST(promo_u AS DOUBLE) / CAST(total_u AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
             AS promo_revenue_pct
    FROM (
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS promo_u,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_u
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
    )
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): % of monthly revenue from PROMO
    parts.  part broadcasts into the date-pruned lineitem scan; both
    sums are scaled-int (order-free), the final percentage is one
    double division on identical integers in either engine."""
    _tune(spark)
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_type"
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    rev_u = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev_u).otherwise(F.lit(0)))
            .cast("long")
            .alias("promo_u"),
            F.sum(rev_u).cast("long").alias("total_u"),
        )
    )
    pct = F.lit(100.0) * F.col("promo_u").cast("double") / F.col("total_u").cast("double")
    return agg.select(_r4t(pct).alias("promo_revenue_pct"))


@register(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year, revenue_u FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_8'))
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3
    ) ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year.

    Scale shape: nation joins twice under DIFFERENT keys (supplier side
    vs customer side); each side's nation pre-filter ({2,8}) applies to
    supplier and customer BEFORE the fact joins, so the broadcast
    supplier set and the customer shuffle both carry ~2/25 of their
    tables and lineitem is pruned by supplier nation at the scan side.
    The disjunctive pair predicate then evaluates as a residual on the
    joined row (one pipeline, no union-of-plans); the only big shuffles
    are lineitem⋈orders on orderkey and orders⋈customer on custkey;
    the final (nation, nation, year) aggregation has a handful of
    groups with map-side partials."""
    _tune(spark)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin("NATION_8", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin("NATION_8", "NATION_2"))
    supp_f = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select("s_suppkey", "supp_nation")
    )
    cust_f = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .select("c_custkey", "cust_nation")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    joined = (
        li.join(F.broadcast(supp_f), li.l_suppkey == supp_f.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_f, orders.o_custkey == cust_f.c_custkey)
        .where(
            (
                (F.col("supp_nation") == "NATION_8")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_8")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _scaled_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 1000000.0
            ).alias("revenue_u")
        )
        .transform(_sorted_small, "supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8",
    """
    SELECT o_year,
           FLOOR((CAST(nation_u AS DOUBLE) / CAST(total_u AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                  THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS nation_u,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_u
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
    ) ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the target nation's share of
    PROMO-part revenue sold into a region, by order year.

    Scale shape: the PROMO part filter broadcasts into lineitem first
    (the strongest prune, ~1/5 of rows); supplier+nation broadcast as a
    pre-joined (suppkey → nation) map; customer pre-filters through the
    region's nations and meets orders on the custkey shuffle.  The
    share numerator is a conditional scaled-int sum over the SAME
    joined stream as the denominator (one pass, no self-join); the
    final ratio divides identical integers in either engine."""
    _tune(spark)
    region = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n1 = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    part = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp_f = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select("s_suppkey", "supp_nation")
    )
    cust_f = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .select("c_custkey")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_u = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_f), li.l_suppkey == supp_f.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_f, orders.o_custkey == cust_f.c_custkey)
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", rev_u).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("nation_u"),
        F.sum(rev_u).cast("long").alias("total_u"),
    )
    share = F.col("nation_u").cast("double") / F.col("total_u").cast("double")
    return agg.select("o_year", _r4t(share).alias("mkt_share")).transform(_sorted_small, "o_year")


@register(
    "tpch_q13",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution), adapted to the reduced
    schema: the spec filters orders on an o_comment regex; this corpus
    carries no o_comment, so the join-side predicate is
    o_orderpriority <> '1-URGENT' — same left-join-with-residual-
    predicate shape, COUNT counts the nullable side so customers with
    no surviving orders land in the c_count=0 bucket.

    Scale shape: one custkey shuffle for the left join + count, then a
    tiny distribution aggregation (≤ distinct order counts) with
    map-side partials."""
    _tune(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .transform(_sorted_small, F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_revenue_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue_u
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue_u = (SELECT MAX(total_revenue_u) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the quarter's maximum
    revenue — the scalar-subquery-against-an-aggregate shape.

    Scale shape: one suppkey aggregation of the date-pruned lineitem
    scan; the MAX reduces to a single broadcast row cross-joined back
    (no second scan of lineitem, no window over a single partition);
    supplier broadcasts into the tiny winners set.  Scaled-int revenue
    makes the equality comparison exact — a double-summed revenue
    could differ in the last ulp between engines and drop the winner."""
    _tune(spark)
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _scaled_sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 1000000.0
        ).alias("total_revenue_u")
    )
    best = revenue.agg(F.max("total_revenue_u").alias("best_u"))
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue_u") == F.col("best_u"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_u")
        .transform(_sorted_small, "s_suppkey")
    )


@register(
    "tpch_q18",
    """
    SELECT c_custkey, c_name, o_orderkey, o_date, total_qty_c FROM (
      SELECT c_custkey, c_name, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_qty_c
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2, 3, 4
      HAVING SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) > 18000
    ) ORDER BY total_qty_c DESC, o_orderkey LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, with their customers.

    Scale shape: the HAVING filter runs on the orderkey aggregation
    BEFORE joining customer (aggregate-then-join — the spec's IN
    subquery and main join collapse into one pass since the grouping
    key is the join key); customer broadcasts into the small surviving
    set; top-100 is TakeOrdered.  Quantities sum as scaled ints so the
    threshold cut is engine-exact at the boundary."""
    _tune(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(_scaled_sum(F.col("l_quantity"), 100.0).alias("total_qty_c"))
        .where(F.col("total_qty_c") > 18000)
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "total_qty_c",
        )
        .orderBy(F.desc("total_qty_c"), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q17",
    """
    WITH brand_li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
    ),
    pavg AS (
      SELECT l_partkey, SUM(l_quantity) / COUNT(*) AS avg_qty
      FROM brand_li GROUP BY 1
    )
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_u,
           COUNT(*) AS n_items
    FROM brand_li JOIN pavg USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from lineitems
    whose quantity is below 20% of their part's average quantity.

    Scale shape: the per-part average is the correlated subquery turned
    into ONE partkey aggregation joined back to the detail rows — and
    because brand is a part property, brand-filtering lineitem FIRST
    (broadcast part-key set) shrinks both the aggregation and the
    detail side to ~1/num_brands before the partkey shuffle; the agg
    and the join share that partitioning.  Engine-exactness: quantities
    are integral doubles, so SUM is exact in any order and SUM/COUNT ·
    0.2 is the same double everywhere — the threshold cut cannot
    disagree at the boundary."""
    _tune(spark)
    part = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pavg = brand_li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        brand_li.join(pavg, "l_partkey")
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            _scaled_sum(F.col("l_extendedprice"), 1000000.0).alias("total_u"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q2",
    """
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT)) AS ps_cost_c
      FROM lineitem GROUP BY 1, 2
    )
    SELECT CAST(FLOOR(s_acctbal * 100.0 + 0.5) AS BIGINT) AS s_acctbal_c,
           s_name, n_name, p_partkey
    FROM part, ps, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND p_size = 3 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
      AND ps_cost_c = (SELECT MIN(ps2.ps_cost_c)
                       FROM ps ps2, supplier s2, nation n2, region r2
                       WHERE ps2.ps_partkey = p_partkey
                         AND s2.s_suppkey = ps2.ps_suppkey
                         AND s2.s_nationkey = n2.n_nationkey
                         AND n2.n_regionkey = r2.r_regionkey
                         AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted to the reduced schema:
    there is no partsupp table, so the part-supplier relation is
    derived from lineitem — (l_partkey, l_suppkey) pairs with
    ps_supplycost := MIN unit price ever charged (scaled-int for
    engine-exact comparison).  The correlated min-cost-in-region
    subquery — Q2's defining shape — is unchanged.

    Scale shape: the oracle's correlated subquery becomes one regional
    per-part MIN aggregation joined back (two hash aggregates over the
    derived ps relation, no correlated re-execution); dimension tables
    (supplier, nation, region) broadcast; part filter prunes before the
    join.  TakeOrdered 100."""
    _tune(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cost_c = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(cost_c).alias("ps_cost_c"))
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet").where(
        F.col("r_name") == "EUROPE"
    )
    eur_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eur_ps = ps.join(F.broadcast(eur_supp), ps.ps_suppkey == F.col("s_suppkey"))
    part = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where((F.col("p_size") == 3) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    # regional per-part MIN as a window over the (already partkey-keyed)
    # derived ps relation: one shuffle instead of aggregate + join-back
    wmin = Window.partitionBy("ps_partkey")
    out = (
        eur_ps.withColumn("min_cost_c", F.min("ps_cost_c").over(wmin))
        .where(F.col("ps_cost_c") == F.col("min_cost_c"))
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.floor(F.col("s_acctbal") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("s_acctbal_c"),
            "s_name",
            "n_name",
            "p_partkey",
        )
        .orderBy(F.desc("s_acctbal_c"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
    return out


@register(
    "tpch_q11",
    """
    WITH val AS (
      SELECT l_partkey AS ps_partkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_c
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT ps_partkey, value_c FROM val
    WHERE value_c * 1000 > (SELECT CAST(SUM(value_c) AS BIGINT) FROM val)
    ORDER BY value_c DESC, ps_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: partsupp
    value ps_supplycost*ps_availqty becomes the total extended price a
    nation's suppliers ever shipped per part (scaled-int), and the
    HAVING-over-global-fraction shape (value > 1/1000 of the national
    total) is unchanged.

    Scale shape: one partkey hash aggregate over the nation-filtered
    lineitem scan (supplier/nation broadcast); the global total is a
    single-row broadcast cross-join, NOT a correlated re-scan; the
    fraction test runs in scaled-int (value_c * 1000 > total_c), no
    engine-dependent double summation."""
    _tune(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").where(
        F.col("n_name") == "NATION_7"
    )
    nat_supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("value_c")
        )
    )
    total = val.agg(F.sum("value_c").cast("long").alias("total_c"))
    return (
        val.join(F.broadcast(total))
        .where(F.col("value_c") * F.lit(1000) > F.col("total_c"))
        .select("ps_partkey", "value_c")
        .transform(_sorted_small, F.desc("value_c"), "ps_partkey")
    )


@register(
    "tpch_q20",
    """
    WITH avail AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS availqty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT DISTINCT s_name FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT a.l_suppkey FROM avail a JOIN part ON p_partkey = a.l_partkey
        WHERE p_name LIKE 'small%'
          AND a.availqty > (SELECT CAST(FLOOR(0.5 * SUM(l_quantity)) AS BIGINT)
                            FROM lineitem l2
                            JOIN orders o ON o_orderkey = l2.l_orderkey
                            WHERE l2.l_partkey = a.l_partkey
                              AND l2.l_suppkey = a.l_suppkey
                              AND o_orderdate >= TIMESTAMP '1997-01-01'
                              AND o_orderdate < TIMESTAMP '1998-01-01'))
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: ps_availqty
    becomes the total quantity the (part, supplier) pair ever shipped,
    compared against half its 1997 shipped quantity — the nested
    correlated-aggregate + semi-join-chain shape (supplier ⋉ partsupp ⋉
    part with a per-pair scalar subquery) is unchanged.

    Scale shape: the correlated subquery becomes ONE date-pruned hash
    aggregate per (part, supplier) joined to the avail aggregate (inner
    join — pairs with no 1997 shipments compare against NULL in the
    oracle and drop out identically); part filter broadcasts; the
    supplier membership is a semi join; output is DISTINCT supplier
    names, driver-bounded."""
    _tune(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    # ONE lineitem shuffle: the in-1997 flag broadcasts from orders and
    # both aggregates (total qty, half the 1997 qty) ride the same
    # (part, supplier) groupBy as conditional sums.  A pair with no 1997
    # rows gets a NULL half_q97, and `availqty > NULL` drops it exactly
    # like the oracle's empty correlated subquery.
    o97 = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            (
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ).alias("in97"),
        )
    )
    pairs = (
        li.join(F.broadcast(o97), li.l_orderkey == o97.o_orderkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("availqty"),
            F.floor(
                F.lit(0.5) * F.sum(F.when(F.col("in97"), F.col("l_quantity")))
            )
            .cast("long")
            .alias("half_q97"),
        )
    )
    part = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    good_pairs = (
        pairs.where(F.col("availqty") > F.col("half_q97"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").where(
        F.col("n_name") == "NATION_3"
    )
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(good_pairs, supplier.s_suppkey == good_pairs.l_suppkey, "left_semi")
        .select("s_name")
        .distinct()
        .transform(_sorted_small, "s_name")
    )


@register(
    "tpch_q21",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND s_nationkey = n_nationkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o2.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    reduced schema: the spec's lateness predicate l_receiptdate >
    l_commitdate has no columns here, so "late" = shipped more than 90
    days after the order date; the multi-supplier EXISTS / NOT-EXISTS
    self-join shape — the hard part of Q21 — is unchanged.

    Scale shape: instead of two correlated self-joins over lineitem
    (the oracle's literal spelling), ONE per-order aggregation computes
    (distinct suppliers, distinct late suppliers, THE late supplier,
    late-line count) per order — for a late line l1, "another supplier
    exists" == n_supp > 1 and "no other supplier was late" ==
    n_late_supp == 1, and in a qualifying order every late line belongs
    to the single late supplier, so numwait = SUM(n_late_lines) grouped
    by that supplier.  r13: the late lines' rollup rides the SAME
    aggregation (max(late suppkey) + sum(late flags)), so the old
    lineitem-cardinality re-shuffle + join of `lo WHERE is_late`
    against per_order is gone — Q21 is one lineitem-keyed hash
    aggregate, two broadcast joins over orders-cardinality rows, and a
    TakeOrdered over |suppliers| groups."""
    _tune(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    # orders('F') is 1/3 of orders — key+date columns broadcast fine at
    # bench scale, and on a real cluster AQE would pick this anyway
    lo = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late", late
    )
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late_supp"),
        # in a qualifying order (n_late_supp == 1) this IS the one late
        # supplier; sum of flags counts that supplier's late lines
        F.max(late_supp).alias("late_suppkey"),
        F.sum(F.col("is_late").cast("long")).alias("n_late_lines"),
    )
    qual = per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    out = (
        qual.join(F.broadcast(supplier), qual.late_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
    return out


@register(
    "tpch_q22",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_acctbal_c
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
          * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name ORDER BY n_name
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to the reduced
    schema: the spec groups dormant above-average-balance customers by
    phone country code; this corpus has no c_phone, so the grouping key
    is the customer's nation and "dormant" means no order since
    2000-01-01 (the spec's NOT EXISTS against all orders is empty here
    — every customer has historical orders).

    Scale shape: the above-average test cross-multiplies scaled-int
    (sum, count) — `bal·n > Σbal` — instead of comparing against a
    double AVG whose summation order differs between engines; the
    (sum, count) pair is one broadcast row.  The dormancy check is a
    broadcast ANTI join against the date-pruned orders scan; nation
    broadcasts; the final aggregation is ≤25 groups."""
    _tune(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    bal_c = F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5)).cast("long")
    stats = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_c).cast("long").alias("sum_bal_c"),
        F.count(F.lit(1)).alias("n_bal"),
    )
    recent = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    rich = (
        cust.join(F.broadcast(stats))
        .where(bal_c * F.col("n_bal") > F.col("sum_bal_c"))
        .join(
            F.broadcast(recent),
            cust.c_custkey == recent.o_custkey,
            "left_anti",
        )
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_c).cast("long").alias("total_acctbal_c"),
        )
        .transform(_sorted_small, "n_name")
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS decorrelates to
    a LEFT SEMI join on orderkey with the shipdate>orderdate residual —
    the date filter prunes orders before the shuffle, and the semi join
    stops probing an order at its first late lineitem.  (Adapted: the
    test lineitem has no commit/receipt dates; 'a lineitem shipped
    after the order date' plays the late-delivery predicate.)"""
    _tune(spark)
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .transform(_sorted_small, "o_orderpriority")
    )


@register(
    "tpch_q9",
    """
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_u
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, ship_year
    ORDER BY nation, ship_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): the
    fact table joins two broadcast dims and groups on a derived date
    part — (nation, year(shipdate)) — so the only shuffle is the final
    low-cardinality aggregate, whose partial combine runs map-side
    inside the scan stage.  (Adapted: no partsupp/ps_supplycost in the
    test schema, so revenue stands in for profit and the p_name filter
    is dropped.)"""
    _tune(spark)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    rev_u = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(rev_u).cast("long").alias("revenue_u"))
        .transform(_sorted_small, "nation", "ship_year")
    )


@register(
    "tpch_q16",
    """
    SELECT p_brand, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): exclusion
    subquery → broadcast LEFT ANTI join on the fact table before the
    part join, then COUNT(DISTINCT supplier) per brand — Catalyst
    expands the distinct aggregate into a two-stage
    (brand, suppkey)-keyed partial dedup so no group ever materializes
    its supplier set.  (Adapted: negative account balance plays the
    'complaints' supplier exclusion; no partsupp in the test schema.)"""
    _tune(spark)
    bad_supp = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .transform(_sorted_small, "p_brand")
    )


@register(
    "tpch_q12",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split): fact-fact
    equi-join on orderkey + two-way conditional count per group.  The
    lineitem side filters before the shuffle; both counts come from one
    CASE aggregation pass (no second join/scan).  (Adapted: returnflag
    plays the shipmode grouping; the test lineitem carries no
    shipmode/commit/receipt columns.)"""
    _tune(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .transform(_sorted_small, "l_returnflag")
    )


@register(
    "tpch_q19",
    """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_u
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    three brand/size/quantity branches OR-ed across both join sides.
    Catalyst extracts the common single-side conjuncts below the join
    (part prunes on brand∈{...} AND size≤35, lineitem on quantity
    BETWEEN 1 AND 30) so the broadcast probe sees only candidate rows;
    the cross-side residual evaluates post-join.  Revenue is the
    scaled-int sum (order-free).  (Adapted: no shipmode/container
    columns in the test schema — the disjunctive structure is the
    point.)"""
    _tune(spark)
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    qty = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (qty >= 1) & (qty <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & (qty >= 10) & (qty <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & (qty >= 20) & (qty <= 30))
    )
    rev_u = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(branch)
        .agg(F.sum(rev_u).cast("long").alias("revenue_u"))
    )
