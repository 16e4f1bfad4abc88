"""SURVEY §2 composite analytics queries (ADDED during build, round 1) —
classic TPC-H report shapes beyond the q1/q3/q5/q6 bench set, adapted to
this corpus's columns (FIXTURES.md; no commit/receipt dates, no shipmode).

These compose the §2.C/§2.D/§2.M primitives into the multi-table report
plans a warehouse user actually runs: q10 (returned-item revenue top-k),
q14 (promo revenue share), q18 (large-volume orders via IN + HAVING).
Money aggregation follows _fp (exact decimal accumulate, double emit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.queries import _fp
from scopus_spark.registry import register


# --- q10: returned-item revenue report ------------------------------------------------
@register(
    "q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned lines in a
    quarter. Plan: lineitem filtered at the scan, orders date-pruned, both
    big sides shuffle on the join keys, nation broadcast; the top-20 is
    TakeOrderedAndProject after the final agg (no global sort). Tie-break
    on c_custkey keeps the LIMIT cut deterministic (exact-decimal revenue
    makes ties engine-identical)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_fp.dsum(_fp.m("l_extendedprice") * (1 - _fp.s("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .limit(20)
    )


# --- q14: promo revenue share ---------------------------------------------------------
@register(
    "q14",
    oracle="""
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(9,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(4,2))) END)
                AS DOUBLE) * 100
           / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(9,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of a quarter's revenue from PROMO parts.
    Conditional aggregation over one broadcast join (part is the bounded
    dim). Both sums accumulate in exact decimal; the final *100/div runs on
    identical doubles in both engines, so the ratio is emitted raw (C3)."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = _fp.m("l_extendedprice") * (1 - _fp.s("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
    total = F.sum(rev).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((promo * 100 / total).alias("promo_revenue_pct"))
    )


# --- q18: large-volume orders ---------------------------------------------------------
@register(
    "q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300, with customer
    detail. The IN + HAVING subquery becomes an aggregate -> left-semi join
    on o_orderkey; the quantity re-aggregation reuses the same shuffle key.
    l_quantity is integer-valued so the HAVING threshold is exact in any
    partition order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
