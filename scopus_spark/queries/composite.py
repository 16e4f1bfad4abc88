"""SURVEY §2 composite analytics queries (ADDED during build, round 1) —
classic TPC-H report shapes beyond the q1/q3/q5/q6 bench set, adapted to
this corpus's columns (FIXTURES.md; no commit/receipt dates, no shipmode).

These compose the §2.C/§2.D/§2.M primitives into the multi-table report
plans a warehouse user actually runs: q10 (returned-item revenue top-k),
q14 (promo revenue share), q18 (large-volume orders via IN + HAVING);
round 3 adds q4 (EXISTS + priority counts), q7 (two-nation volume
shipping), q8 (regional market share), q19 (disjunctive band predicates).
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


# --- q4: order-priority checking (adapted: EXISTS on returned lines) -----------------
@register(
    "q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (priority counts behind an EXISTS), adapted: the
    corpus has no commit/receipt dates, so the correlated predicate is
    'has a returned line'. The EXISTS decorrelates to a left-semi join on
    o_orderkey; lineitem's returnflag filter is pushed to its scan, orders
    is date-pruned — at 100 TB both sides arrive pre-filtered at one
    shuffle each."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- q7: volume shipping between two nations ----------------------------------------
@register(
    "q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(9,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.
    The two nation joins broadcast; the disjunctive nation pair filter
    applies after them (Catalyst pushes each side's IsIn(NATION_3,
    NATION_7) down through the join into both scans); the two fact joins
    shuffle once each on their keys."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (_fp.m("l_extendedprice") * (1 - _fp.s("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_fp.dsum(F.col("volume"), "revenue"))
    )


# --- q8: regional market share ------------------------------------------------------
@register(
    "q8",
    oracle="""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_region = 'ASIA' THEN volume
                         ELSE CAST(0 AS DECIMAL(9,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(9,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
             r.r_name AS supp_region
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_sales
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: ASIA's share of PROMO-part revenue per order year
    (adapted: the corpus ships no p_container/o_shippriority, and share is
    by supplier region). Five joins — part/nation/region broadcast,
    lineitem-orders shuffle; numerator and denominator accumulate in exact
    decimal within ONE aggregation so the share divides identical doubles
    (C3: emit the ratio raw)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    li = table(spark, sf_dir, "lineitem")
    vol = _fp.m("l_extendedprice") * (1 - _fp.s("l_discount"))
    asia_vol = F.when(F.col("r_name") == "ASIA", vol).otherwise(
        F.lit(0).cast(_fp.MONEY)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            asia_vol.alias("asia_volume"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum("asia_volume").cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


# --- q19: disjunctive band-predicate revenue ----------------------------------------
@register(
    "q19",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue over three OR'd (brand, size-band,
    quantity-band) predicates spanning both join sides. Catalyst extracts
    the common constraints it can push (brand IN (...) to part's scan,
    quantity range to lineitem's); the residual disjunction evaluates
    post-join on the broadcast-joined rows — the classic test that OR
    predicates don't force a cartesian or kill pushdown."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    band = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            band("Brand#1", 1, 15, 1, 20)
            | band("Brand#2", 10, 30, 10, 30)
            | band("Brand#3", 20, 50, 20, 40)
        )
        .agg(
            _fp.dsum(_fp.m("l_extendedprice") * (1 - _fp.s("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
