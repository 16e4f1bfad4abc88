"""SURVEY §2.B — projection, filter, predicates (b1–b6).

All pure map-side operators: no shuffle, fully pipelined inside whole-stage
codegen, predicates pushed to the parquet scan (asserted in
tests/test_plans.py). These scale embarrassingly at 100 TB — per-task work
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.registry import register


# --- b1: projection with computed expressions ------------------------------
# Per-row double arithmetic is IEEE-deterministic: the same ops on the same
# doubles give bit-identical results in Spark and DuckDB, so no rounding
# (C3 refinement — rounding itself is the cross-engine divergence risk).
@register(
    "b1",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)               AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price,
           l_quantity * l_extendedprice / 100.0             AS qty_value
    FROM lineitem
    """,
)
def b1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
        (F.col("l_quantity") * F.col("l_extendedprice") / 100.0).alias("qty_value"),
    )


# --- b2: compound predicates: AND/OR/NOT, BETWEEN, IN ----------------------
@register(
    "b2",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') AND o_totalprice BETWEEN 50000 AND 250000)
       OR (NOT o_orderpriority = '5-LOW' AND o_totalprice > 400000)
    """,
)
def b2_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cond = (
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 250000)
    ) | (~(F.col("o_orderpriority") == "5-LOW") & (F.col("o_totalprice") > 400000))
    return o.filter(cond).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


# --- b3: LIKE patterns ------------------------------------------------------
@register(
    "b3",
    oracle="""
    SELECT p_partkey, p_name,
           (p_name LIKE '%red%')   AS has_red,
           (p_name LIKE 'small%')  AS is_small,
           (p_name LIKE '%ring')   AS ends_ring
    FROM part
    WHERE p_name LIKE '%e%'
    """,
)
def b3_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%e%")).select(
        "p_partkey",
        "p_name",
        F.col("p_name").like("%red%").alias("has_red"),
        F.col("p_name").startswith("small").alias("is_small"),
        F.col("p_name").endswith("ring").alias("ends_ring"),
    )


# --- b4: regex predicate (simple char classes — dialect-safe, C6) -----------
@register(
    "b4",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE regexp_matches(p_name, '^[a-f][a-z]* [a-z]+$')
      AND regexp_matches(p_brand, 'Brand#[12][0-9]')
    """,
)
def b4_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").rlike("^[a-f][a-z]* [a-z]+$")
        & F.col("p_brand").rlike("Brand#[12][0-9]")
    ).select("p_partkey", "p_name", "p_brand")


# --- b5: NULL semantics (nulls manufactured via left join) ------------------
@register(
    "b5",
    oracle="""
    SELECT c.c_custkey,
           (o.o_orderkey IS NULL)                          AS no_big_order,
           coalesce(o.o_totalprice, -1.0)                  AS price_or_default,
           nullif(c.c_mktsegment, 'BUILDING')              AS seg_or_null,
           (o.o_orderstatus IS NOT DISTINCT FROM 'P')      AS is_p_nullsafe
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def b5_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        F.col("o_orderkey").isNull().alias("no_big_order"),
        F.coalesce(F.col("o_totalprice"), F.lit(-1.0)).alias("price_or_default"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.col("o_orderstatus").eqNullSafe("P").alias("is_p_nullsafe"),
    )


# --- b6: conditional projection: CASE ladder, greatest, least ---------------
@register(
    "b6",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END                                    AS price_band,
           greatest(o_totalprice, 150000.0)                        AS floor_150k,
           least(o_totalprice, 150000.0)                           AS cap_150k
    FROM orders
    """,
)
def b6_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("floor_150k"),
        F.least("o_totalprice", F.lit(150000.0)).alias("cap_150k"),
    )


# --- b7: safe-evaluation family (try_cast / try_divide) -----------------------------
@register(
    "b7",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER)
             AS priority_num,
           TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS safe_ratio
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def b7_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe-evaluation surface: TRY_CAST of a numeric prefix (parses) and
    of a status letter (NULL, never an ANSI error), try_divide with a
    sometimes-zero divisor (NULL, not DivideByZero). Under Spark 4's
    default ANSI mode these are THE dirty-data ETL idioms — the plain
    cast/div would throw. DuckDB has no try_divide; the oracle's CASE
    states the identical semantics."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        "o_orderkey",
        F.split_part("o_orderpriority", F.lit("-"), F.lit(1))
            .try_cast("int").alias("priority_num"),
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
        F.try_divide("o_totalprice", F.col("o_orderkey") % 3).alias("safe_ratio"),
    )
