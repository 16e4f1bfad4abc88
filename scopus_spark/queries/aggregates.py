"""SURVEY §2.D — aggregation operators (d1–d14).

Reference capability: the RDBMS analysis tier of the scopus ETL pipeline
(SURVEY §1.1 [U]; mount empty, §0.1) — GROUP BY analytics over the
normalized bibliographic schema. Re-expressed here as Spark hash aggregates:
Catalyst plans partial (map-side) + final aggregation automatically, so
every groupBy below is one shuffle on the grouping keys and scales linearly
with executors.

Conventions: C3 round(·,4) on floating outputs, identical aliases both
sides (C2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.queries import _fp
from scopus_spark.registry import register


# --- d1: global aggregate, no grouping (TPC-H Q6 shape) ---------------------
@register(
    "d1",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def d1_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate with range predicates.

    Physical plan: parquet scan with pushed predicates -> partial agg per
    partition -> single-row final agg. No wide shuffle; at 100 TB the only
    cross-node traffic is one partial-agg row per task. Money sums use
    exact-decimal accumulation (_fp.py) so the value is partition-order-free.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _fp.dsum(_fp.m("l_extendedprice") * _fp.s("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- d2: multi-key, multi-expression hash aggregate (TPC-H Q1 shape) --------
Q1_CUTOFF = "1998-09-02"

@register(
    "d2",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE)        AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)   AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)      AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / count(*), 4)      AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4)      AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d2_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: 8 aggregate expressions over 2 grouping keys.

    The engine's flagship query (entry()). Catalyst plans this as
    scan -> partial hash agg -> shuffle(2 keys, tiny) -> final hash agg,
    all inside whole-stage codegen; the shuffle carries only
    |groups| x |partitions| rows regardless of input size. Money sums are
    exact-decimal (_fp.py); averages are exact-sum / count rounded at 4dp.
    """
    li = table(spark, sf_dir, "lineitem")
    qty, price, disc = _fp.m("l_quantity"), _fp.m("l_extendedprice"), _fp.s("l_discount")
    disc_price = price * (1 - disc)
    charge = disc_price * (1 + _fp.s("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _fp.dsum(qty, "sum_qty"),
            _fp.dsum(price, "sum_base_price"),
            _fp.dsum(disc_price, "sum_disc_price"),
            _fp.dsum(charge, "sum_charge"),
            F.round(F.sum(qty).cast("double") / n, 4).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / n, 4).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )
