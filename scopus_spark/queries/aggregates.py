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
from scopus_spark.registry import register


# --- d1: global aggregate, no grouping (TPC-H Q6 shape) ---------------------
@register(
    "d1",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
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
    cross-node traffic is one partial-agg row per task.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- d2: multi-key, multi-expression hash aggregate (TPC-H Q1 shape) --------
Q1_CUTOFF = "1998-09-02"

@register(
    "d2",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                            AS sum_qty,
           round(sum(l_extendedprice), 4)                                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                    AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)      AS sum_charge,
           round(avg(l_quantity), 4)                                            AS avg_qty,
           round(avg(l_extendedprice), 4)                                       AS avg_price,
           round(avg(l_discount), 4)                                            AS avg_disc,
           count(*)                                                             AS count_order
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
    |groups| x |partitions| rows regardless of input size.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
