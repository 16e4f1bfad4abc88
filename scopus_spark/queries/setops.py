"""SURVEY §2.G — set operations & deduplication (g1–g6).

Spark maps set-semantics ops onto aggregates/joins underneath (distinct →
hash aggregate on all columns; intersect/except → left-semi/anti); bag union
is a zero-shuffle concatenation of partitions. Keyed dedup (g6) uses
deterministic min/min_by — never dropDuplicates(subset), which keeps an
arbitrary row (convention C5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.registry import register


def _hi(spark, sf_dir):  # orders slice A: expensive
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


def _urgent(spark, sf_dir):  # orders slice B: urgent (overlaps A)
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


_HI_SQL = "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 350000"
_URGENT_SQL = "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'"


# --- g1: UNION ALL (bag semantics — duplicates kept) -------------------------
@register("g1", oracle=f"{_HI_SQL} UNION ALL {_URGENT_SQL}")
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hi(spark, sf_dir).unionAll(_urgent(spark, sf_dir))


# --- g2: UNION (set semantics) -----------------------------------------------
@register("g2", oracle=f"{_HI_SQL} UNION {_URGENT_SQL}")
def g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hi(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


# --- g3: INTERSECT -----------------------------------------------------------
@register(
    "g3",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.intersect(o_cust)


# --- g4: EXCEPT (set) --------------------------------------------------------
@register(
    "g4",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def g4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    all_cust = o.select("o_custkey")
    p_cust = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return all_cust.subtract(p_cust)


# --- g5: full-row DISTINCT ---------------------------------------------------
@register("g5", oracle="SELECT DISTINCT text, lang FROM documents")
def g5_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select("text", "lang").distinct()


# --- g6: deterministic keyed dedup (keep min doc_id per text) ----------------
@register(
    "g6",
    oracle="""
    SELECT text,
           min(doc_id)              AS keep_doc_id,
           arg_min(source, doc_id)  AS keep_source,
           count(*)                 AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def g6_keyed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per text, deterministically the min-doc_id copy (C5).

    At 100 TB this is the canonical exact-dedup shape: one shuffle on the
    dedup key, map-side partial min/min_by, no row explosion.
    """
    d = table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.min_by("source", "doc_id").alias("keep_source"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# --- g7: INTERSECT ALL (bag semantics) ---------------------------------------------
@register(
    "g7",
    oracle=f"{_HI_SQL} INTERSECT ALL {_URGENT_SQL}",
)
def g7_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection: each row kept min(m, n) times across the two
    multisets — distinct from g3's set semantics. Spark plans a shuffled
    count-matching aggregate (no row explosion)."""
    return _hi(spark, sf_dir).intersectAll(_urgent(spark, sf_dir))


# --- g8: EXCEPT ALL (bag semantics) ------------------------------------------------
@register(
    "g8",
    oracle=f"{_HI_SQL} EXCEPT ALL {_URGENT_SQL}",
)
def g8_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: multiplicities subtract (max(m - n, 0)) instead of
    g4's whole-row removal."""
    return _hi(spark, sf_dir).exceptAll(_urgent(spark, sf_dir))
