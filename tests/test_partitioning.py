"""Bucketing + salting behavior (operators/partitioning.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.operators.partitioning import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_elides_exchange(spark, sf_dir):
    """orders ⋈ lineitem pre-bucketed on the join key: the join plan must
    contain NO shuffle Exchange — the 100 TB co-location strategy."""
    write_bucketed(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", n_buckets=8, sort_col="o_orderkey",
    )
    write_bucketed(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", n_buckets=8, sort_col="l_orderkey",
    )
    # Force the fact-fact shape: at test SFs the planner would broadcast the
    # small side (disabling bucketed reads); at 100 TB neither side fits.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # sanity: result matches the unbucketed join
    expected = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change join semantics, only key distribution."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").count()
    salted = salted_join(
        li, o, key="l_orderkey", salt_from="l_linenumber", salt_factor=4
    ).count()
    assert salted == plain


def test_salted_join_spreads_keys(spark, sf_dir):
    """The salt column must actually split a hot key's rows."""
    li = table(spark, sf_dir, "lineitem").limit(1000)
    salted = li.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("l_linenumber")), F.lit(4))
    )
    n_salts = salted.select("_salt").distinct().count()
    assert n_salts == 4
