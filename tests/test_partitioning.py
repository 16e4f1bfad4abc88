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


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """AQE's runtime skew mitigation — the complement to the deterministic
    salted join above: a 90%-hot key must come out of the shuffle as a
    SortMergeJoin(skew=true) with the hot partition split
    (AQEShuffleRead ... skewed), not one straggler task. Thresholds are
    lowered so a local-scale hot key crosses them; at 100 TB the defaults
    (256MB partition, factor 5) trigger on real boilerplate/tenant skew."""
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 600_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        right = spark.range(0, 600_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("w")
        )
        j = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        [row] = j.collect()
        # exact check: hot rows (id%10!=0) all match right k=0 (w=0), so
        # s = sum(2*id for id%10!=0) + sum(2*id + id%7 for id%10==0)
        hot = sum(2 * i for i in range(600_000) if i % 10 != 0)
        cold = sum(2 * i + i % 7 for i in range(0, 600_000, 10))
        assert row.s == hot + cold
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
