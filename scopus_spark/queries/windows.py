"""SURVEY §2.E — window functions (e1–e8).

Scale notes: every window below partitions by a key (customer/user/segment/
brand) — one shuffle on the partition key, then per-partition local sort;
no global single-partition window appears anywhere in the engine's hot
paths (f1's rank companion is the sole declared exception, documented
there). Tie-break rule (SURVEY §2.E): every ORDER BY is made total by
appending a unique key, so frames are deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.queries import _fp
from scopus_spark.registry import register


# --- e1: top-k per group via row_number ---------------------------------------
@register(
    "e1",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def e1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Catalyst pushes the rn<=3 filter into the
    window sort as a per-group limit (WindowGroupLimit) — no full sort
    materialization per group at scale."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- e2: rank / dense_rank with real ties ----------------------------------------
@register(
    "e2",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS drnk
    FROM part
    """,
)
def e2_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retail prices repeat within a brand (1000 distinct prices, 2000+
    parts) so rank vs dense_rank genuinely diverge; tie rows get equal
    ranks on both engines — deterministic without a total order."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


# --- e3: distribution functions ----------------------------------------------------
@register(
    "e3",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w           AS pct_rank,
           cume_dist() OVER w              AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def e3_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist emitted raw: with a total order both engines
    compute the identical integer ratio (IEEE division, _fp.py rationale)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --- e4: lag/lead with defaults -------------------------------------------------------
@register(
    "e4",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
           CAST(lag(floor(epoch(CAST(ts AS TIMESTAMP))), 1, 0)
                OVER w AS BIGINT)                        AS prev_ts_s,
           CAST(lead(floor(epoch(CAST(ts AS TIMESTAMP))), 1, 0)
                OVER w AS BIGINT)                        AS next_ts_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def e4_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ts_s = F.unix_timestamp("ts")
    return e.select(
        "event_id",
        "user_id",
        ts_s.alias("ts_s"),
        F.lag(ts_s, 1, 0).over(w).alias("prev_ts_s"),
        F.lead(ts_s, 1, 0).over(w).alias("next_ts_s"),
    )


# --- e5: running total (unbounded preceding -> current row) -----------------------------
@register(
    "e5",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(9,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def e5_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_fp.m("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


# --- e6: moving average, fixed row frame (3 preceding, current) ---------------------------
@register(
    "e6",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(9,2))) OVER w AS DOUBLE)
             / count(*) OVER w AS moving_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def e6_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average as exact-decimal frame sum / frame count — identical
    doubles on both engines without rounding (_fp.py)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-3, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(_fp.m("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


# --- e7: RANGE frame on a numeric key (trailing 600s per user) -----------------------------
@register(
    "e7",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
           CAST(sum(CAST(value AS DECIMAL(9,2)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_10m
    FROM events
    """,
)
def e7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-minute value sum per user — RANGE frame over epoch
    seconds. Equal timestamps share a frame (RANGE semantics), so no
    tie-break is needed for determinism."""
    e = table(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_s)
        .rangeBetween(-600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        ts_s.alias("ts_s"),
        F.sum(_fp.m("value")).over(w).cast("double").alias("sum_10m"),
    )


# --- e8: first_value / last_value / nth_value with explicit frames --------------------------
@register(
    "e8",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           first_value(c_acctbal) OVER w  AS seg_min_bal,
           last_value(c_acctbal)  OVER w  AS seg_max_bal,
           nth_value(c_acctbal, 3) OVER w AS seg_third_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def e8_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_acctbal").over(w).alias("seg_min_bal"),
        F.last("c_acctbal").over(w).alias("seg_max_bal"),
        F.nth_value("c_acctbal", 3).over(w).alias("seg_third_bal"),
    )


# --- e9: running distinct count (the COUNT(DISTINCT) OVER gap) -----------------------
@register(
    "e9",
    oracle="""
    SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, event_id,
           CAST(count(DISTINCT event_type) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS INT) AS n_distinct_types
    FROM events
    """,
)
def e9_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count of event types per user over time — a
    window Spark does NOT support natively (COUNT(DISTINCT) OVER raises
    in Catalyst); the idiomatic rendering is size(collect_set() OVER).
    The set stays bounded by the event-type cardinality (an enum), so
    per-row state is small; for unbounded-cardinality columns the right
    tool is a windowed sketch, not this. Ordering is (µs timestamp,
    event_id) — unique, so the running frame cuts identically on both
    engines (the oracle orders by epoch_us(ts), matching the G1 shim's
    truncation, never the raw ns order)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_distinct_types"),
    )


# --- e10: SCD Type-2 dimension build (validity intervals from change events) ---------
@register(
    "e10",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT * FROM marked WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           event_type AS attr,
           make_timestamp(epoch_us(ts)) AS effective_from,
           make_timestamp(epoch_us(lead(ts) OVER w)) AS effective_to,
           CAST(row_number() OVER w AS INT) AS version,
           (lead(ts) OVER w) IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def e10_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build — the warehouse ETL staple:
    from a change-event feed, one half-open validity interval
    [effective_from, effective_to) per RUN of equal attribute values per
    key, with version numbers and the is_current flag (effective_to NULL
    on the open run). Two steps, both over the SAME (user_id; ts,
    event_id) window: lag() marks run starts (consecutive-duplicate
    collapse — the gaps-and-islands reduction), then lead()/row_number()
    over the surviving run-start rows close each interval at the next
    run's start. Ordering is made total by appending the unique event_id,
    so interval boundaries are deterministic on both engines.

    Scale: both windows hash-partition on user_id — ONE shuffle (Catalyst
    reuses the partitioning across the two sorts since the keys match);
    no global sort, no self-join (the naive SCD2 rendering joins the feed
    to itself on "next change", which is a second corpus shuffle this
    formulation never pays). At 100 TB the run-collapse drops the row
    count BEFORE the second window's sort buffers see it. Incremental
    maintenance composes with a19's keyed MERGE: re-derive intervals only
    for keys present in the new batch, upsert, and the is_current row of
    an unchanged key is never rewritten."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    return changes.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w).alias("effective_to"),
        F.row_number().over(w).cast("int").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
