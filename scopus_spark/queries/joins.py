"""SURVEY §2.C — join operators (c1–c12) + bench star queries.

Reference capability: the relational analysis tier joins the normalized
bibliographic tables (publications ⋈ authors ⋈ affiliations; citation-edge
self-joins) — SURVEY §1.1 [U]. Here every join is a Catalyst-planned
DataFrame join; the physical strategy notes on each operator are the 100 TB
contract:

- Bounded dims are explicitly broadcast (`F.broadcast`) — fact-table scans
  never shuffle for them.
- Fact-fact joins (c12 self-join) shuffle on the join key; AQE skew
  splitting stays on.
- Non-equi joins (c9) are broadcast-nested-loop ONLY because one side is a
  bounded dim; the docstring states the at-scale rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.queries import _fp
from scopus_spark.registry import register


# --- c1: inner equi-join ------------------------------------------------------
@register(
    "c1",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def c1_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer is bounded per-SF → broadcast-hash join, no shuffle of orders."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# --- c2: left outer join --------------------------------------------------------
@register(
    "c2",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def c2_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# --- c3: right outer join --------------------------------------------------------
@register(
    "c3",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def c3_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "right").select(
        "o_orderkey", "o_custkey", "c_name"
    )


# --- c4: full outer join (sort-merge — no broadcast possible) ---------------------
@register(
    "c4",
    oracle="""
    SELECT f.o_custkey AS fk, f.n_f, o.o_custkey AS ok, o.n_o
    FROM (SELECT o_custkey, count(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
    FULL JOIN (SELECT o_custkey, count(*) AS n_o FROM orders
               WHERE o_orderstatus = 'O' GROUP BY o_custkey) o
      ON f.o_custkey = o.o_custkey
    """,
)
def c4_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    f_side = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_f"))
        .alias("f")
    )
    o_side = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_o"))
        .alias("o")
    )
    return f_side.join(
        o_side, F.col("f.o_custkey") == F.col("o.o_custkey"), "full"
    ).select(
        F.col("f.o_custkey").alias("fk"),
        "n_f",
        F.col("o.o_custkey").alias("ok"),
        "n_o",
    )


# --- c5: left semi join (EXISTS) ----------------------------------------------------
@register(
    "c5",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def c5_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --- c6: left anti join (NOT EXISTS) --------------------------------------------------
@register(
    "c6",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def c6_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- c7: explicit cross join -----------------------------------------------------------
@register(
    "c7",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def c7_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join declared ONLY between fixed-cardinality dims (5x25); a
    cross join with a fact table is never planned by this engine."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --- c8: 6-table star join (TPC-H Q5 shape) ----------------------------------------------
@register(
    "c8",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def c8_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier revenue by nation.

    Join order: lineitem (fact) survives one shuffle join against orders;
    every dim (customer/supplier/nation/region) is broadcast. At 100 TB
    orders⋈lineitem co-partitioning (bucketing on orderkey) removes the
    remaining shuffle; here AQE handles it.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _fp.dsum(
                _fp.m("l_extendedprice") * (1 - _fp.s("l_discount")), "revenue"
            )
        )
    )


# --- q3: TPC-H Q3 shipping priority (bench headline; c8-lite shape) -----------------------
@register(
    "q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _fp.dsum(
                _fp.m("l_extendedprice") * (1 - _fp.s("l_discount")), "revenue"
            )
        )
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .limit(10)
    )


# --- c9: theta/range join (non-equi) --------------------------------------------------------
@register(
    "c9",
    oracle="""
    SELECT b.bucket_lo, b.bucket_hi, count(*) AS n_parts,
           CAST(sum(CAST(p.p_retailprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_price
    FROM (VALUES (900.0, 925.0), (925.0, 950.0), (950.0, 975.0), (975.0, 1000.0))
         AS b(bucket_lo, bucket_hi)
    JOIN part p ON p.p_retailprice >= b.bucket_lo AND p.p_retailprice < b.bucket_hi
    GROUP BY b.bucket_lo, b.bucket_hi
    """,
)
def c9_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-containment join: part prices into price buckets.

    Physical: broadcast-nested-loop with the 4-row bucket table broadcast —
    the only sane plan for non-equi conditions. At scale the rule stands:
    the banded side must be bounded/broadcastable, or the bands must be
    discretized into equi-join keys first.
    """
    p = table(spark, sf_dir, "part")
    buckets = spark.createDataFrame(
        [(900.0, 925.0), (925.0, 950.0), (950.0, 975.0), (975.0, 1000.0)],
        "bucket_lo double, bucket_hi double",
    )
    return (
        p.join(
            F.broadcast(buckets),
            (p.p_retailprice >= buckets.bucket_lo)
            & (p.p_retailprice < buckets.bucket_hi),
        )
        .groupBy("bucket_lo", "bucket_hi")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(_fp.m("p_retailprice")).cast("double").alias("sum_price"),
        )
    )


# --- c10: as-of join (time-series) ------------------------------------------------------------
@register(
    "c10",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           e.ts AS event_ts, e.event_id
    FROM (SELECT * FROM orders WHERE o_custkey <= 150) o
    ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
                    FROM events) e
      ON o.o_custkey = e.user_id
     AND e.ts <= o.o_orderdate + INTERVAL 9000 DAY
    """,
)
def c10_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each order matched to the customer's latest event at or
    before (orderdate + 9000d) — the shift overlaps the 1995-2001 order dates
    with the 2024 event timestamps so matches actually occur.

    Spark 4 has no native ASOF JOIN. Engine strategy (SURVEY §4): range-join
    + per-left-row max_by — one equi-shuffle on the key column, then a hash
    aggregate keyed by the left row; no window over the full union needed.
    Ties on ts broken by event_id (max_by on (ts, event_id) struct) to stay
    deterministic (C5). At 100 TB both sides shuffle once on user_id;
    per-key data is then local, and AQE splits skewed users.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 150)
    e = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts"), "event_id"
    )
    cutoff = F.col("o_orderdate") + F.expr("INTERVAL 9000 DAY")
    joined = o.join(
        e, (o.o_custkey == e.user_id) & (e.ts <= cutoff), "left"
    )
    return joined.groupBy(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).agg(
        F.max("ts").alias("event_ts"),
        F.max_by("event_id", F.struct(F.col("ts"), F.col("event_id"))).alias(
            "event_id"
        ),
    )


# --- c11: broadcast-hint variant (plan-shape asserted in tests) ---------------------------------
@register("c11")
def c11_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same rows as c8 with explicit broadcast hints; tests/test_plans.py
    asserts BroadcastHashJoin is actually chosen (UNIT row per SURVEY §2.C)."""
    return c8_star_join(spark, sf_dir)


# --- c12: self-join (events within 1h per user — citation-edge shape) ---------------------------
@register(
    "c12",
    oracle="""
    SELECT a.event_id AS eid_a, b.event_id AS eid_b, a.user_id,
           CAST(date_diff('second', CAST(a.ts AS TIMESTAMP),
                          CAST(b.ts AS TIMESTAMP)) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def c12_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-pairs within 1h per user (the reference's citation-graph
    self-join shape over its reference-edges table, re-keyed to events).

    Equi-condition on user_id carries the shuffle; the range condition
    filters inside each key group. Skewed users are the risk at scale —
    AQE skew-join splitting is the mitigation.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    a = ev.alias("a")
    b = ev.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("a.event_id").alias("eid_a"),
        F.col("b.event_id").alias("eid_b"),
        F.col("a.user_id").alias("user_id"),
        (
            F.unix_timestamp(F.col("b.ts")) - F.unix_timestamp(F.col("a.ts"))
        ).alias("gap_s"),
    )


# --- c13: skew-salted equi-join (result-identical to the plain join) -----------------
@register(
    "c13",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           sum(l.l_quantity)        AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def c13_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact join (operators/partitioning.py::salted_join):
    the big side's hot keys split across 8 deterministic salt
    sub-partitions (xxhash64 of l_linenumber — never rand(), which
    breaks retries), the small side replicated 8x. The HASH gate proves
    the mitigation is semantically invisible: same result as the plain
    join the oracle runs. This is the no-AQE-dependency answer to a hot
    key at 100 TB; AQE skew splitting is the runtime fallback."""
    from scopus_spark.operators.partitioning import salted_join

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        o,
        key="o_orderkey",
        salt_from="l_linenumber",
        salt_factor=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("l_quantity").alias("sum_qty"),
    )


# --- c14: bucketed co-located join (shuffle-free fact-fact join) ---------------------
@register(
    "c14",
    oracle="""
    SELECT o.o_custkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           sum(l.l_quantity)        AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    """,
)
def c14_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join — the layout investment that
    removes the join shuffle entirely at 100 TB: both fact tables are
    written bucketed+sorted on the join key into the same bucket count
    (operators/partitioning.py::write_bucketed), so the sort-merge join
    reads co-located buckets with no Exchange on either side
    (plan-asserted in tests/test_partitioning.py; at corpus test sizes
    AQE may still broadcast one side — the policy, not a defect). The
    HASH gate proves the bucketed layout is semantically invisible vs
    the oracle's plain join. Tables are pid-scoped and idempotently
    rebuilt per run."""
    import os

    from scopus_spark.operators.partitioning import bucketed_join, write_bucketed

    pid = os.getpid()
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    t_li = f"c14_li_{sf_tag}_{pid}"
    t_o = f"c14_ord_{sf_tag}_{pid}"
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_quantity"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_custkey"
    )
    write_bucketed(li, t_li, "orderkey", n_buckets=8, sort_col="orderkey")
    write_bucketed(o, t_o, "orderkey", n_buckets=8, sort_col="orderkey")
    return (
        bucketed_join(spark, t_li, t_o, on="orderkey")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


# --- c15: binned interval join (range join without an equi key) ----------------------
_C15_BIN_US = 3_600_000_000  # 1-hour bins == the join interval


@register(
    "c15",
    oracle=f"""
    WITH e AS (
      SELECT event_id, event_type, epoch_us(ts) AS us FROM events
    )
    SELECT a.event_id            AS purchase_id,
           b.event_id            AS click_id,
           CAST(b.us - a.us AS BIGINT) AS gap_us
    FROM (SELECT * FROM e WHERE event_type = 'purchase') a
    JOIN (SELECT * FROM e WHERE event_type = 'click') b
      ON b.us > a.us AND b.us <= a.us + {_C15_BIN_US}
    """,
)
def c15_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with NO equi key (every purchase to every click in
    the following hour, across all users — cross-stream time
    correlation). A naive plan is a broadcast-nested-loop / cartesian
    filter — quadratic, the thing that melts first at 100 TB. The binned
    rendering turns it into an EQUI-join: both sides bucket into
    1-hour-epoch bins, each probe row explodes into its two candidate
    bins (its own and the next — a 1h window can only span two 1h bins),
    the join runs on bin equality, and the exact range predicate
    re-verifies. Each qualifying pair matches in exactly ONE bin (the
    match's bin is the click's), so no dedup is needed and the hash gate
    proves the rewrite is lossless vs the oracle's plain non-equi join.
    Fan-out is a constant 2x on one side; the join shuffles on a
    time-uniform key (bins), and AQE splits any hot bin."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), us.alias("a_us")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        us.alias("b_us"),
        F.floor(us / _C15_BIN_US).alias("bin"),
    )
    a_binned = pur.withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.col("a_us") / _C15_BIN_US),
                F.floor(F.col("a_us") / _C15_BIN_US) + 1,
            )
        ),
    )
    return (
        a_binned.join(clk, "bin")
        .filter(
            (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") <= F.col("a_us") + _C15_BIN_US)
        )
        .select(
            "purchase_id",
            "click_id",
            (F.col("b_us") - F.col("a_us")).alias("gap_us"),
        )
    )


# --- c16: as-of join (latest prior click per purchase) -------------------------------
@register(
    "c16",
    oracle="""
    WITH c0 AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    c AS (
      SELECT c0.user_id, c0.ts, c0.click_id, e.value AS click_value
      FROM c0 JOIN events e ON e.event_id = c0.click_id
    ),
    p AS (
      SELECT event_id AS p_id, user_id, ts, value AS p_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.p_id, p.user_id, p.p_value,
           c.click_id                                   AS asof_click_id,
           c.click_value                                AS asof_click_value,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS us_since_click
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def c16_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — the time-series join Spark lacks natively (the brief's
    named example of an operator to compose): every purchase matched to
    the SAME USER's latest click at-or-before it, NULL when none.
    Spark side = operators/asof.py's union + one per-user time-ordered
    window (each side shuffles once on user_id; right payload rides as one
    struct, so window state is O(1)); oracle = DuckDB's NATIVE ``ASOF LEFT
    JOIN`` — a hash match proves the composition implements the real
    operator's semantics, boundary instants and all. Clicks pre-deduped to
    one per (user, ts) by max event_id on BOTH engines (the determinism
    caveat native ASOF shares)."""
    from scopus_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by(F.struct("event_id", "value"), "event_id").alias("_c"))
        .select(
            "user_id",
            "ts",
            F.col("_c.event_id").alias("click_id"),
            F.col("_c.value").alias("click_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    joined = asof_join(
        purchases,
        clicks.withColumnRenamed("ts", "c_ts"),
        on=["user_id"],
        left_ts="p_ts",
        right_ts="c_ts",
        right_cols=["click_id", "click_value", "c_ts"],
    )
    return joined.select(
        "p_id",
        "user_id",
        "p_value",
        F.col("asof_click_id").alias("asof_click_id"),
        F.col("asof_click_value").alias("asof_click_value"),
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_c_ts").cast("timestamp"))
        ).alias("us_since_click"),
    )


# --- c17: runtime Bloom-filter join pruning ------------------------------------------
@register(
    "c17",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size < 5
    GROUP BY l_returnflag
    """,
)
def c17_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning — the shuffle-join regime where
    the dim side is TOO BIG to broadcast (the 100 TB reality for
    customer/part-sized dims, simulated here by a session-scoped
    autoBroadcastJoinThreshold=-1): Catalyst's InjectRuntimeFilter builds
    a bloom_filter_agg over the FILTERED dim keys (p_size < 5 keeps ~10%
    of parts) and injects might_contain(l_partkey) into the fact side
    BEFORE its shuffle, so ~90% of lineitem rows drop at the scan instead
    of crossing the wire — the runtime analogue of a15's dynamic
    partition pruning, but row-level and layout-independent. The bloom
    configs live on a spark.newSession() clone (shared SparkContext, own
    SQLConf), so the shared session's planning — every other key in a
    soak — is untouched, and they stay in force for the returned
    DataFrame's own execution. tests/test_plans.py asserts
    bloom_filter_agg + might_contain appear in the executed plan and the
    broadcast regime really was off. At 100 TB the creation-side
    threshold guards the build cost: the filter is built map-side in one
    pass over the already-filtered dim and OR-merged at the driver
    (bytes ~ 8M bits default), then shipped with the fact scan tasks."""
    ns = spark.newSession()
    for k in (
        "spark.sql.shuffle.partitions",
        "spark.sql.session.timeZone",
    ):
        ns.conf.set(k, spark.conf.get(k))
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = table(ns, sf_dir, "lineitem")
    part = table(ns, sf_dir, "part").filter(F.col("p_size") < 5)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )
