"""SURVEY §2.M (added during build, round 1) — subqueries & lateral joins
(l1–l7): the decorrelation surface of the engine.

These are declared through the SQL entry point (E2, SURVEY §3.2) on
purpose: scalar/EXISTS/IN/NOT-IN subqueries and LATERAL are *language*
surface whose execution hinges on Catalyst's rewrites —
RewritePredicateSubquery (EXISTS/IN -> left-semi, NOT IN -> null-aware
anti join), RewriteCorrelatedScalarSubquery (correlated scalar -> aggregate
+ left outer join), and DecorrelateInnerQuery for lateral subqueries. A
100 TB plan never executes a subquery per-row; the rewrites turn every one
of these into the same join/agg shapes as §2.C/§2.D, which is exactly what
the plan-shape tests assert.

FP discipline (C3): scalar thresholds are made exact — money comparisons
multiply through by count(*) in exact DECIMAL instead of dividing
(l1), and l2's per-part avg is exact because l_quantity is integer-valued
(sums of small integers in double are order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scopus_spark.catalog import register_views
from scopus_spark.registry import register


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


# --- l1: uncorrelated scalar subqueries (above-average orders) ----------------------
_L1 = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
          > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
"""


@register("l1", oracle=_L1)
def l1_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price. Two uncorrelated scalar
    subqueries; Catalyst executes each once and broadcasts the scalar into
    the filter (no per-row re-evaluation). The avg threshold is expressed
    as an exact decimal cross-multiplication so both engines compare
    identical exact values (C3)."""
    return _sql(spark, sf_dir, _L1)


# --- l2: correlated scalar subquery (TPC-H Q17 shape) -------------------------------
_L2 = """
    SELECT count(*) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
"""


@register("l2", oracle=_L2)
def l2_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity lineitems vs their part's average
    quantity. Catalyst decorrelates the scalar subquery into a per-part
    aggregate joined back to lineitem — one agg + one join, not a per-row
    subquery. Threshold is deterministic cross-engine: l_quantity is
    integer-valued, so its double sum is exact in any partition order."""
    return _sql(spark, sf_dir, _L2)


# --- l3: IN subquery -> left-semi join ---------------------------------------------
_L3 = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT'
                          AND o_totalprice > 250000)
"""


@register("l3", oracle=_L3)
def l3_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery, rewritten by RewritePredicateSubquery into a left-semi
    join (same physical shape as c5, arrived at from SQL)."""
    return _sql(spark, sf_dir, _L3)


# --- l4: correlated EXISTS (TPC-H Q4 shape) ----------------------------------------
# The corpus lineitem has no commit/receipt dates, so "late order" is
# expressed as: some line shipped more than 60 days after the order date.
_L4 = """
    SELECT o.o_orderpriority, count(*) AS n_late_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
"""


@register("l4", oracle=_L4)
def l4_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders with a late-shipping
    line. The correlated EXISTS carries a non-equi conjunct
    (l_shipdate > o_orderdate + 60 days), which still decorrelates to a
    left-semi join with a post-join condition."""
    return _sql(spark, sf_dir, _L4)


# --- l5: NOT IN -> null-aware anti join --------------------------------------------
_L5 = """
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation
                              WHERE n_name LIKE 'A%')
"""


@register("l5", oracle=_L5)
def l5_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — the null-aware anti-join rewrite (a plain anti
    join is wrong if the subquery can yield NULL; n_nationkey is non-null
    here so both engines agree, but the plan is the null-aware variant)."""
    return _sql(spark, sf_dir, _L5)


# --- l6: LATERAL correlated subquery with LIMIT (top-k per group) -------------------
_L6 = """
    SELECT n.n_name, top.c_name, top.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2
    ) top
"""


@register("l6", oracle=_L6)
def l6_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by balance per nation via a LATERAL correlated
    subquery with ORDER BY ... LIMIT — the SQL spelling of e1's
    window-top-k. Catalyst decorrelates it into a partitioned rank filter,
    NOT a per-nation re-scan. Tie-break on c_name keeps the order total
    (window-oracle convention, §2.E)."""
    return _sql(spark, sf_dir, _L6)


# --- l7: LATERAL VIEW posexplode (SQL table-generating function) --------------------
@register(
    "l7",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) + 1), i -> i - 1)) AS pos,
           unnest(w) AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
    """,
)
def l7_lateral_view_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style LATERAL VIEW posexplode through the SQL entry point —
    ordinality-preserving fan-out (h2 is the DataFrame spelling, without
    position). The DuckDB oracle zips two parallel unnests for the same
    (pos, word) rows."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT doc_id, pos, word
        FROM documents
        LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
        """,
    )


# --- l8: recursive CTE (linear chain walk over the next-event graph) -----------------
# Both engines run genuine WITH RECURSIVE fixpoint iteration (Spark 4's
# recursive-CTE operator is UNION ALL-only, so the walked graph must be
# acyclic; the next-event edge is strictly time-increasing, hence a DAG,
# and functional — out-degree <= 1 — so row volume per level is bounded
# by the seed count and the recursion depth by the longest <=10-min run).
_L8_CORE = """
    WITH RECURSIVE hops AS (
      SELECT event_id,
             user_id,
             lead(event_id) OVER w AS next_id,
             lead(event_type) OVER w AS next_type,
             CASE WHEN lead(ts) OVER w <= ts + INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS hop_ok
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    chain (seed_id, user_id, cur_id, cur_type, depth) AS (
      SELECT event_id, user_id, event_id, CAST('error' AS {strtype}), 0
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT c.seed_id, c.user_id, h.next_id, h.next_type, c.depth + 1
      FROM chain c
      JOIN hops h ON h.event_id = c.cur_id AND h.hop_ok = 1
    )
    SELECT seed_id, user_id,
           CAST(max(depth) AS BIGINT) AS chain_len,
           max_by(cur_id, depth) AS terminal_id,
           max_by(cur_type, depth) AS terminal_type
    FROM chain
    GROUP BY seed_id, user_id
"""


@register(
    "l8",
    oracle=_L8_CORE.format(strtype="VARCHAR"),
)
def l8_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE — Spark 4's WITH RECURSIVE operator (SPARK-24497),
    declared through the SQL entry point like the rest of §2.M: from every
    'error' event, walk the user's next-event edge (the immediate successor
    within 10 minutes) to the end of the burst, reporting chain length and
    the terminal event. The walk is the incident-triage question "what did
    the user do right after the error, and where did the burst end?".

    Scale shape: each recursion level is ONE equi-join of the frontier
    against the (precomputed, reusable) hops edge table — the same
    pointer-chase shape as n2's pointer-jumping, but expressed in the
    language surface so Catalyst owns the loop. The edge is functional
    (out-degree <= 1 via lead()) and strictly time-increasing, so the
    frontier never grows past the seed count, levels are bounded by the
    longest dense run (4 at sf0.1, ~burst length generally), and UNION
    ALL-only recursion (no dedup pass per level) is semantically exact.
    The aggregation collapses each walk to its terminus with max_by —
    both engines agree because (seed_id, depth) is unique per row.
    """
    register_views(spark, sf_dir)
    return spark.sql(_L8_CORE.format(strtype="STRING"))
