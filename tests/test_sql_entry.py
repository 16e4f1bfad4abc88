"""E2 entry-point parity (SURVEY §3.2): the SQL surface must produce the
same results as the DataFrame API — users of the engine can pick either.
"""

from __future__ import annotations

from scopus_spark import registry
from scopus_spark.catalog import register_views
from tests.oracle_harness import _rowset

QUERIES = registry.all_queries()

# SQL renderings of representative DataFrame-API queries (one per category).
SQL_EQUIVALENTS = {
    "d2": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE)      AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))
                        * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)      AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / count(*), 4)      AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / count(*), 4) AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4)      AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "c5": """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    "e1": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
          FROM orders
        ) WHERE rn <= 3
    """,
    "g3": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
}


def test_sql_surface_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    for key, sql in SQL_EQUIVALENTS.items():
        df_api = QUERIES[key](spark, sf_dir)
        via_sql = spark.sql(sql)
        a = _rowset(df_api.columns, [tuple(r) for r in df_api.collect()])
        b = _rowset(via_sql.columns, [tuple(r) for r in via_sql.collect()])
        assert a == b, f"SQL/DataFrame divergence for {key}"


def test_survey_inventory_matches_registry():
    """SURVEY §2.Z is the diffable coverage contract: its generated table
    must list exactly the registry's keys with the right oracle modes.
    Regenerate with tools/gen_survey_inventory.py after registry changes."""
    import os
    import re

    from scopus_spark import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "SURVEY.md")).read()
    m = re.search(
        r"<!-- BEGIN GENERATED KEY INVENTORY.*?-->(.*?)<!-- END GENERATED",
        text,
        re.S,
    )
    assert m, "SURVEY.md lost its generated §2.Z inventory block"
    rows = re.findall(r"^\| ([a-z]+\d+) \| .* \| (HASH|ROWS/UNIT) \|", m.group(1), re.M)
    keys = {k for k, _ in rows}
    modes = dict(rows)
    reg = registry.all_queries()
    oracles = registry.all_oracles()
    assert keys == set(reg), (
        f"survey-only={sorted(keys - set(reg))} registry-only={sorted(set(reg) - keys)}"
    )
    for k in reg:
        want = "HASH" if k in oracles else "ROWS/UNIT"
        assert modes[k] == want, f"{k}: SURVEY says {modes[k]}, registry says {want}"
    # the per-family prose line is generated too (r7 verdict hygiene 1):
    # it must equal counts recomputed from the live registry
    fm = re.search(
        r"<!-- BEGIN GENERATED FAMILY COUNTS.*?-->\n(.*?)\n<!-- END GENERATED FAMILY COUNTS -->",
        text,
        re.S,
    )
    assert fm, "SURVEY.md lost its generated family-counts block"
    from collections import Counter

    fams = Counter(re.match(r"([a-z]+)", k).group(1) for k in reg)
    want_line = (
        ", ".join(f"{f}={fams[f]}" for f in sorted(fams))
        + f" — {len(reg)} keys total."
    )
    assert fm.group(1).strip() == want_line, (
        f"family counts drifted: survey={fm.group(1).strip()!r} "
        f"registry={want_line!r} — run python tools/sync.py"
    )
