"""d29 — the deterministic normal-equation rendering must agree with the
regr_slope / regr_intercept / regr_r2 builtins (which are run-order
dependent at the ulp level and therefore can't cross the hash gate
themselves — see _fp.py C3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.queries import _fp
from scopus_spark.queries.aggregates import d29_revenue_trend


def test_d29_matches_regr_builtins(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
            .cast("double")
            .alias("m"),
        )
        .agg(
            F.sum(_fp.m("l_extendedprice") * (1 - _fp.s("l_discount")))
            .cast("double")
            .alias("rev")
        )
    )
    builtin = monthly.groupBy("n_name").agg(
        F.regr_slope("rev", "m").alias("slope"),
        F.regr_intercept("rev", "m").alias("intercept"),
        F.regr_r2("rev", "m").alias("r2"),
    )
    want = {r.n_name: r for r in builtin.collect()}
    got = {r.n_name: r for r in d29_revenue_trend(spark, sf_dir).collect()}
    assert set(got) == set(want) and len(got) > 0
    for name, g in got.items():
        w = want[name]
        assert abs(g.slope - w.slope) <= 1e-9 * max(1.0, abs(w.slope))
        assert abs(g.intercept - w.intercept) <= 1e-9 * max(
            1.0, abs(w.intercept)
        )
        assert abs(g.r2 - w.r2) <= 1e-9
