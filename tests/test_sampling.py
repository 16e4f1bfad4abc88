"""Unit tests for sampling/splitting (SURVEY §2.O) and subquery keys'
engine-side invariants that the oracle hash can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.queries import sampling
from scopus_spark.registry import all_queries

Q = all_queries()


def test_m1_split_partitions_the_corpus(spark, sf_dir):
    """train/val/test is a disjoint cover: split counts sum to the corpus."""
    total = table(spark, sf_dir, "documents").count()
    split_rows = Q["m1"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in split_rows) == total
    # hash-split is measure-preserving-ish: train is the large bucket
    by_split = {}
    for r in split_rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_m1_assignment_stable_under_repartitioning(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    def assign(df):
        return {
            r["doc_id"]: r["b"]
            for r in df.select(
                "doc_id", sampling._bucket(F.col("doc_id")).alias("b")
            ).collect()
        }
    assert assign(d.repartition(1)) == assign(d.repartition(16))


def test_m2_exact_stratum_quotas(spark, sf_dir):
    import math

    strata = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {}
    for r in Q["m2"](spark, sf_dir).collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got == {lang: math.ceil(n * 0.1) for lang, n in strata.items()}


def test_m3_seeded_sample_reproducible_and_in_band(spark, sf_dir):
    a = sorted(r["doc_id"] for r in Q["m3"](spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in Q["m3"](spark, sf_dir).collect())
    assert a == b  # same layout + seed => same draw
    total = table(spark, sf_dir, "documents").count()
    assert 0.1 * total <= len(a) <= 0.3 * total  # fraction=0.2 tolerance band


def test_m4_materialized_replicas_match_audit(spark, sf_dir):
    for r in Q["m4"](spark, sf_dir).collect():
        assert r["n_after"] == r["n_before"] * r["rep_factor"]
        assert r["rep_factor"] >= 1


def test_m6_exactly_k_per_stratum_and_deterministic(spark, sf_dir):
    rows = Q["m6"](spark, sf_dir).collect()
    from collections import Counter

    per_lang = Counter(r["lang"] for r in rows)
    sizes = {r["lang"]: r["stratum_n"] for r in rows}
    for lang, n in per_lang.items():
        assert n == min(20, sizes[lang]), (lang, n, sizes[lang])
    # rerun == same sample (no RNG state anywhere)
    again = {(r["lang"], r["doc_id"]) for r in Q["m6"](spark, sf_dir).collect()}
    assert again == {(r["lang"], r["doc_id"]) for r in rows}


def test_m7_embargo_gap_enforced(spark, sf_dir):
    """The leakage contract: every train row precedes every test row by at
    least the 3-day embargo, and no event inside the embargo band survives."""
    from datetime import timedelta

    from scopus_spark.queries.sampling import m7_temporal_embargo_split

    rows = m7_temporal_embargo_split(spark, sf_dir).collect()
    train_max = max(r.t_max for r in rows if r.split == "train")
    test_min = min(r.t_min for r in rows if r.split == "test")
    assert test_min - train_max >= timedelta(days=3)
    # both sides non-empty at every declared event type
    assert sorted({r.event_type for r in rows if r.split == "train"}) == sorted(
        {r.event_type for r in rows if r.split == "test"}
    )


def test_m7_split_is_pure_predicate(spark, sf_dir):
    """Scale contract: assignment adds no shuffle beyond the audit agg —
    exactly one Exchange in the plan."""
    from scopus_spark.queries.sampling import m7_temporal_embargo_split

    plan = m7_temporal_embargo_split(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial->final agg pair at most


def test_m9_weighted_sample_properties(spark, sf_dir):
    """E-S weighted sample: exactly k rows, subset of corpus, and longer
    docs are overrepresented vs their corpus share (the point of the
    weights)."""
    d = table(spark, sf_dir, "documents")
    sel = Q["m9"](spark, sf_dir).collect()
    assert len(sel) == sampling._M9_K
    ids = {r["doc_id"] for r in sel}
    assert len(ids) == sampling._M9_K  # without replacement
    corpus_mean = d.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r["n_chars"] for r in sel) / len(sel)
    # weight = n_chars + 1 -> length-biased sample mean must exceed the
    # corpus mean (size-biased expectation E[X^2]/E[X] > E[X])
    assert sample_mean > corpus_mean


def test_m9_stable_under_repartitioning(spark, sf_dir):
    out1 = {r["doc_id"] for r in Q["m9"](spark, sf_dir).collect()}
    d = table(spark, sf_dir, "documents").repartition(17)
    import scopus_spark.queries.sampling as m
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(1152921504606846976.0)
    pri = -F.log(u) / (F.col("n_chars") + F.lit(1)).cast("double")
    out2 = {
        r["doc_id"]
        for r in d.select("doc_id", pri.alias("pri"))
        .orderBy("pri", "doc_id")
        .limit(m._M9_K)
        .collect()
    }
    assert out1 == out2
