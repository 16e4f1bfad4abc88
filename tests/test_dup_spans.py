"""j40 duplicate n-gram span coverage: exactness against a driver-side
brute-force recompute, plus the structural invariants the hash check can't
state (coverage bounds, exact-duplicate docs are fully covered)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.registry import all_queries

Q = all_queries()
N = 5  # gram width declared by j40

SMOKE_SF = "/root/testdata/sf0.001"


def _brute_coverage(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    """Reference implementation: per doc, positions covered by any word
    5-gram occurring in >= 2 distinct docs."""
    grams = defaultdict(set)  # gram hash -> {doc_id}
    starts = defaultdict(list)  # doc_id -> [(start, h)]
    toks = {d: t.split(" ") for d, t in texts.items()}
    for d, w in toks.items():
        for i in range(len(w) - N + 1):
            h = hashlib.md5("\x1f".join(w[i : i + N]).encode()).hexdigest()
            grams[h].add(d)
            starts[d].append((i + 1, h))
    out = {}
    for d, w in toks.items():
        cov = set()
        for s, h in starts[d]:
            if len(grams[h]) >= 2:
                cov.update(range(s, s + N))
        out[d] = (len(w), len(cov))
    return out


def test_j40_matches_bruteforce_exactly(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in table(spark, SMOKE_SF, "documents").collect()
    }
    want = _brute_coverage(texts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in Q["j40"](spark, SMOKE_SF).collect()
    }
    assert set(got) == set(want)
    for d, (n_tok, dup) in want.items():
        gn, gd, gf = got[d]
        assert (gn, gd) == (n_tok, dup), (d, got[d], want[d])
        assert abs(gf - round(dup / n_tok, 6)) < 1e-12


def test_j40_invariants(spark, sf_dir):
    rows = Q["j40"](spark, sf_dir).collect()
    assert len(rows) == table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert 0.0 <= r["dup_frac"] <= 1.0
    # docs whose full text appears verbatim in another doc are 100% covered
    # (any >= N-token duplicate doc is a run of duplicated N-grams)
    dup_texts = (
        table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_list("doc_id").alias("ids"))
        .filter((F.col("n") >= 2) & (F.size(F.split("text", " ")) >= N))
        .collect()
    )
    fully = {d for r in dup_texts for d in r["ids"]}
    by_id = {r["doc_id"]: r for r in rows}
    for d in fully:
        assert by_id[d]["dup_frac"] == 1.0, (d, by_id[d])


def test_j40_plan_has_no_cartesian(spark, sf_dir):
    plan = Q["j40"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
