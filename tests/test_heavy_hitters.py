"""operators/frequency.exact_heavy_hitters — the Misra-Gries candidate
pass must be a provable superset of the true heavy hitters under ANY
partitioning, so the exact-recount output is partitioning-invariant and
equals brute force. These tests exercise the PRODUCTION operator (the
same function d30 delegates to), not a copy."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from scopus_spark.operators.frequency import exact_heavy_hitters


def _run(spark, texts, k=64, parts=1):
    from scopus_spark.operators.text import tokens

    d = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(parts)
    words = d.select(F.explode(tokens("text")).alias("w")).filter(
        F.length("w") > 0
    )
    return {
        (r.word, r.cnt) for r in exact_heavy_hitters(words, k=k).collect()
    }


def _brute(texts, k=64):
    words = [w for t in texts for w in t.split(" ") if w]
    n = len(words)
    c = Counter(words)
    return {(w, cnt) for w, cnt in c.items() if cnt * (k + 1) > n}


def test_partitioning_invariance_and_exactness(spark):
    # Zipf-ish corpus: a few dominant words, a long tail.
    texts = []
    for i in range(200):
        texts.append(
            "alpha alpha beta " + f"tail{i} tail{i % 7} gamma " + "alpha"
        )
    want = _brute(texts)
    assert want, "constructed corpus must have heavy hitters"
    for parts in (1, 3, 13):
        assert _run(spark, texts, parts=parts) == want, f"parts={parts}"


def test_no_heavy_hitters_is_empty(spark):
    # perfectly uniform vocabulary wider than k: nothing exceeds W/(k+1)
    texts = [f"u{i}" for i in range(300)]
    assert _run(spark, texts) == set()


def test_small_k_forces_reductions(spark):
    """k far below the vocabulary forces many batch-merge reductions;
    the superset bound must still hold."""
    texts = ["hot hot hot " + " ".join(f"c{i}_{j}" for j in range(20)) for i in range(50)]
    assert _run(spark, texts, k=4, parts=7) == _brute(texts, k=4)


def test_d30_matches_brute_on_documents(spark, sf_dir):
    from scopus_spark.catalog import table
    from scopus_spark.queries.aggregates import d30_heavy_hitters

    texts = [r.text for r in table(spark, sf_dir, "documents").collect()]
    want = _brute(texts)
    got = {
        (r.word, r.cnt) for r in d30_heavy_hitters(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
