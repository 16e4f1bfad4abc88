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


def test_candidate_fanin_bounded_at_high_partition_counts(spark):
    """VERDICT r6 item 4: the recount filter's In-list must stay <= k
    literals no matter how many input partitions there are. 256
    partitions x (k+1) would be ~2300 candidates without the distributed
    MG merge; bounded, the optimizer keeps a plain In (never the InSet
    conversion that fires above ~10 items), and the output still equals
    brute force."""
    texts = ["hot hot hot hot warm warm " + f"t{i}" for i in range(400)]
    want = _brute(texts, k=8)
    assert want
    from pyspark.sql import functions as F2

    d = spark.createDataFrame([(t,) for t in texts], "text string").repartition(256)
    from scopus_spark.operators.text import tokens

    words = d.select(F2.explode(tokens("text")).alias("w"))
    df = exact_heavy_hitters(words, k=8)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "inset" not in plan.lower(), "candidate In-list blew past k"
    assert {(r.word, r.cnt) for r in df.collect()} == want
    # 256-partition run is also part of the partitioning-invariance sweep
    assert _run(spark, texts, k=8, parts=256) == want


def test_custom_column_name(spark):
    """ADVICE r6: callers with a column not named 'w' must work via the
    col= parameter instead of KeyError-ing inside mapInPandas."""
    texts = ["x x x x y"] * 50
    d = spark.createDataFrame(
        [(w,) for t in texts for w in t.split()], "token string"
    )
    got = {
        (r.word, r.cnt)
        for r in exact_heavy_hitters(d, k=4, col="token").collect()
    }
    assert got == _brute(texts, k=4)
