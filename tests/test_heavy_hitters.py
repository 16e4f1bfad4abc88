"""d30 — the Misra-Gries candidate pass must be a provable superset of
the true heavy hitters under ANY partitioning, so the exact-recount
output is partitioning-invariant and equals brute force."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def _run(spark, texts, k=64, parts=1):
    from scopus_spark.queries.aggregates import d30_heavy_hitters  # noqa: F401
    # drive the same machinery on a constructed corpus via the operator
    # internals: rebuild the query inline with a controlled partitioning
    from scopus_spark.operators.text import tokens

    d = spark.createDataFrame([(t,) for t in texts], "text string").repartition(
        parts
    )
    words = d.select(F.explode(tokens("text")).alias("w")).filter(
        F.length("w") > 0
    )

    def mg_partial(batches):
        import numpy as np
        import pandas as pd

        c = Counter()
        for pdf in batches:
            c.update(pdf["w"].tolist())
            if len(c) > k:
                vals = np.fromiter(c.values(), dtype=np.int64)
                m = np.partition(vals, -(k + 1))[-(k + 1)]
                c = Counter({w: n - m for w, n in c.items() if n > m})
        if c:
            yield pd.DataFrame({"w": list(c.keys())})

    cands = words.mapInPandas(mg_partial, "w string").distinct()
    total = words.agg(F.count(F.lit(1)).alias("n_words"))
    out = (
        words.join(F.broadcast(cands), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("n_words"))
    )
    return {(r.w, r.cnt) for r in out.collect()}


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


def test_d30_matches_brute_on_documents(spark, sf_dir):
    from scopus_spark.catalog import table
    from scopus_spark.queries.aggregates import d30_heavy_hitters

    texts = [r.text for r in table(spark, sf_dir, "documents").collect()]
    want = _brute(texts)
    got = {
        (r.word, r.cnt) for r in d30_heavy_hitters(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0
