"""operators/similarity.graph_beam_search — beam search over the
NN-Descent graph (j53). Contracts: recall@10 >= 0.9 vs the exact
brute-force top-k on the fixture corpus, exact degeneration when the
beam covers the corpus, determinism across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _exact_top10(spark, e):
    base = similarity.prepare_vectors(e)
    q = base.filter(F.col("vec_id") == 0).collect()[0]
    qe = F.array(*[F.lit(float(x)) for x in q.emb])
    cos = F.round(
        similarity._dot(F.col("emb"), qe) / (F.col("nrm") * F.lit(float(q.nrm))),
        6,
    )
    return [
        r.vec_id
        for r in base.filter(F.col("vec_id") != 0)
        .select("vec_id", cos.alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]


def test_recall_at_10_vs_exact(spark):
    e = _emb(spark)
    n = e.count()
    g = similarity.nn_descent(
        e, k=10, rounds=3, n_cells=similarity.auto_n_cells(n), n_rows=n
    )
    got = {
        r.vec_id
        for r in similarity.graph_beam_search(
            e, g, query_vec_id=0, k=10, beam=16, hops=3
        ).collect()
    }
    exact = set(_exact_top10(spark, e))
    assert len(got & exact) / 10 >= 0.9


def test_beam_covering_corpus_is_exact(spark):
    e = _emb(spark).limit(60)
    n = 60
    g = similarity.nn_descent(e, k=5, rounds=2, n_cells=4, n_rows=n)
    got = [
        r.vec_id
        for r in similarity.graph_beam_search(
            e, g, query_vec_id=0, k=10, beam=n, hops=1
        ).collect()
    ]
    exact = _exact_top10(spark, e)
    assert got == exact


def test_deterministic_across_runs(spark):
    e = _emb(spark).limit(80)
    g = similarity.nn_descent(e, k=5, rounds=2, n_cells=4, n_rows=80)
    a = [
        (r.rank, r.vec_id)
        for r in similarity.graph_beam_search(e, g, beam=8, hops=2).collect()
    ]
    b = [
        (r.rank, r.vec_id)
        for r in similarity.graph_beam_search(
            e.repartition(7), g, beam=8, hops=2
        ).collect()
    ]
    assert a == b
