"""operators/similarity.nn_descent — approximate k-NN graph (j49).

Contracts: recall@10 vs the exact k-NN join (which is unit-proven equal
to brute force), determinism / partitioning-invariance, monotone
improvement over the IVF init, and bounded candidate volume (no
cartesian in the plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.operators import similarity
from tests.conftest import TEST_SF_DIR

K = 10


def _graph_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["vec_id"], set()).add(r["nn_id"])
    return out


def _exact(spark, emb, k=K):
    base = similarity.prepare_vectors(emb)
    n_cells = similarity.auto_n_cells(emb.count())
    cents = similarity._refine_centroids(base, n_cells, iters=2)
    cents = cents.localCheckpoint(eager=False)
    assigned = similarity.assign_cells(base, cents)
    return similarity.exact_topk_join(assigned, assigned, cents, k=k)


def test_nn_descent_recall_at_10(spark):
    emb = table(spark, TEST_SF_DIR, "embeddings")
    exact = _graph_sets(_exact(spark, emb))
    approx = _graph_sets(similarity.nn_descent(emb, k=K, rounds=2))
    hits = sum(len(exact[v] & approx.get(v, set())) for v in exact)
    total = sum(len(s) for s in exact.values())
    recall = hits / total
    assert recall >= 0.9, f"recall@10 = {recall:.3f}"


def test_nn_descent_rounds_improve_on_init(spark):
    emb = table(spark, TEST_SF_DIR, "embeddings")
    exact = _graph_sets(_exact(spark, emb))

    def recall(g):
        hits = sum(len(exact[v] & g.get(v, set())) for v in exact)
        return hits / sum(len(s) for s in exact.values())

    r0 = recall(_graph_sets(similarity.nn_descent(emb, k=K, rounds=0)))
    r2 = recall(_graph_sets(similarity.nn_descent(emb, k=K, rounds=2)))
    assert r2 > r0


def test_nn_descent_deterministic_under_repartitioning(spark):
    emb = table(spark, TEST_SF_DIR, "embeddings")
    a = {
        (r["vec_id"], r["nn_id"], r["rank"])
        for r in similarity.nn_descent(emb, k=5, rounds=1).collect()
    }
    b = {
        (r["vec_id"], r["nn_id"], r["rank"])
        for r in similarity.nn_descent(emb.repartition(13), k=5, rounds=1).collect()
    }
    assert a == b


def test_nn_descent_output_shape(spark):
    emb = table(spark, TEST_SF_DIR, "embeddings")
    g = similarity.nn_descent(emb, k=5, rounds=1)
    per = g.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("deg"), F.max("rank").alias("mr")
    )
    rows = per.collect()
    assert all(r["deg"] <= 5 and r["mr"] == r["deg"] for r in rows)
    n = emb.count()
    assert len(rows) == n  # every vector got a neighbor list


def test_every_vector_covered_degenerate_corpus(spark):
    """n=2: each vector is alone in its IVF cell and (possibly) in every
    hash bucket — the isolated case. The coverage fallback must still
    give BOTH vectors a neighbor list (ADVICE r7)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1],
            "label": ["a", "b"],
            "embedding": [[1.0, 0.0, 0.0, 0.0], [0.6, 0.8, 0.0, 0.0]],
        }
    )
    e = spark.createDataFrame(pdf)
    g = similarity.nn_descent(e, k=3, rounds=1, n_cells=2, n_rows=2)
    rows = {(r.vec_id, r.nn_id) for r in g.collect()}
    assert rows == {(0, 1), (1, 0)}


def test_nn_descent_refuses_single_vector_corpus(spark):
    """ADVICE r8: the coverage guarantee holds for n >= 2; an n=1 corpus
    cannot have a neighbor, so the call is refused loudly instead of
    returning a graph the vector silently vanished from."""
    import pytest

    from scopus_spark.operators import similarity

    one = spark.createDataFrame(
        [(0, [1.0, 0.0], "a")], "vec_id long, emb array<double>, label string"
    )
    with pytest.raises(ValueError, match=">= 2 vectors"):
        similarity.nn_descent(one, k=2, rounds=1)
