"""operators/similarity PQ tier (j48) — product-quantization ADC search
with exact re-rank. Contracts: codebook shape/determinism, recall@10
against the j3 exact anchor, and EXACT degeneration when the re-rank
set covers the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from scopus_spark import registry
from scopus_spark.catalog import table
from scopus_spark.operators import similarity

QUERIES = registry.all_queries()


def _exact_topk_ids(spark, sf_dir, k=10):
    return [r.vec_id for r in QUERIES["j3"](spark, sf_dir).collect()][:k]


def test_codebook_shape_and_code_range(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    base = similarity.prepare_vectors(e)
    cbs = similarity.pq_fit(base, dim=64, m=8, kc=16, iters=2)
    rows = cbs.collect()
    assert len(rows) == 8 * 16
    assert all(len(r.centroid) == 8 for r in rows)
    enc = similarity.pq_encode(base, cbs, dim=64, m=8)
    stats = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("sz"),
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi < 16 and stats.sz == 8


def test_recall_at_10_vs_exact_anchor(spark, sf_dir):
    """The stated bound: PQ top-64 + exact re-rank must recover >= 8 of
    the true top-10 for the anchor query on the fixture corpus."""
    want = set(_exact_topk_ids(spark, sf_dir))
    got = {r.vec_id for r in QUERIES["j48"](spark, sf_dir).collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.8, f"recall@10 = {recall}"


def test_full_rerank_degenerates_to_exact(spark, sf_dir):
    """rerank >= corpus size: the ADC ordering only picks candidates, so
    the exact re-rank must return EXACTLY the brute-force top-10 (ids,
    order, and 6dp cosines)."""
    e = table(spark, sf_dir, "embeddings")
    n = e.count()
    got = [
        (r.rank, r.vec_id, r.cos_sim)
        for r in similarity.pq_topk(
            e, query_vec_id=0, k=10, rerank=n
        ).collect()
    ]
    want = [
        (i + 1, r.vec_id, r.cos_sim)
        for i, r in enumerate(QUERIES["j3"](spark, sf_dir).collect())
    ]
    assert got == want


def test_fit_is_deterministic(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    base = similarity.prepare_vectors(e)
    a = sorted(
        (r.sub_id, r.code, tuple(r.centroid))
        for r in similarity.pq_fit(base, dim=64, m=8, kc=16, iters=2).collect()
    )
    b = sorted(
        (r.sub_id, r.code, tuple(r.centroid))
        for r in similarity.pq_fit(
            base.repartition(7), dim=64, m=8, kc=16, iters=2
        ).collect()
    )
    assert a == b
