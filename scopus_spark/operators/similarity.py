"""Similarity search over embedding columns (SURVEY §2.L).

Two tiers:
- **Exact brute force** (queries/llm.py j3/j4) — the correctness anchor.
- **IVF-pruned ANN** (here) — the 100 TB path: vectors are assigned to
  coarse cells once (one shuffle, then cell-partitioned storage); a query
  probes only the n_probe nearest cells and re-ranks EXACTLY inside them,
  scanning n_probe/n_cells of the data. With n_probe == n_cells it
  degenerates to exact brute force (asserted in tests).

The coarse quantizer is deterministic: the n_cells lowest-vec_id vectors
serve as fixed centroids (no RNG — resumable, cross-run stable). A k-means
refinement would drop recall-vs-cost further but adds no new Spark
machinery, so it is left as a config hook.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM higher-order fns)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    n1 = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    n2 = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (n1 * n2)


def as_double(col: str | Column = "embedding") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def ivf_assign(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """Assign every vector to its best coarse cell.

    Returns embeddings + cell_id. Centroids = the n_cells lowest-vec_id
    vectors (deterministic seed centroids), broadcast to every task — the
    assignment itself is map-side only.
    """
    centroids = (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.col("vec_id").alias("cell_id"),
            as_double().alias("centroid"),
        )
    )
    cands = embeddings.crossJoin(F.broadcast(centroids))
    sim = F.round(cosine(as_double(), F.col("centroid")), 6)
    best = (
        cands.select("vec_id", "cell_id", sim.alias("sim"))
        .groupBy("vec_id")
        .agg(F.max_by("cell_id", F.struct(F.col("sim"), (-F.col("cell_id")).alias("tb"))).alias("cell_id"))
    )
    return embeddings.join(best, "vec_id")


def ann_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k: probe the n_probe cells nearest the query, exact
    cosine re-rank inside them. Returns (vec_id, label, cos_sim)."""
    assigned = ivf_assign(embeddings, n_cells)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        as_double().alias("qe")
    )
    # rank cells by centroid similarity to the query
    centroids = (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell_id"), as_double().alias("centroid"))
    )
    probe_cells = [
        r.cell_id
        for r in centroids.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            F.round(cosine(F.col("centroid"), F.col("qe")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("cell_id").asc())
        .limit(n_probe)
        .collect()  # n_probe cell ids only — driver-side list is bounded
    ]
    cos = F.round(cosine(as_double(), F.col("qe")), 6)
    return (
        assigned.filter(
            F.col("cell_id").isin(probe_cells) & (F.col("vec_id") != query_vec_id)
        )
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )
