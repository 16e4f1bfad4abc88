"""Graph operators over relational edge tables (SURVEY §2.N).

The reference's citation graph is an edge table queried relationally [U —
SURVEY §1.1]; these operators cover the graph analytics a dedup/citation
pipeline needs without a graph framework: degree statistics, connected
components (dedup clustering), and triangle counting — all as DataFrame
transformations.

Connected components is the one genuinely iterative operator in the
engine. The implementation is min-label propagation with pointer jumping
(path halving), the DataFrame rendering of the classic MapReduce CC
algorithms (Hash-to-Min family — see PAPERS.md; "Connected Components in
MapReduce and Beyond" is the canonical reference):

    comp(v) <- min(comp(v), min_{u in N(v)} comp(u))   # neighbor step
    comp(v) <- comp(comp(v))                           # pointer jump

The pointer-jump step halves label-chain lengths, so convergence is
O(log diameter) iterations instead of O(diameter) — on a 1000-executor
cluster against a 100 TB edge set that is the difference between ~6 and
~hundreds of shuffle rounds. Each iteration is two shuffles (one on node,
one on label); labels are localCheckpoint()ed each round to cut lineage
(without it the plan doubles per iteration and planning time explodes).

All of it is driver-side *control flow* only — every data operation is a
distributed DataFrame op; the only driver materialization is the O(1)
convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrize an edge list: every edge emitted in both directions, deduped."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.union(rev).distinct()


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, degree) over the undirected rendering of the edge list.

    One symmetrize + one hash aggregate — a single shuffle on node.
    """
    und = undirected(edges, src, dst)
    return und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """(node, comp_id) where comp_id = min node id reachable from node.

    Deterministic (min-label), independent of partitioning. Nodes are those
    that appear in at least one edge; callers join back to the entity table
    to label isolated rows (comp = self).
    """
    und = undirected(edges, src, dst).persist()
    try:
        # comp starts as each node's min direct neighbor (or itself).
        labels = (
            und.groupBy(F.col("src").alias("node"))
            .agg(F.least(F.min("dst"), F.first("src")).alias("comp"))
            .localCheckpoint()
        )
        for _ in range(max_iterations):
            # neighbor step: comp(v) <- min over neighbors' comps (and own).
            nbr = (
                und.join(labels, und.src == labels.node)
                .select(F.col("dst").alias("node"), "comp")
            )
            stepped = (
                labels.union(nbr)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
            )
            # pointer jump: comp(v) <- comp(comp(v)). comp ids are nodes, so
            # a self-join on the labels resolves one level of indirection.
            parent = stepped.select(
                F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
            )
            jumped = (
                stepped.join(parent, stepped.comp == parent.p_node, "left")
                .select(
                    "node",
                    F.coalesce(F.col("p_comp"), F.col("comp")).alias("comp"),
                )
                .localCheckpoint()
            )
            changed = (
                jumped.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels = jumped
            if changed == 0:
                return labels.select("node", F.col("comp").alias("comp_id"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    finally:
        und.unpersist()


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count as a one-row DataFrame (n_triangles).

    Classic relational rendering: orient every edge low->high, then count
    paths a<b<c where (a,b), (b,c), (a,c) all exist — each triangle counted
    exactly once. Two joins, both on edge endpoints; at scale the first
    join's fan-out is bounded by orienting edges at the high-degree node
    (low->high orientation caps per-node out-degree for power-law graphs).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    return (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def bfs_hops(
    edges: DataFrame,
    seed,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int | None = None,
) -> DataFrame:
    """(node, hops) — minimum hop count from `seed` to every reachable
    node, by iterative frontier expansion (the reachability walk a
    citation graph runs from a seed paper).

    Each round: join the current frontier to the edge list, keep nodes not
    yet visited, localCheckpoint. Rounds = eccentricity of the seed; each
    is one shuffle-join on node. Deterministic — hop counts don't depend
    on partitioning or visit order. BFS on a finite graph terminates when
    the frontier empties, so there is NO default iteration cap (a cap
    silently truncates hop counts on long-diameter graphs); pass
    max_iterations only as a watchdog, which raises rather than truncates.
    """
    und = undirected(edges, src, dst).persist()
    try:
        spark = edges.sparkSession
        # Seed typed from the edge schema, not hardcoded: string/int node
        # ids must survive the frontier joins.
        node_type = und.schema["src"].dataType
        visited = spark.range(1).select(
            F.lit(seed).cast(node_type).alias("node"),
            F.lit(0).cast("long").alias("hops"),
        )
        frontier = visited
        hop = 0
        while True:
            hop += 1
            if max_iterations is not None and hop > max_iterations:
                raise RuntimeError(f"bfs_hops exceeded {max_iterations} iterations")
            neighbors = (
                und.join(frontier.select("node"), und.src == F.col("node"))
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            frontier = (
                neighbors.join(visited.select("node"), "node", "left_anti")
                .select("node", F.lit(hop).cast("long").alias("hops"))
                .localCheckpoint()
            )
            if frontier.limit(1).count() == 0:
                return visited
            visited = visited.union(frontier).localCheckpoint()
    finally:
        und.unpersist()


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank (damping 0.85, leak variant: dangling mass
    is not redistributed) — the canonical iterative graph ranking.

    Determinism across engines (the reason this can be HASH-checked at
    all): every per-row step is double arithmetic with an identical
    expression tree (IEEE-deterministic), and the ONE order-sensitive op —
    summing in-neighbor contributions — casts each contribution to
    DECIMAL(38,18) first, so the aggregate is exact and associative
    regardless of partitioning. Plan shape per round: one shuffle join of
    edges with ranks on src + one hash aggregate on dst + a left join back
    to the node roster; the node count rides along as a broadcast 1-row
    aggregate (no driver-side count()). At 100 TB: ranks re-shuffle on the
    same node key every round (co-partition with the edge list), and each
    round localCheckpoints like connected_components above — plan depth
    stays O(1) in iters instead of unrolling iters joins+aggs into one
    lineage (a plan-depth bomb past a handful of rounds).

    Honesty correction (round 7, measured): the round-5 claim that
    eager=False makes construction schedule zero jobs was WRONG.
    localCheckpoint — eager or not — builds the checkpoint RDD via
    queryExecution.toRdd, and under AQE that materializes the prior
    round's shuffle stages, so constructing this DataFrame runs the
    iteration jobs up front (~58 jobs for 5 rounds at sf0.001) and the
    returned plan then executes in milliseconds. That cost is inherent to
    mid-lineage checkpointing, paid exactly once, and equals work the
    first action would have done anyway — but it is NOT lazy, and code
    that must stay action-free at plan-build time (the j31 contract)
    cannot use localCheckpoint at all; it uses persist() + footer-count
    metadata instead (queries/pipeline.py::j31_knn_join). Note for
    production runs with executor churn: localCheckpoint blocks are not
    fault-tolerant; swap in reliable `checkpoint()` (HDFS/S3 dir) when an
    executor loss mid-run must be recoverable.
    """
    ncnt = nodes.agg(F.count(F.lit(1)).alias("n_docs"))
    roster = (
        nodes.select(F.col(node_col).alias("node"))
        .crossJoin(F.broadcast(ncnt))
    )
    outdeg = edges.groupBy(F.col(src).alias("u")).agg(
        F.count(F.lit(1)).alias("od")
    )
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    base = F.lit(0.15) / F.col("n_docs")
    ranks = roster.select(
        "node", "n_docs", (F.lit(1.0) / F.col("n_docs")).alias("r")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks.select(F.col("node").alias("u"), "r"), "u")
            .join(outdeg, "u")
            .groupBy(F.col("v").alias("node"))
            .agg(
                F.sum(
                    (F.col("r") / F.col("od")).cast("decimal(38,18)")
                ).alias("sm")
            )
        )
        ranks = (
            roster.join(contrib, "node", "left")
            .select(
                "node",
                "n_docs",
                (
                    base
                    + F.lit(0.85)
                    * F.coalesce(
                        F.col("sm"), F.lit(0).cast("decimal(38,18)")
                    ).cast("double")
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("r").alias("pagerank"))


def coreness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 200,
) -> DataFrame:
    """(node, coreness) — EXACT k-core number for every node that appears
    in at least one edge, via distributed ascending-k peeling
    (Matula–Beck degeneracy ordering, batched).

    coreness(v) = the largest k such that v belongs to a subgraph whose
    every node has degree >= k inside it. The peel: for k = 1, 2, ...
    repeatedly delete all nodes whose CURRENT degree is < k; a node
    deleted while peeling toward the k-core has coreness k-1. Deleting
    whole low-degree WAVES per round (not one min-degree node at a time,
    as the sequential algorithm does) is what makes the algorithm
    distributed: every wave is a degree aggregation plus two anti-joins,
    and correctness is unaffected because deleting a node never raises
    another node's degree.

    Scale: rounds = sum over k of the peel-wave count, bounded by
    O(degeneracy * diameter-of-waves) — small for the power-law graphs
    dedup/citation pipelines produce (degeneracy ~ tens). Each round
    shuffles only the LIVE edge set (monotonically shrinking) on node
    keys; removed nodes accumulate in a checkpointed label table; the
    driver sees nothing but 1-row emptiness probes. Lineage is cut per
    round with localCheckpoint (the connected_components argument; swap
    for checkpoint() on a real cluster for executor-loss tolerance).

    Like connected_components/pagerank — and unlike the declared-lazy
    relational keys — CONSTRUCTION runs the peeling jobs: the loop's
    emptiness probes are driver-side control flow, inherent to any
    data-dependent iteration. Callers that need a lazy handle should
    persist the returned label table and hand that out (j31's
    persisted-index pattern).
    """
    live = undirected(edges, src, dst).localCheckpoint()
    # Track live NODES separately from live edges: a node whose last edge
    # was peeled away still exists (degree 0) and must receive a label —
    # reading degrees off the edge table alone would silently drop it.
    nodes = live.select("src").distinct().select(F.col("src").alias("node"))
    nodes = nodes.localCheckpoint()
    assigned: DataFrame | None = None
    spark = edges.sparkSession
    k = 1
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        if nodes.limit(1).count() == 0:
            break
        deg = live.groupBy(F.col("src").alias("node_d")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        low = (
            nodes.join(deg, nodes.node == deg.node_d, "left")
            .select("node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
            .filter(F.col("deg") < k)
            .select("node")
        )
        if low.limit(1).count() == 0:
            k += 1
            continue
        labeled = low.select(
            "node", F.lit(k - 1).cast("long").alias("coreness")
        )
        assigned = (
            labeled
            if assigned is None
            else assigned.union(labeled)
        ).localCheckpoint()
        nodes = nodes.join(low, "node", "left_anti").localCheckpoint()
        live = (
            live.join(low, live.src == low.node, "left_anti")
            .join(low, F.col("dst") == low.node, "left_anti")
            .localCheckpoint()
        )
    else:
        raise RuntimeError(f"coreness did not converge in {max_rounds} rounds")
    if assigned is None:
        schema = "node long, coreness long"
        return spark.createDataFrame([], schema)
    return assigned
