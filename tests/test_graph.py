"""Unit tests for graph operators (SURVEY §2.N): degrees, connected
components (pointer-jumping min-label propagation), triangle counting.

Hand-built fixtures with known answers — the oracle tier (n1-n3) checks the
full pipeline over the corpus; these pin the operator semantics themselves,
including CC convergence on adversarial shapes (long path = worst-case
diameter; pointer jumping must converge in O(log n), not O(n))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scopus_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cc_dict(df):
    return {r["node"]: r["comp_id"] for r in df.collect()}


def test_degrees_undirected_and_deduped(spark):
    # duplicate + reversed edges must not double-count
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    deg = {r["node"]: r["degree"] for r in graph.degrees(e).collect()}
    assert deg == {1: 1, 2: 2, 3: 1}


def test_cc_two_components_and_determinism(spark):
    e = _edges(spark, [(4, 2), (2, 7), (10, 11), (11, 10)])
    got = _cc_dict(graph.connected_components(e))
    assert got == {2: 2, 4: 2, 7: 2, 10: 10, 11: 10}


def test_cc_long_path_converges_logarithmically(spark):
    # path 0-1-2-...-40: diameter 40 >> max_iterations=12 proves pointer
    # jumping converges in O(log diameter), not O(diameter).
    # driver_edge_threshold=0 pins the DISTRIBUTED loop (r10: small
    # graphs otherwise take the exact driver-side union-find).
    e = _edges(spark, [(i, i + 1) for i in range(40)])
    got = _cc_dict(
        graph.connected_components(
            e, max_iterations=12, driver_edge_threshold=0
        )
    )
    assert got == {i: 0 for i in range(41)}


def test_cc_raises_if_not_converged(spark):
    e = _edges(spark, [(i, i + 1) for i in range(40)])
    with pytest.raises(RuntimeError, match="converge"):
        graph.connected_components(
            e, max_iterations=1, driver_edge_threshold=0
        )


def test_cc_driver_path_equals_distributed(spark):
    # r10: the union-find driver path (below the edge bound) must return
    # the identical relation as the distributed pointer-jumping loop —
    # min-label CC is algorithm-independent.
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(120)]
    e = _edges(spark, pairs)
    drv = _cc_dict(graph.connected_components(e, driver_edge_threshold=10**6))
    dist = _cc_dict(graph.connected_components(e, driver_edge_threshold=0))
    assert drv == dist


def test_cc_string_nodes_distributed_probe(spark):
    # string-keyed graphs take the join convergence probe (no numeric
    # sum); pin both paths agree there too.
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    e = spark.createDataFrame(pairs, "src string, dst string")
    drv = _cc_dict(graph.connected_components(e, driver_edge_threshold=10**6))
    dist = _cc_dict(graph.connected_components(e, driver_edge_threshold=0))
    assert drv == dist == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; plus a dangling edge adding none
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _edges(spark, k4 + [(3, 9)])
    assert graph.triangle_count(e).collect()[0]["n_triangles"] == 4


def test_triangle_count_orientation_independent(spark):
    # same triangle given with mixed edge directions and dups counts once
    e = _edges(spark, [(1, 2), (3, 2), (1, 3), (2, 1)])
    assert graph.triangle_count(e).collect()[0]["n_triangles"] == 1


def test_cc_partitioning_invariance(spark):
    # comp labels must not depend on physical partitioning (C5-style)
    pairs = [(i, i + 1) for i in range(0, 30, 2)]  # 15 disjoint 2-chains
    one = graph.connected_components(_edges(spark, pairs).repartition(1))
    many = graph.connected_components(_edges(spark, pairs).repartition(16))
    assert _cc_dict(one) == _cc_dict(many)


def test_bfs_hops_path_graph(spark):
    # path 0-1-2-3-4 plus disconnected 10-11: hops from 0
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r["node"]: r["hops"] for r in graph.bfs_hops(e, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_hops_shortest_wins(spark):
    # triangle + tail: node 3 reachable in 1 hop directly, not 2 via 1
    e = _edges(spark, [(0, 1), (1, 3), (0, 3), (3, 4)])
    got = {r["node"]: r["hops"] for r in graph.bfs_hops(e, 0).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 4: 2}


def test_pagerank_hand_graph(spark):
    """pagerank on a hand graph must match the same recurrence computed
    in pure Python (leak variant, 5 iterations), and a directed cycle
    must stay exactly uniform."""
    from scopus_spark.operators import graph as g

    # cycle 0 -> 1 -> 2 -> 0: uniform is a fixed point at every iteration
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {
        r["node"]: r["pagerank"]
        for r in g.pagerank(nodes, edges, iters=5).collect()
    }
    for v in got.values():
        assert abs(v - 1.0 / 3.0) < 1e-12

    # star + chord: 0->1, 0->2, 1->2, 2->0 — reference recurrence in Python
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    e = [(0, 1), (0, 2), (1, 2), (2, 0)]
    edges = spark.createDataFrame(e, "src long, dst long")
    n = 3
    outdeg = {0: 2, 1: 1, 2: 1}
    r = {v: 1.0 / n for v in range(n)}
    for _ in range(5):
        contrib = {v: 0.0 for v in range(n)}
        for (s, d) in e:
            contrib[d] += r[s] / outdeg[s]
        r = {v: 0.15 / n + 0.85 * contrib[v] for v in range(n)}
    got = {
        row["node"]: row["pagerank"]
        for row in g.pagerank(nodes, edges, iters=5).collect()
    }
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-12, (v, got[v], r[v])
    # ranks must be positive and the leak variant sums to <= 1
    assert all(x > 0 for x in got.values())
    assert sum(got.values()) <= 1.0 + 1e-12


def test_pagerank_plan_depth_bounded_in_iters(spark):
    """Each PageRank round localCheckpoints, so the final plan must not
    unroll iters join+agg rounds — its size stays flat as iters grows
    (the lineage starts at the last round's checkpointed RDD)."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    p5 = graph.pagerank(nodes, edges, iters=5)._jdf.queryExecution().executedPlan().toString()
    p20 = graph.pagerank(nodes, edges, iters=20)._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in p20 or "LogicalRDD" in p20 or "Scan" in p20
    assert len(p20) < 2 * len(p5), (len(p5), len(p20))


# --- operators/motif.py -------------------------------------------------------------


def _motif_graph(spark):
    from scopus_spark.operators import motif  # noqa: F401

    edges = spark.createDataFrame(
        [(1, 2, "x"), (2, 3, "y"), (1, 3, "z"), (3, 1, "w"), (4, 1, "v")],
        "src long, dst long, tag string",
    )
    vertices = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3"), (4, "a4")], "id long, name string"
    )
    return edges, vertices


def test_motif_chain_binds_named_vertices_and_edges(spark):
    from scopus_spark.operators import motif

    edges, _ = _motif_graph(spark)
    rows = motif.find(edges, "(a)-[e1]->(b); (b)-[e2]->(c)").collect()
    got = {(r["a"]["id"], r["b"]["id"], r["c"]["id"], r["e1"]["tag"]) for r in rows}
    # paths of length 2: 1->2->3(x), 2->3->1(y), 1->3->1(z), 3->1->2(w),
    # 3->1->3(w), 4->1->2(v), 4->1->3(v)
    assert (1, 2, 3, "x") in got and (4, 1, 3, "v") in got
    assert len(rows) == 7


def test_motif_negation_and_anonymous_vertex(spark):
    from scopus_spark.operators import motif

    edges, _ = _motif_graph(spark)
    # asymmetric edges: (a)->(b) with no (b)->(a)
    rows = motif.find(edges, "(a)-[]->(b); !(b)-[]->(a)").collect()
    got = {(r["a"]["id"], r["b"]["id"]) for r in rows}
    assert got == {(1, 2), (2, 3), (4, 1)}  # 1<->3 both ways drops out
    # anonymous source: every vertex with an out-neighbor of 3
    rows = motif.find(edges, "()-[]->(b)").collect()
    assert {r["b"]["id"] for r in rows} == {1, 2, 3}


def test_motif_vertex_attributes_join(spark):
    from scopus_spark.operators import motif

    edges, vertices = _motif_graph(spark)
    rows = motif.find(edges, "(a)-[]->(b)", vertices=vertices).collect()
    assert all(r["a"]["name"] == f"a{r['a']['id']}" for r in rows)


def test_motif_rejects_bad_patterns(spark):
    from scopus_spark.operators import motif

    edges, _ = _motif_graph(spark)
    for bad in (
        "(a)-[e]->",                      # unparseable
        "(a)-[]->(a)",                    # self-loop term
        "!(a)-[]->(b)",                   # all-negative pattern
        "(a)-[]->(b); !(a)-[e]->(b)",     # named edge in negation
        "(a)-[]->(b); (c)-[]->(d)",       # disconnected terms
        "(a)-[]->(b); !(b)-[]->(z)",      # negation on unbound vertex
        "(a)-[e]->(b); (b)-[e]->(c)",     # duplicate edge name
    ):
        with pytest.raises(ValueError):
            motif.find(edges, bad).collect()


def test_bfs_cap_allows_exact_eccentricity(spark):
    """A walk whose eccentricity EQUALS max_iterations must finish: the
    emptiness-probe round is not an expansion round (review fix)."""
    from scopus_spark.operators import graph

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        r["node"]: r["hops"]
        for r in graph.bfs_hops(e, 0, max_iterations=2).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}
    import pytest

    with pytest.raises(RuntimeError, match="exceeded"):
        e3 = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "src long, dst long"
        )
        graph.bfs_hops(e3, 0, max_iterations=2)


def test_lpa_two_cliques_with_bridge(spark):
    """Two triangles joined by one bridge edge: CC sees one component,
    LPA keeps two communities (each labeled by its min node)."""
    e = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
    )
    comm = {
        r["node"]: r["community"]
        for r in graph.label_propagation(e, rounds=4).collect()
    }
    assert comm[1] == comm[2] == comm[3]
    assert comm[4] == comm[5] == comm[6]
    assert comm[1] != comm[4]


def test_lpa_deterministic_tiebreak_and_partitioning(spark):
    """On a 4-cycle every node has two equally-frequent neighbor labels —
    the min-label tie-break must make the result deterministic and
    partitioning-invariant."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
    a = {
        r["node"]: r["community"]
        for r in graph.label_propagation(_edges(spark, pairs), rounds=4).collect()
    }
    b = {
        r["node"]: r["community"]
        for r in graph.label_propagation(
            _edges(spark, pairs).repartition(7), rounds=4
        ).collect()
    }
    assert a == b
    assert set(a) == {1, 2, 3, 4}


def test_ppr_seed_hardening(spark):
    """Duplicate seed rows and seeds absent from the node set must not
    change ranks: dups would fan out the roster join, foreign ids would
    shrink the restart mass."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    clean = spark.createDataFrame([(0,), (2,)], "node long")
    noisy = spark.createDataFrame(
        [(0,), (0,), (2,), (99,)], "node long"  # dup + foreign id
    )
    a = {
        r["node"]: r["pagerank"]
        for r in graph.pagerank(nodes, edges, iters=3, seeds=clean).collect()
    }
    b = {
        r["node"]: r["pagerank"]
        for r in graph.pagerank(nodes, edges, iters=3, seeds=noisy).collect()
    }
    assert a == b
    assert len(a) == 4  # no duplicate roster rows
