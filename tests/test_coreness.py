"""operators/graph.coreness — exact k-core numbers via distributed peeling.

The contract: node-for-node equality with single-node brute-force peeling
(the sequential Matula–Beck algorithm), on constructed graphs that exercise
every edge case and on the real dup graph the n12 key declares.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from scopus_spark.operators.graph import coreness


def _brute(edges: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    live = set(adj)
    deg = {v: len(adj[v]) for v in live}
    core: dict[int, int] = {}
    k = 1
    while live:
        low = {v for v in live if deg[v] < k}
        if not low:
            k += 1
            continue
        for v in low:
            core[v] = k - 1
            live.discard(v)
            for u in adj[v]:
                if u in live:
                    deg[u] -= 1
    return core


def _spark_coreness(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.coreness for r in coreness(df).collect()}


def test_textbook_graph(spark):
    """Triangle + pendant + chain + isolated-pair: coreness 2/2/2 for the
    triangle, 1 for everything attached by single edges, and the
    degree-0-after-peel node (chain middle) must still get labeled."""
    edges = [
        (1, 2), (2, 3), (1, 3),     # triangle: core 2
        (3, 4),                     # pendant off the triangle: core 1
        (5, 6), (6, 7),             # path: all core 1
        (8, 9),                     # isolated edge: core 1
    ]
    assert _spark_coreness(spark, edges) == _brute(edges)
    assert _brute(edges)[1] == 2 and _brute(edges)[4] == 1


def test_two_cliques_joined_by_bridge(spark):
    """The bridge must NOT inflate coreness: K4 members stay 3, the
    bridge endpoints keep their clique coreness."""
    k4a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k4b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14) if i < j]
    edges = k4a + k4b + [(0, 10)]
    got = _spark_coreness(spark, edges)
    assert got == _brute(edges)
    assert all(got[v] == 3 for v in [0, 1, 2, 3, 10, 11, 12, 13])


def test_deep_peel_chain(spark):
    """A long path forces many peel waves at k=2 — exercises the
    multi-round convergence and the label accumulator."""
    edges = [(i, i + 1) for i in range(30)]
    got = _spark_coreness(spark, edges)
    assert got == _brute(edges)
    assert set(got.values()) == {1}


def test_n12_matches_brute_force_on_dup_graph(spark, sf_dir):
    """The declared key equals sequential peeling on the REAL edge set —
    the HASH check in all but transport."""
    from scopus_spark.queries.graph import _dup_edges, n12_coreness

    edge_rows = _dup_edges(spark, sf_dir).collect()
    edges = [(r.doc_a, r.doc_b) for r in edge_rows]
    expected = _brute(edges)
    got = {r.doc_id: r.coreness for r in n12_coreness(spark, sf_dir).collect()}
    assert got == expected
    assert len(got) > 0


def test_finisher_path_long_chain(spark):
    """wave_rounds too small for a long path forces the per-component
    phase-2 finish; result must still equal brute force exactly."""
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.coreness
        for r in coreness(
            df, wave_rounds=2, driver_edge_threshold=0
        ).collect()
    }
    assert got == _brute(edges)


def test_finisher_mixed_cores_mid_cascade(spark):
    """Abort mid-k-cascade with mixed coreness levels in the residual:
    a K5 (core 4) tied to a long chain (core 1) plus a separate triangle
    component — the floor-clamp splice must keep every label exact."""
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 100)] + [(100 + i, 101 + i) for i in range(40)]
    tri = [(200, 201), (201, 202), (200, 202)]
    edges = k5 + chain + tri
    for budget in (1, 3, 5):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.coreness
            for r in coreness(
                df, wave_rounds=budget, driver_edge_threshold=0
            ).collect()
        }
        assert got == _brute(edges), f"budget={budget}"


def test_self_loops_ignored(spark):
    """Self-loops carry no k-core information: a looped node's coreness
    must equal its loop-free coreness, and a loop-only node is treated
    as isolated (absent), matching _brute."""
    edges = [
        (1, 2), (2, 3), (1, 3),   # triangle
        (1, 1),                   # loop on a core-2 node
        (3, 4), (4, 4),           # pendant with a loop
        (9, 9),                   # loop-only node: excluded
    ]
    got = _spark_coreness(spark, edges)
    assert got == _brute(edges)
    assert got[1] == 2 and got[4] == 1 and 9 not in got


def test_string_keyed_empty_input_schema(spark):
    """The empty-input path must keep the INPUT node type, not flip to
    long."""
    df = spark.createDataFrame([], "src string, dst string")
    out = coreness(df)
    assert dict(out.dtypes)["node"] == "string"
    assert out.count() == 0


def test_giant_residual_component_guard(spark):
    """VERDICT r6 item 8: a residual component bigger than
    max_component_edges must raise an actionable error naming wave_rounds
    instead of funneling the blob into one applyInPandas task. A 20-clique
    survives the k=1 wave untouched (min degree 19), so with wave_rounds=1
    the whole clique reaches phase 2."""
    import pytest

    clique = [(a, b) for a in range(20) for b in range(20) if a != b]
    df = spark.createDataFrame(clique, "src long, dst long")
    with pytest.raises(RuntimeError, match="wave_rounds"):
        coreness(
            df, wave_rounds=1, max_component_edges=10,
            driver_edge_threshold=0,
        ).collect()
    # same graph passes with the default budget (the guard is a bound,
    # not a behavior change)
    got = {
        r.node: r.coreness
        for r in coreness(
            df, wave_rounds=1, driver_edge_threshold=0
        ).collect()
    }
    assert got == _brute([(a, b) for a, b in clique if a < b])


def test_coreness_driver_equals_distributed(spark):
    """r10: the bounded driver-side peel must return the identical
    relation as the distributed wave/finisher machinery (coreness is a
    graph invariant)."""
    import random

    rng = random.Random(13)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    drv = {r.node: r.coreness
           for r in coreness(df, driver_edge_threshold=10**6).collect()}
    dist = {r.node: r.coreness
            for r in coreness(df, driver_edge_threshold=0).collect()}
    assert drv == dist == _brute(edges)
