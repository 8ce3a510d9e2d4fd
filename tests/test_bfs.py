"""BFS hops / weighted SSSP (cugraph.bfs / cugraph.sssp-shaped)."""

import pytest

from graft import fixtures
from graft.algos.bfs import bfs_hops
from graft.graph import Graph


@pytest.fixture(scope="module")
def ring(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    yield g
    g.unpersist()


def test_bfs_capped(spark, ring):
    got = {r.id: r.hop for r in bfs_hops(ring, 0, max_hops=2).collect()}
    assert got[0] == 0
    assert got[1] == got[2] == got[3] == 1  # same clique
    assert got[19] == 1  # bridge 19-0
    assert got[4] == 2  # via bridge 3-4
    assert got[8] is None  # beyond 2 hops


def test_bfs_converged_covers_all(spark, ring):
    got = {r.id: r.hop for r in bfs_hops(ring, 0).collect()}
    assert None not in got.values()  # connected graph fully reached
    # the ring of five 4-cliques: the far side of the opposite clique
    # is 5 hops (0→3→4→7→8→10); its bridge-adjacent vertices are 4
    assert max(got.values()) == 5
    assert got[10] == 5
    assert got[12] == 4


def test_bfs_predecessors(spark, ring):
    got = {r.id: (r.hop, r.pred) for r in
           bfs_hops(ring, 0, return_predecessors=True).collect()}
    assert got[0] == (0, None)  # source: no predecessor
    # every reached non-source vertex: pred is the min-id neighbor one
    # hop closer
    adj = {}
    for r in ring.edges.collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
    for v, (h, p) in got.items():
        if v == 0:
            continue
        want = min(u for u in adj[v] if got[u][0] == h - 1)
        assert p == want


def test_sssp_predecessors_prefer_cheap_path(spark):
    edges = [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: (r.cost, r.pred) for r in
           bfs_hops(g, 0, weighted=True,
                    return_predecessors=True).collect()}
    g.unpersist()
    # vertex 1's shortest path arrives via 2 (cost 2.0), not via the
    # weight-10 direct edge from 0
    assert got[1] == (2.0, 2)
    assert got[2] == (1.0, 0)
    assert got[0] == (0.0, None)


def test_weighted_sssp(spark):
    """Weighted shortest path prefers the cheap 2-edge detour over the
    heavy direct edge."""
    edges = [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.cost for r in
           bfs_hops(g, 0, weighted=True).collect()}
    g.unpersist()
    assert got[0] == 0.0
    assert got[2] == 1.0
    assert got[1] == 2.0  # 0→2→1 beats the weight-10 direct edge


def test_predecessors_ignore_self_loops(spark):
    # a zero-weight self-loop satisfies dist(u)+w == dist(v) on itself;
    # it must not become anyone's pred (source stays NULL)
    edges = [(0, 0, 0.0), (0, 1, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: (r.cost, r.pred) for r in
           bfs_hops(g, 0, weighted=True,
                    return_predecessors=True).collect()}
    g.unpersist()
    assert got[0] == (0.0, None)
    assert got[1] == (1.0, 0)
