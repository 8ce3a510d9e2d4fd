"""Vertex pair-similarity family (cugraph jaccard/overlap/sorensen)."""

from graft import fixtures
from graft.algos.jaccard import (
    common_neighbors,
    overlap_coefficient,
    preferential_attachment,
    sorensen_coefficient,
    vertex_jaccard,
)
from graft.graph import Graph


def test_clique_ring_jaccard(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    got = {(r.u, r.v): r.jaccard for r in vertex_jaccard(g).collect()}
    g.unpersist()
    # one row per undirected edge (ring of five 4-cliques: 5*6 + 5)
    assert len(got) == 35
    # intra-clique edge (1,2): N(1)={0,2,3}, N(2)={0,1,3} -> common
    # {0,3}, union 3+3-2=4 -> 0.5
    assert got[(1, 2)] == 0.5
    # clique edge touching a bridge vertex (0,1): N(0)={1,2,3,19},
    # N(1)={0,2,3} -> common {2,3}, union 4+3-2=5 -> 0.4
    assert got[(0, 1)] == 0.4
    # bridge edge (3,4): disjoint neighborhoods -> 0
    assert got[(3, 4)] == 0.0


def test_custom_pairs(spark):
    """Non-edge candidate pairs score too (link prediction)."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    pairs = spark.createDataFrame([(0, 2), (0, 8)], "u long, v long")
    got = {(r.u, r.v): r.jaccard for r in
           vertex_jaccard(g, pairs=pairs).collect()}
    g.unpersist()
    # (0,2) same clique: N(0)={1,2,3,19}, N(2)={0,1,3} -> common {1,3},
    # union 4+3-2=5 -> 0.4; (0,8) distant -> 0
    assert got[(0, 2)] == 0.4
    assert got[(0, 8)] == 0.0


def test_custom_pairs_with_non_graph_endpoints(spark):
    """Pairs whose endpoint has no edges still score 0 (not dropped)."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    pairs = spark.createDataFrame(
        [(0, 999), (998, 999), (0, 2)], "u long, v long"
    )
    got = {(r.u, r.v): r.jaccard for r in
           vertex_jaccard(g, pairs=pairs).collect()}
    g.unpersist()
    assert got == {(0, 999): 0.0, (998, 999): 0.0, (0, 2): 0.4}


def test_overlap_and_sorensen(spark):
    """Overlap = |∩|/min(d), Sorensen = 2|∩|/(du+dv) on the same wedge
    machinery; brute-force neighborhood oracle over every edge."""
    edges = fixtures.clique_ring_edges()
    adj: dict[int, set[int]] = {}
    for u, v, _ in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got_o = {(r.u, r.v): r.overlap for r in overlap_coefficient(g).collect()}
    got_s = {(r.u, r.v): r.sorensen
             for r in sorensen_coefficient(g).collect()}
    g.unpersist()
    assert set(got_o) == set(got_s) and len(got_o) == 35
    for (u, v), score in got_o.items():
        nc = len(adj[u] & adj[v])
        assert score == round(nc / min(len(adj[u]), len(adj[v])), 6), (u, v)
        assert got_s[(u, v)] == round(
            2 * nc / (len(adj[u]) + len(adj[v])), 6
        ), (u, v)


def test_common_neighbors_and_pref_attach(spark):
    """Brute-force neighborhood oracle over every edge for the two
    denominator-free scorers (networkx common_neighbors /
    preferential_attachment semantics)."""
    edges = fixtures.clique_ring_edges()
    adj: dict[int, set[int]] = {}
    for u, v, _ in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got_c = {(r.u, r.v): r.n_common for r in common_neighbors(g).collect()}
    got_p = {(r.u, r.v): r.pref_attach
             for r in preferential_attachment(g).collect()}
    g.unpersist()
    assert set(got_c) == set(got_p) and len(got_c) == 35
    for (u, v), nc in got_c.items():
        assert nc == len(adj[u] & adj[v]), (u, v)
        assert got_p[(u, v)] == len(adj[u]) * len(adj[v]), (u, v)


def test_common_neighbors_pref_attach_edge_less_endpoints(spark):
    """Candidate pairs with edge-less endpoints score 0, never drop."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    pairs = spark.createDataFrame([(0, 999), (0, 2)], "u long, v long")
    got_c = {(r.u, r.v): r.n_common
             for r in common_neighbors(g, pairs=pairs).collect()}
    got_p = {(r.u, r.v): r.pref_attach
             for r in preferential_attachment(g, pairs=pairs).collect()}
    g.unpersist()
    # (0,2) same clique: common {1,3}; deg(0)=4 (incl. ring edge), deg(2)=3
    assert got_c == {(0, 999): 0, (0, 2): 2}
    assert got_p == {(0, 999): 0, (0, 2): 12}


def test_overlap_edge_less_endpoints_score_zero(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    pairs = spark.createDataFrame([(0, 999)], "u long, v long")
    assert overlap_coefficient(g, pairs=pairs).collect()[0].overlap == 0.0
    assert sorensen_coefficient(g, pairs=pairs).collect()[0].sorensen == 0.0
    g.unpersist()
