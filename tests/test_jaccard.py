"""Vertex pair-similarity family (cugraph jaccard/overlap/sorensen)."""

from graft import fixtures
from graft.algos.jaccard import (
    common_neighbors,
    overlap_coefficient,
    preferential_attachment,
    salton_index,
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


def _weighted_ref(edges, weights=None):
    """Pure-python weighted pair stats on the undirected edge set:
    (cw, su, sv) per canonical edge, neighbor-weighted."""
    adj: dict = {}
    strength: dict = {}
    for u, v, w in edges:
        if u == v:
            strength[u] = strength.get(u, 0.0) + 2 * w
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
        strength[u] = strength.get(u, 0.0) + w
        strength[v] = strength.get(v, 0.0) + w
    wt = weights if weights is not None else strength
    out = {}
    for u in adj:
        for v in adj[u]:
            if u < v:
                cw = sum(wt.get(x, 0.0) for x in adj[u] & adj[v])
                su = sum(wt.get(x, 0.0) for x in adj[u])
                sv = sum(wt.get(x, 0.0) for x in adj[v])
                out[(u, v)] = (cw, su, sv)
    return out


def test_weighted_jaccard_family(spark):
    from graft.algos.jaccard import (
        overlap_coefficient_w,
        sorensen_coefficient_w,
        vertex_jaccard_w,
    )

    edges = [
        (0, 1, 2.0), (0, 2, 1.0), (1, 2, 4.0), (2, 3, 0.5),
        (1, 3, 1.0), (3, 3, 2.0),
    ]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    ref = _weighted_ref(edges)
    jw = {(r.u, r.v): r.jaccard_w for r in vertex_jaccard_w(g).collect()}
    ow = {(r.u, r.v): r.overlap_w
          for r in overlap_coefficient_w(g).collect()}
    sw = {(r.u, r.v): r.sorensen_w
          for r in sorensen_coefficient_w(g).collect()}
    g.unpersist()
    assert jw.keys() == ref.keys()
    for p, (cw, su, sv) in ref.items():
        assert jw[p] == round(cw / (su + sv - cw), 6), p
        assert ow[p] == (round(cw / min(su, sv), 6) if min(su, sv) else 0.0)
        assert sw[p] == round(2 * cw / (su + sv), 6)


def test_weighted_jaccard_custom_weights_and_pairs(spark):
    from graft.algos.jaccard import vertex_jaccard_w

    edges = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    wdf = spark.createDataFrame(
        [(0, 10.0), (1, 1.0), (2, 1.0)], "id long, w double"
    )
    pairs = spark.createDataFrame([(1, 2), (0, 7)], "u long, v long")
    got = {(r.u, r.v): r.jaccard_w for r in
           vertex_jaccard_w(g, vertex_weights=wdf, pairs=pairs).collect()}
    g.unpersist()
    # N(1)∩N(2) = {0} (w 10); N(1)∪N(2) = {0,1,2} (w 12)
    assert got[(1, 2)] == round(10.0 / 12.0, 6)
    # endpoint 7 has no edges: row kept, score 0
    assert got[(0, 7)] == 0.0


def test_salton_index(spark):
    """Salton (cosine) = |∩|/√(du·dv); brute-force neighborhood oracle
    over every edge, plus 0-score-keep for edge-less endpoints."""
    import math

    edges = fixtures.clique_ring_edges()
    adj: dict[int, set[int]] = {}
    for u, v, _ in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {(r.u, r.v): r.salton for r in salton_index(g).collect()}
    assert len(got) == 35
    for (u, v), score in got.items():
        nc = len(adj[u] & adj[v])
        exp = round(nc / math.sqrt(len(adj[u]) * len(adj[v])), 6)
        assert score == exp, (u, v)
    pairs = spark.createDataFrame([(0, 999)], "u long, v long")
    assert salton_index(g, pairs=pairs).collect()[0].salton == 0.0
    g.unpersist()
