"""Neighborhood function (exact + HyperANF) and effective diameter."""

import random

import pytest

from graft import fixtures
from graft.algos.anf import effective_diameter, neighborhood_function
from graft.graph import Graph


def _path_graph(spark, n=8):
    edges = [(i, i + 1, 1.0) for i in range(n - 1)]
    return Graph.from_undirected(fixtures.edges_df(spark, edges))


def _exact_nf_bruteforce(edges, n, max_hops):
    """Dict hop → pair count via per-source BFS (test-side oracle)."""
    adj = {i: set() for i in range(n)}
    for u, v, _ in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = {h: 0 for h in range(max_hops + 1)}
    for s in range(n):
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier and d < max_hops:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        for h in range(max_hops + 1):
            out[h] += sum(1 for x in dist.values() if x <= h)
    return out


def test_exact_nf_matches_bruteforce(spark):
    rng = random.Random(5)
    n = 40
    edges = sorted(
        {(min(u, v), max(u, v)) for u, v in
         ((rng.randrange(n), rng.randrange(n)) for _ in range(70))
         if u != v}
    )
    edges = [(u, v, 1.0) for u, v in edges]
    # make sure every vertex exists (isolated ids dropped otherwise)
    edges += [(i, i, 1.0) for i in range(n)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.hop: r.n_pairs
           for r in neighborhood_function(g, 3, exact=True).collect()}
    want = _exact_nf_bruteforce(edges, n, 3)
    g.unpersist()
    assert got == want


def test_exact_nf_path_graph(spark):
    g = _path_graph(spark, 8).cache()
    got = {r.hop: r.n_pairs
           for r in neighborhood_function(g, 7, exact=True).collect()}
    g.unpersist()
    # path of n vertices: N(h) = n + 2*sum_{d=1..h} (n - d)
    n = 8
    for h in range(8):
        assert got[h] == n + 2 * sum(n - d for d in range(1, h + 1))


def test_hll_nf_tracks_exact(spark):
    """HyperANF estimate within HLL tolerance of the exact curve."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    exact = {r.hop: r.n_pairs
             for r in neighborhood_function(g, 4, exact=True).collect()}
    est = {r.hop: r.n_pairs
           for r in neighborhood_function(g, 4, lg_config_k=12).collect()}
    g.unpersist()
    for h in exact:
        assert est[h] == pytest.approx(exact[h], rel=0.1)
    # monotone non-decreasing curve
    assert all(est[h] <= est[h + 1] for h in range(4))


def test_effective_diameter_path(spark):
    g = _path_graph(spark, 8).cache()
    d = effective_diameter(g, q=1.0, exact=True)
    g.unpersist()
    assert d == 7.0  # true diameter at q=1


def test_effective_diameter_interpolates(spark):
    g = _path_graph(spark, 8).cache()
    d = effective_diameter(g, q=0.9, exact=True)
    g.unpersist()
    assert 4.0 < d < 6.0
    # N(4)=52, N(5)=58, plateau N(7)=64 → target 57.6 → 4 + 5.6/6
    assert d == pytest.approx(4.0 + 5.6 / 6.0)
