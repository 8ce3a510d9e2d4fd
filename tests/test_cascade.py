"""Deterministic IC cascade vs a brute-force live-edge reachability."""

import hashlib

import pytest

from graft import fixtures
from graft.algos.cascade import ic_spread
from graft.graph import Graph

_MOD = 2**60


def _coin(u, v, p, salt="ic"):
    h = int(hashlib.md5(f"{u}|{v}#{salt}".encode()).hexdigest()[:15], 16)
    return h < int(p * _MOD)


def _ref_spread(edges, seeds, p, rounds, salt="ic"):
    adj: dict = {}
    for u, v, _ in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    live: dict = {}
    for u in adj:
        live[u] = {v for v in adj[u] if _coin(u, v, p, salt)}
    dist = {s: 0 for s in seeds}  # callers pass graph vertices
    frontier = set(dist)
    for r in range(1, rounds + 1):
        nxt = set()
        for u in frontier:
            for v in live.get(u, ()):
                if v not in dist:
                    dist[v] = r
                    nxt.add(v)
        frontier = nxt
    return dist


@pytest.mark.parametrize("p", [0.3, 0.7])
def test_ic_spread_matches_live_edge_reachability(spark, p):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {
        r.id: r.round
        for r in ic_spread(g, seeds=[0, 10], p=p, rounds=3).collect()
    }
    g.unpersist()
    exp = _ref_spread(edges, [0, 10], p, 3)
    assert got == exp
    assert got[0] == 0 and got[10] == 0
    if p == 0.7:  # dense coins: the cascade actually spreads
        assert len(got) > 2


def test_ic_spread_p_extremes_and_validation(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    # p=0: nothing fires beyond the seeds
    only_seed = ic_spread(g, seeds=[0], p=0.0, rounds=3).collect()
    assert [(r.id, r.round) for r in only_seed] == [(0, 0)]
    # p=1: every edge live -> plain BFS rounds
    full = {
        r.id: r.round
        for r in ic_spread(g, seeds=[0], p=1.0, rounds=2).collect()
    }
    exp = _ref_spread(fixtures.clique_ring_edges(), [0], 1.0, 2)
    assert full == exp
    with pytest.raises(ValueError):
        ic_spread(g, seeds=[], p=0.5)
    with pytest.raises(ValueError):
        ic_spread(g, seeds=[0], p=1.5)
    # a typo'd seed is an input error, not an empty cascade
    with pytest.raises(ValueError, match="no seed vertex"):
        ic_spread(g, seeds=[999], p=0.5)
    g.unpersist()
