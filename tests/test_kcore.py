"""k-core extraction (iterative peeling) vs a numpy peeling oracle."""

import numpy as np
import pytest

from graft import fixtures
from graft.algos.kcore import k_core
from graft.graph import Graph
from tests.reference_impls import random_graph


def _kcore_ref(edges, k):
    """Sequential peeling oracle on the undirected simple graph."""
    adj: dict[int, set[int]] = {}
    for u, v, _ in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v for v in adj if adj[v]}


def _run(spark, edges, k):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id for r in k_core(g, k).collect()}
    g.unpersist()
    return got


def test_clique_ring_cores(spark):
    edges = fixtures.clique_ring_edges()
    # every vertex has degree >= 3 (cliques of 4 + bridges): full 3-core
    assert _run(spark, edges, 3) == set(range(20))
    # only bridge endpoints reach degree 4, and they collapse: empty
    assert _run(spark, edges, 4) == set()


def test_triangle_with_tail(spark):
    # triangle {0,1,2} with a pendant path 2-3-4: 2-core = the triangle
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0),
             (3, 4, 1.0)]
    assert _run(spark, edges, 2) == {0, 1, 2}


@pytest.mark.parametrize("k", [2, 3])
def test_random_graph_matches_peeling_oracle(spark, k):
    edges = random_graph(60, 0.06, seed=17)
    assert _run(spark, edges, k) == _kcore_ref(edges, k)
