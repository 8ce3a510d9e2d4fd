"""Connected components: exact labels vs union-find oracle, both modes."""

import pytest

from graft import fixtures
from graft.algos.components import connected_components
from graft.graph import Graph
from tests.reference_impls import components_ref, random_graph


def _check(spark, edges, mode):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.comp for r in connected_components(g, mode=mode).collect()}
    g.unpersist()
    want = components_ref(edges)
    assert got == want


@pytest.mark.parametrize("mode", ["propagate", "star"])
def test_clique_ring_single_component(spark, mode):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    got = {r.id: r.comp for r in connected_components(g, mode=mode).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 20


@pytest.mark.parametrize("mode", ["propagate", "star"])
def test_disconnected_components(spark, mode):
    # three islands: a triangle, a path, an isolated self-loop vertex
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
        (10, 11, 1.0), (11, 12, 1.0),
        (20, 20, 1.0),
    ]
    _check(spark, edges, mode)


@pytest.mark.parametrize("mode", ["propagate", "star"])
def test_random_graphs_match_union_find(spark, mode):
    for seed in (3, 4):
        edges = random_graph(40, 0.04, seed=seed)
        if not edges:
            continue
        _check(spark, edges, mode)


@pytest.mark.parametrize("mode", ["propagate", "star"])
def test_long_path(spark, mode):
    # worst case for propagation diameter; star mode needs O(log n)
    edges = [(i, i + 1, 1.0) for i in range(30)]
    _check(spark, edges, mode)
