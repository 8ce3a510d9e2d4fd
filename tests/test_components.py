"""Connected components: exact labels vs union-find oracle, both modes."""

import pytest

from graft import fixtures
from graft.algos.components import connected_components
from graft.graph import Graph
from tests.reference_impls import components_ref, random_graph


# mode parametrizations force the distributed paths with st=0; the
# "seq" rows cover the sequential-tail union-find (the default for
# graphs that fit one Arrow batch)
MODES = [("propagate", 0), ("star", 0), ("propagate", 200_000)]
MODE_IDS = ["propagate", "star", "seq"]


def _check(spark, edges, mode, st=0):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.comp for r in connected_components(
        g, mode=mode, sequential_threshold=st).collect()}
    g.unpersist()
    want = components_ref(edges)
    assert got == want


@pytest.mark.parametrize("mode,st", MODES, ids=MODE_IDS)
def test_clique_ring_single_component(spark, mode, st):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    got = {r.id: r.comp for r in connected_components(
        g, mode=mode, sequential_threshold=st).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 20


@pytest.mark.parametrize("mode,st", MODES, ids=MODE_IDS)
def test_disconnected_components(spark, mode, st):
    # three islands: a triangle, a path, an isolated self-loop vertex
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
        (10, 11, 1.0), (11, 12, 1.0),
        (20, 20, 1.0),
    ]
    _check(spark, edges, mode, st)


@pytest.mark.parametrize("mode,st", MODES, ids=MODE_IDS)
def test_random_graphs_match_union_find(spark, mode, st):
    for seed in (3, 4):
        edges = random_graph(40, 0.04, seed=seed)
        if not edges:
            continue
        _check(spark, edges, mode, st)


@pytest.mark.parametrize("mode,st", MODES, ids=MODE_IDS)
def test_long_path(spark, mode, st):
    # worst case for propagation diameter; star mode needs O(log n)
    edges = [(i, i + 1, 1.0) for i in range(30)]
    _check(spark, edges, mode, st)
