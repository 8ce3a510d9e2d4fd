"""Triangle counting: exact vs brute-force oracle (north_rule: identical
triangle counts)."""

import pytest

from graft import fixtures
from graft.algos.triangles import triangle_count, triangles_per_vertex
from graft.graph import Graph
from tests.reference_impls import (
    random_graph,
    triangles_per_vertex_ref,
    triangles_ref,
)


def _graph(spark, edges):
    return Graph.from_undirected(fixtures.edges_df(spark, edges))


@pytest.mark.parametrize("st", [0, 200_000], ids=["dist", "seq"])
def test_clique_ring_20_triangles(spark, st):
    # 4 triangles per K4 x 5 cliques; bridges add none (FIXTURES.md F2)
    g = _graph(spark, fixtures.clique_ring_edges())
    assert triangle_count(g, sequential_threshold=st) == 20


def test_weighted_triangle(spark):
    assert triangle_count(_graph(spark, fixtures.weighted_triangle_edges())) == 1


def test_bridged_cliques(spark):
    g = _graph(spark, fixtures.bridged_cliques_edges())
    assert triangle_count(g) == triangles_ref(fixtures.bridged_cliques_edges())


@pytest.mark.parametrize("st", [0, 200_000], ids=["dist", "seq"])
def test_self_loops_dont_count(spark, st):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 0, 1.0)]
    assert triangle_count(_graph(spark, edges), sequential_threshold=st) == 1


@pytest.mark.parametrize("st", [0, 200_000], ids=["dist", "seq"])
def test_random_graphs(spark, st):
    for seed in (5, 6, 7):
        edges = random_graph(25, 0.25, seed=seed)
        assert triangle_count(
            _graph(spark, edges), sequential_threshold=st
        ) == triangles_ref(edges)


def test_per_vertex_counts(spark):
    edges = random_graph(20, 0.3, seed=9)
    g = _graph(spark, edges)
    got = {r.id: r.triangles for r in triangles_per_vertex(g).collect()}
    assert got == triangles_per_vertex_ref(edges)
