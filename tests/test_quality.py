"""CPM / modularity agreement with the clean-room python formulas."""

import pytest

from graft import fixtures
from graft.graph import Graph
from graft.quality import cpm, modularity
from tests.reference_impls import cpm_ref, modularity_ref, random_graph


def _assign(spark, labels):
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in labels.items()], "id long, community long"
    )


def _clique_labels():
    return {v: v // 4 for v in range(20)}


def test_cpm_clique_ring_exact(spark):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = _clique_labels()
    got = cpm(g.edges, _assign(spark, labels), gamma=0.1)
    want = cpm_ref(edges, labels, gamma=0.1)
    # 5 cliques: w_in=6 each, n=4 → 5*(6 - 0.1*6) = 27
    assert want == pytest.approx(27.0)
    assert got == pytest.approx(want, abs=1e-9)


def test_modularity_clique_ring(spark):
    edges = fixtures.clique_ring_weighted_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = _clique_labels()
    got = modularity(g.edges, _assign(spark, labels))
    assert got == pytest.approx(modularity_ref(edges, labels), abs=1e-9)


def test_quality_with_self_loops_and_random_labels(spark):
    edges = random_graph(20, 0.2, seed=21) + [(2, 2, 1.5), (7, 7, 0.5)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = {v: v % 3 for v in range(20)}
    a = _assign(spark, labels)
    assert modularity(g.edges, a) == pytest.approx(
        modularity_ref(edges, labels), abs=1e-9
    )
    assert cpm(g.edges, a, gamma=0.25) == pytest.approx(
        cpm_ref(edges, labels, gamma=0.25), abs=1e-9
    )


def test_singleton_partition_modularity_negative_or_zero(spark):
    edges = fixtures.weighted_triangle_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = {0: 0, 1: 1, 2: 2}
    got = modularity(g.edges, _assign(spark, labels))
    assert got == pytest.approx(modularity_ref(edges, labels), abs=1e-9)
    assert got < 0
