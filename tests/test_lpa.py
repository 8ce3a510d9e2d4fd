"""Label propagation: deterministic sync LPA vs the python oracle."""

from graft import fixtures
from graft.algos.lpa import label_propagation
from graft.graph import Graph
from tests.reference_impls import lpa_ref, random_graph


def _check(spark, edges, max_iter=20):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {
        r.id: r.label for r in label_propagation(g, max_iter=max_iter).collect()
    }
    g.unpersist()
    assert got == lpa_ref(edges, max_iter=max_iter)


def test_two_cliques_bridge(spark):
    _check(spark, fixtures.bridged_cliques_edges())


def test_clique_ring_fixed_rounds(spark):
    # bounded rounds keep sync-LPA deterministic even if oscillating
    _check(spark, fixtures.clique_ring_edges(), max_iter=4)


def test_weighted_ties_break_deterministically(spark):
    # vertex 1 sees labels 0 and 2 with equal weight -> picks min label 0
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    _check(spark, edges, max_iter=3)


def test_random_graphs(spark):
    for seed in (13, 14):
        _check(spark, random_graph(30, 0.1, seed=seed), max_iter=6)


def test_clique_ring_converges_to_cliques(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_weighted_edges())
    )
    labels = {
        r.id: r.label for r in label_propagation(g, max_iter=20).collect()
    }
    # each 4-clique should share one label (weighted bridges are weaker)
    for c in range(5):
        block = {labels[4 * c + i] for i in range(4)}
        assert len(block) == 1, f"clique {c}: {block}"
