"""Louvain: golden partitions on the reference validation graphs
(SURVEY.md §5 — clique_ring → exactly the 5 cliques)."""

import pytest

from graft import fixtures
from graft.algos.louvain import louvain
from graft.graph import Graph
from graft.quality import modularity
from tests.reference_impls import modularity_ref


def _partition(spark, edges, **kw):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    labels = {r.id: r.community for r in louvain(g, **kw).collect()}
    g.unpersist()
    return g, labels


def _groups(labels):
    out = {}
    for v, c in labels.items():
        out.setdefault(c, set()).add(v)
    return sorted(map(frozenset, out.values()), key=min)


@pytest.mark.parametrize("tail", [200_000, 0],
                         ids=["seq_tail", "bsp"])
def test_clique_ring_finds_the_cliques(spark, tail):
    g, labels = _partition(spark, fixtures.clique_ring_edges(),
                           sequential_tail_edges=tail)
    assert _groups(labels) == [
        frozenset(range(4 * c, 4 * c + 4)) for c in range(5)
    ]


def test_clique_ring_weighted(spark):
    g, labels = _partition(spark, fixtures.clique_ring_weighted_edges())
    assert _groups(labels) == [
        frozenset(range(4 * c, 4 * c + 4)) for c in range(5)
    ]


@pytest.mark.parametrize("tail", [200_000, 0],
                         ids=["seq_tail", "bsp"])
def test_bridged_cliques_two_communities(spark, tail):
    g, labels = _partition(spark, fixtures.bridged_cliques_edges(),
                           sequential_tail_edges=tail)
    assert _groups(labels) == [frozenset({0, 1, 2, 3}), frozenset({4, 5, 6, 7})]


def test_modularity_at_convergence_matches_oracle_formula(spark):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    result = louvain(g)
    labels = {r.id: r.community for r in result.collect()}
    q_spark = modularity(
        g.edges,
        result.withColumnRenamed("label", "community"),
    )
    q_ref = modularity_ref(edges, labels)
    assert q_spark == pytest.approx(q_ref, abs=1e-9)
    # known optimum for the 5-clique ring: Q = 5*(12/70 - (14/70)^2)
    assert q_spark == pytest.approx(5 * (12 / 70 - (14 / 70) ** 2), abs=1e-9)
    g.unpersist()


def test_determinism_fixed_seed(spark):
    edges = fixtures.clique_ring_weighted_edges()
    _, l1 = _partition(spark, edges, seed=7)
    _, l2 = _partition(spark, edges, seed=7)
    assert l1 == l2
