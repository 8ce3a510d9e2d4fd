"""Katz / eigenvector centrality vs numpy power-iteration oracles."""

import numpy as np
import pytest

from graft import fixtures
from graft.algos.centrality import eigenvector_centrality, katz_centrality
from graft.graph import Graph
from tests.reference_impls import random_graph


def _adj(edges):
    """Symmetric weighted adjacency matching the engine's edge table
    (non-loop edges in both directions, loops once)."""
    verts = sorted({v for e in edges for v in e[:2]})
    pos = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for u, v, w in edges:
        A[pos[u]][pos[v]] += w
        if u != v:
            A[pos[v]][pos[u]] += w
    return verts, pos, A


@pytest.mark.parametrize("edges", [
    fixtures.clique_ring_edges(),
    fixtures.clique_ring_weighted_edges(),
    random_graph(50, 0.08, seed=5),
])
def test_katz_fixed_iterations(spark, edges):
    alpha, beta, iters = 0.05, 1.0, 4
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.katz for r in
           katz_centrality(g, alpha=alpha, beta=beta,
                           fixed_iterations=iters).collect()}
    g.unpersist()
    verts, pos, A = _adj(edges)
    x = np.full(len(verts), beta)
    for _ in range(iters):
        x = alpha * (A @ x) + beta
    x = x / np.sqrt((x * x).sum())
    assert set(got) == set(verts)
    for v in verts:
        assert got[v] == pytest.approx(x[pos[v]], abs=1e-9), v


def test_katz_convergence_mode(spark):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.katz for r in
           katz_centrality(g, alpha=0.05, tol=1e-12).collect()}
    g.unpersist()
    # closed form: x* = (I - alpha A)^-1 beta·1, L2-normalized
    verts, pos, A = _adj(edges)
    x = np.linalg.solve(np.eye(len(verts)) - 0.05 * A,
                        np.ones(len(verts)))
    x = x / np.sqrt((x * x).sum())
    for v in verts:
        assert got[v] == pytest.approx(x[pos[v]], abs=1e-6), v


@pytest.mark.parametrize("edges", [
    fixtures.clique_ring_edges(),
    fixtures.clique_ring_weighted_edges(),
])
def test_eigenvector_fixed_iterations(spark, edges):
    iters = 5
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.eigenvector for r in
           eigenvector_centrality(g, fixed_iterations=iters).collect()}
    g.unpersist()
    verts, pos, A = _adj(edges)
    x = np.full(len(verts), 1.0 / np.sqrt(len(verts)))
    for _ in range(iters):
        y = A @ x
        x = y / np.sqrt((y * y).sum())
    for v in verts:
        assert got[v] == pytest.approx(x[pos[v]], abs=1e-9), v


def test_eigenvector_converges_to_principal(spark):
    edges = fixtures.clique_ring_weighted_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.eigenvector for r in
           eigenvector_centrality(g, tol=1e-10).collect()}
    g.unpersist()
    verts, pos, A = _adj(edges)
    vals, vecs = np.linalg.eigh(A)
    principal = vecs[:, np.argmax(vals)]
    if principal.sum() < 0:
        principal = -principal
    for v in verts:
        assert got[v] == pytest.approx(principal[pos[v]], abs=1e-4), v
