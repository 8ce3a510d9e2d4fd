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


def _dadj(rows):
    """Directed weighted adjacency A[u][v] = w for u→v."""
    verts = sorted({v for e in rows for v in e[:2]})
    pos = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for u, v, w in rows:
        A[pos[u]][pos[v]] += w
    return verts, A


def _hits_oracle(A, iters):
    n = A.shape[0]
    h = np.full(n, 1.0 / np.sqrt(n))
    a = h.copy()
    for _ in range(iters):
        a = A.T @ h
        nrm = np.linalg.norm(a)
        if nrm > 0:
            a = a / nrm
        h = A @ a
        nrm = np.linalg.norm(h)
        if nrm > 0:
            h = h / nrm
    return h, a


@pytest.mark.parametrize("rows", [
    # chain with a hub: 0 points at everyone, 3 pointed at by everyone
    [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (1, 3, 1.0), (2, 3, 2.0)],
    # cycle + shortcut
    [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 2, 3.0)],
])
def test_hits_fixed_iterations_directed(spark, rows):
    from graft.algos.centrality import hits
    from graft.graph import Graph

    iters = 4
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = Graph(e, symmetric=False)
    got = {r.id: (r.hub, r.authority)
           for r in hits(g, fixed_iterations=iters).collect()}
    verts, A = _dadj(rows)
    h, a = _hits_oracle(A, iters)
    assert set(got) == set(verts)
    for i, v in enumerate(verts):
        assert got[v][0] == pytest.approx(h[i], abs=1e-9)
        assert got[v][1] == pytest.approx(a[i], abs=1e-9)


def test_hits_converged_matches_power_iteration(spark):
    from graft.algos.centrality import hits
    from graft.graph import Graph

    rows = [(u, v, w) for u, v, w in random_graph(30, 0.12, seed=9)]
    # make it directed: keep the (u, v, w) orientation as emitted
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = Graph(e, symmetric=False)
    got = {r.id: (r.hub, r.authority)
           for r in hits(g, tol=1e-12).collect()}
    verts, A = _dadj(rows)
    h, a = _hits_oracle(A, 200)
    for i, v in enumerate(verts):
        assert got[v][0] == pytest.approx(h[i], abs=1e-6)
        assert got[v][1] == pytest.approx(a[i], abs=1e-6)


def test_hits_symmetric_equals_eigenvector(spark):
    """On a symmetrized table hub == authority == the principal
    eigenvector (same power iteration)."""
    from graft.algos.centrality import hits
    from graft.graph import Graph

    edges = fixtures.clique_ring_weighted_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: (r.hub, r.authority)
           for r in hits(g, tol=1e-12).collect()}
    eig = {r.id: r.eigenvector
           for r in eigenvector_centrality(g, tol=1e-12).collect()}
    g.unpersist()
    for v, (h, a) in got.items():
        assert h == pytest.approx(a, abs=1e-6)
        assert h == pytest.approx(eig[v], abs=1e-5)


def test_degree_centrality(spark):
    from graft.algos.centrality import degree_centrality

    # star 0-{1,2,3} plus self-loop on 1 (excluded from the count)
    edges = [(0, 1, 5.0), (0, 2, 1.0), (0, 3, 1.0), (1, 1, 9.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r["id"]: r["degree_centrality"]
           for r in degree_centrality(g).collect()}
    g.unpersist()
    assert got == {0: 1.0, 1: round(1 / 3, 6), 2: round(1 / 3, 6),
                   3: round(1 / 3, 6)}
