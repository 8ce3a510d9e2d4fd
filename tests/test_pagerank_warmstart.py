"""Warm-start PageRank (initial_ranks): the incremental-recompute path.

Invariant: the PageRank fixpoint is independent of r0, so a warm start
may only change iterations-to-convergence — never the answer. The
iteration saving is measured through checkpoint metrics (one metrics
line per superstep on the distributed path).
"""

import random

import pytest

from graft import fixtures
from graft.algos.pagerank import pagerank
from graft.checkpoint import Checkpointer
from graft.graph import Graph


def _random_edges(seed=3, n=60, m=150):
    rng = random.Random(seed)
    es = {(min(u, v), max(u, v)) for u, v in
          ((rng.randrange(n), rng.randrange(n)) for _ in range(m)) if u != v}
    # chain guarantees one component
    es |= {(i, i + 1) for i in range(n - 1)}
    return [(u, v, 1.0) for u, v in sorted(es)]


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_fixpoint_independent_of_r0_sequential(spark):
    """A wildly skewed r0 (all mass on vertex 0) converges to the same
    fixpoint as the uniform start — sequential path."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    cold = _ranks(pagerank(g, tol=1e-12))
    skewed = spark.createDataFrame([(0, 1000.0)], "id long, rank double")
    warm = _ranks(pagerank(g, tol=1e-12, initial_ranks=skewed))
    g.unpersist()
    assert warm == pytest.approx(cold, abs=1e-9)


def test_warm_start_converges_faster_distributed(spark, tmp_path):
    """On an incrementally-grown graph, warm-starting from the previous
    graph's converged ranks takes measurably fewer supersteps than the
    uniform cold start (checkpoint metrics count supersteps), and both
    reach the same fixpoint within tolerance."""
    edges = _random_edges()
    old = Graph.from_undirected(
        fixtures.edges_df(spark, edges[:-10])
    ).cache()
    prev = pagerank(old, alpha=0.5, tol=1e-10)  # converged on old graph
    prev = prev.localCheckpoint(eager=True)
    old.unpersist()

    grown = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    # alpha=0.5 halves the convergence constant so the distributed runs
    # stay test-suite-sized; the warm-vs-cold iteration comparison is
    # alpha-independent
    cp_cold = Checkpointer(spark, str(tmp_path), "pr_cold")
    cold = pagerank(
        grown, alpha=0.5, tol=1e-7, sequential_threshold=0,
        checkpointer=cp_cold,
    )
    cold_iters = len(cp_cold.metrics())

    cp_warm = Checkpointer(spark, str(tmp_path), "pr_warm")
    warm = pagerank(
        grown, alpha=0.5, tol=1e-7, sequential_threshold=0,
        checkpointer=cp_warm, initial_ranks=prev,
    )
    warm_iters = len(cp_warm.metrics())

    got_cold, got_warm = _ranks(cold), _ranks(warm)
    grown.unpersist()
    assert got_warm == pytest.approx(got_cold, abs=1e-6)
    assert warm_iters < cold_iters, (warm_iters, cold_iters)


def test_new_vertices_get_teleport_share(spark):
    """Vertices absent from initial_ranks start at 1/N (renormalized),
    not zero — they must not be starved of their teleport mass."""
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    partial = spark.createDataFrame(
        [(0, 0.5), (1, 0.5)], "id long, rank double"
    )
    got = _ranks(pagerank(g, tol=1e-12, initial_ranks=partial))
    cold = _ranks(pagerank(g, tol=1e-12))
    g.unpersist()
    assert got == pytest.approx(cold, abs=1e-9)
    assert got[3] > 0.1
