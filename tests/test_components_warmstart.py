"""Warm-start connected components (initial_labels): the
incremental-recompute path for monotonically-grown graphs.

Invariant: with warm labels from a run on a SUBGRAPH, min-label
propagation converges to the identical per-component min-id fixpoint
(every stale label is the id of a vertex inside the same enlarged
component). The round saving is measured through checkpoint metrics.
"""

import pytest

from graft import fixtures
from graft.algos.components import connected_components
from graft.checkpoint import Checkpointer
from graft.graph import Graph


def _labels(df):
    return {r["id"]: r["comp"] for r in df.collect()}


def _chain_edges(lo, hi):
    """A path lo—lo+1—…—hi (worst case for propagate: diameter rounds)."""
    return [(i, i + 1, 1.0) for i in range(lo, hi)]


def test_warm_equals_cold_on_grown_graph(spark):
    """Two chains joined by a new bridge edge: warm labels from the
    pre-bridge run converge to the same labels as a cold run."""
    old_edges = _chain_edges(0, 20) + _chain_edges(30, 50)
    old = Graph.from_undirected(fixtures.edges_df(spark, old_edges)).cache()
    prev = connected_components(old, sequential_threshold=0)
    prev = prev.localCheckpoint(eager=True)
    old.unpersist()

    grown_edges = old_edges + [(20, 30, 1.0)]  # bridge merges the chains
    grown = Graph.from_undirected(fixtures.edges_df(spark, grown_edges)).cache()
    cold = _labels(connected_components(grown, sequential_threshold=0))
    warm = _labels(
        connected_components(
            grown, sequential_threshold=0, initial_labels=prev
        )
    )
    grown.unpersist()
    assert warm == cold
    # the merged component takes the global min id
    assert set(warm.values()) == {0}


def test_warm_start_cuts_rounds(spark, tmp_path):
    """On a long chain grown by one edge, the warm run converges in far
    fewer supersteps than the cold run (checkpoint metrics count
    rounds), with identical labels."""
    old_edges = _chain_edges(0, 60)
    old = Graph.from_undirected(fixtures.edges_df(spark, old_edges)).cache()
    prev = connected_components(old, sequential_threshold=0)
    prev = prev.localCheckpoint(eager=True)
    old.unpersist()

    grown_edges = old_edges + [(60, 61, 1.0)]
    grown = Graph.from_undirected(fixtures.edges_df(spark, grown_edges)).cache()

    cp_cold = Checkpointer(spark, str(tmp_path), "cc_cold")
    cold = connected_components(
        grown, sequential_threshold=0, checkpointer=cp_cold
    )
    cold_rounds = len(cp_cold.metrics())

    cp_warm = Checkpointer(spark, str(tmp_path), "cc_warm")
    warm = connected_components(
        grown,
        sequential_threshold=0,
        checkpointer=cp_warm,
        initial_labels=prev,
    )
    warm_rounds = len(cp_warm.metrics())

    got_cold, got_warm = _labels(cold), _labels(warm)
    grown.unpersist()
    assert got_warm == got_cold
    # cold pays ~diameter rounds; warm absorbs one new edge in O(1)
    assert warm_rounds < cold_rounds / 2, (warm_rounds, cold_rounds)


def test_new_vertices_start_at_own_id(spark):
    """Vertices absent from initial_labels default to their own id —
    a brand-new isolated clique must form its own component, not
    inherit anything."""
    old_edges = _chain_edges(0, 5)
    old = Graph.from_undirected(fixtures.edges_df(spark, old_edges)).cache()
    prev = connected_components(old, sequential_threshold=0)
    prev = prev.localCheckpoint(eager=True)
    old.unpersist()

    grown_edges = old_edges + [(100, 101, 1.0), (101, 102, 1.0)]
    grown = Graph.from_undirected(fixtures.edges_df(spark, grown_edges)).cache()
    warm = _labels(
        connected_components(
            grown, sequential_threshold=0, initial_labels=prev
        )
    )
    grown.unpersist()
    assert warm[100] == warm[101] == warm[102] == 100
    assert warm[0] == 0
