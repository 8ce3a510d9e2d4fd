"""ECG ensemble clustering: golden recovery, determinism, gating."""

import pytest

from graft import fixtures
from graft.algos.ecg import ecg
from graft.graph import Graph


def _groups(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r.community, set()).add(r.id)
    return sorted(out.values(), key=min)


def test_ecg_recovers_planted_cliques(spark):
    """The clique-ring golden: five 4-cliques joined in a ring —
    the ensemble vote makes intra-clique edges heavy and ring bridges
    light, so ECG recovers exactly the five cliques."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    labels, q = ecg(g, ensemble_size=6, seed=5, return_quality=True)
    parts = _groups(labels.collect())
    g.unpersist()
    assert parts == [
        {0, 1, 2, 3}, {4, 5, 6, 7}, {8, 9, 10, 11},
        {12, 13, 14, 15}, {16, 17, 18, 19},
    ]
    # known modularity of the clique partition on this fixture (same
    # value the louvain/leiden goldens converge to)
    assert q == pytest.approx(0.657143, abs=1e-3)


def test_ecg_deterministic_under_seed(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    a = _groups(ecg(g, ensemble_size=4, seed=11).collect())
    b = _groups(ecg(g, ensemble_size=4, seed=11).collect())
    g.unpersist()
    assert a == b


def test_ecg_non_2core_edges_floor_weight(spark):
    """A pendant chain hangs off one clique: its edges are outside the
    2-core, get only the floor weight, and the pendant vertices still
    end up in SOME community (labels cover every vertex)."""
    edges = fixtures.clique_ring_edges() + [
        (0, 100, 1.0), (100, 101, 1.0)
    ]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    labels = ecg(g, ensemble_size=4, seed=3)
    ids = {r.id for r in labels.collect()}
    g.unpersist()
    assert {100, 101} <= ids and len(ids) == 22


def test_ecg_validates_args(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0)])
    )
    with pytest.raises(ValueError):
        ecg(g, ensemble_size=0)
    with pytest.raises(ValueError):
        ecg(g, min_weight=0.0)


def test_ecg_keeps_self_loop_only_vertices(spark):
    """A vertex present only via a self-loop is in graph.vertices() and
    labeled by plain louvain; ECG must not drop it (it carries no vote
    and no reweighted edge, so it returns as a singleton labeled by its
    own id)."""
    edges = fixtures.edges_df(
        spark,
        fixtures.clique_ring_edges() + [(99, 99, 1.0)],
    )
    g = Graph.from_undirected(edges).cache()
    labels = ecg(g, ensemble_size=3, seed=5)
    rows = {r.id: r.community for r in labels.collect()}
    g.unpersist()
    assert set(rows) == set(range(20)) | {99}
    assert rows[99] == 99
    # the planted structure is untouched by the singleton restore
    assert len({rows[i] for i in range(4)}) == 1
