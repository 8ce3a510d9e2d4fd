"""Deterministic random-walk corpus vs an exact python simulation of
the counter-based LCG transition rule."""

import pytest

from graft import fixtures
from graft.algos.walks import _LCG_A, _LCG_C, _LCG_M, random_walks
from graft.graph import Graph
from tests.reference_impls import random_graph


def _simulate(edges, walk_length, num_walks, seed):
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for u, v, _ in edges:
        verts.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    nbrs = {v: sorted(ns) for v, ns in adj.items()}
    rows = set()
    for v0 in verts:
        for rep in range(num_walks):
            wid = v0 * num_walks + rep
            cur = v0
            rows.add((wid, 0, cur))
            for t in range(1, walk_length + 1):
                ns = nbrs.get(cur)
                if not ns:
                    break
                x = (wid % _LCG_M * _LCG_A + t * _LCG_C + seed) % _LCG_M
                cur = ns[x % len(ns)]
                rows.add((wid, t, cur))
    return rows


@pytest.mark.parametrize("edges", [
    fixtures.clique_ring_edges(),
    random_graph(30, 0.15, seed=17, weighted=False),
])
def test_walks_match_simulation(spark, edges):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {(r.walk_id, r.step, r.id)
           for r in random_walks(g, walk_length=5, num_walks=2,
                                 seed=7).collect()}
    g.unpersist()
    assert got == _simulate(edges, 5, 2, 7)


def test_walks_follow_edges_and_are_deterministic(spark):
    edges = random_graph(25, 0.2, seed=23, weighted=False)
    eset = {(u, v) for u, v, _ in edges if u != v}
    eset |= {(v, u) for u, v in eset}
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    w1 = sorted(
        (r.walk_id, r.step, r.id)
        for r in random_walks(g, walk_length=4, seed=1).collect()
    )
    w2 = sorted(
        (r.walk_id, r.step, r.id)
        for r in random_walks(g, walk_length=4, seed=1).collect()
    )
    g.unpersist()
    assert w1 == w2
    pos = {}
    for wid, step, v in w1:
        pos.setdefault(wid, {})[step] = v
    for wid, steps in pos.items():
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset, (wid, t)


def test_walks_stop_at_dead_ends(spark):
    # vertex 2 dangles off a pair; 9 is self-loop-only (no simple nbrs)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (9, 9, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {(r.walk_id, r.step, r.id)
           for r in random_walks(g, walk_length=3, seed=5).collect()}
    g.unpersist()
    assert got == _simulate(edges, 3, 1, 5)
    # the self-loop-only vertex emits exactly its start row
    assert (9, 0, 9) in got
    assert not any(w == 9 and s > 0 for w, s, _ in got)


def test_walks_reject_string_ids(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, weight double"
    )
    with pytest.raises(TypeError, match="integral vertex ids"):
        random_walks(Graph(e, symmetric=False))
