"""Fanout neighbor sampling vs an exact python replay of the draws."""

import pytest

from graft import fixtures
from graft.algos.sampling import neighbor_sample
from graft.graph import Graph
from tests.reference_impls import random_graph

_M = 2147483647
_A = 1103515245


def _score(root, dst, hop, seed):
    return (dst + 31 * root + 97 * hop + seed) % _M * _A % _M


def neighbor_sample_ref(edges, fanouts, seed=42, roots=None):
    adj: dict = {}
    verts: set = set()
    for e in edges:
        u, v = e[0], e[1]
        verts.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    out = set()
    for root in (roots if roots is not None else verts):
        frontier = {root}
        for h, fanout in enumerate(fanouts, start=1):
            nxt = set()
            for src in sorted(frontier):
                picks = sorted(
                    adj.get(src, ()),
                    key=lambda d: (_score(root, d, h, seed), d),
                )[:fanout]
                for d in picks:
                    out.add((root, h, src, d))
                    nxt.add(d)
            frontier = nxt
    return out


def _run(spark, edges, fanouts, **kw):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {
        (r.root, r.hop, r.src, r.dst)
        for r in neighbor_sample(g, fanouts, **kw).collect()
    }
    g.unpersist()
    return got


def test_two_hop_exact_rows(spark):
    edges = random_graph(40, 0.15, seed=23, weighted=False)
    got = _run(spark, edges, [3, 2], seed=7)
    assert got == neighbor_sample_ref(edges, [3, 2], seed=7)


def test_fanout_caps_and_membership(spark):
    edges = random_graph(30, 0.3, seed=5, weighted=False)
    eset = {(u, v) for u, v, _ in edges} | {(v, u) for u, v, _ in edges}
    got = _run(spark, edges, [2, 2, 2], seed=1)
    per_key: dict = {}
    for root, hop, src, dst in got:
        assert (src, dst) in eset
        per_key[(root, hop, src)] = per_key.get((root, hop, src), 0) + 1
    assert per_key and max(per_key.values()) <= 2


def test_deterministic_under_repartition(spark):
    edges = random_graph(25, 0.25, seed=9, weighted=False)
    df = fixtures.edges_df(spark, edges)
    g1 = Graph.from_undirected(df).cache()
    g2 = Graph.from_undirected(df.repartition(13)).cache()
    s1 = {(r.root, r.hop, r.src, r.dst)
          for r in neighbor_sample(g1, [3, 2], seed=3).collect()}
    s2 = {(r.root, r.hop, r.src, r.dst)
          for r in neighbor_sample(g2, [3, 2], seed=3).collect()}
    g1.unpersist()
    g2.unpersist()
    assert s1 == s2


def test_explicit_roots(spark):
    edges = random_graph(30, 0.2, seed=13, weighted=False)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    roots = g.vertices().where("id < 5")
    got = {
        (r.root, r.hop, r.src, r.dst)
        for r in neighbor_sample(g, [4], roots=roots, seed=2).collect()
    }
    g.unpersist()
    want = neighbor_sample_ref(
        edges, [4], seed=2, roots=[v for v in range(5)]
    )
    assert got == want


def test_rejects_string_ids_and_bad_fanouts(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0)]).selectExpr(
            "cast(src AS string) AS src",
            "cast(dst AS string) AS dst",
            "weight",
        )
    )
    with pytest.raises(TypeError):
        neighbor_sample(g, [2])
    g2 = Graph.from_undirected(fixtures.edges_df(spark, [(0, 1, 1.0)]))
    with pytest.raises(ValueError):
        neighbor_sample(g2, [])


def test_max_degree_pretruncation(spark):
    """max_degree bounds every vertex's candidate adjacency before the
    fanout pick; the result is still a valid deterministic sample and
    uncapped vertices are unaffected."""
    edges = random_graph(30, 0.35, seed=31, weighted=False)
    eset = {(u, v) for u, v, _ in edges} | {(v, u) for u, v, _ in edges}
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {
        (r.root, r.hop, r.src, r.dst)
        for r in neighbor_sample(
            g, [50], seed=4, max_degree=3
        ).collect()
    }
    got2 = {
        (r.root, r.hop, r.src, r.dst)
        for r in neighbor_sample(
            g, [50], seed=4, max_degree=3
        ).collect()
    }
    g.unpersist()
    assert got == got2
    per_src: dict = {}
    for root, hop, src, dst in got:
        assert (src, dst) in eset
        per_src.setdefault(src, set()).add(dst)
    # fanout 50 >> degree, so without the cap every neighbor appears;
    # with max_degree=3 each src contributes at most 3 distinct dsts
    assert per_src and max(len(v) for v in per_src.values()) <= 3
