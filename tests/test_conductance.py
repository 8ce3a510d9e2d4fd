"""Per-community conductance (graft.quality.conductance)."""

import pytest

from pyspark.sql import functions as F

from graft import fixtures
from graft.graph import Graph
from graft.quality import conductance


def _assign(spark, pairs):
    return spark.createDataFrame(pairs, "id long, community long")


def test_two_triangles_one_bridge(spark):
    # triangles {0,1,2} and {3,4,5} joined by one unit edge 2-3
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
        (2, 3, 1.0),
    ]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    a = _assign(spark, [(i, 0) for i in (0, 1, 2)] + [(i, 1) for i in (3, 4, 5)])
    got = {r.community: r for r in conductance(g.edges, a).collect()}
    g.unpersist()
    # each side: cut = 1, volume = 2*3 + 1 = 7, 2m = 14 → min(7, 7) = 7
    for c in (0, 1):
        assert got[c].cut == 1.0
        assert got[c].volume == 7.0
        assert got[c].conductance == pytest.approx(1.0 / 7.0)


def test_whole_graph_is_zero(spark):
    edges = [(0, 1, 2.0), (1, 2, 3.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    a = _assign(spark, [(0, 9), (1, 9), (2, 9)])
    got = conductance(g.edges, a).collect()
    g.unpersist()
    assert len(got) == 1
    assert got[0].cut == 0.0
    assert got[0].conductance == 0.0  # vol = 2m → denominator guard


def test_self_loop_counts_twice_in_volume(spark):
    edges = [(0, 0, 1.0), (0, 1, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    a = _assign(spark, [(0, 0), (1, 1)])
    got = {r.community: r for r in conductance(g.edges, a).collect()}
    g.unpersist()
    # vertex 0: loop (2) + edge (1) = 3; cut = 1; 2m = 4 → min(3, 1) = 1
    assert got[0].volume == 3.0
    assert got[0].conductance == pytest.approx(1.0)
    # vertex 1: volume 1, cut 1 → min(1, 3) = 1
    assert got[1].volume == 1.0
    assert got[1].conductance == pytest.approx(1.0)


def test_weighted_cut(spark):
    edges = [(0, 1, 5.0), (1, 2, 1.0), (2, 3, 5.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    a = _assign(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])
    got = {r.community: r for r in conductance(g.edges, a).collect()}
    g.unpersist()
    # cut crosses the middle unit edge; vol each side = 11; 2m = 22
    for c in (0, 1):
        assert got[c].cut == 1.0
        assert got[c].conductance == pytest.approx(1.0 / 11.0)
