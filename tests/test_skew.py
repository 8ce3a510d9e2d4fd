"""Skew handling: salted gather equivalence + hub detection on the
adversarial fixture (mega-conversation + hub tool)."""

import pyspark.sql.functions as F

from graft import fixtures
from graft.algos.community import gather_neighbor_comm_weights, init_level
from graft.graph import Graph
from graft.io import actor_edges_to_long, transcripts_to_edges
from graft.skew import detect_hubs, repartition_by_degree, salted_gather


def _skewed_graph(spark):
    t = fixtures.synth_transcripts(spark, n_conv=80, skew=True)
    e, _ = actor_edges_to_long(transcripts_to_edges(t))
    return Graph.from_undirected(e)


def test_skewed_fixture_has_hubs(spark):
    g = _skewed_graph(spark)
    hubs = detect_hubs(g.edges, degree_threshold=50)
    assert hubs.count() >= 1  # the hub tool / role actors


def test_salted_gather_equivalence(spark):
    """Salting is a physical rewrite: results must match the plain
    gather exactly on a skewed graph."""
    g = _skewed_graph(spark).cache()
    lvl = init_level(g.edges)
    # non-trivial communities: group vertices mod 7
    assign = lvl.vertices.select(
        "id", (F.col("id") % 7).alias("community")
    )
    plain = {
        (r.id, r.nbr_comm): r.k_vc
        for r in gather_neighbor_comm_weights(g.edges, assign).collect()
    }
    salted = {
        (r.id, r.nbr_comm): r.k_vc
        for r in salted_gather(g.edges, assign, n_salt=8).collect()
    }
    assert plain == salted
    g.unpersist()


def test_repartition_by_degree_preserves_rows(spark):
    g = _skewed_graph(spark)
    before = g.edges.count()
    rep = repartition_by_degree(g.edges, 8)
    assert rep.count() == before
    assert rep.rdd.getNumPartitions() == 8
    # weight totals unchanged
    a = g.edges.agg(F.sum("weight")).first()[0]
    b = rep.agg(F.sum("weight")).first()[0]
    assert a == b
