"""Seeded label spreading: hand-computed diffusion, clamping,
tie-breaks, truncation, reachability."""

from graft import fixtures
from graft.algos.spreading import label_spreading
from graft.graph import Graph


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "id long, label string")


def test_two_seed_competition(spark):
    # L1(a=0) --2-- x(1) --1-- L2(b=2): x mixes 2:1 in favor of L1
    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 2.0), (1, 2, 1.0)])
    ).cache()
    seeds = _seeds(spark, [(0, "L1"), (2, "L2")])
    got = {r.id: (r.label, r.score) for r in
           label_spreading(g, seeds, rounds=2).collect()}
    g.unpersist()
    assert got[0] == ("L1", 1.0)          # clamped seed
    assert got[2] == ("L2", 1.0)
    assert got[1] == ("L1", round(2 / 3, 6))


def test_equal_mass_tie_breaks_label_asc(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    ).cache()
    seeds = _seeds(spark, [(0, "Lb"), (2, "La")])
    got = {r.id: (r.label, r.score) for r in
           label_spreading(g, seeds, rounds=1).collect()}
    g.unpersist()
    assert got[1] == ("La", 0.5)


def test_unreached_vertices_get_no_row(spark):
    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0), (5, 6, 1.0)])
    ).cache()
    seeds = _seeds(spark, [(0, "L")])
    got = {r.id for r in label_spreading(g, seeds, rounds=3).collect()}
    g.unpersist()
    assert got == {0, 1}


def test_seed_clamp_resists_flooding(spark):
    # seed 0 surrounded by a flood of L2-labeled mass keeps L1 @ 1.0
    edges = [(0, i, 9.0) for i in range(1, 5)] + [(i, 9, 1.0)
                                                  for i in range(1, 5)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    seeds = _seeds(spark, [(0, "L1"), (9, "L2")])
    got = {r.id: r.label for r in
           label_spreading(g, seeds, rounds=4).collect()}
    g.unpersist()
    assert got[0] == "L1"
    assert got[9] == "L2"


def test_top_labels_truncation_keeps_heaviest(spark):
    # x(0) sees three seed labels with masses 3:2:1; top_labels=1 keeps
    # only the heaviest, and the final argmax equals the untruncated one
    edges = [(1, 0, 3.0), (2, 0, 2.0), (3, 0, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    seeds = _seeds(spark, [(1, "A"), (2, "B"), (3, "C")])
    full = {r.id: (r.label, r.score) for r in
            label_spreading(g, seeds, rounds=1).collect()}
    cut = {r.id: (r.label, r.score) for r in
           label_spreading(g, seeds, rounds=1, top_labels=1).collect()}
    g.unpersist()
    assert full[0] == ("A", 0.5)
    # truncation keeps the heaviest label WITHOUT renormalizing: the
    # score stays the label's share of the full gathered mass (an
    # honest confidence), so truncated and full agree here
    assert cut[0] == ("A", 0.5)
