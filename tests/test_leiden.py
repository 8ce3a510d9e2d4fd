"""Leiden: golden partitions + CPM at convergence on the reference's own
validation graphs (SURVEY.md §5; gamma=0.1 per examples/test1.py:50)."""

import pytest

from graft import fixtures
from graft.algos.leiden import leiden, refine_partition
from graft.algos.community import init_level
from graft.graph import Graph
from graft.quality import cpm
from tests.reference_impls import cpm_ref


def _partition(spark, edges, **kw):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    labels = {r.id: r.community for r in leiden(g, **kw).collect()}
    return g, labels


def _groups(labels):
    out = {}
    for v, c in labels.items():
        out.setdefault(c, set()).add(v)
    return sorted(map(frozenset, out.values()), key=min)


CLIQUES = [frozenset(range(4 * c, 4 * c + 4)) for c in range(5)]


@pytest.mark.parametrize("tail", [200_000, 0],
                         ids=["seq_tail", "bsp"])
def test_clique_ring_gamma01_finds_cliques(spark, tail):
    g, labels = _partition(spark, fixtures.clique_ring_edges(), gamma=0.1,
                           sequential_tail_edges=tail)
    assert _groups(labels) == CLIQUES
    a = spark.createDataFrame(
        [(int(v), int(c)) for v, c in labels.items()], "id long, community long"
    )
    got = cpm(g.edges, a, gamma=0.1)
    assert got == pytest.approx(27.0, abs=1e-9)
    assert got == pytest.approx(
        cpm_ref(fixtures.clique_ring_edges(), labels, 0.1), abs=1e-9
    )
    g.unpersist()


def test_clique_ring_weighted(spark):
    g, labels = _partition(
        spark, fixtures.clique_ring_weighted_edges(), gamma=0.1
    )
    assert _groups(labels) == CLIQUES
    g.unpersist()


@pytest.mark.parametrize("tail", [200_000, 0],
                         ids=["seq_tail", "bsp"])
def test_bridged_cliques_gamma009(spark, tail):
    # the reference's in-code fixture and gamma (custom_leiden.py:796)
    g, labels = _partition(spark, fixtures.bridged_cliques_edges(), gamma=0.09,
                           sequential_tail_edges=tail)
    assert _groups(labels) == [frozenset({0, 1, 2, 3}), frozenset({4, 5, 6, 7})]
    g.unpersist()


def test_low_gamma_merges_everything(spark):
    # gamma below the bridge threshold 1/16: one community wins CPM
    g, labels = _partition(spark, fixtures.bridged_cliques_edges(), gamma=0.01)
    assert len(_groups(labels)) == 1
    g.unpersist()


@pytest.mark.parametrize("tail", [200_000, 0],
                         ids=["seq_tail", "bsp"])
def test_determinism_fixed_seed(spark, tail):
    edges = fixtures.clique_ring_weighted_edges()
    _, l1 = _partition(spark, edges, gamma=0.1, seed=99,
                       sequential_tail_edges=tail)
    _, l2 = _partition(spark, edges, gamma=0.1, seed=99,
                       sequential_tail_edges=tail)
    assert l1 == l2


def test_refinement_splits_disconnected_community(spark):
    """A community containing two disconnected pieces must be split by
    refinement (the defining Leiden guarantee over Louvain)."""
    # two triangles, NOT connected to each other, forced into one community
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
        (10, 11, 1.0), (11, 12, 1.0), (12, 10, 1.0),
    ]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    level = init_level(g.edges)
    from pyspark.sql import functions as F

    forced = level.vertices.withColumn("community", F.lit(0).cast("long"))
    level.vertices = forced
    refined = refine_partition(level, gamma=0.1, seed=1)
    groups = {}
    for r in refined.collect():
        groups.setdefault(r.refined, set()).add(r.id)
    blocks = sorted(map(frozenset, groups.values()), key=min)
    assert blocks == [frozenset({0, 1, 2}), frozenset({10, 11, 12})]


def test_tail_ready_trigger():
    """The tail engages on small edge tables OR small vertex sets (with
    the Arrow byte guard), and never when disabled (VERDICT r3: the
    vertex trigger is what catches contracted levels of structureless
    graphs whose edge multigraph stays wide; r4 widened it to 500k
    vertices — the Arrow EDGE guard is the binding memory bound, so a
    200k-vertex / 4M-row graph now runs the ~70s tail instead of the
    ~130s BSP path)."""
    from graft.algos.leiden import _tail_ready

    assert _tail_ready(500_000, 400_000, 1_000_000)       # small edges
    assert _tail_ready(3_850_000, 90_000, 1_000_000)      # small vertices
    assert _tail_ready(4_000_000, 200_000, 1_000_000)     # r4 envelope
    assert not _tail_ready(4_000_000, 600_000, 1_000_000)  # too many verts
    assert not _tail_ready(9_000_000, 50_000, 1_000_000)   # byte guard
    assert not _tail_ready(10, 2, 0)                       # disabled
