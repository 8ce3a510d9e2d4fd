"""Mid-level checkpoint/resume equivalence for Leiden and Louvain
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics ... resumable mid-aggregation-level")."""

from graft import fixtures
from graft.algos.leiden import leiden
from graft.algos.louvain import louvain
from graft.checkpoint import Checkpointer
from graft.graph import Graph


def _labels(df):
    return {r.id: r.community for r in df.collect()}


def _canon(labels):
    """Partition up to relabeling: map community -> min member id."""
    rep = {}
    for v, c in labels.items():
        rep[c] = min(rep.get(c, v), v)
    return {v: rep[c] for v, c in labels.items()}


def test_leiden_resume_equivalence(spark, tmp_path):
    edges = fixtures.clique_ring_weighted_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()

    full = _canon(_labels(leiden(g, gamma=0.1, seed=5, sequential_tail_edges=0)))

    # interrupted run: stop after the first aggregation level
    ck1 = Checkpointer(spark, str(tmp_path), "leiden")
    partial = leiden(g, gamma=0.1, seed=5, sequential_tail_edges=0, max_levels=1, checkpointer=ck1)
    partial.count()
    assert ck1.has_table("level=0/mapping")
    assert len(ck1.metrics()) > 0
    assert all("partition_rows" in m for m in ck1.metrics())

    # resumed run continues from the persisted level
    ck2 = Checkpointer(spark, str(tmp_path), "leiden")
    resumed = _canon(_labels(leiden(g, gamma=0.1, seed=5, sequential_tail_edges=0, checkpointer=ck2)))
    assert resumed == full
    g.unpersist()


def test_louvain_resume_equivalence(spark, tmp_path):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()

    full = _canon(_labels(louvain(g, seed=3, sequential_tail_edges=0)))

    ck1 = Checkpointer(spark, str(tmp_path), "louvain")
    louvain(g, seed=3, sequential_tail_edges=0, max_levels=1, checkpointer=ck1).count()
    assert ck1.has_table("level=0/vertices")

    ck2 = Checkpointer(spark, str(tmp_path), "louvain")
    resumed = _canon(_labels(louvain(g, seed=3, sequential_tail_edges=0, checkpointer=ck2)))
    assert resumed == full
    g.unpersist()
