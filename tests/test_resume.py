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


def test_pic_embedding_resume_equivalence(spark, tmp_path):
    from graft.algos.spectral import pic_embedding

    edges = fixtures.clique_ring_weighted_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    full = {r.id: round(r.v, 12)
            for r in pic_embedding(g, 6, sequential_threshold=0).collect()}

    # interrupted run: only 3 of the 6 supersteps
    ck1 = Checkpointer(spark, str(tmp_path), "pic")
    pic_embedding(g, 3, checkpointer=ck1).count()
    ms = ck1.metrics()
    assert [m["step"] for m in ms] == [0, 1, 2]
    assert all("partition_rows" in m for m in ms)

    # resumed run continues from superstep 3 and matches the full run
    ck2 = Checkpointer(spark, str(tmp_path), "pic")
    resumed = {r.id: round(r.v, 12)
               for r in pic_embedding(g, 6, checkpointer=ck2).collect()}
    assert resumed == full
    assert [m["step"] for m in ck2.metrics()] == [0, 1, 2, 3, 4, 5]
    g.unpersist()


def test_msf_resume_equivalence(spark, tmp_path):
    from graft.algos.msf import minimum_spanning_forest

    edges = fixtures.clique_ring_weighted_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    full = sorted(
        (r.u, r.v, r.weight)
        for r in minimum_spanning_forest(g, sequential_threshold=0).collect()
    )

    # interrupted run: cap at 1 Boruvka round (clique ring needs >1)
    ck1 = Checkpointer(spark, str(tmp_path), "msf")
    try:
        minimum_spanning_forest(g, max_iter=1, checkpointer=ck1).count()
    except RuntimeError:
        pass  # expected: round budget exhausted mid-run
    ms = ck1.metrics()
    assert [m["step"] for m in ms] == [0]
    # the round-0 save holds that round's grabs plus the still-unmerged
    # work list (the run needs more rounds — hence the RuntimeError)
    assert ms[0]["n_forest"] > 0 and ms[0]["n_work"] > 0

    # resumed run finishes from the round-0 checkpoint
    ck2 = Checkpointer(spark, str(tmp_path), "msf")
    resumed = sorted(
        (r.u, r.v, r.weight)
        for r in minimum_spanning_forest(g, checkpointer=ck2).collect()
    )
    assert resumed == full
    g.unpersist()
