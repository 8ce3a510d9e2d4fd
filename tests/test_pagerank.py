"""PageRank: allclose 1e-6 vs the numpy oracle (north_rule requirement)."""

import pytest

from graft import fixtures
from graft.algos.pagerank import pagerank
from graft.checkpoint import Checkpointer
from graft.graph import Graph
from tests.reference_impls import pagerank_ref, random_graph


def _run(spark, edges, sequential_threshold=200_000, **kw):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.rank for r in pagerank(
        g, sequential_threshold=sequential_threshold, **kw).collect()}
    g.unpersist()
    return got


def _check(spark, edges, sequential_threshold=200_000, **kw):
    got = _run(spark, edges, sequential_threshold=sequential_threshold, **kw)
    want = pagerank_ref(edges, **kw)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), f"vertex {v}"
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


# st=0 forces the distributed superstep path; the default runs these
# small fixtures through the sequential-tail kernel — both must match
# the numpy oracle
@pytest.mark.parametrize("st", [0, 200_000])
def test_clique_ring(spark, st):
    _check(spark, fixtures.clique_ring_edges(), sequential_threshold=st)


@pytest.mark.parametrize("st", [0, 200_000])
def test_clique_ring_weighted(spark, st):
    _check(spark, fixtures.clique_ring_weighted_edges(),
           sequential_threshold=st)


def test_weighted_triangle(spark):
    _check(spark, fixtures.weighted_triangle_edges())


@pytest.mark.parametrize("st", [0, 200_000])
def test_random_graph_with_self_loop(spark, st):
    edges = random_graph(30, 0.15, seed=7) + [(3, 3, 2.0)]
    _check(spark, edges, sequential_threshold=st)


def test_symmetric_graph_uniform_on_regular(spark):
    # a cycle is 2-regular: stationary distribution is uniform
    edges = [(i, (i + 1) % 8, 1.0) for i in range(8)]
    got = _run(spark, edges)
    for v in range(8):
        assert got[v] == pytest.approx(1.0 / 8, abs=1e-6)


def test_checkpoint_resume_equivalence(spark, tmp_path):
    """north_rule: resumable from checkpoint — a resumed run must land on
    the same ranks as an uninterrupted one."""
    edges = random_graph(25, 0.2, seed=11)
    full = _run(spark, edges, max_iter=30)

    ck1 = Checkpointer(spark, str(tmp_path), "pr")
    _run(spark, edges, max_iter=5, checkpointer=ck1)  # interrupted early
    assert ck1.latest_step() == 4
    assert len(ck1.metrics()) == 5
    assert all("partition_rows" in m for m in ck1.metrics())

    ck2 = Checkpointer(spark, str(tmp_path), "pr")  # same dir → resumes
    resumed = _run(spark, edges, max_iter=30, checkpointer=ck2)
    for v in full:
        assert resumed[v] == pytest.approx(full[v], abs=1e-9)


@pytest.mark.parametrize("st", [0, 200_000])
def test_directed_graph_with_sink(spark, st):
    """Raw directed input (symmetric=False): dst-only sink vertices must
    be part of the vertex set — their rank mass previously vanished
    because Graph.vertices() derived ids from src endpoints only
    (ADVICE r2, graft/graph.py). Chain 0→1→2 plus 3→2: vertex 2 is a
    pure sink (dangling), 0 and 3 are pure sources."""
    from pyspark.sql import functions as F

    rows = [(0, 1, 1.0), (1, 2, 1.0), (3, 2, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = Graph(edges, symmetric=False)
    got = {r.id: r.rank for r in
           pagerank(g, sequential_threshold=st).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # the sink accumulates the most mass; sources keep only teleport+share
    assert got[2] == max(got.values())
    # oracle: networkx-convention power iteration on the directed graph
    import numpy as np

    n, alpha = 4, 0.85
    out_w = {0: 1.0, 1: 1.0, 3: 1.0}
    r = {v: 1 / n for v in range(n)}
    for _ in range(200):
        dangling = r[2]
        base = (1 - alpha) / n + alpha * dangling / n
        new = {v: base for v in range(n)}
        new[1] += alpha * r[0]
        new[2] += alpha * (r[1] + r[3])
        r = new
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-6), v


@pytest.mark.parametrize("st", [0, 200_000])
def test_personalized_pagerank(spark, st):
    """PPR: teleport mass concentrated on a 2-vertex source set, both
    execution paths vs an unrolled numpy oracle."""
    import numpy as np

    edges = fixtures.clique_ring_edges()
    sources = [0, 10]
    got = _run(spark, edges, sequential_threshold=st, sources=sources,
               fixed_iterations=8)
    # numpy oracle on the symmetrized weighted graph
    verts = sorted({v for e in edges for v in e[:2]})
    pos = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for u, v, w in edges:
        W[pos[u]][pos[v]] += w
        if u != v:
            W[pos[v]][pos[u]] += w
    P = W / W.sum(axis=1, keepdims=True)
    e = np.zeros(n)
    for s in sources:
        e[pos[s]] = 1.0 / len(sources)
    alpha = 0.85
    r = e.copy()
    for _ in range(8):
        r = (1 - alpha) * e + alpha * (P.T @ r)
    for v in verts:
        assert got[v] == pytest.approx(r[pos[v]], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # sources hold the most rank mass (restart set)
    top2 = sorted(got, key=got.get, reverse=True)[:2]
    assert set(top2) == set(sources)


@pytest.mark.parametrize("st", [0, 200_000])
def test_personalized_pagerank_missing_sources_raises(spark, st):
    """An empty restart set raises the same clean ValueError on BOTH
    execution paths (the sequential kernel used to surface an opaque
    executor ZeroDivisionError)."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    with pytest.raises(ValueError, match="no source vertex"):
        pagerank(g, sequential_threshold=st, sources=[777, 888],
                 fixed_iterations=3)
    g.unpersist()


def test_batch_ppr_slices_equal_single_seed_runs(spark):
    """Each (source, ·) slice of the batched operator equals the
    single-seed personalized pagerank at the same iteration count."""
    import math

    import pytest

    from graft.algos.pagerank import batch_personalized_pagerank, pagerank

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    out = batch_personalized_pagerank(
        g, sources=[0, 7, 13], fixed_iterations=3
    )
    got = {(r.source, r.id): r.rank for r in out.collect()}
    assert len(got) == 3 * 20
    for s in (0, 7, 13):
        single = {
            r.id: r.rank
            for r in pagerank(g, fixed_iterations=3, sources=[s]).collect()
        }
        for vid, rank in single.items():
            assert math.isclose(
                got[(s, vid)], round(rank, 6), abs_tol=2e-6
            ), (s, vid)
    # per-seed mass: at fixed iterations each vector sums to
    # (1-a)*(1+a+a^2) + a^3 = 1 on a dangling-free graph
    for s in (0, 7, 13):
        tot = sum(v for (src, _), v in got.items() if src == s)
        assert math.isclose(tot, 1.0, abs_tol=1e-4), s
    with pytest.raises(ValueError, match="seeds exist"):
        batch_personalized_pagerank(g, sources=[0, 999])
    with pytest.raises(ValueError):
        batch_personalized_pagerank(g, sources=[])
    g.unpersist()
