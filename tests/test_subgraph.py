"""Ego subgraph extraction and community quotient graphs."""

from pyspark.sql import functions as F

from graft import fixtures
from graft.algos.lpa import label_propagation
from graft.algos.subgraph import ego_edges, quotient_edges
from graft.graph import Graph
from tests.reference_impls import random_graph


def _ego_ref(edges, source, radius):
    """Pure-python ego: BFS ball then induced canonical edge list."""
    adj: dict = {}
    for u, v, _ in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    ball = {source}
    frontier = {source}
    for _ in range(radius):
        frontier = {
            n for v in frontier for n in adj.get(v, ()) if n not in ball
        }
        ball |= frontier
    out = {}
    for u, v, w in edges:
        if u in ball and v in ball:
            key = (min(u, v), max(u, v))
            out[key] = out.get(key, 0.0) + w
    return out


def test_ego_matches_python_reference(spark):
    edges = random_graph(50, 0.08, seed=21)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {
        (r.u, r.v): r.weight
        for r in ego_edges(g, 0, radius=2).collect()
    }
    g.unpersist()
    assert got == _ego_ref(edges, 0, 2)


def test_ego_radius_zero_and_absent_source(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 0, 3.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    r0 = ego_edges(g, 0, radius=0).collect()
    assert [(r.u, r.v, r.weight) for r in r0] == [(0, 0, 3.0)]
    assert ego_edges(g, 99, radius=2).count() == 0
    g.unpersist()


def test_ego_full_radius_is_component(spark):
    """A radius beyond the diameter returns the source's whole
    component, canonical single-counted."""
    edges = [(0, 1, 2.0), (1, 2, 1.0), (5, 6, 4.0)]  # two components
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = sorted(
        (r.u, r.v, r.weight) for r in ego_edges(g, 0, radius=10).collect()
    )
    g.unpersist()
    assert got == [(0, 1, 2.0), (1, 2, 1.0)]


def test_quotient_hand_example(spark):
    """A={0,1}, B={2}: intra(A)=w1, inter=w2, loop(B)=w3."""
    edges = [(0, 1, 1.5), (1, 2, 2.5), (2, 2, 3.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20)], "id long, label long"
    )
    got = {
        (r.cu, r.cv): r.weight
        for r in quotient_edges(g, labels).collect()
    }
    g.unpersist()
    assert got == {(10, 10): 1.5, (10, 20): 2.5, (20, 20): 3.0}


def test_quotient_singletons_is_identity(spark):
    """Under the all-singletons labeling the quotient IS the canonical
    single-counted edge list."""
    edges = random_graph(30, 0.1, seed=5) + [(3, 3, 2.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    labels = g.vertices().select("id", F.col("id").alias("label"))
    got = {
        (r.cu, r.cv): round(r.weight, 9)
        for r in quotient_edges(g, labels).collect()
    }
    g.unpersist()
    want: dict = {}
    for u, v, w in edges:
        key = (min(u, v), max(u, v))
        want[key] = round(want.get(key, 0.0) + w, 9)
    assert got == want


def test_quotient_conserves_total_weight(spark):
    """Sum of quotient weights = m (single-counted incl. loops) for any
    labeling — here LPA labels on the clique ring."""
    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    labels = label_propagation(g, max_iter=3)
    q = quotient_edges(g, labels)
    total = q.agg(F.sum("weight")).first()[0]
    m = g.total_edge_weight()
    g.unpersist()
    assert abs(total - m) < 1e-9


def test_sparsify_top_k_matches_brute_force(spark):
    from graft.algos.subgraph import sparsify_top_k
    from tests.reference_impls import random_graph

    edges = random_graph(40, 0.2, seed=21, weighted=True)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    # brute force over the same symmetrized weighted adjacency the
    # engine sees (from_undirected sums parallel edges)
    wsum: dict[tuple[int, int], float] = {}
    for u, v, w in edges:
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        wsum[key] = wsum.get(key, 0.0) + w
    nbrs: dict[int, list] = {}
    for (u, v), w in wsum.items():
        nbrs.setdefault(u, []).append((v, w))
        nbrs.setdefault(v, []).append((u, w))
    want = set()
    k = 3
    for u, lst in nbrs.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for v, w in lst[:k]:
            want.add((min(u, v), max(u, v)))
    got = {(r.u, r.v) for r in sparsify_top_k(g, k=3).collect()}
    g.unpersist()
    assert got == want
    # retained degree of every vertex stays bounded by construction
    # (each vertex CONTRIBUTES at most k edges; its retained degree can
    # exceed k only via other vertices' picks of it)
    assert len(got) <= sum(min(k, len(v)) for v in nbrs.values())


def test_sparsify_keeps_weight_and_drops_loops(spark):
    from graft.algos.subgraph import sparsify_top_k

    g = Graph.from_undirected(fixtures.edges_df(spark, [
        (0, 1, 5.0), (0, 2, 3.0), (0, 3, 1.0), (0, 0, 9.0),
    ])).cache()
    rows = {(r.u, r.v): r.weight for r in sparsify_top_k(g, 2).collect()}
    g.unpersist()
    # vertex 0 keeps its two heaviest; 1/2/3 each keep their only edge,
    # which re-adds (0,3); the loop never appears
    assert rows == {(0, 1): 5.0, (0, 2): 3.0, (0, 3): 1.0}


def test_two_hop_neighbors_path(spark):
    from graft.algos.subgraph import two_hop_neighbors

    # path 0-1-2-3 plus a self-loop on 1 (must not create pairs)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (1, 1, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {(r["first"], r["second"])
           for r in two_hop_neighbors(g).collect()}
    g.unpersist()
    assert got == {(0, 2), (2, 0), (1, 3), (3, 1)}


def test_two_hop_neighbors_keeps_direct_and_restricts_sources(spark):
    from graft.algos.subgraph import two_hop_neighbors

    # triangle: every pair is ALSO two hops apart (cugraph keeps them)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    full = {(r["first"], r["second"])
            for r in two_hop_neighbors(g).collect()}
    only0 = {(r["first"], r["second"])
             for r in two_hop_neighbors(g, sources=[0]).collect()}
    g.unpersist()
    assert full == {(a, b) for a in range(3) for b in range(3) if a != b}
    assert only0 == {(0, 1), (0, 2)}


def test_disparity_backbone(spark):
    """Hand-checked disparity p-values: a hub with one dominant edge
    keeps it, uniform edges are insignificant, leaves give p=1."""
    from graft.algos.subgraph import disparity_backbone

    # hub 0 with neighbors 1..4: one heavy edge (0,1,w=20), three
    # light (w=1); vertex 5 dangles off 1 (leaf edge)
    edges = [(0, 1, 20.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0),
             (1, 5, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {(r.u, r.v): r for r in disparity_backbone(g).collect()}
    g.unpersist()
    assert set(got) == {(0, 1), (0, 2), (0, 3), (0, 4), (1, 5)}
    # endpoint 0: s=23, k=4 -> p_(0,1) from 0's side = (1-20/23)^3
    assert got[(0, 1)].p_u == round((1 - 20 / 23) ** 3, 6)
    assert got[(0, 1)].keep                      # 0.00227 < 0.05
    # light hub edges: (1-1/23)^3 ~ 0.875 -> not significant from 0;
    # degree-1 far endpoints give p = 1 (0^0 convention)
    assert got[(0, 2)].p_v == 1.0 and not got[(0, 2)].keep
    # leaf edge (1,5): from 1 (s=21, k=2) p=(1-1/21)^1; from 5 p=1
    assert got[(1, 5)].p_u == round(1 - 1 / 21, 6)
    assert got[(1, 5)].p_v == 1.0 and not got[(1, 5)].keep
