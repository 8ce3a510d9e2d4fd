"""Structural metrics (clustering, transitivity, assortativity, knn)
and the weighted-common-neighbor link scorers (Adamic-Adar, resource
allocation) against brute-force neighborhood oracles."""

import math

import pytest

from graft import fixtures
from graft.graph import Graph
from tests.reference_impls import random_graph


def _adj(edges):
    adj: dict[int, set[int]] = {}
    verts: set[int] = set()
    for u, v, _ in edges:
        verts.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    return verts, adj


def _triangles_of(adj, v):
    nb = adj.get(v, set())
    return sum(1 for x in nb for y in nb if x < y and y in adj.get(x, set()))


@pytest.mark.parametrize("edges", [
    fixtures.clique_ring_edges(),
    random_graph(40, 0.15, seed=5, weighted=False),
])
def test_clustering_coefficient(spark, edges):
    from graft.algos.structure import clustering_coefficient

    verts, adj = _adj(edges)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.clustering for r in clustering_coefficient(g).collect()}
    g.unpersist()
    assert set(got) == verts
    for v in verts:
        d = len(adj.get(v, ()))
        want = 0.0 if d < 2 else round(
            2.0 * _triangles_of(adj, v) / (d * (d - 1)), 6
        )
        assert got[v] == pytest.approx(want, abs=1e-9), v


def test_clustering_self_loop_only_vertex_is_zero(spark):
    from graft.algos.structure import clustering_coefficient

    edges = fixtures.clique_ring_edges() + [(99, 99, 2.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.clustering for r in clustering_coefficient(g).collect()}
    g.unpersist()
    assert got[99] == 0.0


@pytest.mark.parametrize("edges,want", [
    # a triangle: every wedge closes
    ([(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)], 1.0),
    # a path: no wedge closes
    ([(0, 1, 1.0), (1, 2, 1.0)], 0.0),
])
def test_transitivity_golden(spark, edges, want):
    from graft.algos.structure import transitivity

    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    assert transitivity(g) == pytest.approx(want)
    g.unpersist()


def test_transitivity_random_matches_oracle(spark):
    from graft.algos.structure import transitivity

    edges = random_graph(40, 0.15, seed=7, weighted=False)
    verts, adj = _adj(edges)
    n_tri = sum(_triangles_of(adj, v) for v in verts) // 3
    wedges = sum(
        len(adj.get(v, ())) * (len(adj.get(v, ())) - 1) // 2 for v in verts
    )
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    assert transitivity(g) == pytest.approx(3.0 * n_tri / wedges)
    g.unpersist()


def test_degree_assortativity(spark):
    from graft.algos.structure import degree_assortativity

    edges = random_graph(40, 0.12, seed=11, weighted=False)
    verts, adj = _adj(edges)
    xs, ys = [], []
    for u in verts:
        for v in adj.get(u, ()):
            xs.append(len(adj[u]))
            ys.append(len(adj[v]))
    mx = sum(xs) / len(xs)
    my = sum(ys) / len(ys)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    want = cov / (sx * sy)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    assert degree_assortativity(g) == pytest.approx(want, abs=1e-9)
    g.unpersist()


def test_degree_assortativity_regular_graph_is_defined(spark):
    """On a degree-regular graph the correlation is undefined (constant
    marginals) — the engine returns 0.0, not NaN."""
    from graft.algos.structure import degree_assortativity

    # a 4-cycle: every vertex has degree 2
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    assert degree_assortativity(g) == 0.0
    g.unpersist()


def test_avg_neighbor_degree(spark):
    from graft.algos.structure import avg_neighbor_degree

    edges = random_graph(35, 0.15, seed=13, weighted=False)
    verts, adj = _adj(edges)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.knn for r in avg_neighbor_degree(g).collect()}
    g.unpersist()
    assert set(got) == verts
    for v in verts:
        nb = adj.get(v, set())
        want = 0.0 if not nb else round(
            sum(len(adj[x]) for x in nb) / len(nb), 6
        )
        assert got[v] == pytest.approx(want, abs=1e-9), v


def test_adamic_adar_and_resource_allocation(spark):
    from graft.algos.jaccard import adamic_adar, resource_allocation

    edges = fixtures.clique_ring_edges()
    verts, adj = _adj(edges)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got_aa = {(r.u, r.v): r.adamic_adar for r in adamic_adar(g).collect()}
    got_ra = {(r.u, r.v): r.resource_allocation
              for r in resource_allocation(g).collect()}
    g.unpersist()
    assert set(got_aa) == set(got_ra) and len(got_aa) == 35
    for (u, v) in got_aa:
        common = adj[u] & adj[v]
        assert got_aa[(u, v)] == pytest.approx(
            round(sum(1.0 / math.log(len(adj[w])) for w in common), 6)
            if common else 0.0,
            abs=1e-6,
        ), (u, v)
        assert got_ra[(u, v)] == pytest.approx(
            round(sum(1.0 / len(adj[w]) for w in common), 6)
            if common else 0.0,
            abs=1e-6,
        ), (u, v)


def test_adamic_adar_custom_pairs_not_dropped(spark):
    from graft.algos.jaccard import adamic_adar, resource_allocation

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    pairs = spark.createDataFrame(
        [(0, 999), (998, 999), (3, 4)], "u long, v long"
    )
    got = {(r.u, r.v): r.adamic_adar
           for r in adamic_adar(g, pairs=pairs).collect()}
    got_ra = {(r.u, r.v): r.resource_allocation
              for r in resource_allocation(g, pairs=pairs).collect()}
    g.unpersist()
    # bridge edge (3,4): disjoint neighborhoods -> 0; foreign endpoints
    # -> 0 (kept, not dropped)
    assert got == {(0, 999): 0.0, (998, 999): 0.0, (3, 4): 0.0}
    assert got_ra == got


def test_powerlaw_alpha_recovers_exponent(spark):
    """Degrees drawn from a discrete powerlaw with alpha=2.5: the Hill
    MLE over a star-matching synthetic graph recovers alpha within a
    loose tolerance, and the python formula matches exactly."""
    import math

    import numpy as np

    from graft.algos.structure import powerlaw_alpha

    rng = np.random.default_rng(7)
    # build a graph whose simple degrees are the sampled values:
    # vertex i gets d_i dedicated leaf neighbors (leaves have degree 1,
    # below d_min=2, so they never enter the tail)
    degs = np.clip((1.0 / rng.random(60)) ** (1 / 1.5), 2, 200).astype(int)
    edges = []
    nxt = 10_000
    for i, d in enumerate(degs):
        for _ in range(int(d)):
            edges.append((i, nxt, 1.0))
            nxt += 1
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    row = powerlaw_alpha(g, d_min=2).first()
    g.unpersist()
    want = 1 + len(degs) / sum(math.log(d / 1.5) for d in degs)
    assert row.n_tail == len(degs)
    assert abs(row.alpha - round(want, 6)) < 1e-6
    assert 2.0 < row.alpha < 3.5


def test_powerlaw_alpha_empty_tail(spark):
    from graft.algos.structure import powerlaw_alpha

    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0)])
    ).cache()
    row = powerlaw_alpha(g, d_min=5).first()
    g.unpersist()
    assert row.alpha is None and row.n_tail == 0


def _brute_squares(edges):
    """Independent C4 oracle: enumerate 4-subsets and check the three
    cyclic pairings directly (no reuse of the diagonal identity)."""
    import itertools

    verts, adj = _adj(edges)
    sq = {v: 0 for v in verts}
    for quad in itertools.combinations(sorted(verts), 4):
        a, b, c, d = quad
        for p, q, r, s in ((a, b, c, d), (a, c, b, d), (a, b, d, c)):
            if (
                q in adj.get(p, ())
                and r in adj.get(q, ())
                and s in adj.get(r, ())
                and p in adj.get(s, ())
            ):
                for v in quad:
                    sq[v] += 1
    return sq


@pytest.mark.parametrize("edges", [
    [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0)],  # one C4
    fixtures.clique_ring_edges(),
    random_graph(40, 0.15, seed=11, weighted=False),
])
def test_square_count_matches_brute_force(spark, edges):
    from graft.algos.structure import square_count

    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.squares for r in square_count(g).collect()}
    g.unpersist()
    want = _brute_squares(edges)
    assert got == want


def test_square_count_k4_and_self_loops(spark):
    """K4 has three 4-cycles, each through all four vertices; a
    self-loop vertex contributes nothing but still gets a zero row."""
    from graft.algos.structure import square_count

    edges = [
        (a, b, 1.0) for a in range(4) for b in range(a + 1, 4)
    ] + [(9, 9, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.squares for r in square_count(g).collect()}
    g.unpersist()
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}


def test_rich_club_matches_brute_force(spark):
    from graft.algos.structure import rich_club

    edges = random_graph(50, 0.12, seed=13, weighted=False)
    verts, adj = _adj(edges)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    rows = {r.k: r for r in rich_club(g, ks=(0, 1, 2, 4, 8, 16)).collect()}
    g.unpersist()
    und = {(u, v) for u, v, _ in edges if u < v} | {
        (v, u) for u, v, _ in edges if v < u
    }
    for k, row in rows.items():
        club = {v for v in verts if len(adj.get(v, ())) > k}
        ek = sum(1 for u, v in und if u in club and v in club)
        assert row.n_nodes == len(club), k
        assert row.n_edges == ek, k
        want = (
            0.0 if len(club) < 2
            else round(2.0 * ek / (len(club) * (len(club) - 1)), 6)
        )
        assert row.phi == pytest.approx(want, abs=1e-9), k


def test_rich_club_empty_club_is_zero(spark):
    from graft.algos.structure import rich_club

    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    ).cache()
    rows = {r.k: r for r in rich_club(g, ks=(1, 5)).collect()}
    g.unpersist()
    # degree>1 club = {1} (singleton → phi 0); degree>5 club empty
    assert rows[1].n_nodes == 1 and rows[1].n_edges == 0
    assert rows[1].phi == 0.0
    assert rows[5].n_nodes == 0 and rows[5].phi == 0.0


def test_reciprocity_hand_example(spark):
    from graft.algos.structure import reciprocity

    # a→b, b→a, a→c, c→d, d→c, e→e(loop): 5 non-loop directed edges,
    # 4 of them reciprocated → 0.8; the loop is excluded
    edges = [
        (0, 1, 1.0), (1, 0, 2.0), (0, 2, 1.0),
        (2, 3, 1.0), (3, 2, 1.0), (4, 4, 1.0),
    ]
    g = Graph(fixtures.edges_df(spark, edges), symmetric=False)
    row = reciprocity(g).first()
    assert (row.n_directed, row.n_reciprocal) == (5, 4)
    assert row.reciprocity == 0.8


def test_reciprocity_extremes(spark):
    from graft.algos.structure import reciprocity

    one_way = Graph(
        fixtures.edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0)]),
        symmetric=False,
    )
    assert reciprocity(one_way).first().reciprocity == 0.0
    sym = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    )
    assert reciprocity(sym).first().reciprocity == 1.0


# ---------------------------------------------------------------------------
# attribute mixing / categorical assortativity


def _attr_assort_ref(edges, cats):
    """Hand Newman r from the both-orientations simple edge list."""
    from collections import Counter

    pairs = set()
    for u, v, *_ in edges:
        if u != v:
            pairs.add((u, v))
            pairs.add((v, u))
    e = Counter((cats[a], cats[b]) for a, b in pairs if a in cats and b in cats)
    t = sum(e.values())
    tr = sum(c for (x, y), c in e.items() if x == y) / t
    ai = Counter()
    bi = Counter()
    for (x, y), c in e.items():
        ai[x] += c / t
        bi[y] += c / t
    sab = sum(ai[x] * bi.get(x, 0.0) for x in ai)
    return 1.0 if 1 - sab == 0 else (tr - sab) / (1 - sab)


def _cats_df(spark, cats):
    return spark.createDataFrame(
        [(k, v) for k, v in cats.items()], "id long, cat string"
    )


def test_attribute_mixing_fractions(spark):
    from graft.algos.structure import attribute_mixing

    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 3, 9.0)]
    cats = {0: "r", 1: "t", 2: "t", 3: "r"}
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    rows = {
        (r.ca, r.cb): r.frac
        for r in attribute_mixing(g, _cats_df(spark, cats)).collect()
    }
    # 3 undirected non-loop edges -> 6 directed: r-t, t-r, t-t x2, t-r, r-t
    assert sum(rows.values()) == pytest.approx(1.0)
    assert rows[("r", "t")] == rows[("t", "r")]  # symmetric
    assert rows[("t", "t")] == pytest.approx(2 / 6)
    assert ("r", "r") not in rows


def test_attribute_assortativity_matches_hand_formula(spark):
    from graft.algos.structure import attribute_assortativity

    edges = random_graph(24, 0.2, seed=11)
    cats = {v: ("a", "b", "c")[v % 3] for v in range(24)}
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    want = _attr_assort_ref(edges, cats)
    got = attribute_assortativity(g, _cats_df(spark, cats)).first()[0]
    assert got == pytest.approx(want, abs=1e-12)


def test_attribute_assortativity_extremes(spark):
    from graft.algos.structure import attribute_assortativity

    # two disjoint triangles, one category each -> all edges intra -> 1.0
    intra = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0),
             (3, 4, 1.0), (4, 5, 1.0), (5, 3, 1.0)]
    cats = {v: "x" if v < 3 else "y" for v in range(6)}
    g = Graph.from_undirected(fixtures.edges_df(spark, intra)).cache()
    assert attribute_assortativity(g, _cats_df(spark, cats)).first()[0] == 1.0

    # balanced complete bipartite across categories -> -1.0
    cross = [(u, v, 1.0) for u in (0, 1, 2) for v in (3, 4, 5)]
    g2 = Graph.from_undirected(fixtures.edges_df(spark, cross)).cache()
    got = attribute_assortativity(g2, _cats_df(spark, cats)).first()[0]
    assert got == pytest.approx(-1.0, abs=1e-12)


def _brute_k4(edges):
    import itertools

    adj = {}
    for u, v, *_ in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    n = 0
    for quad in itertools.combinations(sorted(adj), 4):
        if all(b in adj[a] for a, b in itertools.combinations(quad, 2)):
            n += 1
    return n


@pytest.mark.parametrize("edges", [
    [(a, b, 1.0) for a in range(4) for b in range(a + 1, 4)],   # one K4
    [(a, b, 1.0) for a in range(6) for b in range(a + 1, 6)],   # K6: C(6,4)
    fixtures.clique_ring_edges(),                               # five K4s
    random_graph(30, 0.3, seed=7, weighted=False),
])
def test_four_clique_count_matches_brute_force(spark, edges):
    from graft.algos.structure import four_clique_count

    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = four_clique_count(g)
    g.unpersist()
    assert got == _brute_k4(edges)


def test_four_clique_count_ignores_loops_and_weights(spark):
    from graft.algos.structure import four_clique_count

    edges = [(a, b, 2.5) for a in range(4) for b in range(a + 1, 4)]
    edges += [(0, 0, 1.0), (4, 5, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    assert four_clique_count(g) == 1
