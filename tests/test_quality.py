"""CPM / modularity agreement with the clean-room python formulas."""

import pytest

from graft import fixtures
from graft.graph import Graph
from graft.quality import cpm, modularity
from tests.reference_impls import cpm_ref, modularity_ref, random_graph


def _assign(spark, labels):
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in labels.items()], "id long, community long"
    )


def _clique_labels():
    return {v: v // 4 for v in range(20)}


def test_cpm_clique_ring_exact(spark):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = _clique_labels()
    got = cpm(g.edges, _assign(spark, labels), gamma=0.1)
    want = cpm_ref(edges, labels, gamma=0.1)
    # 5 cliques: w_in=6 each, n=4 → 5*(6 - 0.1*6) = 27
    assert want == pytest.approx(27.0)
    assert got == pytest.approx(want, abs=1e-9)


def test_modularity_clique_ring(spark):
    edges = fixtures.clique_ring_weighted_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = _clique_labels()
    got = modularity(g.edges, _assign(spark, labels))
    assert got == pytest.approx(modularity_ref(edges, labels), abs=1e-9)


def test_quality_with_self_loops_and_random_labels(spark):
    edges = random_graph(20, 0.2, seed=21) + [(2, 2, 1.5), (7, 7, 0.5)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = {v: v % 3 for v in range(20)}
    a = _assign(spark, labels)
    assert modularity(g.edges, a) == pytest.approx(
        modularity_ref(edges, labels), abs=1e-9
    )
    assert cpm(g.edges, a, gamma=0.25) == pytest.approx(
        cpm_ref(edges, labels, gamma=0.25), abs=1e-9
    )


def test_singleton_partition_modularity_negative_or_zero(spark):
    edges = fixtures.weighted_triangle_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    labels = {0: 0, 1: 1, 2: 2}
    got = modularity(g.edges, _assign(spark, labels))
    assert got == pytest.approx(modularity_ref(edges, labels), abs=1e-9)
    assert got < 0


# ---------------------------------------------------------------------------
# partition_agreement (NMI + ARI)


def _agree_ref(la, lb):
    """Hand NMI/ARI from the contingency table (independent of the
    engine's formula assembly)."""
    import math
    from collections import Counter

    ids = sorted(set(la) & set(lb))
    n = len(ids)
    cont = Counter((la[i], lb[i]) for i in ids)
    ai = Counter(la[i] for i in ids)
    bj = Counter(lb[i] for i in ids)
    mi = sum(
        (c / n) * math.log(n * c / (ai[x] * bj[y]))
        for (x, y), c in cont.items()
    )
    ha = -sum((c / n) * math.log(c / n) for c in ai.values())
    hb = -sum((c / n) * math.log(c / n) for c in bj.values())
    nmi = 1.0 if ha + hb == 0 else 2 * mi / (ha + hb)

    def c2(x):
        return x * (x - 1) / 2.0

    s_nij = sum(c2(c) for c in cont.values())
    s_a = sum(c2(c) for c in ai.values())
    s_b = sum(c2(c) for c in bj.values())
    exp = s_a * s_b / c2(n)
    mx = (s_a + s_b) / 2.0
    ari = 1.0 if mx - exp == 0 else (s_nij - exp) / (mx - exp)
    return n, nmi, ari


def _labels_df(spark, labels):
    return spark.createDataFrame(
        [(k, v) for k, v in labels.items()], "id long, community long"
    )


def test_agreement_identical_partitions(spark):
    from graft.quality import partition_agreement

    la = {v: v % 4 for v in range(20)}
    row = partition_agreement(_labels_df(spark, la), _labels_df(spark, la)).first()
    assert row["n"] == 20
    assert row["nmi"] == pytest.approx(1.0, abs=1e-12)
    assert row["ari"] == pytest.approx(1.0, abs=1e-12)


def test_agreement_matches_hand_formulas(spark):
    from graft.quality import partition_agreement

    la = {v: v % 4 for v in range(23)}
    lb = {v: (v // 3) % 5 for v in range(23)}
    n, nmi, ari = _agree_ref(la, lb)
    row = partition_agreement(_labels_df(spark, la), _labels_df(spark, lb)).first()
    assert row["n"] == n
    assert row["nmi"] == pytest.approx(nmi, abs=1e-12)
    assert row["ari"] == pytest.approx(ari, abs=1e-12)


def test_agreement_trivial_single_cluster_both(spark):
    from graft.quality import partition_agreement

    la = {v: 0 for v in range(8)}
    row = partition_agreement(_labels_df(spark, la), _labels_df(spark, la)).first()
    # both entropies 0 and both index sums trivial -> defined as 1.0
    assert row["nmi"] == 1.0 and row["ari"] == 1.0


def test_agreement_inner_join_and_relabel_invariance(spark):
    from graft.quality import partition_agreement

    la = {v: v % 3 for v in range(15)}
    lb = {v: (v % 3) * 100 + 7 for v in range(10, 25)}  # overlap = 10..14
    n, nmi, ari = _agree_ref(la, lb)
    row = partition_agreement(_labels_df(spark, la), _labels_df(spark, lb)).first()
    assert row["n"] == n == 5
    # on the overlap the partitions are identical up to relabeling
    assert row["nmi"] == pytest.approx(nmi, abs=1e-12)
    assert row["ari"] == pytest.approx(ari, abs=1e-12)


def test_community_profile(spark):
    """Hand-computed profile on two triangles + a bridge + a loop-only
    singleton: sizes, volumes, cuts, densities, and both degenerate
    branches (singleton density, loop-excluded n_in_edges)."""
    from graft.quality import community_profile

    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
             (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
             (2, 3, 1.0), (6, 6, 2.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    assign = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 20), (4, 20), (5, 20), (6, 30)],
        "id long, community long",
    )
    got = {r.community: r for r in
           community_profile(g.edges, assign).collect()}
    g.unpersist()
    assert set(got) == {10, 20, 30}
    for c in (10, 20):
        r = got[c]
        assert (r.n_members, r.volume, r.cut) == (3, 7.0, 1.0)
        assert (r.w_in, r.n_in_edges) == (3.0, 3)
        assert r.conductance == round(1 / 7, 6)
        assert r.density == 1.0
    s = got[30]
    assert (s.n_members, s.volume, s.cut) == (1, 4.0, 0.0)
    assert (s.w_in, s.n_in_edges) == (2.0, 0)
    assert s.conductance == 0.0 and s.density == 0.0


def test_community_profile_isolated_community(spark):
    """A community whose members have no incident edges still gets a
    (all-zero) profile row instead of vanishing from the table."""
    from graft.quality import community_profile

    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0)])
    ).cache()
    assign = spark.createDataFrame(
        [(0, 10), (1, 10), (7, 99), (8, 88), (9, 88)],
        "id long, community long",
    )
    got = {r.community: r for r in
           community_profile(g.edges, assign).collect()}
    g.unpersist()
    assert set(got) == {10, 99, 88}
    iso = got[99]
    assert (iso.n_members, iso.volume, iso.cut) == (1, 0.0, 0.0)
    assert (iso.w_in, iso.n_in_edges) == (0.0, 0)
    assert iso.conductance == 0.0 and iso.density == 0.0
    # >=2 edge-less members: pairs > 0 exercises the density branch on a
    # NULL (left-join-missed) n_in_edges — must coalesce to 0.0, not NULL
    pair = got[88]
    assert (pair.n_members, pair.volume, pair.cut) == (2, 0.0, 0.0)
    assert (pair.w_in, pair.n_in_edges) == (0.0, 0)
    assert pair.conductance == 0.0
    assert pair.density == 0.0
