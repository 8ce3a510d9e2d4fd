"""PPR sweep-cut local community extraction vs brute-force sweep."""

from graft import fixtures
from graft.algos.pagerank import pagerank
from graft.algos.sweepcut import ppr_sweep_cut
from graft.graph import Graph


def _brute_sweep(edges, pr, k):
    """Replay the sweep over the engine's own PPR vector."""
    strength: dict = {}
    und = []
    for u, v, w in edges:
        if u == v:
            strength[u] = strength.get(u, 0.0) + 2 * w
        else:
            strength[u] = strength.get(u, 0.0) + w
            strength[v] = strength.get(v, 0.0) + w
        und.append((u, v, w))
    two_m = sum(strength.values())
    order = sorted(
        pr, key=lambda i: (-round(pr[i] / strength[i], 6), i)
    )[:k]
    pos = {v: i + 1 for i, v in enumerate(order)}
    vin_at: dict = {}
    for u, v, w in und:
        if u in pos and v in pos:
            p = max(pos[u], pos[v])
            vin_at[p] = vin_at.get(p, 0.0) + 2 * w
    out = []
    vol = vin = 0.0
    for i, vtx in enumerate(order):
        vol += strength[vtx]
        vin += vin_at.get(i + 1, 0.0)
        denom = min(vol, two_m - vol)
        phi = round((vol - vin) / denom, 6) if denom > 0 else 0.0
        out.append((i + 1, vtx, round(pr[vtx], 6), phi))
    return out


def test_sweep_matches_bruteforce_and_finds_the_clique(spark):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    pr = {
        r.id: r.rank
        for r in pagerank(g, fixed_iterations=3, sources=[0]).collect()
    }
    got = [
        (r.pos, r.id, r.rank, r.conductance)
        for r in ppr_sweep_cut(g, sources=[0], iters=3, k=10)
        .orderBy("pos")
        .collect()
    ]
    g.unpersist()
    exp = _brute_sweep(edges, pr, 10)
    assert got == exp
    # seeded at vertex 0, the first swept prefix of size 4 is its
    # 4-clique, whose conductance is the golden cut/vol = 2/14 (on a
    # clique RING the global argmin sits at a larger prefix — whole
    # neighboring cliques keep joining — so we pin the local value,
    # not the argmin position)
    assert {r[1] for r in got[:4]} == {0, 1, 2, 3}
    assert got[3][3] == round(2 / 14, 6)


def test_sweep_validations(spark):
    import pytest

    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0)])
    ).cache()
    with pytest.raises(ValueError):
        ppr_sweep_cut(g, sources=[])
    with pytest.raises(ValueError):
        ppr_sweep_cut(g, sources=[0], k=0)
    # k larger than the graph: full-graph prefix has zero complement
    rows = ppr_sweep_cut(g, sources=[0], k=10).orderBy("pos").collect()
    g.unpersist()
    assert len(rows) == 2
    assert rows[-1].conductance == 0.0
