"""Deterministic random-walk corpus vs an exact python simulation of
the counter-based LCG transition rule."""

import pytest

from graft import fixtures
from graft.algos.walks import _LCG_A, _LCG_C, _LCG_M, random_walks
from graft.graph import Graph
from tests.reference_impls import random_graph


def _simulate(edges, walk_length, num_walks, seed):
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for u, v, _ in edges:
        verts.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    nbrs = {v: sorted(ns) for v, ns in adj.items()}
    rows = set()
    for v0 in verts:
        for rep in range(num_walks):
            wid = v0 * num_walks + rep
            cur = v0
            rows.add((wid, 0, cur))
            for t in range(1, walk_length + 1):
                ns = nbrs.get(cur)
                if not ns:
                    break
                x = (wid % _LCG_M * _LCG_A + t * _LCG_C + seed) % _LCG_M
                cur = ns[x % len(ns)]
                rows.add((wid, t, cur))
    return rows


@pytest.mark.parametrize("edges", [
    fixtures.clique_ring_edges(),
    random_graph(30, 0.15, seed=17, weighted=False),
])
def test_walks_match_simulation(spark, edges):
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {(r.walk_id, r.step, r.id)
           for r in random_walks(g, walk_length=5, num_walks=2,
                                 seed=7).collect()}
    g.unpersist()
    assert got == _simulate(edges, 5, 2, 7)


def test_walks_follow_edges_and_are_deterministic(spark):
    edges = random_graph(25, 0.2, seed=23, weighted=False)
    eset = {(u, v) for u, v, _ in edges if u != v}
    eset |= {(v, u) for u, v in eset}
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    w1 = sorted(
        (r.walk_id, r.step, r.id)
        for r in random_walks(g, walk_length=4, seed=1).collect()
    )
    w2 = sorted(
        (r.walk_id, r.step, r.id)
        for r in random_walks(g, walk_length=4, seed=1).collect()
    )
    g.unpersist()
    assert w1 == w2
    pos = {}
    for wid, step, v in w1:
        pos.setdefault(wid, {})[step] = v
    for wid, steps in pos.items():
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset, (wid, t)


def test_walks_stop_at_dead_ends(spark):
    # vertex 2 dangles off a pair; 9 is self-loop-only (no simple nbrs)
    edges = [(0, 1, 1.0), (1, 2, 1.0), (9, 9, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {(r.walk_id, r.step, r.id)
           for r in random_walks(g, walk_length=3, seed=5).collect()}
    g.unpersist()
    assert got == _simulate(edges, 3, 1, 5)
    # the self-loop-only vertex emits exactly its start row
    assert (9, 0, 9) in got
    assert not any(w == 9 and s > 0 for w, s, _ in got)


def test_walks_reject_string_ids(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, weight double"
    )
    with pytest.raises(TypeError, match="integral vertex ids"):
        random_walks(Graph(e, symmetric=False))


_M, _A, _C = 2147483647, 1103515245, 12345


def node2vec_ref(edges, walk_length, num_walks, p, q, seed):
    """Exact python replay of node2vec_walks' integer-scaled draws."""
    adj: dict = {}
    verts: set = set()
    for e in edges:
        u, v = e[0], e[1]
        verts.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    srt = {v: sorted(ns) for v, ns in adj.items()}
    w_ret, w_com, w_far = round(1000 / p), 1000, round(1000 / q)
    rows = set()
    for v in verts:
        for rep in range(num_walks):
            wid = v * num_walks + rep
            rows.add((wid, 0, v))
            nbrs = srt.get(v)
            if not nbrs:
                continue
            x1 = (wid % _M * _A + 1 * _C + seed) % _M
            cur, prev = nbrs[x1 % len(nbrs)], v
            rows.add((wid, 1, cur))
            for t in range(2, walk_length + 1):
                nbrs = srt.get(cur)
                if not nbrs:
                    break
                ws = [
                    w_ret if d == prev
                    else (w_com if d in adj[prev] else w_far)
                    for d in nbrs
                ]
                x = (wid % _M * _A + t * _C + seed) % _M % sum(ws)
                cum = 0
                for d, w in zip(nbrs, ws):
                    cum += w
                    if x < cum:
                        nxt = d
                        break
                rows.add((wid, t, nxt))
                prev, cur = cur, nxt
    return rows


def test_node2vec_exact_rows(spark):
    from graft.algos.walks import node2vec_walks

    edges = random_graph(30, 0.15, seed=29, weighted=False)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {
        (r.walk_id, r.step, r.id)
        for r in node2vec_walks(
            g, walk_length=4, num_walks=2, p=2.0, q=0.5, seed=3
        ).collect()
    }
    g.unpersist()
    assert got == node2vec_ref(edges, 4, 2, p=2.0, q=0.5, seed=3)


def test_node2vec_uniform_matches_first_order_bias(spark):
    """p=q=1 makes every transition class equal weight; the walk is
    still a valid walk over graph edges and fully deterministic."""
    from graft.algos.walks import node2vec_walks

    edges = random_graph(20, 0.3, seed=17, weighted=False)
    eset = {(u, v) for u, v, _ in edges} | {(v, u) for u, v, _ in edges}
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    out = node2vec_walks(g, walk_length=3, p=1.0, q=1.0, seed=9)
    rows = sorted(
        ((r.walk_id, r.step, r.id) for r in out.collect())
    )
    out2 = node2vec_walks(g, walk_length=3, p=1.0, q=1.0, seed=9)
    rows2 = sorted(
        ((r.walk_id, r.step, r.id) for r in out2.collect())
    )
    g.unpersist()
    assert rows == rows2
    assert rows == sorted(node2vec_ref(edges, 3, 1, 1.0, 1.0, 9))
    by_walk: dict = {}
    for wid, step, vid in rows:
        by_walk.setdefault(wid, {})[step] = vid
    for steps in by_walk.values():
        for t in range(1, max(steps)):
            assert (steps[t], steps[t + 1]) in eset


def test_node2vec_return_bias(spark):
    """Tiny p (strong return weight) on a path graph: step 2 returns to
    the start far more often than under uniform."""
    from graft.algos.walks import node2vec_walks

    edges = [(i, i + 1, 1.0) for i in range(40)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    out = {
        (r.walk_id, r.step): r.id
        for r in node2vec_walks(
            g, walk_length=2, p=0.01, q=1.0, seed=1
        ).collect()
    }
    g.unpersist()
    returns = sum(
        1 for (wid, step), vid in out.items()
        if step == 2 and vid == out[(wid, 0)]
    )
    n_walks = sum(1 for (wid, step) in out if step == 2)
    # w_ret=100000 vs w_far=1000: interior vertices return ~99% of
    # draws; endpoints (degree 1 mid-walk) always return
    assert returns / n_walks > 0.9


def test_skipgram_pairs(spark):
    from graft.algos.walks import random_walks, skipgram_pairs

    edges = random_graph(20, 0.25, seed=41, weighted=False)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    walks = random_walks(g, walk_length=4, num_walks=2, seed=5)
    rows = [(r.walk_id, r.step, r.id) for r in walks.collect()]
    got = {
        (r.center, r.context): r.cnt
        for r in skipgram_pairs(walks, window=2).collect()
    }
    g.unpersist()
    want: dict = {}
    by_walk: dict = {}
    for wid, step, vid in rows:
        by_walk.setdefault(wid, []).append((step, vid))
    for seq in by_walk.values():
        for s1, c in seq:
            for s2, x in seq:
                if s1 != s2 and abs(s1 - s2) <= 2:
                    want[(c, x)] = want.get((c, x), 0) + 1
    assert got == want
    # symmetric corpus: every (a,b) has the mirror (b,a) with equal cnt
    for (a, b), n in got.items():
        assert got[(b, a)] == n


def negative_samples_ref(edges, n_samples, seed, num_buckets, power=1.0):
    """Exact python replay of negative_samples (integer-power weights)."""
    adj: dict = {}
    for e in edges:
        u, v = e[0], e[1]
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    w = {
        v: max(1, round(len(ns) ** power * 1000))
        for v, ns in adj.items()
    }
    buckets: dict = {}
    for v in sorted(w):
        buckets.setdefault(v % num_buckets, []).append(v)
    offsets, acc = {}, 0
    for b in sorted(buckets):
        offsets[b] = acc
        acc += sum(w[v] for v in buckets[b])
    total = acc
    out = {}
    for i in range(n_samples):
        d1 = (i % _M * _A + 1 * _C + seed) % _M
        d2 = (i % _M * _A + 2 * _C + seed) % _M
        x = (d1 * 2147483648 + d2) % total
        b = max(bb for bb in offsets if offsets[bb] <= x)
        v_in = x - offsets[b]
        cum = 0
        for v in buckets[b]:
            if v_in < cum + w[v]:
                out[i] = v
                break
            cum += w[v]
    return out


def test_negative_samples_exact(spark):
    from graft.algos.walks import negative_samples

    edges = random_graph(35, 0.15, seed=47, weighted=False)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {
        r.sample_id: r.id
        for r in negative_samples(
            g, 500, power=1.0, seed=6, num_buckets=8
        ).collect()
    }
    g.unpersist()
    want = negative_samples_ref(edges, 500, seed=6, num_buckets=8)
    assert got == want


def test_negative_samples_tracks_degree_power(spark):
    """With power=0.75 a hub is sampled roughly (d_hub/d_leaf)^0.75
    times as often as a leaf — star + path makes the ratio extreme."""
    from graft.algos.walks import negative_samples

    edges = [(0, i, 1.0) for i in range(1, 21)] + [
        (100, 101, 1.0), (101, 102, 1.0)
    ]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = [
        r.id
        for r in negative_samples(g, 2000, power=0.75, seed=1).collect()
    ]
    g.unpersist()
    assert len(got) == 2000
    hub = sum(1 for v in got if v == 0)
    # hub weight 20^0.75*1000 ≈ 9457 of total ≈ 9457+20*1000+2*1000+1000
    # ≈ 0.29 of the mass; allow generous monte-carlo slack
    assert 0.2 < hub / 2000 < 0.4
