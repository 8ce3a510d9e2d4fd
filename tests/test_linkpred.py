"""Link-prediction AUC harness vs a pure-python protocol reference."""

import hashlib
import math

from graft import fixtures
from graft.algos.linkpred import link_pred_auc
from graft.graph import Graph

_MOD = 2**60


def _u60(key: str, salt: str) -> int:
    return int(hashlib.md5(f"{key}#{salt}".encode()).hexdigest()[:15], 16)


def _ref_auc(edges, test_frac=0.2, neg_frac=1.0, salt="lp"):
    """Brute-force replay of the documented protocol."""
    und = sorted(
        {(min(u, v), max(u, v)) for u, v, _ in edges if u != v}
    )
    test = [
        p for p in und
        if _u60(f"{p[0]}|{p[1]}", f"{salt}-test") < int(test_frac * _MOD)
    ]
    train = [p for p in und if p not in test]
    adj: dict = {}
    for u, v in train:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cand = {}
    for w in adj:
        nbrs = sorted(adj[w])
        for i, u in enumerate(nbrs):
            for v in nbrs[i + 1:]:
                cand[(u, v)] = cand.get((u, v), 0) + 1
    pos = [cand.get(p, 0) for p in test]
    neg = [
        s for p, s in cand.items()
        if p not in set(und)
        and _u60(f"{p[0]}|{p[1]}", f"{salt}-neg") < int(neg_frac * _MOD)
    ]
    if not pos or not neg:
        return len(pos), len(neg), 0.5
    num = sum(
        (sum(1 for n in neg if n < s) + sum(1 for n in neg if n == s) / 2.0)
        for s in pos
    )
    return len(pos), len(neg), round(num / (len(pos) * len(neg)), 6)


def test_link_pred_auc_matches_protocol_reference(spark):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    row = link_pred_auc(g).collect()[0]
    g.unpersist()
    n_pos, n_neg, auc = _ref_auc(edges)
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    assert math.isclose(row.auc, auc, abs_tol=1e-6)
    # the clique-ring holdout is a real test: both classes populated
    assert n_pos >= 2 and n_neg >= 2
    assert 0.0 <= row.auc <= 1.0


def test_link_pred_auc_neg_frac_and_salt(spark):
    edges = fixtures.clique_ring_edges()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    row = link_pred_auc(g, neg_frac=0.5, salt="alt").collect()[0]
    g.unpersist()
    n_pos, n_neg, auc = _ref_auc(edges, neg_frac=0.5, salt="alt")
    assert (row.n_pos, row.n_neg, row.auc) == (n_pos, n_neg, auc)


def test_link_pred_auc_degenerate_is_half(spark):
    # a single edge: no wedges survive any split -> empty negatives
    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0)])
    ).cache()
    row = link_pred_auc(g).collect()[0]
    g.unpersist()
    assert row.auc == 0.5
