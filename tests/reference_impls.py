"""Clean-room single-node oracles for testing the Spark engine.

Written from the semantics in SURVEY.md §1.4 (this is NOT copied from
/root/reference — plain numpy/dict implementations used purely as test
oracles, the role networkx/leidenalg play in the reference's own test
strategy, SURVEY.md §5 item 2).
"""

from __future__ import annotations

import numpy as np


def _symmetrize(edges: list[tuple[int, int, float]]):
    """(u,v,w) undirected list → dict adjacency with both directions,
    self-loops once, duplicate pairs collapsed to min weight."""
    adj: dict[int, dict[int, float]] = {}
    for u, v, w in edges:
        for a, b in ((u, v), (v, u)) if u != v else ((u, u),):
            adj.setdefault(a, {})
            if b in adj[a]:
                adj[a][b] = min(adj[a][b], w)
            else:
                adj[a][b] = w
    return adj


def pagerank_ref(
    edges, alpha: float = 0.85, tol: float = 1e-6, max_iter: int = 500
) -> dict[int, float]:
    """Weighted PageRank, identical update rule to graft.algos.pagerank."""
    adj = _symmetrize(edges)
    nodes = sorted(adj)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = np.array([sum(adj[v].values()) for v in nodes])
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        new = np.full(n, (1.0 - alpha) / n)
        share = r / s
        for v in nodes:
            for u, w in adj[v].items():
                new[idx[u]] += alpha * share[idx[v]] * w
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in nodes}


def components_ref(edges) -> dict[int, int]:
    """Union-find; component label = min vertex id in the component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in parent}


def triangles_ref(edges) -> int:
    adj = _symmetrize(edges)
    nbr = {v: {u for u in adj[v] if u != v} for v in adj}
    total = 0
    for v in nbr:
        for u in nbr[v]:
            if u > v:
                total += sum(1 for w in nbr[v] & nbr[u] if w > u)
    return total


def triangles_per_vertex_ref(edges) -> dict[int, int]:
    adj = _symmetrize(edges)
    nbr = {v: {u for u in adj[v] if u != v} for v in adj}
    out = {v: 0 for v in nbr}
    for v in nbr:
        for u in nbr[v]:
            if u > v:
                for w in nbr[v] & nbr[u]:
                    if w > u:
                        out[v] += 1
                        out[u] += 1
                        out[w] += 1
    return out


def lpa_ref(edges, max_iter: int = 20) -> dict[int, int]:
    """Synchronous weighted LPA, tie-break (max weight, min label) —
    mirrors graft.algos.lpa exactly, including the changed==0 stop."""
    adj = _symmetrize(edges)
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        for v in adj:
            scores: dict[int, float] = {}
            for u, w in adj[v].items():
                if u == v:
                    continue
                scores[labels[u]] = scores.get(labels[u], 0.0) + w
            if scores:
                new[v] = min(
                    (lbl for lbl in scores),
                    key=lambda L: (-scores[L], L),
                )
            else:
                new[v] = labels[v]
        if new == labels:
            break
        labels = new
    return labels


def modularity_ref(edges, labels: dict[int, int]) -> float:
    """Q = Σ_c [Σin_c/(2m) − (Σtot_c/(2m))²], m single-counted, loops once
    in m and twice in strength (SURVEY.md §2.3 A7)."""
    adj = _symmetrize(edges)
    m = sum(w for u, v, w in dedup_undirected(edges))
    sin: dict[int, float] = {}
    stot: dict[int, float] = {}
    for v in adj:
        c = labels[v]
        k = sum(2 * w if u == v else w for u, w in adj[v].items())
        stot[c] = stot.get(c, 0.0) + k
    for u, v, w in dedup_undirected(edges):
        if labels[u] == labels[v]:
            c = labels[u]
            sin[c] = sin.get(c, 0.0) + (2 * w)  # double-count convention
    q = 0.0
    for c in stot:
        q += sin.get(c, 0.0) / (2 * m) - (stot[c] / (2 * m)) ** 2
    return q


def cpm_ref(edges, labels: dict[int, int], gamma: float) -> float:
    """CPM (single-counted Python convention, SURVEY.md §1.4 item 1):
    Σ_c [w_in_c − γ·n_c(n_c−1)/2]."""
    sin: dict[int, float] = {}
    size: dict[int, int] = {}
    for v in labels:  # the partition defines the vertex universe
        c = labels[v]
        size[c] = size.get(c, 0) + 1
    for u, v, w in dedup_undirected(edges):
        if labels[u] == labels[v]:
            c = labels[u]
            sin[c] = sin.get(c, 0.0) + w
    return sum(
        sin.get(c, 0.0) - gamma * n * (n - 1) / 2.0 for c, n in size.items()
    )


def dedup_undirected(edges):
    """Each undirected edge once (min-weight on duplicates), loops kept."""
    seen: dict[tuple[int, int], float] = {}
    for u, v, w in edges:
        key = (min(u, v), max(u, v))
        seen[key] = min(seen[key], w) if key in seen else w
    return [(u, v, w) for (u, v), w in seen.items()]


def random_graph(n: int, p: float, seed: int, weighted: bool = True):
    """Deterministic G(n, p) with optional uniform weights in [0.5, 1.5]."""
    rng = np.random.default_rng(seed)
    edges = []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                w = float(rng.uniform(0.5, 1.5)) if weighted else 1.0
                edges.append((u, v, round(w, 3)))
    return edges
