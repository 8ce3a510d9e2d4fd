"""Guimerà–Amaral participation/z roles (graft.algos.roles)."""

import math

import pytest

from graft.algos.roles import participation_roles
from graft.graph import Graph

# two triangles {1,2,3} and {4,5,6} bridged by 7 (edges to 1 and 4);
# 7 is labeled with community A -> the classic connector vertex
EDGES = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (7, 1), (7, 4)]
LABELS = {1: 10, 2: 10, 3: 10, 7: 10, 4: 20, 5: 20, 6: 20}


def _brute(edges, labels):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, {})[v] = 1.0
        adj.setdefault(v, {})[u] = 1.0
    out = {}
    kin = {}
    for v in labels:
        kc = {}
        for u, w in adj.get(v, {}).items():
            kc[labels[u]] = kc.get(labels[u], 0.0) + w
        k = sum(kc.values())
        p = 1.0 - sum((x / k) ** 2 for x in kc.values()) if k else 0.0
        kin[v] = kc.get(labels[v], 0.0)
        out[v] = (k, p)
    comm = {}
    for v, c in labels.items():
        comm.setdefault(c, []).append(v)
    z = {}
    for c, members in comm.items():
        vals = [kin[v] for v in members]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum((x - mu) ** 2 for x in vals) / len(vals))
        for v in members:
            z[v] = (kin[v] - mu) / sd if sd > 0 else 0.0
    return {v: (out[v][0], out[v][1], z[v]) for v in labels}


def test_roles_match_bruteforce(spark):
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in EDGES], "src long, dst long, weight double"
    )
    g = Graph.from_undirected(e)
    labels = spark.createDataFrame(
        list(LABELS.items()), "id long, community long"
    )
    got = {
        r["id"]: (r["k"], r["p_coef"], r["z_in"])
        for r in participation_roles(g, labels).collect()
    }
    want = _brute(EDGES, LABELS)
    assert set(got) == set(want)
    for v in want:
        for a, b in zip(got[v], want[v]):
            assert a == pytest.approx(b, abs=1e-6), v
    # the bridge is the connector: half its weight in each community
    assert got[7][1] == pytest.approx(0.5, abs=1e-6)
    # pure-internal vertices participate nowhere else
    assert got[2][1] == 0.0 and got[5][1] == 0.0


def test_roles_isolated_vertex(spark):
    e = spark.createDataFrame(
        [(1, 2, 1.0)], "src long, dst long, weight double"
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (9, 9)], "id long, community long"
    )
    got = {
        r["id"]: r for r in
        participation_roles(Graph.from_undirected(e), labels).collect()
    }
    assert got[9]["k"] == 0.0 and got[9]["p_coef"] == 0.0
    assert got[9]["z_in"] == 0.0  # degenerate singleton community
