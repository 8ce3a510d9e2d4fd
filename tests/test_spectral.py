"""Power Iteration Clustering (graft.algos.spectral).

Golden structure tests (cliques joined by bridges separate exactly),
a numpy reference for the embedding math, path agreement between the
sequential kernel and the distributed superstep loop, and determinism.
"""

import numpy as np
import pytest

from graft.algos.spectral import (
    _kmeans_1d,
    pic_embedding,
    power_iteration_clustering,
)
from graft.graph import Graph


def _clique_edges(ids):
    return [
        (a, b, 1.0) for i, a in enumerate(ids) for b in ids[i + 1:]
    ]


def _graph(spark, rows):
    return Graph.from_undirected(
        spark.createDataFrame(rows, "src long, dst long, weight double")
    ).cache()


def _clusters(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["cluster"], set()).add(r["id"])
    return sorted(out.values(), key=min)


@pytest.fixture(scope="module")
def two_cliques(spark):
    rows = (
        _clique_edges(list(range(5)))
        + _clique_edges(list(range(10, 15)))
        + [(4, 10, 1.0)]
    )
    g = _graph(spark, rows)
    yield g
    g.unpersist()


def test_two_cliques_separate(two_cliques):
    got = _clusters(power_iteration_clustering(two_cliques, k=2))
    assert got == [set(range(5)), set(range(10, 15))]


def test_four_clique_ring(spark):
    blocks = [list(range(b * 10, b * 10 + 4)) for b in range(4)]
    rows = [e for b in blocks for e in _clique_edges(b)]
    rows += [(3, 10, 0.1), (13, 20, 0.1), (23, 30, 0.1), (33, 0, 0.1)]
    g = _graph(spark, rows)
    got = _clusters(power_iteration_clustering(g, k=4, iterations=30))
    g.unpersist()
    assert got == [set(b) for b in blocks]


def test_embedding_matches_numpy(two_cliques):
    import hashlib

    rows = two_cliques.edges.collect()
    ids = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    pos = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for r in rows:
        A[pos[r["src"]], pos[r["dst"]]] += r["weight"]
    s = A.sum(axis=1)
    W = A / s[:, None]
    v = np.array([
        int(hashlib.md5(f"{i}:1234".encode()).hexdigest()[:15], 16) / 2**60
        for i in ids
    ])
    v = v / v.sum()
    for _ in range(3):
        v = W @ v
        v = v / np.abs(v).sum()
    got = {r["id"]: r["v"] for r in pic_embedding(two_cliques, 3).collect()}
    want = {ids[i]: v[i] for i in range(len(ids))}
    assert got.keys() == want.keys()
    assert np.allclose(
        [got[i] for i in ids], [want[i] for i in ids], atol=1e-12
    )


def test_paths_agree(two_cliques):
    seq = power_iteration_clustering(two_cliques, k=2)
    bsp = power_iteration_clustering(
        two_cliques, k=2, sequential_threshold=0
    )
    assert sorted(map(tuple, seq.collect())) == sorted(
        map(tuple, bsp.collect())
    )


def test_deterministic(two_cliques):
    a = power_iteration_clustering(two_cliques, k=2).collect()
    b = power_iteration_clustering(two_cliques, k=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmeans_1d_golden(spark):
    emb = spark.createDataFrame(
        [(i, 0.0 + i * 0.001) for i in range(5)]
        + [(i, 10.0 + i * 0.001) for i in range(10, 15)],
        "id long, v double",
    )
    assign, cents = _kmeans_1d(emb, 2)
    got = {}
    for r in assign.collect():
        got.setdefault(r["cluster"], set()).add(r["id"])
    assert got[0] == set(range(5)) and got[1] == set(range(10, 15))
    assert cents == sorted(cents)


def test_k1_and_validation(two_cliques):
    one = power_iteration_clustering(two_cliques, k=1)
    assert {r["cluster"] for r in one.collect()} == {0}
    with pytest.raises(ValueError):
        power_iteration_clustering(two_cliques, k=0)
    with pytest.raises(ValueError):
        pic_embedding(two_cliques, iterations=-1)


def test_empty_graph_keeps_key_type(spark):
    g = Graph.from_undirected(
        spark.createDataFrame([], "src string, dst string, weight double")
    )
    emb = pic_embedding(g, 3)
    out = power_iteration_clustering(g, k=2)
    assert emb.schema["id"].dataType.simpleString() == "string"
    assert out.schema["id"].dataType.simpleString() == "string"
    assert emb.count() == 0 and out.count() == 0
