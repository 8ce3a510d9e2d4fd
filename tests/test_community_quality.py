"""Mid-size Leiden/Louvain quality oracle (VERDICT r1 'missing' #1/#2).

The BSP engine and a sequential greedy optimizer won't produce identical
labels (different visit semantics), so the honest cross-implementation
check — the role leidenalg plays in the reference's own tests
(examples/leiden-alg.py:42-68) — is partition QUALITY at convergence:
on mid-size random / planted / skewed graphs the engine's CPM
(modularity for Louvain) must reach ≥ 0.95× the sequential oracle's,
and on planted-partition graphs it must recover the planted blocks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graft.algos.leiden import leiden
from graft.algos.louvain import louvain
from graft.graph import Graph
from graft import fixtures
from tests.reference_impls import (
    cpm_ref,
    greedy_louvain_ref,
    modularity_ref,
    planted_partition_graph,
    skewed_graph,
)


def _labels(df) -> dict[int, int]:
    return {r["id"]: r["community"] for r in df.collect()}


@pytest.mark.parametrize(
    "maker,gamma",
    [
        (lambda: planted_partition_graph(10, 25, 0.5, 0.01, seed=7), 0.05),
        (lambda: planted_partition_graph(20, 15, 0.6, 0.02, seed=11), 0.1),
        (lambda: skewed_graph(400, 3000, seed=5), 0.02),
    ],
)
def test_leiden_cpm_matches_sequential_oracle(spark, maker, gamma):
    edges = maker()
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    # force the BSP path: comparing the sequential tail kernel to a
    # sequential oracle would be near-vacuous
    ours = _labels(leiden(g, gamma=gamma, seed=1234,
                          sequential_tail_edges=0))
    ours_cpm = cpm_ref(edges, ours, gamma)

    ref = greedy_louvain_ref(edges, objective="cpm", gamma=gamma, seed=99)
    # the oracle only labels vertices with edges; ours labels all
    ref_cpm = cpm_ref(edges, {v: ref.get(v, v) for v in ours}, gamma)

    assert ours_cpm >= 0.95 * ref_cpm, (ours_cpm, ref_cpm)
    g.unpersist()


def test_leiden_recovers_planted_partition(spark):
    edges = planted_partition_graph(8, 20, 0.6, 0.005, seed=3)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    ours = _labels(leiden(g, gamma=0.1, seed=1234,
                          sequential_tail_edges=0))
    # block purity: every planted block maps to one engine community
    blocks: dict[int, set[int]] = {}
    for v, c in ours.items():
        blocks.setdefault(v // 20, set()).add(c)
    assert all(len(cs) == 1 for cs in blocks.values()), blocks
    assert len({next(iter(cs)) for cs in blocks.values()}) == 8
    g.unpersist()


def test_louvain_modularity_matches_sequential_oracle(spark):
    edges = planted_partition_graph(12, 20, 0.5, 0.01, seed=13)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    ours = _labels(louvain(g, seed=1234, sequential_tail_edges=0))
    ours_q = modularity_ref(edges, ours)

    ref = greedy_louvain_ref(edges, objective="modularity", seed=99)
    ref_q = modularity_ref(edges, {v: ref.get(v, v) for v in ours})

    assert ours_q >= 0.95 * ref_q, (ours_q, ref_q)
    g.unpersist()


def test_edge_cut_and_ratio_cut(spark):
    from graft.quality import edge_cut, ratio_cut

    # two triangles {0,1,2} and {3,4,5} joined by one weight-2 bridge
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
        (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0),
        (2, 3, 2.0),
    ]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    assign = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, community long"
    )
    # only the bridge crosses: edge_cut = 2.0; each cluster has cut 2.0
    # over 3 members: ratio_cut = 2/3 + 2/3
    assert edge_cut(g.edges, assign) == 2.0
    assert abs(ratio_cut(g.edges, assign) - 4.0 / 3.0) < 1e-12
    # all-in-one clustering: no boundary
    one = spark.createDataFrame(
        [(i, 0) for i in range(6)], "id long, community long"
    )
    assert edge_cut(g.edges, one) == 0.0
    assert ratio_cut(g.edges, one) == 0.0
    g.unpersist()
