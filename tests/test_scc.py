"""Strongly connected components: Tarjan tail vs distributed coloring
vs a mutual-reachability closure oracle."""

import random

import pytest

from graft.algos.scc import strongly_connected_components
from graft.graph import Graph
from tests.reference_impls import scc_ref


def _dgraph(spark, rows, schema="src long, dst long, weight double"):
    rows = [(u, v, 1.0) for u, v in rows]
    return Graph(spark.createDataFrame(rows, schema), symmetric=False)


def _run(g, st):
    return {
        r.id: r.comp
        for r in strongly_connected_components(
            g, sequential_threshold=st
        ).collect()
    }


# st=10**6 → Tarjan tail; st=0 → distributed coloring path
@pytest.mark.parametrize("st", [10**6, 0])
def test_two_cycles_one_way_bridge(spark, st):
    # cycle {0,1,2} → bridge → cycle {10,11}; the bridge is one-way so
    # the cycles stay separate SCCs
    rows = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 10)]
    got = _run(_dgraph(spark, rows), st)
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


@pytest.mark.parametrize("st", [10**6, 0])
def test_dag_all_singletons(spark, st):
    rows = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got = _run(_dgraph(spark, rows), st)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


@pytest.mark.parametrize("st", [10**6, 0])
def test_self_loops_are_singletons(spark, st):
    rows = [(0, 0), (0, 1), (1, 1)]
    got = _run(_dgraph(spark, rows), st)
    assert got == {0: 0, 1: 1}


@pytest.mark.parametrize("st", [10**6, 0])
def test_string_keys(spark, st):
    rows = [("a", "b"), ("b", "a"), ("b", "c")]
    g = _dgraph(spark, rows, schema="src string, dst string, weight double")
    got = _run(g, st)
    assert got == {"a": "a", "b": "a", "c": "c"}


@pytest.mark.parametrize("st", [10**6, 0])
@pytest.mark.parametrize("seed", [1, 7])
def test_random_directed_vs_closure_oracle(spark, st, seed):
    rng = random.Random(seed)
    n = 40
    rows = sorted({
        (rng.randrange(n), rng.randrange(n)) for _ in range(120)
    })
    got = _run(_dgraph(spark, rows), st)
    want = scc_ref(rows)
    assert got == want


def test_symmetric_graph_matches_wcc(spark):
    from graft import fixtures
    from graft.algos.components import connected_components

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    )
    scc = _run(g, 10**6)
    wcc = {r.id: r.comp for r in connected_components(g).collect()}
    assert scc == wcc
