"""RMAT generator: engine parity, determinism, skew, plan shape."""

import duckdb
import pytest

from graft.algos.generators import rmat_edges, rmat_sql


def test_rmat_matches_duckdb_twin(spark):
    df = rmat_edges(spark, scale=7, n_edges=512)
    got = sorted((r.src, r.dst, r.weight) for r in df.collect())
    want = sorted(
        tuple(r) for r in duckdb.sql(rmat_sql(scale=7, n_edges=512)).fetchall()
    )
    assert got == want


def test_rmat_deterministic_and_bounded(spark):
    a = sorted(map(tuple, rmat_edges(spark, scale=6, n_edges=256).collect()))
    b = sorted(map(tuple, rmat_edges(spark, scale=6, n_edges=256).collect()))
    assert a == b
    assert all(0 <= s < 64 and 0 <= d < 64 and s != d for s, d, _ in a)
    c = sorted(
        map(tuple, rmat_edges(spark, scale=6, n_edges=256, seed=7).collect())
    )
    assert c != a  # different seed, different graph


def test_rmat_is_heavy_tailed(spark):
    import collections

    deg = collections.Counter()
    for s, d, _ in rmat_edges(spark, scale=8, n_edges=4096).collect():
        deg[s] += 1
        deg[d] += 1
    vals = sorted(deg.values())
    # classic (0.57,.19,.19,.05) concentrates mass on low ids: the top
    # vertex should dominate the median by an order of magnitude
    assert vals[-1] > 10 * vals[len(vals) // 2]


def test_rmat_plan_is_shuffle_free(spark):
    plan = (
        rmat_edges(spark, scale=10, n_edges=1000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_rmat_validation(spark):
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=0)
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=4, a=0.9, b=0.2, c=0.2)


def test_rmat_feeds_graph(spark):
    from graft.graph import Graph

    g = Graph.from_undirected(rmat_edges(spark, scale=6, n_edges=512))
    assert g.vertices().count() <= 64
    assert g.total_edge_weight() > 0
