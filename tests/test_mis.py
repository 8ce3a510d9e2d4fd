"""Maximal independent set: independence + maximality properties."""

import pytest

from graft import fixtures
from graft.algos.mis import maximal_independent_set
from graft.graph import Graph
from tests.reference_impls import random_graph


def _check(edges, got):
    adj: dict = {}
    verts: set = set()
    for e in edges:
        u, v = e[0], e[1]
        verts.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    assert set(got) == verts
    mis = {v for v, inm in got.items() if inm}
    assert mis
    for v in mis:  # independence
        assert not (adj.get(v, set()) & mis), v
    for v in verts - mis:  # maximality
        assert adj.get(v, set()) & mis, v


def test_random_graphs_properties(spark):
    for s in (1, 2, 3):
        edges = random_graph(40, 0.12 * s, seed=s, weighted=False)
        g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
        got = {
            r.id: r.in_mis
            for r in maximal_independent_set(g, seed=s).collect()
        }
        g.unpersist()
        _check(edges, got)


def test_deterministic_under_repartition(spark):
    edges = random_graph(30, 0.2, seed=7, weighted=False)
    df = fixtures.edges_df(spark, edges)
    g1 = Graph.from_undirected(df).cache()
    g2 = Graph.from_undirected(df.repartition(11)).cache()
    r1 = sorted(
        (r.id, r.in_mis)
        for r in maximal_independent_set(g1, seed=9).collect()
    )
    r2 = sorted(
        (r.id, r.in_mis)
        for r in maximal_independent_set(g2, seed=9).collect()
    )
    g1.unpersist()
    g2.unpersist()
    assert r1 == r2


def test_isolated_and_self_loop_vertices_always_in(spark):
    edges = [(0, 1, 1.0), (2, 2, 1.0)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    got = {
        r.id: r.in_mis for r in maximal_independent_set(g).collect()
    }
    assert got[2] is True
    assert got[0] != got[1]
    _check(edges, got)


def test_clique_picks_exactly_one(spark):
    edges = [
        (u, v, 1.0) for u in range(6) for v in range(u + 1, 6)
    ]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    got = {
        r.id: r.in_mis for r in maximal_independent_set(g).collect()
    }
    assert sum(got.values()) == 1


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_mis_oracle_unroll_exhausts(sf_dir):
    """Certificate for the driver's MIS oracle: the unrolled Luby
    rounds must EXHAUST the undecided set at the contract SFs,
    otherwise vertices would be left undecided and reported out of the
    set. Also cross-checks the md5-prefix priority against hashlib."""
    import duckdb
    import hashlib

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    dd = con.execute(
        "SELECT ('0x' || substr(md5('role:view:4'), 1, 15))::BIGINT"
    ).fetchone()[0]
    assert dd == int(hashlib.md5(b"role:view:4").hexdigest()[:15], 16)

    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{sf_dir}/events.parquet'"
    )
    r = entrymod._SQL_MIS_ROUNDS
    sql = entrymod._build_sql_mis(r, seed=4)
    n_left = con.execute(
        sql.split("\n, mis AS")[0] + f"\nSELECT count(*) FROM und{r}"
    ).fetchone()[0]
    assert n_left == 0
