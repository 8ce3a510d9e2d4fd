"""Jones–Plassmann coloring: properness + bound + determinism."""

import pytest

from graft import fixtures
from graft.algos.coloring import greedy_color
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
    max_deg = max((len(ns) for ns in adj.values()), default=0)
    for v, c in got.items():
        assert 0 <= c <= max_deg
        for w in adj.get(v, ()):
            assert got[w] != c, (v, w)


def test_random_graphs_proper(spark):
    for s in (1, 2):
        edges = random_graph(40, 0.1 * (s + 1), seed=s, weighted=False)
        g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
        got = {r.id: r.color for r in greedy_color(g, seed=s).collect()}
        g.unpersist()
        _check(edges, got)


def test_deterministic_under_repartition(spark):
    edges = random_graph(30, 0.2, seed=5, weighted=False)
    df = fixtures.edges_df(spark, edges)
    g1 = Graph.from_undirected(df).cache()
    g2 = Graph.from_undirected(df.repartition(7)).cache()
    c1 = sorted((r.id, r.color) for r in greedy_color(g1, seed=3).collect())
    c2 = sorted((r.id, r.color) for r in greedy_color(g2, seed=3).collect())
    g1.unpersist()
    g2.unpersist()
    assert c1 == c2


def test_bipartite_and_special_cases(spark):
    # even cycle: 2 colors suffice for SOME order, greedy uses <= 3
    edges = [(i, (i + 1) % 8, 1.0) for i in range(8)]
    g = Graph.from_undirected(fixtures.edges_df(spark, edges))
    got = {r.id: r.color for r in greedy_color(g).collect()}
    _check(edges, got)
    assert len(set(got.values())) <= 3
    # clique: exactly n colors
    ek = [(u, v, 1.0) for u in range(5) for v in range(u + 1, 5)]
    gk = Graph.from_undirected(fixtures.edges_df(spark, ek))
    gotk = {r.id: r.color for r in greedy_color(gk).collect()}
    _check(ek, gotk)
    assert sorted(set(gotk.values())) == [0, 1, 2, 3, 4]
    # self-loop-only vertex colors 0
    gs = Graph.from_undirected(
        fixtures.edges_df(spark, [(0, 1, 1.0), (2, 2, 1.0)])
    )
    gots = {r.id: r.color for r in greedy_color(gs).collect()}
    assert gots[2] == 0 and gots[0] != gots[1]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_coloring_oracle_unroll_exhausts(sf_dir):
    """Certificate for the driver's coloring oracle: the unrolled
    Jones-Plassmann rounds must EXHAUST the uncolored set at the
    contract SFs (i.e. the unroll covers the longest
    decreasing-priority path), otherwise vertices would be missing
    from the oracle output."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{sf_dir}/events.parquet'"
    )
    r = entrymod._SQL_COLORING_ROUNDS
    sql = entrymod._build_sql_coloring(r, seed=4)
    n_left = con.execute(
        sql.rsplit("\nSELECT id, color", 1)[0]
        + f"\nSELECT count(*) FROM unc{r}"
    ).fetchone()[0]
    assert n_left == 0
