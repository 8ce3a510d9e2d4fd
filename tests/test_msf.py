"""Minimum spanning forest (graft.algos.msf).

Oracle: an independent in-test Kruskal over the collected edge list
under the same (weight, u, v) total order — the MSF is unique under
that order, so both execution paths must match it edge-for-edge.
"""

import pytest

from graft.algos.msf import minimum_spanning_forest, msf_total_weight
from graft.graph import Graph


def _kruskal(rows):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for u, v, w in sorted(
        {(min(a, b), max(a, b), w) for a, b, w in rows if a != b}
    , key=lambda t: (t[2], t[0], t[1])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.append((u, v, w))
    return sorted(out)


def _got(df):
    return sorted((r["u"], r["v"], r["weight"]) for r in df.collect())


@pytest.fixture(scope="module")
def weighted(spark):
    # two components: a weighted 6-vertex blob and a 3-cycle
    rows = [
        (0, 1, 4.0), (0, 2, 3.0), (1, 2, 1.0), (1, 3, 2.0),
        (2, 3, 4.0), (3, 4, 2.0), (4, 5, 6.0), (2, 5, 5.0),
        (0, 3, 1.0),
        (10, 11, 1.0), (11, 12, 1.0), (10, 12, 1.0),
    ]
    g = Graph.from_undirected(
        spark.createDataFrame(rows, "src long, dst long, weight double")
    ).cache()
    yield g, rows
    g.unpersist()


def test_sequential_matches_kruskal(weighted):
    g, rows = weighted
    assert _got(minimum_spanning_forest(g)) == _kruskal(rows)


def test_boruvka_matches_kruskal(weighted):
    g, rows = weighted
    got = _got(minimum_spanning_forest(g, sequential_threshold=0))
    assert got == _kruskal(rows)


def test_forest_shape(weighted):
    g, rows = weighted
    row = msf_total_weight(g).first()
    want = _kruskal(rows)
    # forest over 2 components of 6 + 3 vertices: (6-1) + (3-1) edges
    assert row["n_edges"] == 7 == len(want)
    assert row["total_weight"] == round(sum(w for _, _, w in want), 6)


def test_string_keys(spark):
    rows = [
        ("a", "b", 2.0), ("b", "c", 1.0), ("a", "c", 3.0),
        ("c", "d", 5.0),
    ]
    g = Graph.from_undirected(
        spark.createDataFrame(rows, "src string, dst string, weight double")
    ).cache()
    for thresh in (1_000_000, 0):
        got = _got(minimum_spanning_forest(g, sequential_threshold=thresh))
        assert got == _kruskal(rows)
    g.unpersist()


def test_tie_break_deterministic(spark):
    # all weights equal: unique MSF under the (weight, u, v) order is
    # the lexicographically-first spanning tree
    rows = [(a, b, 1.0) for a in range(5) for b in range(a + 1, 5)]
    g = Graph.from_undirected(
        spark.createDataFrame(rows, "src long, dst long, weight double")
    ).cache()
    seq = _got(minimum_spanning_forest(g))
    bsp = _got(minimum_spanning_forest(g, sequential_threshold=0))
    g.unpersist()
    assert seq == bsp == _kruskal(rows)
    assert seq == [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0)]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_contract_graph_matches_kruskal(spark, sf_dir):
    """Certificate for the driver's rows-only `msf_total_weight` row:
    on the SAME sf-dir actor graphs the engine's forest must equal an
    independent in-test Kruskal edge-for-edge (the MSF is unique under
    the (weight, u, v) order, so this is exact, not statistical)."""
    import os

    import __spark_entry__ as entrymod

    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    g = entrymod._actor_graph(spark, sf_dir).cache()
    rows = [
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.collect()
        if r["src"] < r["dst"]
    ]
    want = _kruskal(rows)
    for thresh in (1_000_000, 0):
        got = _got(minimum_spanning_forest(g, sequential_threshold=thresh))
        assert got == want
    g.unpersist()


def test_self_loops_excluded(spark):
    rows = [(0, 0, 0.5), (0, 1, 2.0)]
    g = Graph.from_undirected(
        spark.createDataFrame(rows, "src long, dst long, weight double")
    ).cache()
    assert _got(minimum_spanning_forest(g)) == [(0, 1, 2.0)]
    g.unpersist()


def test_exact_round_budget_completes(spark):
    # a run whose work list empties exactly on round max_iter must
    # complete, not raise (emptiness is checked after contraction)
    g = Graph.from_undirected(
        spark.createDataFrame([(0, 1, 1.0)],
                              "src long, dst long, weight double")
    ).cache()
    got = _got(minimum_spanning_forest(g, max_iter=1,
                                       sequential_threshold=0))
    g.unpersist()
    assert got == [(0, 1, 1.0)]


def test_maximum_spanning_forest(spark, weighted):
    from graft.algos.msf import maximum_spanning_forest

    g, rows = weighted
    want = sorted(
        (u, v, -w) for u, v, w in
        _kruskal([(a, b, -w) for a, b, w in rows])
    )
    for thresh in (1_000_000, 0):
        got = _got(maximum_spanning_forest(g, sequential_threshold=thresh))
        assert got == want
    # a maximum tree never weighs less than the minimum tree
    assert sum(w for _, _, w in got) >= sum(
        w for _, _, w in _kruskal(rows)
    )


def test_cut_property_sql_oracle_matches_kruskal():
    """The contract oracle's cut-property characterization
    (__spark_entry__.SQL_MSF_BODY: an edge is in the unique MSF iff its
    endpoints are NOT connected by strictly (weight, u, v)-order-smaller
    edges, reachability run to the WITH RECURSIVE fixpoint) reproduces
    Kruskal edge-for-edge on random tie-heavy graphs — certifying the
    SQL twin's logic independently of the events-table derivation. No
    Spark involved: pure DuckDB vs the in-test Kruskal."""
    import random
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import SQL_MSF_BODY

    rng = random.Random(7)
    for _trial in range(5):
        n = rng.randrange(5, 40)
        pairs = {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randrange(4, 3 * n))
        }
        # small weight universe so tie-breaks on (u, v) actually fire
        rows = [(u, v, float(rng.randrange(1, 4))) for u, v in pairs]
        con = duckdb.connect()
        con.execute("CREATE TABLE raw(u BIGINT, v BIGINT, weight DOUBLE)")
        con.executemany("INSERT INTO raw VALUES (?, ?, ?)", rows)
        got = con.execute(
            "WITH RECURSIVE cand AS (SELECT u, v, weight FROM raw)"
            + SQL_MSF_BODY
            + " SELECT u, v, weight FROM msf"
        ).fetchall()
        con.close()
        assert sorted(got) == _kruskal(rows), f"n={n} rows={rows}"
