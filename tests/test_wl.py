"""Weisfeiler–Leman refinement: refinement/invariance properties plus
the DuckDB-replayability of the recolor hash."""

import hashlib

import pytest

from graft import fixtures
from graft.algos.wl import (
    conversation_wl_fingerprints,
    graph_fingerprint,
    wl_colors,
)
from graft.graph import Graph
from tests.reference_impls import random_graph


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _wl_ref(edges, rounds):
    """Pure-python 1-WL with the engine's exact recolor: md5-prefix of
    "own|S", S = commutative sum of neighbor color hashes mod 2^60."""
    adj: dict = {}
    for u, v, _ in edges:
        if u == v:
            adj.setdefault(u, set())
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    color = {v: len(ns) for v, ns in adj.items()}
    for _ in range(rounds):
        nxt = {}
        for v, ns in adj.items():
            s_sum = sum(_h60(str(color[u])) for u in ns) % 2**60
            nxt[v] = _h60(f"{color[v]}|{s_sum}")
        color = nxt
    return color


def test_wl_matches_python_reference(spark):
    edges = random_graph(40, 0.12, seed=11)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    got = {r.id: r.color for r in wl_colors(g, rounds=2).collect()}
    g.unpersist()
    assert got == _wl_ref(edges, 2)


def test_wl_isomorphism_invariance(spark):
    """Relabeling vertices must not change the color multiset or the
    graph fingerprint."""
    edges = random_graph(30, 0.15, seed=7)
    perm = {v: (v * 13 + 5) % 97 for v in range(120)}
    relabeled = [(perm[u], perm[v], w) for u, v, w in edges]
    g1 = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    g2 = Graph.from_undirected(
        fixtures.edges_df(spark, relabeled)
    ).cache()
    m1 = sorted(r.color for r in wl_colors(g1, 2).collect())
    m2 = sorted(r.color for r in wl_colors(g2, 2).collect())
    f1 = graph_fingerprint(g1, 2).first()
    f2 = graph_fingerprint(g2, 2).first()
    g1.unpersist()
    g2.unpersist()
    assert m1 == m2
    assert f1 == f2


def test_wl_distinguishes_non_isomorphic(spark):
    """P6 vs triangle+P3: identical degree sequences [1,1,2,2,2,2], so
    round-0 colors agree — but after one round the P3 center is the
    only vertex colored (deg 2, neighbor degs {1,1}), so WL separates
    the fingerprints by round 2."""
    p6 = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0),
          (3, 4, 1.0), (4, 5, 1.0)]
    tri_p3 = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
              (3, 4, 1.0), (4, 5, 1.0)]
    g1 = Graph.from_undirected(fixtures.edges_df(spark, p6)).cache()
    g2 = Graph.from_undirected(fixtures.edges_df(spark, tri_p3)).cache()
    f1 = graph_fingerprint(g1, 2).first()
    f2 = graph_fingerprint(g2, 2).first()
    g1.unpersist()
    g2.unpersist()
    assert f1.fingerprint != f2.fingerprint


def test_wl_known_blind_spot_collides(spark):
    """Documented 1-WL limitation: 2×C3 vs C6 are NON-isomorphic but
    every vertex stays in one uniform color class forever (degree-2,
    two same-colored neighbors), so the fingerprints MUST collide.
    This pins the operator's honest contract — it's 1-WL, not a
    complete isomorphism test."""
    tri2 = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
            (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0)]
    c6 = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0),
          (3, 4, 1.0), (4, 5, 1.0), (5, 0, 1.0)]
    g1 = Graph.from_undirected(fixtures.edges_df(spark, tri2)).cache()
    g2 = Graph.from_undirected(fixtures.edges_df(spark, c6)).cache()
    f1 = graph_fingerprint(g1, 2).first()
    f2 = graph_fingerprint(g2, 2).first()
    g1.unpersist()
    g2.unpersist()
    assert f1.fingerprint == f2.fingerprint
    assert f1.n_colors == 1 and f2.n_colors == 1


def test_wl_refines_partition(spark):
    """Colors at round t+1 refine round t: vertices sharing a round-2
    color must share their round-1 color."""
    edges = random_graph(40, 0.1, seed=3)
    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    c1 = {r.id: r.color for r in wl_colors(g, 1).collect()}
    c2 = {r.id: r.color for r in wl_colors(g, 2).collect()}
    g.unpersist()
    by_c2: dict = {}
    for v, c in c2.items():
        by_c2.setdefault(c, set()).add(c1[v])
    assert all(len(s) == 1 for s in by_c2.values())


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_wl_recolor_hash_matches_duckdb(sf_dir):
    """The engine's recolor hash and DuckDB's must be bit-identical on
    a canonical string (priority of the oracle's replayability)."""
    import duckdb

    s = "12|3437281"
    con = duckdb.connect()
    dd = con.execute(
        f"SELECT ('0x' || substr(md5('{s}'), 1, 15))::BIGINT"
    ).fetchone()[0]
    assert dd == _h60(s)
    # and the commutative neighbor-sum path: HUGEINT sum mod 2^60
    # must match python's arbitrary-precision sum mod 2^60
    cols = [3, 3, 7, 2**59, 2**59 + 11]
    dd_sum = con.execute(
        "SELECT cast(sum(('0x' || substr(md5(cast(c AS varchar)), 1, 15))"
        "::BIGINT) % 1152921504606846976 AS varchar) "
        "FROM (SELECT unnest(?) AS c)", [cols]
    ).fetchone()[0]
    assert dd_sum == str(sum(_h60(str(c)) for c in cols) % 2**60)


def _tx(spark, convs):
    """Transcript df from {conv_id: [(role, tool), ...]} turn lists."""
    import datetime as dt

    rows = []
    for cid, turns in convs.items():
        for i, (role, tool) in enumerate(turns):
            rows.append(
                (cid, i, role, f"text {cid} {i}", tool,
                 dt.datetime(2026, 1, 1, 0, 0, i))
            )
    return spark.createDataFrame(
        rows, schema=fixtures.TRANSCRIPT_SCHEMA
    )


def test_conv_fingerprints_rename_invariant(spark):
    """Two conversations with the same interaction SHAPE but entirely
    different actor names (relabeled roles/tools) must collide; a
    structurally different third must not. This is the dedup contract:
    names never enter the hash (colors start from degree)."""
    # shape 1: u -> a -> t -> a -> u -> a   (path-ish revisit pattern)
    c1 = [("user", None), ("assistant", None), (None, "search"),
          ("assistant", None), ("user", None), ("assistant", None)]
    # same shape, every actor renamed
    c2 = [("alice", None), ("bot", None), (None, "python"),
          ("bot", None), ("alice", None), ("bot", None)]
    # different shape: a 4-actor star around the assistant
    c3 = [("user", None), ("assistant", None), (None, "search"),
          ("assistant", None), (None, "python"), ("assistant", None),
          ("user", None)]
    out = {
        r.conv_id: r
        for r in conversation_wl_fingerprints(
            _tx(spark, {"c1": c1, "c2": c2, "c3": c3})
        ).collect()
    }
    assert out["c1"].fingerprint == out["c2"].fingerprint
    assert out["c1"].n_colors == out["c2"].n_colors
    assert out["c1"].n_vertices == out["c2"].n_vertices
    assert out["c3"].fingerprint != out["c1"].fingerprint


def test_conv_fingerprint_matches_whole_graph_operator(spark):
    """For a single conversation the per-conv fingerprint must equal
    graph_fingerprint() of the SAME simple graph built standalone —
    pins the two code paths to one definition."""
    turns = [("user", None), ("assistant", None), (None, "search"),
             ("user", None), (None, "browser"), ("assistant", None),
             ("assistant", None)]  # incl. a same-actor repeat (dropped)
    t = _tx(spark, {"only": turns})
    row = conversation_wl_fingerprints(t, rounds=2).first()

    actors = [("tool:" + tl) if tl else ("role:" + r) for r, tl in turns]
    ids = {a: i for i, a in enumerate(dict.fromkeys(actors))}
    pairs = {
        tuple(sorted((ids[a], ids[b])))
        for a, b in zip(actors, actors[1:]) if a != b
    }
    g = Graph.from_undirected(
        fixtures.edges_df(spark, [(u, v, 1.0) for u, v in pairs])
    ).cache()
    ref = graph_fingerprint(g, rounds=2).first()
    g.unpersist()
    assert row.fingerprint == ref.fingerprint
    assert row.n_colors == ref.n_colors
    assert row.n_vertices == len(ids)


def test_conv_fingerprints_isolated_and_loop_only_convs(spark):
    """A 1-turn conversation and an all-same-actor conversation both
    have empty adjacency: every vertex keeps the degree-0 color chain,
    so the fingerprint depends only on n_vertices."""
    out = {
        r.conv_id: r
        for r in conversation_wl_fingerprints(
            _tx(spark, {
                "one": [("user", None)],
                "loop": [("user", None), ("user", None), ("user", None)],
            })
        ).collect()
    }
    assert out["one"].n_vertices == 1 and out["loop"].n_vertices == 1
    assert out["one"].fingerprint == out["loop"].fingerprint
    assert out["one"].n_colors == 1


def test_windowed_fingerprints_drift_and_containment(spark):
    """Two weeks with identical interaction shape fingerprint equal;
    a structurally different third week differs. Cross-window
    adjacencies are dropped (each window's graph is self-contained)."""
    from graft.algos.wl import windowed_wl_fingerprints

    def turns(cid, week_day, pattern):
        # pattern: list of (role, tool); one turn per minute on the
        # given day (day 1 = 2026-01-05, a Monday)
        import datetime as dt

        base = dt.datetime(2026, 1, 5) + dt.timedelta(days=week_day)
        return [
            (cid, i, r, "t", tl, base + dt.timedelta(minutes=i))
            for i, (r, tl) in enumerate(pattern)
        ]

    loop = [("user", None), ("assistant", None), (None, "search"),
            ("assistant", None), ("user", None)]
    star = [("user", None), ("assistant", None), (None, "search"),
            ("assistant", None), (None, "python"), ("assistant", None)]
    rows = (
        turns("w1", 0, loop)        # week of Jan 5
        + turns("w2", 7, loop)      # week of Jan 12: same shape
        + turns("w3", 14, star)     # week of Jan 19: different shape
    )
    t = spark.createDataFrame(rows, schema=fixtures.TRANSCRIPT_SCHEMA)
    out = {r.win: r for r in windowed_wl_fingerprints(t, "week").collect()}
    assert len(out) == 3
    fps = sorted(out.items())
    assert fps[0][1].fingerprint == fps[1][1].fingerprint
    assert fps[2][1].fingerprint != fps[0][1].fingerprint


def test_windowed_matches_conversation_core(spark):
    """A single conversation wholly inside one window produces the
    same fingerprint through both grouped-WL wrappers."""
    from graft.algos.wl import windowed_wl_fingerprints

    turns = [("user", None), ("assistant", None), (None, "search"),
             ("user", None), ("assistant", None)]
    t = _tx(spark, {"only": turns})  # all ts within one minute window
    conv = conversation_wl_fingerprints(t).first()
    win = windowed_wl_fingerprints(t, "week").first()
    assert conv.fingerprint == win.fingerprint
    assert conv.n_colors == win.n_colors
    assert conv.n_vertices == win.n_vertices
