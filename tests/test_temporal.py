"""Temporal snapshot analytics: edge_diff and snapshot_drift."""

from graft.temporal import edge_diff, snapshot_drift


def _edges(spark, rows):
    return spark.createDataFrame(rows, "u string, v string, weight double")


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "win string, u string, v string, weight double"
    )


def test_edge_diff_statuses(spark):
    old = _edges(spark, [("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 3.0)])
    new = _edges(spark, [("a", "b", 1.0), ("a", "c", 5.0), ("c", "d", 1.0)])
    got = {(r.u, r.v): r for r in edge_diff(old, new).collect()}
    assert len(got) == 4
    assert got[("a", "b")].status == "unchanged"
    assert got[("a", "b")].delta == 0.0
    assert got[("a", "c")].status == "changed"
    assert got[("a", "c")].delta == 3.0
    assert got[("b", "c")].status == "removed"
    assert got[("b", "c")].w_new is None
    assert got[("b", "c")].delta == -3.0
    assert got[("c", "d")].status == "added"
    assert got[("c", "d")].w_old is None
    assert got[("c", "d")].delta == 1.0


def test_edge_diff_exclude_unchanged(spark):
    old = _edges(spark, [("a", "b", 1.0), ("a", "c", 2.0)])
    new = _edges(spark, [("a", "b", 1.0), ("a", "c", 3.0)])
    rows = edge_diff(old, new, include_unchanged=False).collect()
    assert {(r.u, r.v) for r in rows} == {("a", "c")}


def test_snapshot_drift_consecutive_pairs(spark):
    snaps = _snaps(spark, [
        # day 1: {ab, ac}
        ("d1", "a", "b", 1.0),
        ("d1", "a", "c", 2.0),
        # day 2: {ab (changed), bc (new)} — ac removed
        ("d2", "a", "b", 3.0),
        ("d2", "b", "c", 1.0),
        # day 3: identical to day 2
        ("d3", "a", "b", 3.0),
        ("d3", "b", "c", 1.0),
    ])
    got = {r.win: r for r in snapshot_drift(snaps).collect()}
    assert set(got) == {"d1", "d2"}

    r12 = got["d1"]
    assert r12.next_win == "d2"
    assert (r12.n_prev, r12.n_cur, r12.n_common) == (2, 2, 1)
    assert (r12.n_added, r12.n_removed) == (1, 1)
    assert r12.jaccard == round(1 / 3, 6)
    # |3-1| on ab + |0-2| on ac + |1-0| on bc
    assert r12.weight_delta == 5.0

    r23 = got["d2"]
    assert (r23.n_prev, r23.n_cur, r23.n_common) == (2, 2, 2)
    assert (r23.n_added, r23.n_removed) == (0, 0)
    assert r23.jaccard == 1.0
    assert r23.weight_delta == 0.0


def test_snapshot_drift_single_window_empty(spark):
    snaps = _snaps(spark, [("d1", "a", "b", 1.0)])
    assert snapshot_drift(snaps).count() == 0
