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


def test_rate_anomalies(spark):
    """Hand-built series: z fires only with >= min_periods baseline and
    nonzero variance; empty buckets never enter the baseline."""
    import datetime as dt

    from graft.temporal import rate_anomalies

    rows = []
    base = dt.datetime(2026, 3, 1, 12, 0, 0)
    for day, c in enumerate([1, 2, 3, 10]):          # "a": spike on day 4
        rows += [("a", base + dt.timedelta(days=day))] * c
    for day in range(4):                             # "b": flat (s = 0)
        rows += [("b", base + dt.timedelta(days=day))] * 2
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        (r.key, r.win): r
        for r in rate_anomalies(df, min_periods=3).collect()
    }
    assert len(got) == 8
    spike = got[("a", "2026-03-04 00:00:00")]
    assert spike.n == 10 and spike.base_mean == 2.0 and spike.base_std == 1.0
    assert spike.z == 8.0
    # fewer than min_periods trailing buckets -> NULL z
    assert got[("a", "2026-03-01 00:00:00")].z is None
    assert got[("a", "2026-03-03 00:00:00")].z is None
    # zero-variance baseline -> NULL z, mean still reported
    flat = got[("b", "2026-03-04 00:00:00")]
    assert flat.base_std == 0.0 and flat.z is None and flat.base_mean == 2.0
