"""Statistics helpers behind the scaling cells (bench.py).

These pin the estimator semantics the BENCH/BASELINE.md protocol
documents: the consistent (min hi − min lo)/span pair statistic, the
null-not-fabricated handling of unusable readings, the both-direction
abnormality trigger, and the rep-pooling merges. Pure python — no
Spark session involved.
"""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_pair_min_marginal_consistent_statistic():
    # minima pool across pairs: quiet lo from pair 1, quiet hi from
    # pair 0 — the difference uses both
    assert bench._pair_min_marginal([(2.5, 9.0), (2.0, 10.0)], 8) == (
        (9.0 - 2.0) / 8
    )


def test_pair_min_marginal_burst_on_lo_does_not_sink_estimate():
    # the inconsistent per-pair-min variant would return (4.0-5.0) or
    # skip to (11.0-2.0)/8 from the clean pair only; the pooled minima
    # give (4.0-2.0)/8 — bounded by observed walls, never below a
    # genuinely observed hi minus a genuinely observed lo
    got = bench._pair_min_marginal([(5.0, 11.0), (2.0, 4.0)], 8)
    assert got == (4.0 - 2.0) / 8


def test_pair_min_marginal_unusable_reports_sentinel():
    assert bench._pair_min_marginal([(5.0, 4.0)], 8) == -1.0


def test_abnormal_trigger_both_directions():
    assert bench._abnormal(None)
    assert bench._abnormal(0.5)
    assert bench._abnormal(1.2)
    assert not bench._abnormal(0.82)
    assert not bench._abnormal(1.0)
    assert not bench._abnormal(1.05)


def test_merge_sweep_runs_pools_per_index_minima():
    a = {
        "sweep_durations_per_rep": [[5.0, 6.0], [5.5, 5.8]],
        "sym_edge_rows": 100,
    }
    b = {"sweep_durations_per_rep": [[4.9, 6.2]]}
    m = bench._merge_sweep_runs(a, b)
    assert m["per_index_min_sec"] == [4.9, 5.8]
    assert m["marginal_sec_per_sweep"] == round((4.9 + 5.8) / 2, 3)
    # the originals are not mutated
    assert len(a["sweep_durations_per_rep"]) == 2


def test_merge_pagerank_runs_pools_pairs():
    a = {"wall_sec_pairs": [(1.0, 6.0)], "k": 6, "sym_edge_rows": 100}
    b = {"wall_sec_pairs": [(0.9, 5.8)]}
    m = bench._merge_pagerank_runs(a, b)
    assert m["marginal_sec_per_superstep"] == round((5.8 - 0.9) / 5, 3)
    bad = bench._merge_pagerank_runs(
        {"wall_sec_pairs": [(6.0, 5.0)], "k": 6, "sym_edge_rows": 100},
        {"wall_sec_pairs": [(7.0, 6.5)]},
    )
    assert bad["marginal_sec_per_superstep"] == -1.0
    assert bad["edges_per_sec_per_superstep"] is None


def test_merge_wall_runs_pools_pairs_and_nulls_rate():
    a = {"wall_sec_pairs": [(2.0, 10.0)], "nh_lo": 8, "nh_hi": 64}
    b = {"wall_sec_pairs": [(1.9, 9.4)]}
    m = bench._merge_wall_runs(
        a, b, 56, "marginal_sec_per_hash_fn", "hash_fns_per_sec"
    )
    assert m["marginal_sec_per_hash_fn"] == round((9.4 - 1.9) / 56, 5)
    bad = bench._merge_wall_runs(
        {"wall_sec_pairs": [(5.0, 4.0)]},
        {"wall_sec_pairs": [(6.0, 5.5)]},
        8, "m", "r",
    )
    assert bad["m"] == -1.0 and bad["r"] is None
