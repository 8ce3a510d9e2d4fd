"""Equivalence pins for the native (C) sequential-tail kernels.

The C kernels in graft/_native/kernels.c must be BIT-IDENTICAL to the
pure-Python/numpy reference paths — identical visit schedules, identical
float accumulation order, identical tie-breaks, identical rng streams.
These tests run the same inputs through both paths and assert exact
equality of every output and work counter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from graft import _native as nk

pytestmark = pytest.mark.skipif(
    nk.lib() is None, reason="no C compiler / native kernels unavailable"
)


def _random_graph(rng, n=300, m=1800, weighted=True):
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    w = (
        np.round(rng.random(m) * 3 + 0.01, 3)
        if weighted
        else np.ones(m)
    )
    raw = pd.DataFrame({"src": src, "dst": dst, "weight": w})
    sym = pd.concat(
        [raw, raw.rename(columns={"src": "dst", "dst": "src"})],
        ignore_index=True,
    )
    epdf = sym.groupby(["src", "dst"], as_index=False)["weight"].min()
    strength = epdf.groupby("src", sort=True)["weight"].sum()
    nodes = pd.DataFrame(
        {
            "id": strength.index.to_numpy(),
            "agg_count": 1,
            "k": strength.to_numpy(),
        }
    )
    m_half = float(epdf["weight"].sum()) / 2.0
    return nodes, epdf, m_half


def _hub_graph(rng, n=200, hub_deg=150):
    """A star-heavy graph whose hub degree crosses _VEC_DEGREE, so the
    local-moving gather exercises both the dict and the vectorized
    Python branches against the single C path."""
    spokes = rng.choice(np.arange(1, n), size=hub_deg, replace=False)
    extra_src = rng.integers(1, n, size=400)
    extra_dst = rng.integers(1, n, size=400)
    raw = pd.DataFrame(
        {
            "src": np.concatenate([np.zeros(hub_deg, dtype=np.int64), extra_src]),
            "dst": np.concatenate([spokes, extra_dst]),
            "weight": np.round(rng.random(hub_deg + 400) + 0.1, 3),
        }
    )
    sym = pd.concat(
        [raw, raw.rename(columns={"src": "dst", "dst": "src"})],
        ignore_index=True,
    )
    epdf = sym.groupby(["src", "dst"], as_index=False)["weight"].min()
    strength = epdf.groupby("src", sort=True)["weight"].sum()
    nodes = pd.DataFrame(
        {
            "id": strength.index.to_numpy(),
            "agg_count": 1,
            "k": strength.to_numpy(),
        }
    )
    return nodes, epdf, float(epdf["weight"].sum()) / 2.0


def _run_both(monkeypatch, nodes, epdf, objective, gamma, m_half, seed,
              warm=None):
    from graft.algos import seq_tail

    n_in = nodes.copy()
    if warm is not None:
        n_in = n_in.assign(community=warm)
    stats_c: dict = {}
    out_c = seq_tail.seq_community_tail(
        n_in, epdf, objective, gamma, m_half, seed, stats=stats_c
    )
    monkeypatch.setattr(nk, "lib", lambda: None)
    monkeypatch.setattr(nk, "rng_ok", lambda: False)
    stats_p: dict = {}
    out_p = seq_tail.seq_community_tail(
        n_in, epdf, objective, gamma, m_half, seed, stats=stats_p
    )
    monkeypatch.undo()
    assert stats_c == stats_p, (stats_c, stats_p)
    pd.testing.assert_frame_equal(out_c, out_p)
    return out_c


def test_rng_stream_is_bit_exact():
    assert nk.rng_ok()
    rs = np.random.default_rng(7)
    for sd in [0, 1, 1234, 2**62 + 99, *rs.integers(0, 2**63, size=20)]:
        for n in [1, 2, 7, 33, 257]:
            got = nk.permutation(int(sd), n)
            ref = np.random.default_rng(int(sd)).permutation(n)
            assert np.array_equal(got, ref), (sd, n)


def test_csr_build_matches_lexsort():
    rng = np.random.default_rng(3)
    n = 50
    eu = rng.integers(0, n - 1, size=200)
    ev = eu + rng.integers(1, 5, size=200)
    ev = np.minimum(ev, n - 1)
    keep = eu < ev
    key = eu[keep] * n + ev[keep]
    uniq = np.unique(key)
    eu_u, ev_u = uniq // n, uniq % n
    ew = np.round(np.random.default_rng(4).random(len(uniq)), 3)
    got = nk.csr_build(n, eu_u, ev_u, ew)
    su = np.concatenate([eu_u, ev_u])
    sv = np.concatenate([ev_u, eu_u])
    sw = np.concatenate([ew, ew])
    order = np.lexsort((sv, su))
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, su + 1, 1)
    indptr = np.cumsum(indptr)
    assert np.array_equal(got[0], indptr)
    assert np.array_equal(got[1], sv[order])
    assert np.array_equal(got[2], sw[order])


@pytest.mark.parametrize("objective", ["cpm", "modularity"])
@pytest.mark.parametrize("seed", [1234, 7, 991])
def test_tail_c_equals_python(monkeypatch, objective, seed):
    rng = np.random.default_rng(seed)
    nodes, epdf, m_half = _random_graph(rng)
    _run_both(monkeypatch, nodes, epdf, objective, 0.05, m_half, seed)


def test_tail_c_equals_python_hub(monkeypatch):
    rng = np.random.default_rng(42)
    nodes, epdf, m_half = _hub_graph(rng)
    _run_both(monkeypatch, nodes, epdf, "cpm", 0.05, m_half, 1234)
    _run_both(monkeypatch, nodes, epdf, "modularity", 0.05, m_half, 1234)


def test_tail_c_equals_python_warm_seed(monkeypatch):
    rng = np.random.default_rng(5)
    nodes, epdf, m_half = _random_graph(rng, n=200, m=900)
    cold = _run_both(monkeypatch, nodes, epdf, "cpm", 0.05, m_half, 1234)
    warm = cold["community"].to_numpy()
    _run_both(monkeypatch, nodes, epdf, "cpm", 0.05, m_half, 1234, warm=warm)


def test_tail_c_equals_python_unweighted(monkeypatch):
    rng = np.random.default_rng(11)
    nodes, epdf, m_half = _random_graph(rng, weighted=False)
    _run_both(monkeypatch, nodes, epdf, "cpm", 0.05, m_half, 1234)


def test_refine_bucket_native_equals_python_loop():
    """The batched native bucket refinement must equal the per-community
    Python loop of refine_partition.fn exactly (same grouping by
    (community, _b), same rng streams, same trivial short-circuits)."""
    from graft.algos.leiden import _refine_bucket_native, _refine_community

    rng = np.random.default_rng(17)
    rows = []
    edge_rows = []
    # 40 communities of varied size incl. singletons, edge-less groups,
    # and a community split into two _b sub-buckets
    next_id = 0
    for c in range(40):
        k = int(rng.integers(1, 12))
        n_sub = 2 if c == 7 else 1
        members = np.arange(next_id, next_id + k)
        next_id += k
        s_tot_full = int(k + rng.integers(0, 5))
        for b in range(n_sub):
            sub = members[b::n_sub]
            for mid in sub:
                rows.append(
                    {
                        "id": int(mid), "community": 1000 + c,
                        "agg_count": int(rng.integers(1, 3)),
                        "s_tot_full": s_tot_full, "_b": b,
                    }
                )
            if len(sub) > 1 and c % 5 != 3:  # some groups edge-less
                for _ in range(int(rng.integers(1, 2 * len(sub)))):
                    u, v = sorted(rng.choice(sub, size=2, replace=False))
                    edge_rows.append(
                        {
                            "community": 1000 + c, "_b": b,
                            "u": int(u), "v": int(v),
                            "weight": float(np.round(rng.random() + 0.1, 3)),
                        }
                    )
    nodes_pdf = pd.DataFrame(rows).sample(frac=1.0, random_state=3)
    edges_pdf = pd.DataFrame(edge_rows).sample(frac=1.0, random_state=4)
    got = _refine_bucket_native(nodes_pdf, edges_pdf, 0.25, 1234)
    assert got is not None
    # reference: the Python per-community loop (refine_partition.fn body)
    edges_by = {
        k: sub for k, sub in edges_pdf.groupby(["community", "_b"], sort=False)
    }
    parts = []
    trivial = []
    for key, nsub in nodes_pdf.groupby(["community", "_b"], sort=False):
        esub = edges_by.get(key)
        if len(nsub) == 1 or esub is None:
            trivial.extend(nsub["id"].tolist())
            continue
        import graft._native as _nk_mod

        real_rng_ok = _nk_mod.rng_ok
        _nk_mod.rng_ok = lambda: False  # force the pure-Python core
        try:
            parts.append(_refine_community(nsub, esub, 0.25, 1234))
        finally:
            _nk_mod.rng_ok = real_rng_ok
    if trivial:
        parts.append(pd.DataFrame({"id": trivial, "refined": trivial}))
    ref = pd.concat(parts, ignore_index=True)
    merged = got.merge(ref, on="id", suffixes=("_c", "_py"))
    assert len(merged) == len(got) == len(ref)
    assert (merged["refined_c"] == merged["refined_py"]).all()
