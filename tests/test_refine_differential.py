"""Differential test: the engine's incremental refinement kernel vs a
clean-room from-scratch implementation of the reference's
merge_nodes_subset semantics (custom_leiden.py:349-459), including the
shrinking remaining-communities bookkeeping (VERDICT r1 'missing' #4).

Equivalence argument under test: the reference's remaining set is at all
times exactly the set of non-empty refined communities (only a mover's
emptied singleton is ever removed), so its remaining-set community cut
equals the engine's incrementally-maintained rc_cut. 200 random seeds
×  several graph shapes check it empirically — including after merges,
where the two bookkeeping styles could in principle diverge.

Runs without Spark: the kernel is exercised as a plain pandas function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from graft.algos.leiden import _refine_community
from tests.reference_impls import (
    dedup_undirected,
    random_graph,
    refine_subset_ref,
)


def _partition(labels: dict) -> set[frozenset]:
    groups: dict = {}
    for v, c in labels.items():
        groups.setdefault(c, set()).add(v)
    return {frozenset(g) for g in groups.values()}


def _run_kernel(ids, n_v, intra, gamma, seed, comm_id=0):
    nodes = pd.DataFrame(
        {
            "id": ids,
            "community": [comm_id] * len(ids),
            "agg_count": [n_v[i] for i in ids],
            "s_tot_full": [sum(n_v.values())] * len(ids),
        }
    )
    edges = pd.DataFrame(
        {
            "u": [e[0] for e in intra],
            "v": [e[1] for e in intra],
            "weight": [e[2] for e in intra],
        }
    )
    out = _refine_community(nodes, edges, gamma, seed)
    return dict(zip(out["id"], out["refined"]))


def _kernel_order(ids, seed, comm_id=0):
    """Reproduce the kernel's canonical visit order: ids sorted, then the
    seeded permutation it draws internally."""
    ids_sorted = sorted(ids)
    rng = np.random.default_rng((seed * 1_000_003 + comm_id) % (2**63))
    return [ids_sorted[i] for i in rng.permutation(len(ids_sorted))]


@pytest.mark.parametrize("case", range(50))
def test_refinement_matches_reference_semantics(case):
    """50 parametrized cases × 4 (n, p, gamma) shapes = 200 differential
    runs against the remaining-set reference implementation."""
    shapes = [
        (12, 0.35, 0.1),
        (30, 0.2, 0.05),
        (50, 0.12, 0.02),
        (50, 0.3, 0.3),
    ]
    for shape_i, (n, p, gamma) in enumerate(shapes):
        seed = case * 17 + shape_i
        raw = random_graph(n, p, seed=seed + 1000)
        intra = [(u, v, w) for u, v, w in dedup_undirected(raw) if u != v]
        ids = list(range(n))
        rng = np.random.default_rng(seed)
        n_v = {i: int(rng.integers(1, 4)) for i in ids}

        got = _run_kernel(ids, n_v, intra, gamma, seed)
        order = _kernel_order(ids, seed)
        want = refine_subset_ref(ids, n_v, intra, gamma, order)

        assert _partition(got) == _partition(want), (
            f"divergence at n={n} p={p} gamma={gamma} seed={seed}"
        )


def test_refinement_weighted_no_ties():
    """Real-valued weights (no tie ambiguity): exact label-set match."""
    for seed in range(30):
        raw = random_graph(25, 0.3, seed=seed, weighted=True)
        intra = [(u, v, w) for u, v, w in dedup_undirected(raw) if u != v]
        ids = list(range(25))
        n_v = {i: 1 for i in ids}
        got = _run_kernel(ids, n_v, intra, 0.08, seed)
        want = refine_subset_ref(ids, n_v, intra, 0.08, _kernel_order(ids, seed))
        assert _partition(got) == _partition(want)
