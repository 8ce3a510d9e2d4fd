"""Quality parity vs the ACTUAL reference implementation (X4 /
VERDICT r1 "missing" #1-#2).

The reference's own test practice is cross-implementation comparison
(examples/leiden-alg.py:12-23, examples/test1.py:44-61). leidenalg/
igraph are not installed here, but the reference's pure-python
`custom_leiden.py` / `custom_louvain.py` ARE runnable, so they serve as
the external engine: we import them READ-ONLY from /root/reference
(nothing copied into this repo) and require the engine's partition
quality (CPM / modularity, computed by the clean-room scorer in
tests/reference_impls.py for both sides) to reach >= 0.95x the
reference's on mid-size random and planted graphs.

Executing code from an untrusted external checkout is an explicit
OPT-IN: set ``GRAFT_REF_PARITY=1`` (CI/driver runs do; a plain
``pytest`` on a dev box never runs third-party code by default).
Tests also skip when the reference checkout is absent, so the repo
stays standalone.
"""

from __future__ import annotations

import contextlib
import importlib.util
import io
import os
import pathlib
import random

import pytest

from graft import fixtures
from graft.algos.leiden import leiden
from graft.algos.louvain import louvain
from graft.graph import Graph
from tests.reference_impls import (
    cpm_ref,
    modularity_ref,
    planted_partition_graph,
    skewed_graph,
)

REF = pathlib.Path("/root/reference")

pytestmark = [
    pytest.mark.skipif(
        not (REF / "custom_leiden.py").exists(),
        reason="reference checkout not available (dev-only differential)",
    ),
    pytest.mark.skipif(
        os.environ.get("GRAFT_REF_PARITY") != "1",
        reason="set GRAFT_REF_PARITY=1 to opt in to executing the "
        "untrusted reference checkout as a differential oracle",
    ),
]


def _load_ref_module(name: str):
    spec = importlib.util.spec_from_file_location(name, REF / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _nx_graph(edges):
    import networkx as nx

    g = nx.Graph()
    for u, v, w in edges:
        if g.has_edge(u, v):
            g[u][v]["weight"] += w
        else:
            g.add_edge(u, v, weight=w)
    return g


def _ref_labels(communities) -> dict[int, int]:
    return {v: i for i, comm in enumerate(communities) for v in comm}


def _our_labels(df) -> dict[int, int]:
    return {r["id"]: r["community"] for r in df.collect()}


@pytest.mark.parametrize(
    "maker,gamma",
    [
        (lambda: planted_partition_graph(8, 18, 0.55, 0.02, seed=21), 0.05),
        (lambda: skewed_graph(150, 900, seed=23), 0.02),
    ],
)
def test_leiden_quality_parity_with_reference(spark, maker, gamma):
    edges = maker()
    ref_mod = _load_ref_module("custom_leiden")
    random.seed(42)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_comms = ref_mod.custom_leiden(_nx_graph(edges), gamma=gamma,
                                          max_iter=10)
    ref_labels = _ref_labels(ref_comms)
    ref_cpm = cpm_ref(edges, ref_labels, gamma)

    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    ours = _our_labels(leiden(g, gamma=gamma, seed=1234,
                              sequential_tail_edges=0))
    ours_cpm = cpm_ref(edges, ours, gamma)
    g.unpersist()

    assert ours_cpm >= 0.95 * ref_cpm, (ours_cpm, ref_cpm)


def test_louvain_quality_parity_with_reference(spark):
    edges = planted_partition_graph(10, 16, 0.5, 0.02, seed=31)
    ref_mod = _load_ref_module("custom_louvain")
    random.seed(42)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_comms = ref_mod.custom_louvain(_nx_graph(edges))
    ref_q = modularity_ref(edges, _ref_labels(ref_comms))

    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    ours = _our_labels(louvain(g, seed=1234, sequential_tail_edges=0))
    ours_q = modularity_ref(edges, ours)
    g.unpersist()

    assert ours_q >= 0.95 * ref_q, (ours_q, ref_q)


def test_sequential_tail_quality_parity_with_reference(spark):
    """The same parity bar for the sequential-tail execution path (the
    one production Leiden levels actually finish on)."""
    edges = planted_partition_graph(8, 18, 0.55, 0.02, seed=21)
    gamma = 0.05
    ref_mod = _load_ref_module("custom_leiden")
    random.seed(42)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_comms = ref_mod.custom_leiden(_nx_graph(edges), gamma=gamma,
                                          max_iter=10)
    ref_cpm = cpm_ref(edges, _ref_labels(ref_comms), gamma)

    g = Graph.from_undirected(fixtures.edges_df(spark, edges)).cache()
    ours = _our_labels(leiden(g, gamma=gamma, seed=1234,
                              sequential_tail_edges=10**9))
    ours_cpm = cpm_ref(edges, ours, gamma)
    g.unpersist()

    assert ours_cpm >= 0.95 * ref_cpm, (ours_cpm, ref_cpm)
