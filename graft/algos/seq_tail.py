"""Sequential tail kernel: finish community detection once the
contracted graph fits one Arrow batch.

Multi-level algorithms shrink the graph geometrically; after a few BSP
levels the supernode graph is thousands of rows, where every distributed
sweep costs more in job latency than the whole remaining computation.
The honest scale design (same pattern as the refinement kernel,
SURVEY.md §7 item 2) is to ship that tail to ONE executor task as an
Arrow batch and run the exact sequential algorithm there — vectorized
kernel on an executor, not a driver-side loop; the driver never touches
row data. The BSP path still handles every level above the threshold
(bench: louvain over the 16M-row power-law graph runs pure BSP).

Semantics: greedy pass-until-stable local moving (CPM or modularity,
same closed-form deltas as community._select_moves) + for CPM the
reference's refinement via leiden._refine_community (differentially
tested against custom_leiden.py:349-459 semantics in
tests/test_refine_differential.py) + aggregation, for max_levels.
Deterministic: inputs sorted by id, seeded generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _local_move(
    adj: dict, size: dict, strength: dict, comm: dict,
    objective: str, gamma: float, m: float, rng, max_passes: int = 20,
) -> dict:
    """Greedy sequential local moving; mutates and returns ``comm``."""
    n_c: dict = {}
    stot: dict = {}
    for v, c in comm.items():
        n_c[c] = n_c.get(c, 0) + size[v]
        stot[c] = stot.get(c, 0.0) + strength[v]
    nodes = sorted(adj)
    for _ in range(max_passes):
        moved = False
        for v in [nodes[i] for i in rng.permutation(len(nodes))]:
            cv = comm[v]
            k_to: dict = {}
            for u, w in adj[v].items():
                k_to[comm[u]] = k_to.get(comm[u], 0.0) + w
            k_own = k_to.get(cv, 0.0)
            kv = strength[v]
            best, best_delta = None, 0.0
            for c, k in sorted(k_to.items()):
                if c == cv:
                    continue
                if objective == "cpm":
                    delta = (k - gamma * size[v] * n_c[c]) - (
                        k_own - gamma * size[v] * (n_c[cv] - size[v])
                    )
                else:
                    delta = (k - k_own) / m - kv * (
                        stot[c] - stot[cv] + kv
                    ) / (2.0 * m * m)
                if delta > best_delta:
                    best, best_delta = c, delta
            if best is not None:
                n_c[cv] -= size[v]
                n_c[best] += size[v]
                stot[cv] -= kv
                stot[best] += kv
                comm[v] = best
                moved = True
        if not moved:
            break
    return comm


def seq_community_tail(
    nodes: pd.DataFrame,
    edges: pd.DataFrame,
    objective: str,
    gamma: float,
    m: float,
    seed: int,
    max_levels: int = 10,
) -> pd.DataFrame:
    """Run the remaining levels sequentially; returns (id, community).

    nodes: (id, agg_count, k[, community]); edges: symmetrized
    (src, dst, weight). A ``community`` column seeds the first level's
    local moving (maintain_p handoff from the distributed levels). For
    ``objective='cpm'`` each level is full Leiden: local moving,
    refinement (leiden._refine_community), contraction by the refined
    partition with maintained P communities. For modularity it is
    sequential Louvain.
    """
    from graft.algos.leiden import _refine_community

    nodes = nodes.sort_values("id")
    edges = edges.sort_values(["src", "dst"])
    rng = np.random.default_rng(seed)

    ids = [int(v) for v in nodes["id"]]
    size = dict(zip(ids, (int(x) for x in nodes["agg_count"])))
    strength = dict(zip(ids, (float(x) for x in nodes["k"])))
    adj: dict = {v: {} for v in ids}
    loop_w: dict = {v: 0.0 for v in ids}
    for u, v, w in zip(edges["src"], edges["dst"], edges["weight"]):
        u, v, w = int(u), int(v), float(w)
        if u == v:
            loop_w[u] += w
        elif u < v:  # symmetrized input: count each pair once
            adj[u][v] = adj[u].get(v, 0.0) + w
            adj[v][u] = adj[v].get(u, 0.0) + w

    carry = {v: [v] for v in ids}
    final = {v: v for v in ids}
    # CPM levels maintain P across levels; a community column on the
    # input seeds it (handoff from the distributed levels above)
    if "community" in nodes.columns:
        init_comm = dict(
            zip((int(v) for v in nodes["id"]),
                (int(c) for c in nodes["community"]))
        )
    else:
        init_comm = {v: v for v in ids}
    for _ in range(max_levels):
        comm = _local_move(
            adj, size, strength, dict(init_comm),
            objective, gamma, m, rng,
        )
        members: dict = {}
        for v, c in comm.items():
            members.setdefault(c, []).append(v)
        if len(members) == len(adj):
            break  # no compression — converged
        if objective == "cpm":
            # refinement: restart from singletons within each community
            refined: dict = {}
            for c, ms in sorted(members.items()):
                npdf = pd.DataFrame(
                    {
                        "id": ms,
                        "community": [c] * len(ms),
                        "agg_count": [size[v] for v in ms],
                        "s_tot_full": [sum(size[v] for v in ms)] * len(ms),
                    }
                )
                mset = set(ms)
                intra = [
                    (u, v, w)
                    for u in ms
                    for v, w in adj[u].items()
                    if u < v and v in mset
                ]
                epdf = pd.DataFrame(
                    intra, columns=["u", "v", "weight"]
                ) if intra else pd.DataFrame(
                    {"u": [], "v": [], "weight": []}
                )
                out = _refine_community(npdf, epdf, gamma, seed)
                refined.update(dict(zip(out["id"], out["refined"])))
            if len(set(refined.values())) == len(adj):
                # refinement kept every node singleton — no compression;
                # the P communities local moving just found ARE the
                # answer (same exit as the distributed level loop)
                for v in adj:
                    for orig in carry[v]:
                        final[orig] = comm[v]
                break
            # contract by the refined partition (maintain_p: members of
            # a refined community share their P community by
            # construction, and the next level restarts from singleton
            # supernodes exactly like the distributed loop)
            group = refined
        else:
            group = comm

        g_members: dict = {}
        for v, gid in group.items():
            g_members.setdefault(gid, []).append(v)
        new_adj: dict = {gid: {} for gid in g_members}
        new_loop = {gid: 0.0 for gid in g_members}
        new_size = {gid: 0 for gid in g_members}
        new_carry: dict = {gid: [] for gid in g_members}
        for gid, ms in g_members.items():
            for v in ms:
                new_size[gid] += size[v]
                new_carry[gid].extend(carry[v])
                new_loop[gid] += loop_w[v]
        for v, nbrs in adj.items():
            gv = group[v]
            for u, w in nbrs.items():
                gu = group[u]
                if gu != gv:
                    new_adj[gv][gu] = new_adj[gv].get(gu, 0.0) + w
                else:
                    new_loop[gv] += w / 2.0
        adj, loop_w, size, carry = new_adj, new_loop, new_size, new_carry
        strength = {
            v: sum(adj[v].values()) + 2.0 * loop_w[v] for v in adj
        }
        if objective == "cpm":
            # maintain_p: refined supernodes start the next level inside
            # the P community local moving just assigned their members
            init_comm = {
                gid: comm[ms[0]] for gid, ms in g_members.items()
            }
        else:
            init_comm = {v: v for v in adj}
        for v in adj:
            for orig in carry[v]:
                final[orig] = v
    else:
        # max_levels exhausted without a convergence break: `final` maps
        # originals to refined-partition supernode ids — a strictly finer
        # partition than Leiden's answer for this edge case. The
        # maintained P community of each supernode is in init_comm
        # (identity for modularity, whose labels are the supernodes).
        if objective == "cpm":
            final = {orig: init_comm[v] for orig, v in final.items()}
    return pd.DataFrame(
        {"id": list(final), "community": [final[v] for v in final]}
    )


def run_tail_distributed(
    level_edges, level_vertices, objective: str, gamma: float, m: float,
    seed: int,
):
    """Execute the sequential tail as ONE cogrouped applyInPandas task
    (the whole level graph is one Arrow batch on one executor).
    Returns a DataFrame (id long, community long)."""
    from pyspark.sql import functions as F

    def fn(nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        if nodes_pdf.empty:
            return pd.DataFrame(
                {
                    "id": pd.Series([], dtype="int64"),
                    "community": pd.Series([], dtype="int64"),
                }
            )
        return seq_community_tail(
            nodes_pdf.drop(columns=["_g"]),
            edges_pdf.drop(columns=["_g"]) if len(edges_pdf) else
            pd.DataFrame({"src": [], "dst": [], "weight": []}),
            objective, gamma, m, seed,
        )

    nodes = level_vertices.select(
        F.lit(0).alias("_g"), "id", "community", "agg_count", "k"
    )
    edges = level_edges.select(F.lit(0).alias("_g"), "src", "dst", "weight")
    return (
        nodes.groupBy("_g")
        .cogroup(edges.groupBy("_g"))
        .applyInPandas(fn, schema="id long, community long")
    )
