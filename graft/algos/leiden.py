"""Leiden community detection (C16, custom_leiden.py:693-757 semantics).

Level loop: CPM local moving (shared BSP machinery, community.py) →
convergence check → refinement → contraction by the *refined* partition
with initial communities from P (maintain_p, custom_leiden.py:493-523)
→ next level. Final labels flow down the refined-mapping chain
(propagate_partitions, custom_leiden.py:659-677).

Refinement (merge_nodes_subset, custom_leiden.py:350-460 /
refine_kernel csrc/src/leiden_kernel.cu:599-761) is inherently
sequential *within* a community but embarrassingly parallel *across*
communities — exactly the shape of a cogrouped ``applyInPandas``: each
community's member table and induced edge table arrive as one Arrow
batch, the per-community loop runs in numpy/dicts (communities are
small after local moving), and no per-row Python ever touches the
distributed path (input_hint requirement).

Semantics preserved (SURVEY.md §1.4 item 7):
- restart from singletons inside each community S;
- only well-connected nodes move:   v_in ≥ γ·n_v·(S_tot − n_v);
- only into well-connected comms:   c_cut ≥ γ·n_c·(S_tot − n_c);
- only nodes still in singleton refined communities move;
- greedy best positive CPM delta with deterministic (min-label)
  tie-break — the reference's actual behavior (its exp(ΔH/θ) sampling
  branch is commented out, custom_leiden.py:428-450); θ is accepted for
  API parity with cugraph.leiden (examples/test2.py:49) but unused;
- connectedness totals use aggregate node counts, not edge weights
  (candidate_node_count, custom_leiden.py:159-165).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.checkpoint import Checkpointer, truncate
from graft.algos.community import (
    Level,
    _is_persisted,
    aggregate_graph,
    init_level,
    move_nodes,
    superstep_conf,
)
from graft.graph import Graph


def _refine_community(nodes: pd.DataFrame, edges: pd.DataFrame,
                      gamma: float, seed: int) -> pd.DataFrame:
    """Sequential refinement of one community S (runs inside the UDF).

    Rows are sorted by id first: Spark only guarantees cogroup batches
    are grouped by key, not intra-group ordered, so the seeded visit
    permutation (and float accumulation order) must be anchored to a
    canonical vertex order or results drift across parallelism levels.

    Thin pandas adapter over :func:`_refine_core` (shared with the
    sequential-tail kernel, which skips the per-community DataFrame
    construction entirely — pandas object overhead dominated the tail's
    refinement cost at 40k+ small communities).
    """
    nodes = nodes.sort_values("id")
    if len(edges):
        edges = edges.sort_values(["u", "v"])
    # s_tot of the FULL community: when an oversized community is split
    # into hash sub-buckets (scale guard), each batch still gates
    # well-connectedness against the whole-S total the reference uses
    # (custom_leiden.py:415-419)
    if "s_tot_full" in nodes.columns and nodes["s_tot_full"].notna().all():
        s_tot = int(nodes["s_tot_full"].iloc[0])
    else:
        s_tot = int(nodes["agg_count"].sum())
    from graft import _native as _nk

    if _nk.rng_ok() and len(nodes) > 1:
        # native single-group _refine_core (bit-identical semantics and
        # rng stream; pinned by tests/test_native_kernels.py)
        import numpy as np

        ids_arr = nodes["id"].to_numpy(dtype=np.int64)
        sizes = nodes["agg_count"].to_numpy(dtype=np.int64)
        if len(edges):
            u = np.searchsorted(ids_arr, edges["u"].to_numpy(dtype=np.int64))
            v = np.searchsorted(ids_arr, edges["v"].to_numpy(dtype=np.int64))
            w = edges["weight"].to_numpy(dtype=np.float64)
        else:
            u = v = np.zeros(0, dtype=np.int64)
            w = np.zeros(0, dtype=np.float64)
        out = _nk.refine_batch(
            np.array([0, len(ids_arr)], dtype=np.int64),
            np.array([0, len(u)], dtype=np.int64),
            sizes,
            np.array([s_tot], dtype=np.int64),
            np.array([int(nodes["community"].iloc[0])], dtype=np.int64),
            u, v, w, gamma, seed,
        )
        if out is not None:
            return pd.DataFrame({"id": ids_arr, "refined": ids_arr[out]})
    refined = _refine_core(
        [int(v) for v in nodes["id"]],
        [int(x) for x in nodes["agg_count"]],
        s_tot,
        int(nodes["community"].iloc[0]),
        zip(edges["u"], edges["v"], edges["weight"]) if len(edges) else (),
        gamma,
        seed,
    )
    return pd.DataFrame(
        {"id": list(refined), "refined": [refined[v] for v in refined]}
    )


def _refine_core(
    ids: list, sizes: list, s_tot: int, comm_id: int, edges_uvw,
    gamma: float, seed: int,
) -> dict:
    """merge_nodes_subset semantics on plain python/numpy structures:
    ``ids`` sorted ascending, ``edges_uvw`` an iterable of single-counted
    (u, v, weight) pairs sorted by (u, v). Returns {id: refined_id}."""
    if len(ids) == 1:  # singleton community: nothing to merge, no rng
        return {ids[0]: ids[0]}
    n_v = dict(zip(ids, sizes))

    # adjacency within S (single-counted pairs, loops excluded from v_in)
    adj: dict[int, dict[int, float]] = {v: {} for v in ids}
    for u, v, w in edges_uvw:
        u, v, w = int(u), int(v), float(w)
        if u == v:
            continue
        adj[u][v] = adj[u].get(v, 0.0) + w
        adj[v][u] = adj[v].get(u, 0.0) + w
    v_in = {v: sum(adj[v].values()) for v in adj}

    refined = {v: v for v in ids}
    rc_n = {v: int(n_v[v]) for v in ids}
    rc_size = {v: 1 for v in ids}
    rc_cut = {v: v_in[v] for v in ids}

    import numpy as np

    rng = np.random.default_rng((seed * 1_000_003 + comm_id) % (2**63))
    order = [ids[i] for i in rng.permutation(len(ids))]
    for v in order:
        nv = int(n_v[v])
        if v_in[v] < gamma * nv * (s_tot - nv):
            continue  # not well-connected
        if rc_size[refined[v]] > 1:
            continue  # only singleton refined communities may move
        k_to: dict[int, float] = {}
        for u, w in adj[v].items():
            rc = refined[u]
            if rc != refined[v]:
                k_to[rc] = k_to.get(rc, 0.0) + w
        best, best_delta = None, 0.0
        for rc, k in k_to.items():
            if rc_cut[rc] < gamma * rc_n[rc] * (s_tot - rc_n[rc]):
                continue  # target not well-connected
            delta = k - gamma * nv * rc_n[rc]
            if delta > best_delta or (
                delta == best_delta and best is not None and rc < best
            ):
                if delta > 0:
                    best, best_delta = rc, delta
        if best is not None:
            old = refined[v]
            refined[v] = best
            rc_n[best] += nv
            rc_size[best] += 1
            rc_cut[best] += v_in[v] - 2.0 * k_to[best]
            del rc_n[old], rc_size[old], rc_cut[old]
    return refined


def _refine_bucket_native(
    nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame, gamma: float, seed: int
) -> pd.DataFrame | None:
    """One cogroup bucket of communities refined in a single native
    batch call (semantics identical to the per-community Python loop in
    ``refine_partition.fn`` — same grouping by (community, _b), members
    sorted by id, edges by (u, v), same per-community rng stream and
    trivial-group short-circuits).  The per-community pandas slicing the
    Python loop pays (~0.3 ms x tens of thousands of communities per
    level) collapses into two lexsorts plus one C call."""
    import numpy as np

    from graft import _native as _nk

    if nodes_pdf["s_tot_full"].isna().any():
        return None
    ids = nodes_pdf["id"].to_numpy(dtype=np.int64)
    comm = nodes_pdf["community"].to_numpy(dtype=np.int64)
    bb = nodes_pdf["_b"].to_numpy(dtype=np.int64)
    sizes = nodes_pdf["agg_count"].to_numpy(dtype=np.int64)
    stf = nodes_pdf["s_tot_full"].to_numpy(dtype=np.int64)
    order_n = np.lexsort((ids, bb, comm))
    cs, bs = comm[order_n], bb[order_n]
    ids_s, sz_s, stf_s = ids[order_n], sizes[order_n], stf[order_n]
    gstart = np.flatnonzero(
        np.r_[True, (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1])]
    )
    counts = np.diff(np.append(gstart, len(cs)))
    n_groups = len(gstart)
    if len(edges_pdf):
        ec = edges_pdf["community"].to_numpy(dtype=np.int64)
        ebb = edges_pdf["_b"].to_numpy(dtype=np.int64)
        uu = edges_pdf["u"].to_numpy(dtype=np.int64)
        vv = edges_pdf["v"].to_numpy(dtype=np.int64)
        ww = edges_pdf["weight"].to_numpy(dtype=np.float64)
        order_e = np.lexsort((vv, uu, ebb, ec))
        ec, ebb = ec[order_e], ebb[order_e]
        uu, vv, ww = uu[order_e], vv[order_e], ww[order_e]
        estart = np.flatnonzero(
            np.r_[True, (ec[1:] != ec[:-1]) | (ebb[1:] != ebb[:-1])]
        )
        ecounts_g = np.diff(np.append(estart, len(ec)))
    else:
        ec = ebb = uu = vv = np.zeros(0, dtype=np.int64)
        ww = np.zeros(0, dtype=np.float64)
        estart = np.zeros(0, dtype=np.int64)
        ecounts_g = np.zeros(0, dtype=np.int64)
    # align edge groups to node groups (both key-sorted; edge keys are a
    # subset of node keys)
    ecount_per_node_group = np.zeros(n_groups, dtype=np.int64)
    ei = 0
    for gi in range(n_groups):
        if ei < len(estart) and ec[estart[ei]] == cs[gstart[gi]] and (
            ebb[estart[ei]] == bs[gstart[gi]]
        ):
            ecount_per_node_group[gi] = ecounts_g[ei]
            ei += 1
    if ei != len(estart):
        return None  # an edge key without a node group: fall back
    nontriv = (counts > 1) & (ecount_per_node_group > 0)
    refined_ids = np.empty(len(ids_s), dtype=np.int64)
    mask_nodes = np.repeat(nontriv, counts)
    refined_ids[~mask_nodes] = ids_s[~mask_nodes]
    if nontriv.any():
        nt_counts = counts[nontriv]
        node_start = np.concatenate(([0], np.cumsum(nt_counts))).astype(
            np.int64
        )
        edge_start = np.concatenate(
            ([0], np.cumsum(ecount_per_node_group[nontriv]))
        ).astype(np.int64)
        mask_edges = np.repeat(nontriv, ecount_per_node_group)
        # group-local endpoint indices via per-group searchsorted over
        # the id-sorted member slice
        lu = np.empty(int(edge_start[-1]), dtype=np.int64)
        lv = np.empty(int(edge_start[-1]), dtype=np.int64)
        uu_nt, vv_nt, ww_nt = uu[mask_edges], vv[mask_edges], ww[mask_edges]
        nt_gstart = gstart[nontriv]
        for gi in range(len(nt_counts)):
            ns, ne = nt_gstart[gi], nt_gstart[gi] + nt_counts[gi]
            es, ee = edge_start[gi], edge_start[gi + 1]
            mslice = ids_s[ns:ne]
            lu[es:ee] = np.searchsorted(mslice, uu_nt[es:ee])
            lv[es:ee] = np.searchsorted(mslice, vv_nt[es:ee])
        out = _nk.refine_batch(
            node_start, edge_start, sz_s[mask_nodes],
            stf_s[nt_gstart], cs[nt_gstart], lu, lv, ww_nt, gamma, seed,
        )
        if out is None:
            return None
        members_cat = np.flatnonzero(mask_nodes)
        base_rep = np.repeat(node_start[:-1], nt_counts)
        refined_ids[mask_nodes] = ids_s[members_cat[base_rep + out]]
    return pd.DataFrame({"id": ids_s, "refined": refined_ids})


def refine_partition(
    level: Level, gamma: float, seed: int,
    max_community_size: int = 200_000,
) -> DataFrame:
    """C11/C12: refined partition of the current level's vertices.

    Returns ``(id long, refined long)`` where ``refined`` is the min-…
    founding-member id of the refined community (globally unique).

    Scale guard: one community = one Arrow batch, so a hub community of
    10^7 members would OOM a single worker. Communities larger than
    ``max_community_size`` are split into deterministic hash sub-buckets
    refined independently (cross-bucket merges are forgone — a bounded
    approximation that only ever leaves extra singletons, never produces
    an invalid partition; the well-connectedness gate still uses the
    full-community ``s_tot``). Communities at or under the cap — all of
    them, at every tested scale — follow the exact reference semantics.
    """
    sizes = level.vertices.groupBy("community").agg(
        F.count(F.lit(1)).alias("_sz"),
        F.sum("agg_count").alias("s_tot_full"),
    ).select(
        "community",
        "s_tot_full",
        F.greatest(
            F.ceil(F.col("_sz") / F.lit(max_community_size)), F.lit(1)
        ).cast("long").alias("_nsub"),
    )
    # Materialize the per-vertex assignment BEFORE the edge joins: as a
    # parquet leaf with true file-size stats (a few MB per million
    # vertices) the static planner broadcasts it into both endpoint
    # joins, so the (much larger) edge table is scanned map-side and
    # shuffled exactly ONCE — the cogroup exchange on (community, _b).
    # Unmaterialized, Catalyst's size-only estimator saw a join product,
    # declined to broadcast, and sort-merge-shuffled the edge table for
    # BOTH endpoint joins (3 full edge shuffles per refinement instead
    # of 1) — the residual that kept the otherwise CPU-bound refinement
    # stage at 0.68 efficiency 8→32 on one memory bus (VERDICT r3 #3).
    # At vertex counts past the broadcast threshold the planner falls
    # back to a shuffled join on its own — the right call at that scale.
    assign = truncate(
        level.vertices.select("id", "community", "agg_count")
        .join(sizes, "community")
        .select(
            "id", "community", "agg_count", "s_tot_full",
            F.pmod(F.xxhash64("id", F.lit(seed)), F.col("_nsub")).alias("_b"),
        )
    )
    a_u = assign.select(
        F.col("id").alias("u"), F.col("community").alias("cu"),
        F.col("_b").alias("bu"),
    )
    a_v = assign.select(
        F.col("id").alias("v"), F.col("community").alias("cv"),
        F.col("_b").alias("bv"),
    )
    intra = (
        level.edges.where(F.col("src") <= F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"), "weight")
        .join(a_u, "u")
        .join(a_v, "v")
        .where((F.col("cu") == F.col("cv")) & (F.col("bu") == F.col("bv")))
        .select(
            F.col("cu").alias("community"), F.col("bu").alias("_b"),
            "u", "v", "weight",
        )
    )

    # Cogroup on a BUCKET of (community, _b), not the key itself: local
    # moving leaves ~tens of thousands of small communities, and one
    # Arrow group per community pays Spark's per-group overhead (batch
    # framing + Python invocation) ~40k times — measured r5 as the
    # majority of the 20 s refinement wall on the 2M-edge level. With
    # ~64 communities per bucket the overhead amortizes while the
    # per-community reference semantics (and the scale guard's _b
    # sub-bucketing) are untouched: the kernel segments the bucket by
    # (community, _b) and runs the same _refine_core per segment.
    # Bucket count scales with the session's reducer setting, so larger
    # clusters get proportionally more buckets.
    spark = level.vertices.sparkSession
    n_buckets = 8 * max(
        1, int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    bucket = F.pmod(
        F.xxhash64("community", "_b", F.lit(seed)), F.lit(n_buckets)
    ).alias("_g")

    def fn(nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        if nodes_pdf.empty:
            return pd.DataFrame({"id": [], "refined": []})
        from graft import _native as _nk

        if _nk.rng_ok():
            out = _refine_bucket_native(nodes_pdf, edges_pdf, gamma, seed)
            if out is not None:
                return out
        edges_by = {}
        if len(edges_pdf):
            edges_by = {
                k: sub for k, sub in
                edges_pdf.groupby(["community", "_b"], sort=False)
            }
        parts = []
        trivial_ids: list = []
        for key, nsub in nodes_pdf.groupby(["community", "_b"], sort=False):
            esub = edges_by.get(key)
            # exact short-circuit (same as seq_tail._refine_groups): a
            # singleton community, or one with no intra edges, refines
            # every member to itself — skip the per-community kernel
            if len(nsub) == 1 or esub is None:
                trivial_ids.extend(nsub["id"].tolist())
                continue
            parts.append(_refine_community(nsub, esub, gamma, seed))
        if trivial_ids:
            parts.append(
                pd.DataFrame({"id": trivial_ids, "refined": trivial_ids})
            )
        return pd.concat(parts, ignore_index=True)

    return (
        assign.select("id", "community", "agg_count", "s_tot_full",
                      "_b", bucket)
        .groupBy("_g")
        .cogroup(
            intra.select("community", "_b", "u", "v", "weight", bucket)
            .groupBy("_g")
        )
        .applyInPandas(fn, schema="id long, refined long")
    )


def _maintained_vertices(
    vertices: DataFrame, refined: DataFrame, new_edges: DataFrame
) -> DataFrame:
    """C13 maintain_p + aggregate: supernodes = refined communities, with
    *initial* communities = the P community of their members
    (custom_leiden.py:493-523 — all members share it by construction)."""
    joined = vertices.join(refined, "id")
    return (
        joined.groupBy(F.col("refined").alias("id"))
        .agg(
            F.min("community").alias("community"),
            F.sum("agg_count").alias("agg_count"),
        )
        .join(
            new_edges.groupBy(F.col("src").alias("id")).agg(
                F.sum(
                    F.when(
                        F.col("src") == F.col("dst"), F.col("weight") * 2
                    ).otherwise(F.col("weight"))
                ).alias("k")
            ),
            "id",
            "left",
        )
        .select(
            "id", "community", "agg_count", F.coalesce("k", F.lit(0.0)).alias("k")
        )
    )


# a level whose VERTEX set fits one task goes sequential even when its
# edge multigraph is still wide (contracted levels of structureless
# graphs shrink vertices geometrically but keep most edges distinct).
# The binding memory constraint is the EDGE-ROW guard, not the vertex
# count: the Arrow cogroup batch carries ~32 B per symmetrized edge row
# (two longs + a double + framing), so 8M rows ≈ 256 MB in one task —
# comfortable against the multi-GB executor heap — while per-vertex
# kernel state (CSR slots, labels, queue) is ~50 B/vertex, i.e. ~25 MB
# even at 500k vertices. r3 capped vertices at 100k, which kept the
# 200k-vertex / 4M-row powerlaw graph on the BSP path at 132 s when the
# tail kernel finishes it in ~70 s (VERDICT r3 "wrong" #1); 500k admits
# every graph the edge guard admits in practice (a 500k-vertex graph
# with <8M multigraph rows averages degree ≤16).
_TAIL_MAX_VERTICES = 500_000
_TAIL_MAX_EDGE_ROWS = 8_000_000


def _tail_ready(
    n_edge_rows: int, n_verts: int, tail_edges: int,
    max_vertices: int | None = None,
) -> bool:
    """True when the remaining levels should finish as ONE executor task
    (see the leiden docstring; 0 for ``tail_edges`` forces BSP).
    ``max_vertices`` overrides the module vertex cap (bench harnesses
    shrink it to keep the distributed level-0 path measured)."""
    if not tail_edges:
        return False
    cap = _TAIL_MAX_VERTICES if max_vertices is None else max_vertices
    return n_edge_rows <= tail_edges or (
        n_verts <= cap and n_edge_rows <= _TAIL_MAX_EDGE_ROWS
    )


def leiden(
    graph: Graph,
    gamma: float = 0.05,
    theta: float = 1.0,  # noqa: ARG001 — API parity; greedy per reference
    max_levels: int = 10,
    max_sweeps: int = 15,
    seed: int = 1234,
    checkpointer: Checkpointer | None = None,
    sequential_tail_edges: int = 1_000_000,
    tail_max_vertices: int | None = None,
    return_quality: bool = False,
    initial_membership: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(id long, community long)`` final labels on original
    vertices. Deterministic for a fixed seed (SURVEY.md §1.4 item 10).

    ``initial_membership``: warm start — an ``(id, community)`` table
    seeding level 0 instead of singletons. The reference's maintain_p
    invariant (custom_leiden.py:693-757 seeds from singletons, but
    :493-523's maintained partition accepts ANY starting P) imposes no
    obstacle: local moving starts from the seed partition, refinement
    still splits each P community into well-connected parts, and both
    the BSP and sequential-tail paths honor the seed (seq_tail reads a
    ``community`` column when present). Vertices absent from the seed
    start as singletons. Greedy local moving never decreases the CPM
    objective, so quality(result) >= quality(seed) (pytest-pinned);
    like Louvain's the fixpoint is seed-DEPENDENT — a warm run may
    legitimately differ from a cold run. On an incrementally-grown
    graph, seeding with the previous refresh's labels converges in
    fewer sweeps (graft.streaming.incremental_leiden).

    ``return_quality=True`` returns ``(labels, cpm_quality)`` — the
    cugraph.leiden-shaped API (examples/test2.py:71,
    examples/cugraph-cpp-api/leiden_cugraph.cpp:93-101 both return the
    (parts, quality) pair); the default stays labels-only for backward
    compatibility. The quality is one extra closed-form job
    (graft.quality.cpm) over the final labels, not a per-level cost.

    ``max_sweeps`` caps BSP local moving per level (default mirrors the
    reference's hard 10-iteration cap, csrc/src/leiden_kernel.cu:1211-
    1213; deeper levels pick up what a capped level leaves). Once a
    level fits one Arrow batch — edge table at most
    ``sequential_tail_edges`` rows, OR vertex set under
    ``_TAIL_MAX_VERTICES`` with the edge multigraph under the
    ``_TAIL_MAX_EDGE_ROWS`` byte guard — the remaining levels run as
    ONE executor task via the sequential tail kernel
    (graft.algos.seq_tail): at that size every distributed sweep costs
    more in job latency than the whole remaining computation. The 1M
    row default is backed by the r3 CSR/queue kernel rewrite: a full
    multi-level CPM tail over 500k symmetrized rows measures ~4 s in
    one task (was ~60 s as dict-of-dict loops), versus tens of seconds
    for the BSP sweeps it replaces; the vertex trigger covers
    contracted levels of structureless graphs, whose vertex count
    shrinks geometrically while the edge multigraph stays wide (BSP
    sweeps there burn seconds of latency per handful of movers). Set
    ``sequential_tail_edges=0`` to force the BSP path at every level."""
    base_ids = graph.vertices().persist()
    level = init_level(graph.edges)
    if initial_membership is not None:
        level.vertices = level.vertices.join(
            initial_membership.withColumnRenamed("community", "_c0"),
            "id",
            "left",
        ).select(
            "id",
            F.coalesce("_c0", F.col("id")).alias("community"),
            "agg_count",
            "k",
        )
    # Ownership (r6): persisting the caller's edge frame returns the
    # SAME object when it is already cached, so unpersisting it on exit
    # silently evicted the caller's cache — every later algorithm on
    # the same Graph re-derived and re-cached the edge table. Only
    # frames this function created (contracted levels, or a level-0
    # persist the caller had not done) are released.
    _owns_edges = not _is_persisted(level.edges)
    level.edges = level.edges.persist()

    def _release(df: DataFrame, owned: bool) -> None:
        if owned:
            df.unpersist()

    mappings: list[DataFrame] = []
    start_lvl = 0
    if checkpointer is not None:
        # mid-aggregation-level resume (north_rule): reload the deepest
        # fully-persisted level (edges + vertices + mapping) and the
        # mapping chain below it, then continue the level loop from
        # there — identical final labels to an uninterrupted run.
        done = -1
        for k in range(max_levels):
            names = [f"level={k}/{t}" for t in ("mapping", "edges", "vertices")]
            if all(checkpointer.has_table(n) for n in names):
                done = k
            else:
                break
        if done >= 0:
            mappings = [
                checkpointer.load_table(f"level={k}/mapping")
                for k in range(done + 1)
            ]
            _release(level.edges, _owns_edges)
            _owns_edges = True
            level = Level(
                edges=checkpointer.load_table(f"level={done}/edges").persist(),
                vertices=checkpointer.load_table(f"level={done}/vertices"),
            )
            start_lvl = done + 1
    tail_at_base = False
    for lvl in range(start_lvl, max_levels):
        _n_rows, _n_verts = level.edges.count(), level.vertices.count()
        if _tail_ready(
            _n_rows, _n_verts, sequential_tail_edges, tail_max_vertices,
        ):
            import os as _os
            import sys as _sys
            import time as _time

            from graft.algos.seq_tail import run_tail_distributed

            _t0 = _time.time()
            tail = truncate(
                run_tail_distributed(
                    level.edges, level.vertices, "cpm", gamma, 1.0,
                    seed + lvl,
                )
            )
            if _os.environ.get("GRAFT_SWEEP_LOG"):
                print(
                    f"[leiden] lvl={lvl} tail rows={_n_rows} "
                    f"verts={_n_verts} tail_s={_time.time() - _t0:.1f}",
                    file=_sys.stderr, flush=True,
                )
            level = Level(edges=level.edges, vertices=tail)
            # the whole run was one tail task over the base vertex set:
            # the label fold below would be an identity join (no
            # mappings, tail covers every base id) — skip it (r6)
            tail_at_base = lvl == 0 and start_lvl == 0 and not mappings
            break

        def _on_sweep(it, n_moves, verts, _lvl=lvl):
            if checkpointer is not None:
                checkpointer.save(
                    _lvl * 1000 + it, verts, algo="leiden",
                    level=_lvl, sweep=it, moves=n_moves,
                )

        level, _ = move_nodes(
            level, objective="cpm", gamma=gamma,
            max_sweeps=max_sweeps, seed=seed + lvl, on_sweep=_on_sweep,
        )
        # one bookkeeping agg per level (vertex + community counts)
        row = level.vertices.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("community").alias("c"),
        ).first()
        n_before = row["n"]
        if row["c"] == n_before:
            break  # all singletons
        import os as _os
        import time as _time

        _t0 = _time.time()
        spark = level.edges.sparkSession
        with superstep_conf(spark, level.edges.count()):
            # the refinement cogroup is PYTHON-bound (one _refine_core
            # call per community), not shuffle-bound: run it at 3x core
            # parallelism even when the superstep reducers are sized
            # smaller for shuffle latency (measured r3 on the 4M-row
            # powerlaw level: 16 reducers left half the cores idle; r4:
            # exactly-one-wave scheduling made the stage straggler-bound
            # — one slow partition set the wall — so ~3 waves of smaller
            # tasks amortize stragglers, per-task overhead is trivial
            # against the per-community Python work)
            sp_now = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(
                    int(sp_now),
                    3 * spark.sparkContext.defaultParallelism,
                )),
            )
            refined = truncate(refine_partition(level, gamma, seed + lvl))
            spark.conf.set("spark.sql.shuffle.partitions", sp_now)
            n_refined = refined.agg(F.countDistinct("refined")).first()[0]
            if _os.environ.get("GRAFT_SWEEP_LOG"):
                print(
                    f"[leiden] lvl={lvl} n={n_before} refined={n_refined} "
                    f"refine_s={_time.time() - _t0:.1f}",
                    file=__import__('sys').stderr, flush=True,
                )
            if n_refined == n_before:
                break  # refinement kept every node singleton
            new_edges = truncate(
                aggregate_graph(
                    level.edges,
                    refined.select("id", F.col("refined").alias("community")),
                )
            )
            new_vertices = truncate(
                _maintained_vertices(level.vertices, refined, new_edges)
            )
            if _os.environ.get("GRAFT_SWEEP_LOG"):
                print(
                    f"[leiden] lvl={lvl} aggregate_s={_time.time() - _t0:.1f}",
                    file=__import__('sys').stderr, flush=True,
                )
        mappings.append(
            refined.select(
                F.col("id").alias("child"), F.col("refined").alias("parent")
            )
        )
        if checkpointer is not None:
            checkpointer.save_table(f"level={lvl}/mapping", mappings[-1])
            new_edges = checkpointer.save_table(f"level={lvl}/edges", new_edges)
            new_vertices = checkpointer.save_table(
                f"level={lvl}/vertices", new_vertices
            )
        _release(level.edges, _owns_edges)
        _owns_edges = True
        level = Level(edges=new_edges.persist(), vertices=new_vertices)

    if tail_at_base:
        # level-0 tail: its (id, community) output IS the final label
        # table — already a truncated leaf over the base vertex set
        final = level.vertices.select("id", "community")
    else:
        # fold orig id → coarsest supernode, then take that supernode's
        # final P community
        cur = base_ids.select("id", F.col("id").alias("node"))
        for mp in mappings:
            cur = cur.join(
                mp.withColumnRenamed("child", "node"), "node", "left"
            ).select("id", F.coalesce("parent", "node").alias("node"))
        final = cur.join(
            level.vertices.select(
                F.col("id").alias("node"),
                F.col("community").alias("community"),
            ),
            "node",
            "left",
        ).select("id", F.coalesce("community", "node").alias("community"))
        final = truncate(final)
    base_ids.unpersist()
    if return_quality:
        from graft.quality import cpm

        q = cpm(graph.edges, final, gamma)
        _release(level.edges, _owns_edges)
        return final, q
    _release(level.edges, _owns_edges)
    return final
