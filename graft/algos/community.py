"""Shared machinery for Louvain/Leiden: bulk-synchronous local moving,
graph aggregation (contraction) and label propagation down the level
hierarchy.

This is the Spark re-expression of the reference's hottest path
(SURVEY.md §2.4 C5/C6, §4 P1-P3):

- the node→community weight gather (A2,
  edge_gather_new_neighbor_comm_weights_kernel,
  csrc/src/leiden_kernel.cu:187-227) is a join + partial/final hash
  aggregation — the exact rewrite that took the reference from 92.7 s to
  0.6 s (report.txt:19-27), and the one Catalyst plans natively;
- the per-vertex argmax (C5) is a struct-max aggregation (no window —
  map-side partials absorb hub skew);
- the reference's graph-coloring + per-community locks (P3,
  csrc/src/leiden_kernel.cu:66-76,144-159) become a deterministic
  independent-set commit: a selected mover commits only if its hash
  priority beats every adjacent mover's, which prevents the A↔B
  oscillation of naive bulk-synchronous moves while staying lock-free.

Vertex state: ``(id long, community long, agg_count long, k double)``
with ``k`` = strength (self-loops doubled) and ``agg_count`` = number of
original vertices carried by the (super)node.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.checkpoint import drop_spill, truncate


@dataclass
class Level:
    """One level of the hierarchy: symmetrized edges + vertex state."""

    edges: DataFrame  # (src, dst, weight) symmetrized, loops once
    vertices: DataFrame  # (id, community, agg_count, k)


def init_level(edges: DataFrame) -> Level:
    """Singleton communities, agg_count=1, k=strength (C1,
    custom_leiden.py:525-531)."""
    verts = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight") * 2).otherwise(
                F.col("weight")
            )
        ).alias("k")
    ).select(
        "id",
        F.col("id").alias("community"),
        F.lit(1).cast("long").alias("agg_count"),
        "k",
    )
    return Level(edges=edges, vertices=verts)


def gather_neighbor_comm_weights(
    edges: DataFrame, assign: DataFrame
) -> DataFrame:
    """A2: for every (vertex, neighboring community) the total edge
    weight — self-loops excluded (a node is not its own neighbor,
    csrc/src/leiden_kernel.cu:66-69). Returns (id, nbr_comm, k_vc)."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .join(
            assign.select(
                F.col("id").alias("dst"), F.col("community").alias("nbr_comm")
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("id"), "nbr_comm")
        .agg(F.sum("weight").alias("k_vc"))
    )


def community_aggregates(vertices: DataFrame) -> DataFrame:
    """(community, n long, stot double): aggregate node count + total
    strength per community (A1 recomputed per superstep — the reference
    found full re-gather beats incremental maintenance, report.txt:24-25)."""
    return vertices.groupBy("community").agg(
        F.sum("agg_count").alias("n"), F.sum("k").alias("stot")
    )


def _select_moves(
    vertices: DataFrame,
    gather: DataFrame,
    comm_agg: DataFrame,
    objective: str,
    gamma: float,
    m: float,
) -> DataFrame:
    """Per-vertex best positive-delta move → (id, new_community, delta).

    CPM delta (SURVEY.md §1.4 item 4, custom_leiden.py:262-280):
        ΔH = (k_v→new − γ·n_v·n_new) − (k_v→own\\v − γ·n_v·(n_own − n_v))
    Modularity delta (custom_louvain.py:124-160 closed form):
        ΔQ = (k_v→new − k_v→own\\v)/m − k_v·(Σtot_new − Σtot_own + k_v)/(2m²)
    """
    v = vertices.select("id", "community", "agg_count", "k")
    own = gather.withColumnRenamed("nbr_comm", "community").withColumnRenamed(
        "k_vc", "k_own"
    )
    base = (
        v.join(own, ["id", "community"], "left")
        .na.fill({"k_own": 0.0})
        .join(
            comm_agg.select(
                "community",
                F.col("n").alias("n_own"),
                F.col("stot").alias("stot_own"),
            ),
            "community",
        )
    )
    cand = base.join(
        gather.select("id", "nbr_comm", "k_vc"), "id"
    ).where(F.col("nbr_comm") != F.col("community")).join(
        comm_agg.select(
            F.col("community").alias("nbr_comm"),
            F.col("n").alias("n_new"),
            F.col("stot").alias("stot_new"),
        ),
        "nbr_comm",
    )
    if objective == "cpm":
        delta = (
            F.col("k_vc") - F.lit(gamma) * F.col("agg_count") * F.col("n_new")
        ) - (
            F.col("k_own")
            - F.lit(gamma)
            * F.col("agg_count")
            * (F.col("n_own") - F.col("agg_count"))
        )
    elif objective == "modularity":
        delta = (F.col("k_vc") - F.col("k_own")) / F.lit(m) - F.col("k") * (
            F.col("stot_new") - F.col("stot_own") + F.col("k")
        ) / F.lit(2.0 * m * m)
    else:
        raise ValueError(f"unknown objective {objective!r}")
    scored = cand.select(
        "id", "community", F.col("nbr_comm"), delta.alias("delta")
    ).where(F.col("delta") > 0)
    # argmax with deterministic tie-break: max struct(delta, -nbr_comm)
    return (
        scored.groupBy("id")
        .agg(
            F.max(
                F.struct(
                    F.col("delta"), (-F.col("nbr_comm")).alias("nc")
                )
            ).alias("top")
        )
        .select(
            "id",
            (-F.col("top.nc")).alias("new_community"),
            F.col("top.delta").alias("delta"),
        )
    )


def _resolve_conflicts(
    moves: DataFrame, edges: DataFrame, it: int, seed: int
) -> DataFrame:
    """Commit only an independent set of movers (P3 rewrite).

    Deterministic per-superstep hash priority; a mover yields to any
    adjacent mover with lower (priority, id). Mirrors the reference's
    lowest-random-wins coloring (csrc/src/leiden_kernel.cu:66-76)
    without locks.
    """
    prio = F.xxhash64(F.col("id"), F.lit(it), F.lit(seed))
    m = moves.select("id", "new_community", prio.alias("prio"))
    mover_edges = (
        edges.where(F.col("src") != F.col("dst"))
        .join(m.select(F.col("id").alias("src"), F.col("prio").alias("p_src")), "src")
        .join(m.select(F.col("id").alias("dst"), F.col("prio").alias("p_dst")), "dst")
    )
    blocked = mover_edges.where(
        (F.col("p_dst") < F.col("p_src"))
        | ((F.col("p_dst") == F.col("p_src")) & (F.col("dst") < F.col("src")))
    ).select(F.col("src").alias("id")).distinct()
    return m.join(blocked, "id", "left_anti").select("id", "new_community")


def _quality(
    edges: DataFrame, vertices: DataFrame, objective: str, gamma: float, m: float
) -> float:
    """Current partition quality from two aggregations (closed forms)."""
    a_src = vertices.select(
        F.col("id").alias("src"), F.col("community").alias("cs")
    )
    a_dst = vertices.select(
        F.col("id").alias("dst"), F.col("community").alias("cd")
    )
    w_in = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(
            (
                F.sum(
                    F.when(F.col("src") != F.col("dst"), F.col("weight"))
                    .otherwise(F.lit(0.0))
                )
                / 2.0
                + F.sum(
                    F.when(F.col("src") == F.col("dst"), F.col("weight"))
                    .otherwise(F.lit(0.0))
                )
            ).alias("w_in")
        )
    )
    comm = community_aggregates(vertices).join(w_in, "community", "left")
    if objective == "cpm":
        expr = F.sum(
            F.coalesce("w_in", F.lit(0.0))
            - F.lit(gamma) * F.col("n") * (F.col("n") - 1) / 2.0
        )
    else:
        expr = F.sum(
            F.coalesce("w_in", F.lit(0.0)) * 2 / (2 * m)
            - (F.col("stot") / (2 * m)) * (F.col("stot") / (2 * m))
        )
    return float(comm.agg(expr).first()[0] or 0.0)


# sweep index from which oscillation detection (per-sweep quality probe)
# kicks in; before that, sweeps are assumed productive
_QUALITY_CHECK_FROM = 5


def _quality_row(
    gather: DataFrame,
    comm_agg: DataFrame,
    vertices: DataFrame,
    loop_w: float,
    objective: str,
    gamma: float,
    m: float,
) -> DataFrame:
    """One-row ``(q_pre double)``: quality of the *current* partition,
    derived from the sweep's already-needed gather/comm_agg subtrees
    (Catalyst reuses their shuffle exchanges), so evaluating quality
    costs no extra pass over the edge table.

    Identities (loop weight LW is constant for the level):
      CPM  = 0.5·Σ_v k_own(v) + LW − γ·Σ_c n_c(n_c−1)/2
      Q    = (Σ_v k_own(v) + 2·LW)/(2m) − Σ_c (stot_c/(2m))²
    where k_own(v) is the non-loop weight from v into its own community.
    """
    own_sum = (
        vertices.select("id", "community")
        .join(
            gather.select(
                "id",
                F.col("nbr_comm").alias("community"),
                F.col("k_vc").alias("k_own"),
            ),
            ["id", "community"],
            "left",
        )
        .agg(F.coalesce(F.sum("k_own"), F.lit(0.0)).alias("k_own_sum"))
    )
    if objective == "cpm":
        comm_term = comm_agg.agg(
            F.coalesce(
                F.sum(F.lit(gamma) * F.col("n") * (F.col("n") - 1) / 2.0),
                F.lit(0.0),
            ).alias("penalty")
        )
        return own_sum.crossJoin(comm_term).select(
            (
                F.col("k_own_sum") / 2.0 + F.lit(loop_w) - F.col("penalty")
            ).alias("q_pre")
        )
    comm_term = comm_agg.agg(
        F.coalesce(
            F.sum((F.col("stot") / (2 * m)) * (F.col("stot") / (2 * m))),
            F.lit(0.0),
        ).alias("penalty")
    )
    return own_sum.crossJoin(comm_term).select(
        (
            (F.col("k_own_sum") + 2.0 * F.lit(loop_w)) / (2 * m)
            - F.col("penalty")
        ).alias("q_pre")
    )


def move_nodes(
    level: Level,
    objective: str,
    gamma: float = 1.0,
    m: float = 1.0,
    max_sweeps: int = 50,
    seed: int = 1234,
    patience: int = 3,
    on_sweep=None,
) -> tuple[Level, int]:
    """Local moving to convergence (C5/C8): repeat gather → delta →
    argmax → independent-set commit → apply, until a sweep commits zero
    moves OR the partition quality stops improving for ``patience``
    sweeps (bulk-synchronous moves on hub-heavy graphs can oscillate a
    small churn set forever — quality-guided stopping keeps the
    best-seen partition, the BSP analog of the reference's hard
    10-iteration cap, csrc/src/leiden_kernel.cu:1211-1213).

    Superstep cadence (the round-1 perf lesson): each sweep is exactly
    TWO Spark actions — one parquet write that executes the whole
    gather → select → conflict-resolve → apply chain (with the commit
    flag and the partition quality folded in as columns), and one tiny
    aggregate over the written file to read back (n_moves, quality).
    No separate commit-count job, no separate quality double-join job.

    Returns (updated level with the best-seen vertices, total moves).
    """
    edges = level.edges
    vertices = truncate(
        level.vertices.select("id", "community", "agg_count", "k")
    )
    spills: list[DataFrame] = [vertices]
    # total self-loop weight — constant across sweeps, feeds the cheap
    # gather-based quality identity in _quality_row
    loop_w = float(
        edges.where(F.col("src") == F.col("dst"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)))
        .first()[0]
    )
    total = 0
    best_vertices = vertices
    best_q = None
    final_q = None  # quality of `vertices`, when known
    stall = 0
    for it in range(max_sweeps):
        gather = gather_neighbor_comm_weights(edges, vertices)
        comm_agg = community_aggregates(vertices)
        moves = _select_moves(vertices, gather, comm_agg, objective, gamma, m)
        commits = _resolve_conflicts(moves, edges, it, seed)
        q_row = _quality_row(
            gather, comm_agg, vertices, loop_w, objective, gamma, m
        )
        flagged = truncate(
            vertices.join(commits, "id", "left")
            .select(
                "id",
                F.coalesce("new_community", "community").alias("community"),
                "agg_count",
                "k",
                F.col("new_community").isNotNull().alias("moved"),
            )
            .crossJoin(F.broadcast(q_row))
        )
        spills.append(flagged)
        stat = flagged.agg(
            F.sum(F.col("moved").cast("long")).alias("n_moves"),
            F.first("q_pre").alias("q_pre"),
        ).first()
        n_moves = int(stat["n_moves"] or 0) if stat is not None else 0
        q_cur = stat["q_pre"] if stat is not None else None
        # best-partition tracking: q_cur evaluates the partition that
        # ENTERED this sweep (`vertices`) — the same quality stream as
        # evaluating each produced state, shifted one sweep, at zero
        # extra jobs (it rides the sweep's own gather aggregates).
        if it >= _QUALITY_CHECK_FROM and q_cur is not None:
            final_q = q_cur
            if best_q is None or q_cur > best_q + 1e-12:
                best_q = q_cur
                best_vertices = vertices
                stall = 0
            else:
                stall += 1
        else:
            best_vertices = vertices  # tracking not active yet
        if n_moves == 0:
            break
        total += n_moves
        new_vertices = flagged.select("id", "community", "agg_count", "k")
        new_vertices._graft_spill_path = getattr(  # type: ignore[attr-defined]
            flagged, "_graft_spill_path", None
        )
        vertices = new_vertices
        final_q = None  # the new state has not been evaluated yet
        if on_sweep is not None:
            on_sweep(it, n_moves, new_vertices)
        if stall >= patience:
            break
    # the loop's last state may be unevaluated (stall/max_sweeps exit one
    # sweep after its chain ran) — one catch-up quality job, then keep
    # whichever partition scored best
    if best_q is not None and vertices is not best_vertices:
        if final_q is None:
            final_q = _quality(edges, vertices, objective, gamma, m)
        if final_q > best_q + 1e-12:
            best_q = final_q
            best_vertices = vertices
    elif best_q is None:
        best_vertices = vertices  # quality tracking never kicked in
    keep = getattr(best_vertices, "_graft_spill_path", None)
    for df in spills:
        if getattr(df, "_graft_spill_path", None) != keep:
            drop_spill(df)
    return Level(edges=edges, vertices=best_vertices), total


def aggregate_graph(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """A4 contraction: community graph with self-loops carrying the
    single-counted intra-community weight (custom_leiden.py:611-637
    'Important: this should include adding self-edges').

    Input edges symmetrized → output edges symmetrized by construction;
    internal non-loop weight lands twice on (c, c) so it is halved, then
    original loops are added once.
    """
    a_src = assign.select(F.col("id").alias("src"), F.col("community").alias("cu"))
    a_dst = assign.select(F.col("id").alias("dst"), F.col("community").alias("cv"))
    joined = edges.join(a_src, "src").join(a_dst, "dst")
    return joined.groupBy(
        F.col("cu").alias("src"), F.col("cv").alias("dst")
    ).agg(
        (
            F.sum(
                F.when(
                    (F.col("cu") == F.col("cv")) & (F.col("src") != F.col("dst")),
                    F.col("weight") / 2,
                ).otherwise(F.lit(0.0))
            )
            + F.sum(
                F.when(
                    ~((F.col("cu") == F.col("cv")) & (F.col("src") != F.col("dst"))),
                    F.col("weight"),
                ).otherwise(F.lit(0.0))
            )
        ).alias("weight")
    )


def aggregate_vertices(vertices: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Vertex state for the contracted graph: one supernode per
    community, agg_count summed, k recomputed from the new edges,
    fresh singleton communities."""
    counts = vertices.groupBy(F.col("community").alias("id")).agg(
        F.sum("agg_count").alias("agg_count")
    )
    k = new_edges.groupBy(F.col("src").alias("id")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight") * 2).otherwise(
                F.col("weight")
            )
        ).alias("k")
    )
    return counts.join(k, "id", "left").select(
        "id",
        F.col("id").alias("community"),
        "agg_count",
        F.coalesce("k", F.lit(0.0)).alias("k"),
    )


def propagate_labels(
    base_ids: DataFrame, mappings: list[DataFrame]
) -> DataFrame:
    """C14: fold child→parent mapping tables down to original vertices.

    ``mappings[i]`` is (child long, parent long) for level i. Returns
    (id, community). One join per level — the hierarchy is shallow
    (O(log V) levels), so this is a handful of broadcastable joins.
    """
    cur = base_ids.select("id", F.col("id").alias("community"))
    for mp in mappings:
        cur = (
            cur.join(
                mp.withColumnRenamed("child", "community"), "community", "left"
            )
            .select(
                "id",
                F.coalesce("parent", "community").alias("community"),
            )
        )
    return cur


def all_singletons(vertices: DataFrame) -> bool:
    """A8 convergence predicate (custom_leiden.py:601-609):
    every community has exactly one (super)node."""
    row = vertices.agg(
        F.countDistinct("community").alias("c"), F.count(F.lit(1)).alias("n")
    ).first()
    return row["c"] == row["n"]
