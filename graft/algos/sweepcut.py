"""Seeded local community extraction: PPR + conductance sweep cut.

The Andersen–Chung–Lang (2006) local clustering recipe, the standard
"community of THIS seed" primitive (reference ecosystem: cugraph ships
the global leiden/louvain family; the seeded-local variant is the
query-shaped complement a transcript link graph needs — "which actors
cluster around this conversation/tool?"): rank vertices by
degree-normalized personalized PageRank from the seed set, then sweep
prefixes of that order and return each prefix's conductance; the argmin
prefix is the extracted community.

Scale shape: the PPR is the engine's existing distributed operator; the
sweep itself NEVER materializes a global order — the candidate order is
a bounded top-k (``TakeOrderedAndProject``, no full sort), and every
window after that runs over k rows. Internal-edge mass enters the sweep
via two semi-bounded hash joins of the edge table against the k-row
rank table (an edge becomes internal at position max(pos_u, pos_v)), so
the edge pass is one join + one groupBy regardless of k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graft.algos.pagerank import pagerank
from graft.graph import Graph


def ppr_sweep_cut(
    graph: Graph,
    sources: list,
    iters: int = 3,
    k: int = 50,
) -> DataFrame:
    """Returns the sweep table ``(pos, id, rank double, conductance
    double)`` for the top-``k`` degree-normalized PPR vertices.

    ``pos`` orders candidates by (round(rank/strength, 6) DESC, id) —
    the ACL sweep order, rounded so the order is engine-portable;
    ``conductance`` is φ(S_pos) = cut(S_pos) / min(vol(S_pos),
    2m − vol(S_pos)) of the prefix S_pos = {candidates 1..pos}, with
    the engine's conventions (vol = Σ strength, self-loops twice;
    cut single-counted; degenerate denominators score 0.0) — the same
    φ as :func:`graft.quality.conductance`. The community is the
    argmin-φ prefix; returning the whole sweep keeps the operator
    deterministic and lets callers apply their own stopping rule.
    """
    if not sources:
        raise ValueError("ppr_sweep_cut needs a non-empty seed set")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pr = pagerank(graph, fixed_iterations=iters, sources=sources)
    kv = graph.strength().select("id", "k")
    scored = pr.join(kv, "id").select(
        "id",
        "rank",
        "k",
        F.round(F.col("rank") / F.col("k"), 6).alias("score"),
    )
    # bounded top-k: compiles to TakeOrderedAndProject (no global sort
    # materialization); the row_number window below runs on k rows
    top = scored.orderBy(F.desc("score"), "id").limit(k)
    pos_w = Window.orderBy(F.desc("score"), "id")
    ranked = top.select(
        F.row_number().over(pos_w).alias("pos"), "id", "rank", "k"
    )
    # internal volume per position: a symmetrized row (u, v) counts
    # toward the prefix that first contains BOTH endpoints (loops are
    # one row, doubled — the strength convention)
    tu = ranked.select(F.col("id").alias("src"), F.col("pos").alias("pu"))
    tv = ranked.select(F.col("id").alias("dst"), F.col("pos").alias("pv"))
    w_in = F.when(
        F.col("src") == F.col("dst"), F.col("weight") * 2
    ).otherwise(F.col("weight"))
    vint = (
        graph.edges.join(tu, "src")
        .join(tv, "dst")
        .groupBy(F.greatest("pu", "pv").alias("pos"))
        .agg(F.sum(w_in).alias("vin_at"))
    )
    two_m = graph.edges.agg(
        F.sum(
            F.when(
                F.col("src") == F.col("dst"), F.col("weight") * 2
            ).otherwise(F.col("weight"))
        )
    ).first()[0] or 0.0
    cum_w = Window.orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = ranked.join(vint, "pos", "left").select(
        "pos",
        "id",
        "rank",
        F.sum("k").over(cum_w).alias("vol"),
        F.coalesce(
            F.sum("vin_at").over(cum_w), F.lit(0.0)
        ).alias("vin"),
    )
    denom = F.least(F.col("vol"), F.lit(two_m) - F.col("vol"))
    return sweep.select(
        "pos",
        "id",
        F.round("rank", 6).alias("rank"),
        F.round(
            F.when(denom > 0, (F.col("vol") - F.col("vin")) / denom)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("conductance"),
    )
