"""Vertex Jaccard similarity (link prediction / edge scoring).

The cugraph API family ships ``cugraph.jaccard`` alongside
leiden/louvain/pagerank; the reference wires that ecosystem
(examples/cugraph-cpp-api/), so the engine carries the same capability:
for each undirected edge (u, v), the Jaccard coefficient of the two
endpoint neighborhoods |N(u) ∩ N(v)| / |N(u) ∪ N(v)| (self-loops
excluded, neighborhoods unweighted).

Plan shape: common neighbors come from ONE wedge join — the candidate
edge list joined twice against the (symmetrized) adjacency on the
shared endpoint — then two broadcast-able degree joins. The wedge join
is the same degree-bounded pattern as triangle counting: scoring is
restricted to the CANDIDATE pairs (default: the existing edges), never
all vertex pairs, so hub blowup is bounded by Σ_e min-degree work, and
AQE skew splitting applies to the shared-endpoint key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.graph import Graph


def vertex_jaccard(
    graph: Graph, pairs: DataFrame | None = None
) -> DataFrame:
    """Returns ``(u, v, jaccard double)`` for each candidate pair.

    ``pairs``: optional (u, v) candidate table; defaults to the graph's
    undirected edge set (u < v), the cugraph.jaccard convention. Pairs
    with no common neighbors score 0 — including custom candidate pairs
    whose endpoint has no edges at all (degree joins are LEFT joins with
    degree coalesced to 0, and a 0 denominator scores 0.0 instead of
    dividing by zero or dropping the row).
    """
    adj = graph.without_self_loops().select("src", "dst").distinct()
    deg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    if pairs is None:
        pairs = adj.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
    # common neighbors: w adjacent to BOTH u and v (one wedge join)
    common = (
        pairs.join(
            adj.select(F.col("src").alias("u"), F.col("dst").alias("w")), "u"
        )
        .join(
            adj.select(F.col("src").alias("v"), F.col("dst").alias("w")),
            ["v", "w"],
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    nc = F.coalesce("n_common", F.lit(0))
    du = F.coalesce("du", F.lit(0))
    dv = F.coalesce("dv", F.lit(0))
    denom = du + dv - nc
    return (
        pairs.join(common, ["u", "v"], "left")
        .join(
            deg.select(F.col("id").alias("u"), F.col("d").alias("du")),
            "u", "left",
        )
        .join(
            deg.select(F.col("id").alias("v"), F.col("d").alias("dv")),
            "v", "left",
        )
        .select(
            "u",
            "v",
            F.when(denom == 0, F.lit(0.0))
            .otherwise(F.round(nc / denom, 6))
            .alias("jaccard"),
        )
    )
