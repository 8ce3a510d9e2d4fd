"""k-core subgraph extraction (iterative degree peeling).

The cugraph API family ships ``cugraph.k_core`` / ``core_number``; the
engine carries the membership operator: the k-core is the maximal
subgraph where every vertex has degree ≥ k, found by repeatedly
deleting under-degree vertices until a fixpoint. Each round is one
degree aggregation + one semi-join filter over the surviving edge set —
O(peeling-depth) rounds, typically a handful on link graphs.

Training-data relevance: the k-core is the standard "dense interaction
backbone" filter (drop leaf actors / one-off conversations before
community detection or embedding training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.algos.community import superstep_conf
from graft.checkpoint import drop_spill, truncate
from graft.graph import Graph


def k_core(graph: Graph, k: int, max_iter: int = 100) -> DataFrame:
    """Returns ``(id,)`` — the vertices of the k-core (possibly empty).

    Peeling is monotone (vertices only ever leave), so the loop
    terminates at the first round that deletes nothing; ``max_iter``
    is a safety cap (peeling depth is bounded by the vertex count but
    is tiny in practice).
    """
    edges = truncate(
        graph.without_self_loops().select("src", "dst").distinct()
    )
    with superstep_conf(graph.edges.sparkSession, graph.edges.count()):
        for _ in range(max_iter):
            deg = edges.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("d")
            )
            survivors = deg.where(F.col("d") >= k).select("id")
            new_edges = truncate(
                edges.join(
                    survivors.withColumnRenamed("id", "src"), "src",
                    "left_semi",
                ).join(
                    survivors.withColumnRenamed("id", "dst"), "dst",
                    "left_semi",
                )
            )
            n_old = edges.count()
            n_new = new_edges.count()
            drop_spill(edges)
            edges = new_edges
            if n_new == n_old:
                break
    return edges.select(F.col("src").alias("id")).distinct()
