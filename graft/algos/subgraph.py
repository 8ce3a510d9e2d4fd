"""Subgraph extraction: k-hop ego graphs and community quotient graphs.

Two "zoom" operators the analytics workflows around this engine need
constantly (both are stock capabilities in the cugraph/networkx API
family the engine mirrors — ``ego_graph`` / community contraction):

- :func:`ego_edges` — the induced subgraph within ``radius`` hops of a
  seed vertex, as a canonical single-counted edge list. The transcript
  use case: pull one actor's interaction neighborhood out of the
  10^12-turn link graph for inspection or per-neighborhood analytics.
- :func:`quotient_edges` — the super-graph whose vertices are
  communities (any ``(id, label)`` table: LPA, Leiden, Louvain, CC) and
  whose edge weights are the summed inter-community weights, intra
  weight on the diagonal. The community interaction map — what gets
  plotted/ranked after community detection — and a public, oracle-able
  face for the same A4 contraction Leiden iterates internally
  (graft.algos.community.aggregate_graph, reference
  custom_leiden.py:611-637).

Scale: the ego ball is found by ``radius`` BFS supersteps; the two
induced-edge joins are against a ball that is (by construction of a
bounded-radius query) far smaller than the graph — AQE broadcasts it.
The quotient is one assignment join per endpoint + one keyed groupBy —
exactly the Leiden contraction cost envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graft.algos.bfs import bfs_hops
from graft.algos.community import aggregate_graph
from graft.graph import Graph


def ego_edges(graph: Graph, source, radius: int = 2) -> DataFrame:
    """Returns ``(u, v, weight)`` with ``u <= v`` — the single-counted
    canonical edge list of the subgraph induced by vertices within
    ``radius`` hops of ``source`` (the seed's own loops/edges
    included). An unreachable or absent ``source`` yields an empty
    result rather than an error — matching the relational reading
    ("edges whose endpoints are both in the ball")."""
    hops = bfs_hops(graph, source, max_hops=radius)
    ball = hops.where(F.col("hop").isNotNull()).select("id")
    # symmetrized input: each non-loop edge appears in both directions
    # with the single-counted weight, loops once — keeping src <= dst
    # selects exactly one copy per undirected edge.
    return (
        graph.edges.join(ball.withColumnRenamed("id", "src"), "src")
        .join(ball.withColumnRenamed("id", "dst"), "dst")
        .where(F.col("src") <= F.col("dst"))
        .select(
            F.col("src").alias("u"), F.col("dst").alias("v"), "weight"
        )
    )


def sparsify_top_k(graph: Graph, k: int) -> DataFrame:
    """Degree-bounded graph sparsifier: keep each vertex's ``k``
    strongest incident edges (weight desc, neighbor id asc as the
    deterministic tie-break); an undirected edge survives when EITHER
    endpoint ranks it — the standard mutual-kNN-union backbone that
    bounds every vertex's retained degree to at most ~2k while
    preserving hub-to-hub trunk edges. The preprocessing step that
    makes O(d²) per-vertex analytics (squares, triangles, wedge
    scorers) safe on hub-heavy corpora. Self-loops are dropped
    (they are not neighbors).

    Returns the canonical single-counted ``(u, v, weight)`` edge list
    (u <= v).

    Plan: ONE per-src window (row_number) over the symmetrized
    adjacency + a canonicalizing distinct — a single shuffle each. The
    hub's window partition is a single-task sort of its d rows, the
    same envelope as every ranked-adjacency op here; salt upstream if
    one vertex's edge list alone exceeds a task (graft.skew).
    """
    adj = graph.without_self_loops().select("src", "dst", "weight")
    w = Window.partitionBy("src").orderBy(F.desc("weight"), "dst")
    return (
        adj.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "weight",
        )
        .distinct()
    )


def two_hop_neighbors(graph: Graph, sources=None) -> DataFrame:
    """Returns ``(first, second)`` — distinct vertex pairs joined by a
    path of length exactly 2 (``first ≠ second``; pairs that are ALSO
    direct neighbors are kept, the cugraph ``get_two_hop_neighbors``
    convention). ``sources``: optional iterable restricting ``first``
    (cugraph's ``start_vertices``) — the form to use at scale, since
    the unrestricted pair count is Σ_v d(v)², hub-quadratic on a
    powerlaw graph (same blow-up square_count documents; bound retained
    degree first via :func:`sparsify_top_k` when you truly need the
    corpus-wide answer). One self-join of the adjacency on the shared
    midpoint — the engine's standard bounded wedge join."""
    adj = graph.without_self_loops().select("src", "dst").distinct()
    lhs = adj.select(F.col("src").alias("first"), F.col("dst").alias("w"))
    if sources is not None:
        lhs = lhs.where(F.col("first").isin(list(sources)))
    return (
        lhs.join(
            adj.select(F.col("src").alias("w"), F.col("dst").alias("second")),
            "w",
        )
        .where(F.col("first") != F.col("second"))
        .select("first", "second")
        .distinct()
    )


def quotient_edges(
    graph: Graph, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Returns ``(cu, cv, weight)`` with ``cu <= cv`` — the community
    quotient (super-)graph under ``labels`` ``(id, <label_col>)``.
    Off-diagonal weight = single-counted total weight between the two
    communities; diagonal weight = single-counted intra-community
    weight with original self-loops counted once (the A4 contraction
    convention, so ``quotient_edges`` over the all-singletons labeling
    is the canonical edge list itself)."""
    assign = labels.select(
        "id", F.col(label_col).alias("community")
    )
    q = aggregate_graph(graph.edges, assign)
    # aggregate_graph output is symmetrized (off-diagonal pairs appear
    # in both orientations, each already carrying the single-counted
    # inter-community weight); keep the canonical copy.
    return q.where(F.col("src") <= F.col("dst")).select(
        F.col("src").alias("cu"),
        F.col("dst").alias("cv"),
        "weight",
    )
