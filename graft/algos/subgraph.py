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


def disparity_backbone(
    graph: Graph, alpha: float = 0.05
) -> DataFrame:
    """Multiscale backbone extraction (Serrano, Boguñá & Vespignani
    2009 disparity filter): for each endpoint i of an edge (i, j), the
    probability that a uniformly-random split of i's strength over its
    k_i neighbors gives (i, j) at least its observed share is
    ``p = (1 − w/s_i)^(k_i − 1)``; the edge joins the backbone when
    EITHER endpoint finds it significant (min p < ``alpha``). The
    weight-aware complement of :func:`sparsify_top_k`: it keeps
    statistically-heavy edges at every degree scale instead of a fixed
    per-vertex quota.

    Returns ``(u, v, weight, p_u, p_v, keep boolean)`` for each
    undirected simple edge (u < v), p's rounded to 6 dp and the keep
    predicate evaluated on the ROUNDED values so any engine replays the
    same backbone bit-for-bit. Leaf endpoints (k = 1) give p = 1 by the
    0^0 = 1 convention — a leaf edge survives only via its other
    endpoint, the published convention.

    Plan shape: one degree/strength hash agg + two broadcast-able joins
    onto the (u < v) edge list, then pure column math — no wedge
    enumeration, no window, nothing quadratic; the canonical 100-TB
    pre-filter before O(d²) analytics.
    """
    simple = graph.without_self_loops()
    ds = simple.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("s"), F.count(F.lit(1)).alias("k")
    )
    und = simple.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v"), "weight"
    )

    def _p(side: str) -> F.Column:
        return F.round(
            F.pow(
                1.0 - F.col("weight") / F.col(f"s_{side}"),
                F.col(f"k_{side}") - 1,
            ),
            6,
        )

    out = (
        und.join(
            ds.select(
                F.col("id").alias("u"),
                F.col("s").alias("s_u"),
                F.col("k").alias("k_u"),
            ),
            "u",
        )
        .join(
            ds.select(
                F.col("id").alias("v"),
                F.col("s").alias("s_v"),
                F.col("k").alias("k_v"),
            ),
            "v",
        )
        .select(
            "u",
            "v",
            "weight",
            _p("u").alias("p_u"),
            _p("v").alias("p_v"),
        )
    )
    return out.withColumn(
        "keep", F.least("p_u", "p_v") < F.lit(alpha)
    )
