"""Structural graph metrics: clustering coefficient, transitivity,
degree assortativity, average neighbor degree.

The cugraph API family the engine mirrors ships these alongside the
pair-similarity scorers (reference ecosystem: examples/cugraph-cpp-api/
— networkx.clustering / transitivity / degree_assortativity_coefficient
/ average_neighbor_degree are the semantics anchors). All four are pure
DataFrame compositions over the simple (self-loop-free, deduplicated)
adjacency:

- clustering reuses the degree-ranked wedge-close join from
  :mod:`graft.algos.triangles` (one bounded shuffle) plus a degree agg;
- transitivity is 3·triangles over the wedge total Σ d(d−1)/2 — two
  scalar aggs;
- assortativity is one ``corr`` agg over the degree-joined edge list —
  the edge table is scanned once, the (small) degree table joins in
  twice, broadcast-able at any scale;
- average neighbor degree is one degree join + one groupBy-avg.

Nothing here drives data to the driver beyond O(1) scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.graph import Graph


def _simple_adj(graph: Graph) -> DataFrame:
    """Directed expansion of the simple graph: both orientations of each
    self-loop-free edge, deduplicated — (a, b) means a—b."""
    return (
        graph.without_self_loops()
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )


def _simple_degrees(adj: DataFrame) -> DataFrame:
    """(id, d) — distinct-neighbor count per vertex of the simple graph."""
    return adj.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )


def clustering_coefficient(graph: Graph) -> DataFrame:
    """Per-vertex local clustering coefficient: ``(id, clustering)`` —
    2·T(v) / (d(v)·(d(v)−1)) on the simple graph, 0.0 for vertices of
    degree < 2 (networkx.clustering convention). Every graph vertex gets
    a row, including self-loop-only ones (degree 0 → 0.0).
    """
    from graft.algos.triangles import triangles_per_vertex

    adj = _simple_adj(graph)
    deg = _simple_degrees(adj)
    tri = triangles_per_vertex(graph)
    d = F.coalesce("d", F.lit(0))
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.when(d < 2, F.lit(0.0))
            .otherwise(
                F.round(2.0 * F.col("triangles") / (d * (d - 1)), 6)
            )
            .alias("clustering"),
        )
    )


def transitivity(graph: Graph) -> float:
    """Global transitivity: 3·triangles / Σ_v C(d(v), 2) — the fraction
    of length-2 paths that close (networkx.transitivity). 0.0 on a
    wedge-free graph."""
    from graft.algos.triangles import triangle_count

    n_tri = triangle_count(graph)
    wedges = (
        _simple_degrees(_simple_adj(graph))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2))
        .first()[0]
    )
    if not wedges:
        return 0.0
    return 3.0 * n_tri / float(wedges)


def degree_assortativity(graph: Graph) -> float:
    """Degree assortativity coefficient: the Pearson correlation of the
    endpoint degrees over the (both-orientations) simple edge list —
    networkx.degree_assortativity_coefficient. NaN-free: returns 0.0
    when either marginal is constant (correlation undefined)."""
    adj = _simple_adj(graph)
    deg = _simple_degrees(adj)
    # ANSI mode makes F.corr raise DIVIDE_BY_ZERO on constant marginals;
    # assemble Pearson from its pieces and guard the denominator here
    cov, sa, sb = (
        adj.join(deg.select(F.col("id").alias("a"),
                            F.col("d").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"),
                         F.col("d").alias("db")), "b")
        .agg(
            F.covar_pop("da", "db"),
            F.stddev_pop("da"),
            F.stddev_pop("db"),
        )
        .first()
    )
    if not sa or not sb:  # null/zero: constant-degree marginals
        return 0.0
    return float(cov) / (float(sa) * float(sb))


def avg_neighbor_degree(graph: Graph) -> DataFrame:
    """Per-vertex mean neighbor degree on the simple graph:
    ``(id, knn)`` (networkx.average_neighbor_degree, unweighted). Every
    graph vertex gets a row; neighborless vertices score 0.0."""
    adj = _simple_adj(graph)
    deg = _simple_degrees(adj)
    knn = (
        adj.join(
            deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b"
        )
        .groupBy(F.col("a").alias("id"))
        .agg(F.avg("db").alias("knn"))
    )
    return graph.vertices().join(knn, "id", "left").select(
        "id", F.round(F.coalesce("knn", F.lit(0.0)), 6).alias("knn")
    )


def powerlaw_alpha(graph: Graph, d_min: int = 2) -> DataFrame:
    """One-row ``(alpha double, n_tail long, d_min long)`` — the
    continuous maximum-likelihood (Hill) estimate of the degree-tail
    exponent over simple degrees d >= d_min:

        alpha = 1 + n / sum(ln(d_i / (d_min - 0.5)))

    using the Clauset–Shalizi–Newman −0.5 discreteness correction. The
    standard summary of how heavy-tailed an interaction graph is — the
    number that decides whether hub mitigation (salting, adjacency
    caps) is needed on a new transcript corpus before running it.
    Cost: one degree agg + one scalar agg; nothing driver-sized.
    alpha is NULL when no tail vertex exists (empty fit). Rounded to
    6 dp so aggregation order never shows.
    """
    deg = _simple_degrees(_simple_adj(graph))
    tail = deg.where(F.col("d") >= d_min)
    return tail.agg(
        F.round(
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("d") / (d_min - 0.5))),
            6,
        ).alias("alpha"),
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(d_min).cast("long").alias("d_min"),
    )
