"""Betweenness centrality (Brandes) — multi-source BFS as DataFrame
supersteps.

The cugraph API family ships ``cugraph.betweenness_centrality`` with
optional source sampling (k); the engine mirrors that surface. The
classic Brandes algorithm runs one BFS per source plus a dependency
back-propagation; here ALL sources advance in the same superstep by
keying the state on ``(s, id)`` — one edge join per DEPTH, not per
source, so the round count is the graph eccentricity bound, independent
of how many sources are in flight:

- forward: frontier(s, id, sigma) joins the edge table on the vertex
  key; new reach rows are anti-joined against the visited set and
  groupBy-summed (sigma accumulates shortest-path counts);
- backward: depths processed descending; delta(v) = Σ over successors
  w one level deeper: sigma_v/sigma_w · (1 + delta_w) — one join of
  adjacent frontier levels per depth.

State is O(k·V) rows and every step is a keyed join + hash agg —
shuffle-partitioned, map-side combinable, no driver data. Source
sampling (``k``) is the 100-TB path: exact betweenness is O(V·E) work
regardless of engine, so at scale you sample sources and rescale by
n/k exactly as networkx/cugraph do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.algos.community import superstep_conf
from graft.checkpoint import drop_spill, truncate
from graft.graph import Graph


def _forward_levels(adj, sources, _t) -> list[DataFrame]:
    """Multi-source level-synchronous BFS carrying shortest-path counts
    sigma: one edge join + anti-join + hash-agg per DEPTH for all
    sources at once, state keyed (s, id). Returns the per-depth levels
    (``levels[d]`` = vertices at distance d from their source s)."""
    frontier = _t(
        sources.select("s", F.col("s").alias("id"),
                       F.lit(1.0).alias("sigma"))
    )
    visited = frontier.select("s", "id")
    levels: list[DataFrame] = [frontier]
    while True:
        reached = (
            levels[-1]
            .join(adj.withColumnRenamed("src", "id"), "id")
            .select("s", F.col("dst").alias("id"), "sigma")
            .join(visited, ["s", "id"], "left_anti")
            .groupBy("s", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = _t(reached)
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        visited = _t(visited.unionAll(nxt.select("s", "id")))
    return levels


def _select_sources(
    verts: DataFrame,
    n: int,
    k: int | None,
    sources: DataFrame | None,
    seed: int,
) -> tuple[DataFrame, int, bool]:
    """Shared source-selection contract for the Brandes family:
    explicit ``sources`` win (no rescale), else all vertices, else a
    deterministic xxhash64-ordered sample of ``k``. Returns the
    one-column ``(s)`` table, its count, and whether it was explicit."""
    explicit = sources is not None
    if sources is None:
        sources = verts
        if k is not None and k < n:
            sources = verts.orderBy(F.xxhash64("id", F.lit(seed))).limit(k)
    sources = sources.select(F.col("id").alias("s"))
    return sources, sources.count(), explicit


def betweenness_centrality(
    graph: Graph,
    k: int | None = None,
    sources: DataFrame | None = None,
    normalized: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Returns ``(id, betweenness double)`` — unweighted betweenness on
    the undirected simple graph (networkx.betweenness_centrality
    semantics: normalized by 2/((n−1)(n−2)) when ``normalized``, else
    the raw undirected pair counts halved).

    ``k``: sample that many sources (deterministic xxhash64 order by
    ``seed``) and rescale by n/k — the networkx/cugraph estimator.
    ``sources``: explicit one-column ``(id)`` source table (overrides
    ``k``; no rescaling — partial betweenness from those sources).
    """
    verts = graph.vertices_cached()
    n = graph.num_vertices()
    spark = graph.edges.sparkSession
    if n < 3:
        return verts.select("id", F.lit(0.0).alias("betweenness"))

    sources, n_src, explicit_sources = _select_sources(
        verts, n, k, sources, seed
    )
    if n_src == 0:
        return verts.select("id", F.lit(0.0).alias("betweenness"))
    adj = truncate(
        graph.without_self_loops().select("src", "dst").distinct()
    )

    spills: list[DataFrame] = []

    def _t(df: DataFrame) -> DataFrame:
        out = truncate(df)
        spills.append(out)
        return out

    with superstep_conf(spark, adj.count()):
        levels = _forward_levels(adj, sources, _t)

        # ---- backward: dependency accumulation, depths descending ----
        # delta at the deepest level is 0; each shallower level gathers
        # sigma_v/sigma_w * (1 + delta_w) from its successors
        acc: list[DataFrame] = []
        delta = levels[-1].select(
            "s", "id", F.lit(0.0).alias("delta")
        )
        for d in range(len(levels) - 2, -1, -1):
            below = levels[d + 1].join(delta, ["s", "id"]).select(
                "s",
                F.col("id").alias("w"),
                F.col("sigma").alias("sigma_w"),
                "delta",
            )
            gathered = (
                levels[d]
                .join(adj.withColumnRenamed("src", "id"), "id")
                .select("s", "id", "sigma", F.col("dst").alias("w"))
                .join(below, ["s", "w"])
                .groupBy("s", "id")
                .agg(
                    F.sum(
                        F.col("sigma") / F.col("sigma_w")
                        * (F.lit(1.0) + F.col("delta"))
                    ).alias("delta")
                )
            )
            delta = _t(
                levels[d]
                .join(gathered, ["s", "id"], "left")
                .select("s", "id", "sigma",
                        F.coalesce("delta", F.lit(0.0)).alias("delta"))
            )
            if d >= 1:  # Brandes: the source's own delta is discarded
                acc.append(delta.select("s", "id", "delta"))
            delta = delta.select("s", "id", "delta")

        if acc:
            total = acc[0]
            for a in acc[1:]:
                total = total.unionAll(a)
            bc = total.groupBy("id").agg(F.sum("delta").alias("b"))
        else:
            bc = verts.select("id", F.lit(0.0).alias("b")).limit(0)

        # undirected: every (s, t) pair is counted from both endpoints
        # when sources cover the graph, so halve; then the networkx
        # rescale (sampled estimator multiplies back by n/k)
        factor = 0.5
        if normalized:
            factor = 1.0 / ((n - 1) * (n - 2))
        if not explicit_sources and n_src < n:
            factor *= n / n_src
        out = truncate(
            verts.join(bc, "id", "left")
            .select(
                "id",
                F.round(
                    F.coalesce("b", F.lit(0.0)) * F.lit(factor), 6
                ).alias("betweenness"),
            )
        )
        for df in spills:
            drop_spill(df)
        drop_spill(adj)
    return out


def edge_betweenness_centrality(
    graph: Graph,
    k: int | None = None,
    sources: DataFrame | None = None,
    normalized: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Returns ``(u, v, betweenness double)`` — one row per undirected
    simple edge (u < v), networkx.edge_betweenness_centrality
    semantics: Σ_{s≠t} σ(s,t|e)/σ(s,t), halved for the undirected
    double count, normalized by 1/(n(n−1)) when ``normalized`` (so the
    two conventions compose to 2/(n(n−1)) per unordered pair).

    Same multi-source Brandes supersteps as
    :func:`betweenness_centrality`; the per-edge dependency is the
    backward gather's addend BEFORE its vertex groupBy —
    σ_v/σ_w · (1 + δ_w) for the tree edge (v, w) with w one BFS level
    deeper — accumulated over every depth INCLUDING the source's own
    incident edges (vertex Brandes discards the source's delta; edge
    Brandes keeps every edge on a shortest path). Edges whose endpoints
    sit at equal depth from a source carry no flow from it and simply
    never appear in that source's accumulation. ``k``/``sources``
    sample exactly as in :func:`betweenness_centrality` (Girvan–Newman
    at 100 TB runs on sampled sources or not at all).
    """
    verts = graph.vertices_cached()
    n = graph.num_vertices()
    spark = graph.edges.sparkSession
    # early returns derive from the RAW edge lineage (not the spill-
    # backed adj) so they stay readable after the spill cleanup
    simple = graph.without_self_loops().select("src", "dst").distinct()
    und_zero = simple.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(0.0).alias("betweenness"),
    )
    if n < 2:
        return und_zero

    sources, n_src, explicit_sources = _select_sources(
        verts, n, k, sources, seed
    )
    if n_src == 0:
        return und_zero

    adj = truncate(simple)
    und = adj.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )

    spills: list[DataFrame] = []

    def _t(df: DataFrame) -> DataFrame:
        out = truncate(df)
        spills.append(out)
        return out

    with superstep_conf(spark, adj.count()):
        levels = _forward_levels(adj, sources, _t)

        acc: list[DataFrame] = []
        delta = levels[-1].select(
            "s", "id", F.lit(0.0).alias("delta")
        )
        for d in range(len(levels) - 2, -1, -1):
            below = levels[d + 1].join(delta, ["s", "id"]).select(
                "s",
                F.col("id").alias("w"),
                F.col("sigma").alias("sigma_w"),
                "delta",
            )
            contrib = _t(
                levels[d]
                .join(adj.withColumnRenamed("src", "id"), "id")
                .select("s", "id", "sigma", F.col("dst").alias("w"))
                .join(below, ["s", "w"])
                .select(
                    "s",
                    "id",
                    "w",
                    (
                        F.col("sigma") / F.col("sigma_w")
                        * (F.lit(1.0) + F.col("delta"))
                    ).alias("c"),
                )
            )
            acc.append(contrib.select("id", "w", "c"))
            gathered = contrib.groupBy("s", "id").agg(
                F.sum("c").alias("delta")
            )
            delta = _t(
                levels[d]
                .join(gathered, ["s", "id"], "left")
                .select("s", "id",
                        F.coalesce("delta", F.lit(0.0)).alias("delta"))
            )

        factor = 0.5
        if normalized:
            factor = 1.0 / (n * (n - 1))
        if not explicit_sources and n_src < n:
            factor *= n / n_src
        if acc:
            total = acc[0]
            for a in acc[1:]:
                total = total.unionAll(a)
            eb = (
                total.groupBy(
                    F.least("id", "w").alias("u"),
                    F.greatest("id", "w").alias("v"),
                )
                .agg(F.sum("c").alias("b"))
            )
        else:
            eb = und.select("u", "v", F.lit(0.0).alias("b")).limit(0)
        out = truncate(
            und.join(eb, ["u", "v"], "left").select(
                "u",
                "v",
                F.round(
                    F.coalesce("b", F.lit(0.0)) * F.lit(factor), 6
                ).alias("betweenness"),
            )
        )
        for df in spills:
            drop_spill(df)
        drop_spill(adj)
    return out
