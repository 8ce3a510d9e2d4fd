"""Katz and eigenvector centrality (cugraph API family parity).

The cugraph ecosystem the reference wires (examples/cugraph-cpp-api/)
ships ``katz_centrality`` and ``eigenvector_centrality`` alongside
pagerank; the engine carries both as DataFrame superstep loops over the
symmetrized weighted edge table (same per-superstep plan shape as
PageRank: the small score table joins into the big edge scan — the edge
table is never shuffled — followed by one groupBy-sum; lineage truncated
per superstep, AQE off + data-sized reducers via superstep_conf).

Semantics (fixed-iteration forms are what the SQL oracles certify):

- Katz:        x_{t+1}(v) = alpha * Σ_{u} w_uv · x_t(u) + beta,
               from x_0 = beta; optional final L2 normalization
               (the cugraph convention). alpha must be below the
               reciprocal spectral radius for the fixpoint to exist;
               the fixed-iteration mode is well-defined for any alpha.
- Eigenvector: y = A·x_t ; x_{t+1} = y / ||y||_2, from the L2-unit
               constant vector — classic power iteration on the
               weighted adjacency (converges to the principal
               eigenvector on connected non-bipartite graphs).

Self-loops contribute once per direction of the symmetrized table (a
loop row (v, v, w) adds w·x(v) into v's own sum), matching what the
plain relational A·x product computes — and what the oracle SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.algos.community import superstep_conf
from graft.checkpoint import drop_spill, truncate
from graft.graph import Graph


def _ax(edges: DataFrame, x: DataFrame, out_col: str) -> DataFrame:
    """One A·x product: (id, out_col) with rows only for vertices that
    receive any inflow (callers left-join against the vertex table)."""
    return (
        edges.join(x.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum(F.col("x") * F.col("weight")).alias(out_col))
    )


def katz_centrality(
    graph: Graph,
    alpha: float = 0.1,
    beta: float = 1.0,
    fixed_iterations: int | None = None,
    max_iter: int = 100,
    tol: float = 1e-6,
    normalized: bool = True,
) -> DataFrame:
    """Returns ``(id, katz double)``.

    ``fixed_iterations`` runs exactly that many probe-free supersteps
    (the oracle-certified mode); otherwise the loop stops when the L1
    delta drops below ``tol`` (requires alpha < 1/λ_max to converge).
    ``normalized`` divides the final vector by its L2 norm (cugraph's
    output convention).
    """
    spark = graph.edges.sparkSession
    verts = graph.vertices_cached()
    x = truncate(verts.select("id", F.lit(float(beta)).alias("x")))
    iters = fixed_iterations if fixed_iterations is not None else max_iter
    probe = fixed_iterations is None
    with superstep_conf(spark, graph.edges.count()):
        for _ in range(iters):
            new_x = truncate(
                verts.join(_ax(graph.edges, x, "ax"), "id", "left").select(
                    "id",
                    (
                        F.lit(alpha) * F.coalesce("ax", F.lit(0.0))
                        + F.lit(float(beta))
                    ).alias("x"),
                )
            )
            if probe:
                delta = (
                    new_x.join(x.withColumnRenamed("x", "old"), "id")
                    .agg(F.sum(F.abs(F.col("x") - F.col("old"))))
                    .first()[0]
                )
            drop_spill(x)
            x = new_x
            if probe and delta < tol:
                break
    if normalized:
        norm = x.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).first()[0]
        if norm and norm > 0:
            x = x.select("id", (F.col("x") / F.lit(norm)).alias("x"))
    return x.select("id", F.col("x").alias("katz"))


def hits(
    graph: Graph,
    fixed_iterations: int | None = None,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> DataFrame:
    """HITS hubs & authorities on a DIRECTED graph (cugraph.hits parity).

    Returns ``(id, hub double, authority double)``. Per iteration, from
    an L2-unit constant hub vector:

        a'(v) = Σ_{u→v} w_uv · h(u);   a = a' / ||a'||₂
        h'(u) = Σ_{u→v} w_uv · a(v);   h = h' / ||h'||₂

    ``graph.edges`` is taken as directed (pass raw asymmetric input via
    ``Graph(edges, symmetric=False)``); on a symmetrized table hub and
    authority coincide with eigenvector centrality. ``fixed_iterations``
    is the probe-free, SQL-oracle-certified mode; otherwise the loop
    stops when the hub vector's L1 delta drops below ``tol``. Plan per
    half-step: the small score table joins into the big edge scan (the
    edge table is never shuffled), one groupBy-sum, one scalar norm agg
    — identical shape to the PageRank superstep.
    """
    spark = graph.edges.sparkSession
    verts = graph.vertices_cached()
    n = graph.num_vertices()
    if n == 0:
        return spark.createDataFrame(
            [], "id long, hub double, authority double"
        )

    def _norm(df: DataFrame) -> DataFrame:
        nrm = df.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).first()[0]
        if not nrm or nrm == 0.0:
            return df
        return df.select("id", (F.col("x") / F.lit(nrm)).alias("x"))

    def _atx(x: DataFrame) -> DataFrame:
        """One Aᵀ·x product: h flows along edge direction into dst."""
        return (
            graph.edges.join(x.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("x") * F.col("weight")).alias("ax"))
        )

    h = truncate(verts.select("id", F.lit(1.0 / float(n) ** 0.5).alias("x")))
    a = h
    iters = fixed_iterations if fixed_iterations is not None else max_iter
    probe = fixed_iterations is None
    with superstep_conf(spark, graph.edges.count()):
        for _ in range(iters):
            new_a = truncate(_norm(
                verts.join(_ax(graph.edges, h, "ax"), "id", "left")
                .select("id", F.coalesce("ax", F.lit(0.0)).alias("x"))
            ))
            new_h = truncate(_norm(
                verts.join(_atx(new_a), "id", "left")
                .select("id", F.coalesce("ax", F.lit(0.0)).alias("x"))
            ))
            if probe:
                delta = (
                    new_h.join(h.withColumnRenamed("x", "old"), "id")
                    .agg(F.sum(F.abs(F.col("x") - F.col("old"))))
                    .first()[0]
                )
            drop_spill(h)
            drop_spill(a)
            h, a = new_h, new_a
            if probe and delta < tol:
                break
    return h.withColumnRenamed("x", "hub").join(
        a.select("id", F.col("x").alias("authority")), "id"
    ).select("id", "hub", "authority")


def eigenvector_centrality(
    graph: Graph,
    fixed_iterations: int | None = None,
    max_iter: int = 100,
    tol: float = 1e-6,
) -> DataFrame:
    """Returns ``(id, eigenvector double)`` — the L2-normalized power
    iteration on the weighted adjacency. ``fixed_iterations`` is the
    probe-free oracle-certified mode; otherwise stops when the L1 delta
    drops below ``tol``."""
    spark = graph.edges.sparkSession
    verts = graph.vertices_cached()
    n = graph.num_vertices()
    if n == 0:
        return spark.createDataFrame([], "id long, eigenvector double")
    x = truncate(
        verts.select("id", F.lit(1.0 / float(n) ** 0.5).alias("x"))
    )
    iters = fixed_iterations if fixed_iterations is not None else max_iter
    probe = fixed_iterations is None
    with superstep_conf(spark, graph.edges.count()):
        for _ in range(iters):
            y = verts.join(_ax(graph.edges, x, "ax"), "id", "left").select(
                "id", F.coalesce("ax", F.lit(0.0)).alias("x")
            )
            y = truncate(y)
            norm = y.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).first()[0]
            if not norm or norm == 0.0:
                # zero vector (no edges): centrality degenerates to 0
                drop_spill(x)
                x = y
                break
            new_x = truncate(
                y.select("id", (F.col("x") / F.lit(norm)).alias("x"))
            )
            if probe:
                delta = (
                    new_x.join(x.withColumnRenamed("x", "old"), "id")
                    .agg(F.sum(F.abs(F.col("x") - F.col("old"))))
                    .first()[0]
                )
            drop_spill(x)
            drop_spill(y)
            x = new_x
            if probe and delta < tol:
                break
    return x.select("id", F.col("x").alias("eigenvector"))


def degree_centrality(graph: Graph) -> DataFrame:
    """Returns ``(id, degree_centrality double)`` — unweighted degree
    over (n-1), the cugraph/networkx ``degree_centrality`` convention
    (self-loops excluded from the count; a single-vertex graph scores
    0). One distinct + one keyed count over the symmetrized table —
    the cheapest member of the centrality family, and the baseline the
    others are compared against."""
    n = graph.num_vertices()
    denom = float(n - 1) if n > 1 else 1.0
    deg = (
        graph.without_self_loops()
        .select("src", "dst")
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        graph.vertices()
        .join(deg, "id", "left")
        .select(
            "id",
            F.round(
                F.coalesce("d", F.lit(0)) / F.lit(denom), 6
            ).alias("degree_centrality"),
        )
    )
