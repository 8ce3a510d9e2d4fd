"""Weighted PageRank as a DataFrame superstep loop.

Capability X3 in SURVEY.md §2.5: the reference wires cuGraph PageRank
with alpha=0.85, epsilon=1e-6, max_iter=500
(examples/cugraph-cpp-api/leiden_cugraph.cpp:70-91); we implement the
same semantics natively.

Semantics: random walk on the symmetrized weighted edge table. A
vertex's out-probability mass splits proportionally to edge weight
(self-loops allowed, counted once in the out-weight). Dangling vertices
(possible on directed inputs) spread their mass uniformly.

    r_v = (1-alpha)/N + alpha * ( sum_u r_u * w_uv / s_u + D/N )

Scale notes:
- the transition matrix ``(src, dst, p)`` is computed ONCE (one groupBy
  + one join), repartitioned by ``src`` and cached — the per-iteration
  work is a single shuffle of the small rank table plus a partial/final
  hash agg on ``dst``; the big edge table is never re-shuffled.
- convergence probe = one agg action per superstep, the driver↔executor
  analog of the reference's device-side probe
  (csrc/src/leiden_kernel.cu:1054-1066).
- hub skew in the gather (many edges into one dst) is a pre-aggregated
  partial combine: Spark's hash agg does map-side partials, so a hub
  receives one row per shuffle partition, not per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.checkpoint import Checkpointer, truncate
from graft.graph import Graph


def pagerank(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 500,
    fixed_iterations: int | None = None,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """Returns ``(id long, rank double)``; ranks sum to 1.

    Convergence: L1 norm of the rank delta < ``tol`` (the cuGraph
    epsilon convention the reference uses). With ``fixed_iterations``
    the loop runs exactly that many supersteps with NO per-step delta
    probe — the oracle-comparison and benchmark mode (one action total).
    """
    if fixed_iterations is not None:
        max_iter = fixed_iterations
    spark = graph.edges.sparkSession
    verts = graph.vertices().persist()
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    out_w = graph.edges.groupBy("src").agg(F.sum("weight").alias("s"))
    trans = (
        graph.edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("s")).alias("p"))
        .repartition("src")
        .persist()
    )
    trans.count()  # materialize once; iterations reuse the cached shuffle

    start = 0
    ranks = None
    if checkpointer is not None:
        resumed = checkpointer.resume()
        if resumed is not None:
            start, ranks = resumed
            start += 1
    if ranks is None:
        ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    ranks = truncate(ranks)

    # Dangling vertices (no out-edges) cannot exist on a symmetrized
    # undirected graph, so probe ONCE and skip the per-iteration mass
    # aggregation when the set is empty — one action/superstep saved.
    dangling_ids = verts.join(
        out_w, verts.id == out_w.src, "left_anti"
    ).persist()
    has_dangling = dangling_ids.limit(1).count() > 0

    teleport = (1.0 - alpha) / n
    for it in range(start, max_iter):
        contrib = (
            trans.join(ranks, trans.src == ranks.id)
            .select(trans.dst.alias("id"), (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: rank held by vertices with no outgoing edges
        dangling = 0.0
        if has_dangling:
            dangling = (
                ranks.join(dangling_ids, "id", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
        base = teleport + alpha * dangling / n
        new_ranks = verts.join(contrib, "id", "left").select(
            "id",
            (F.lit(base) + F.lit(alpha) * F.coalesce("inflow", F.lit(0.0))).alias(
                "rank"
            ),
        )
        new_ranks = truncate(new_ranks)
        if fixed_iterations is not None:
            ranks = new_ranks
            continue
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .first()[0]
        )
        ranks = new_ranks
        if checkpointer is not None:
            ranks = checkpointer.save(it, ranks, algo="pagerank", l1_delta=delta)
        if delta < tol:
            break

    trans.unpersist()
    dangling_ids.unpersist()
    verts.unpersist()
    return ranks
