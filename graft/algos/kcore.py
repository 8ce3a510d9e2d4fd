"""k-core extraction and full core decomposition (degree peeling).

The cugraph API family ships ``cugraph.k_core`` AND ``cugraph.core_number``;
the engine carries both:

- :func:`k_core` — membership of the maximal subgraph where every vertex
  has degree ≥ k, by repeatedly deleting under-degree vertices until a
  fixpoint. Each round is one degree aggregation + one semi-join filter
  over the surviving edge set.

- :func:`core_number` — the per-vertex core index for EVERY vertex in one
  pass (so a core-decomposition caller never re-runs peeling per k).
  Below the sequential threshold it runs the exact Batagelj–Zaversnik
  O(E) bin-sort peel as ONE executor task (same tail pattern as
  graft.algos.seq_tail); above it, the distributed path iterates the
  neighborhood h-index operator c'(v) = min(c(v), H({c(u): u ∈ N(v)}))
  from c0 = degree, whose fixpoint is exactly the core number
  (Lü et al., "The H-index of a network node and its relation to degree
  and coreness", Nat. Commun. 2016). Each round is one join + one
  per-vertex window + one groupBy — O(few) rounds on link graphs, and
  the iteration is monotone non-increasing so the changed-count probe
  terminates it exactly.

Training-data relevance: the k-core is the standard "dense interaction
backbone" filter (drop leaf actors / one-off conversations before
community detection or embedding training); core numbers give the whole
peeling profile in one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graft.algos.community import superstep_conf
from graft.checkpoint import drop_spill, truncate
from graft.graph import Graph


def k_core(graph: Graph, k: int, max_iter: int | None = None) -> DataFrame:
    """Returns ``(id,)`` — the vertices of the k-core (possibly empty).

    Peeling is monotone (vertices only ever leave), so the loop runs to
    the first round that deletes nothing — guaranteed to terminate, so
    by default there is NO round cap (a cap would silently return an
    under-peeled superset on chain-like graphs whose peeling depth
    exceeds it). Passing ``max_iter`` raises RuntimeError if the
    fixpoint is not reached within the cap, never returning a partial
    result.
    """
    edges = truncate(
        graph.without_self_loops().select("src", "dst").distinct()
    )
    with superstep_conf(graph.edges.sparkSession, graph.edges.count()):
        it = 0
        while True:
            it += 1
            if max_iter is not None and it > max_iter:
                raise RuntimeError(
                    f"k_core(k={k}) did not reach its peeling fixpoint "
                    f"within max_iter={max_iter} rounds"
                )
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


def _sequential_core_number(graph: Graph) -> DataFrame:
    """Exact Batagelj–Zaversnik bin-sort peeling over the whole graph as
    ONE cogrouped ``applyInPandas`` task (same pattern and rationale as
    graft.algos.seq_tail: below the threshold every distributed round
    costs more in job latency than the entire remaining computation)."""
    import numpy as np
    import pandas as pd

    def fn(vpdf: pd.DataFrame, epdf: pd.DataFrame) -> pd.DataFrame:
        if vpdf.empty:
            return pd.DataFrame(
                {
                    "id": vpdf["id"].iloc[:0],
                    "core": pd.Series([], dtype="int64"),
                }
            )
        ids = np.sort(vpdf["id"].to_numpy())
        n = len(ids)
        pos_of = pd.Series(np.arange(n), index=ids)
        src = pos_of[epdf["src"].to_numpy()].to_numpy()
        dst = pos_of[epdf["dst"].to_numpy()].to_numpy()
        # CSR over the symmetric distinct non-loop edge set
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        deg = np.bincount(src, minlength=n)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(deg, out=indptr[1:])
        core = deg.astype(np.int64).copy()
        md = int(deg.max()) if n else 0
        # bin sort: vert sorted by degree, pos inverse, bin_start per degree
        vert = np.argsort(deg, kind="stable")
        pos = np.empty(n, dtype=np.int64)
        pos[vert] = np.arange(n)
        bin_start = np.zeros(md + 2, dtype=np.int64)
        np.cumsum(np.bincount(deg, minlength=md + 1), out=bin_start[1:])
        bin_start = bin_start[:-1].copy()
        for i in range(n):
            v = vert[i]
            cv = core[v]
            for u in dst[indptr[v]:indptr[v + 1]]:
                cu = core[u]
                if cu > cv:
                    # swap u with the first vertex of its bin, shrink bin
                    pu = pos[u]
                    pw = bin_start[cu]
                    w = vert[pw]
                    if u != w:
                        vert[pu], vert[pw] = w, u
                        pos[u], pos[w] = pw, pu
                    bin_start[cu] += 1
                    core[u] = cu - 1
        return pd.DataFrame({"id": ids, "core": core})

    nodes = graph.vertices().select(F.lit(0).alias("_g"), "id")
    id_type = nodes.schema["id"].dataType.simpleString()
    edges = graph.without_self_loops().select("src", "dst").distinct().select(
        F.lit(0).alias("_g"), "src", "dst"
    )
    return (
        nodes.groupBy("_g")
        .cogroup(edges.groupBy("_g"))
        .applyInPandas(fn, schema=f"id {id_type}, core long")
    )


def core_number(
    graph: Graph, sequential_threshold: int = 1_000_000
) -> DataFrame:
    """Returns ``(id, core long)`` for ALL vertices (cugraph.core_number
    parity; self-loops excluded from degrees, isolated vertices core 0).

    Graphs at most ``sequential_threshold`` symmetrized edge rows run
    the exact BZ peel as one task (0 forces the distributed path); above
    it the h-index fixpoint iteration runs distributed — monotone
    non-increasing from the degree, so the changed-count probe is an
    exact stopping rule.
    """
    if (
        sequential_threshold
        and graph.edges.count() <= sequential_threshold
    ):
        return _sequential_core_number(graph)

    adj = truncate(graph.without_self_loops().select("src", "dst").distinct())
    verts = graph.vertices()
    deg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("core")
    )
    cores = truncate(
        verts.join(deg, "id", "left").select(
            "id", F.coalesce("core", F.lit(0)).cast("long").alias("core")
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("c"), "dst")
    with superstep_conf(adj.sparkSession, adj.count()):
        while True:
            nbr = adj.join(
                cores.withColumnRenamed("id", "dst"), "dst"
            ).select("src", "dst", F.col("core").alias("c"))
            # neighborhood h-index: max over rank r of min(c_r, r) with
            # neighbor cores sorted descending
            h = (
                nbr.withColumn("r", F.row_number().over(w))
                .select("src", F.least(F.col("c"), F.col("r")).alias("m"))
                .groupBy(F.col("src").alias("id"))
                .agg(F.max("m").alias("h"))
            )
            new_cores = truncate(
                cores.join(h, "id", "left").select(
                    "id",
                    F.least(
                        "core", F.coalesce("h", F.lit(0))
                    ).cast("long").alias("core"),
                )
            )
            changed = (
                new_cores.join(
                    cores.withColumnRenamed("core", "old"), "id"
                )
                .where(F.col("core") != F.col("old"))
                .limit(1)
                .count()
            )
            drop_spill(cores)
            cores = new_cores
            if changed == 0:
                break
    return cores
