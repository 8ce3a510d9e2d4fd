"""Capture .explain('formatted') output for the bench query paths the
r6 optimization round touches (plans/r06/<query>_{before,after}.txt).

Usage: python tools/dump_plans_r06.py before|after [names...]

Each dump is the physical plan of the representative DataFrame the cell
executes (for iterative operators: one inner-loop step against
materialized state — the plan whose shape repeats every round).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from graft.graph import Graph  # noqa: E402
from graft.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans", "r06",
)


def _fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def dump(name: str, tag: str, text: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote {path}")


def plan_hyper_anf(spark, big: Graph) -> str:
    """One sketch-union round, mirroring the shape _hll_nf executes
    (r6 after: broadcast sketch table + self-loop adjacency partitioned
    by src, no per-round exchange)."""
    from graft.algos.community import superstep_conf
    from graft.checkpoint import truncate

    with superstep_conf(spark, big.edges.count()) as sp:
        adj = (
            big.without_self_loops().select("src", "dst")
            .unionAll(
                big.vertices().select(
                    F.col("id").alias("src"), F.col("id").alias("dst")
                )
            )
            .repartition(sp, "src")
            .persist()
        )
        adj.count()
        sk = truncate(
            big.vertices()
            .groupBy("id")
            .agg(F.hll_sketch_agg(F.col("id"), F.lit(8)).alias("sk"))
        )
        gathered = (
            adj.join(F.broadcast(sk.withColumnRenamed("id", "dst")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.hll_union_agg("sk").alias("sk"))
        )
        out = _fmt(gathered)
        adj.unpersist()
    return out


def plan_neighbor_sample(spark, big: Graph) -> str:
    """Full lazy plan of the 2-hop sample: truncate() materializes
    eagerly inside the operator, so it is patched to identity for the
    dump — the printed tree is the real computation the cell runs."""
    import graft.algos.sampling as sampling

    saved = sampling.truncate
    sampling.truncate = lambda df: df
    try:
        from graft.algos.sampling import neighbor_sample

        return _fmt(neighbor_sample(big, [10, 5], seed=1, max_degree=64))
    finally:
        sampling.truncate = saved


def plan_wl(spark, big: Graph) -> str:
    """Full lazy 2-round plan (truncate patched to identity, as above)."""
    import graft.algos.wl as wl

    saved = wl.truncate
    wl.truncate = lambda df: df
    try:
        return _fmt(wl.wl_colors(big, rounds=2))
    finally:
        wl.truncate = saved


def plan_sweep(spark, big: Graph) -> str:
    """One BSP local-moving sweep's move-select plan against
    materialized vertex state (the plan that repeats per sweep)."""
    from graft.algos.community import (
        _select_moves,
        community_aggregates,
        gather_neighbor_comm_weights,
        init_level,
        superstep_conf,
    )
    from graft.checkpoint import truncate

    with superstep_conf(spark, big.edges.count()) as sp:
        edges = big.edges.repartition(sp, "src").persist()
        edges.count()
        level = init_level(edges)
        verts = truncate(level.vertices)
        gather = gather_neighbor_comm_weights(edges, verts)
        comm_agg = community_aggregates(verts)
        moves = _select_moves(
            verts, gather, comm_agg, "modularity", 1.0,
            big.total_edge_weight(),
        )
        out = _fmt(moves)
        edges.unpersist()
    return out


def plan_edge_derivation(spark, big: Graph) -> str:
    from graft.io import events_to_transcripts, read_table, transcripts_to_edges

    t = transcripts_to_edges(
        events_to_transcripts(read_table(spark, bench.SF_DIR, "events"))
    )
    return _fmt(t)


def plan_brandes_adjacency(spark, big: Graph, tag: str) -> str:
    """The per-call simple-adjacency build the Brandes/WL family pays.

    before (round-start code shape, betweenness.py@bfdc2a8+2: every
    betweenness / edge-betweenness / wl_colors call re-ran this):
    distinct over the 4M-row symmetrized table — HashAggregate +
    Exchange + HashAggregate + spill write PER CALL.

    after: the r6 `Graph.simple_adjacency()` memoized leaf — the build
    runs once per Graph; every subsequent caller's plan starts from the
    stats-true parquet scan shown here (no distinct, no Exchange).
    """
    if tag == "before":
        return (
            "-- per-call adjacency build (repeated by every Brandes/WL"
            " call at round start)\n"
            + _fmt(big.without_self_loops().select("src", "dst").distinct())
        )
    adj, n = big.simple_adjacency()  # first call materializes the leaf
    return (
        "-- adjacency as every caller after the first now sees it"
        f" (memoized leaf, {n} rows)\n" + _fmt(adj.select("src", "dst"))
    )


def plan_leiden_tail_shuttle(spark, big: Graph, tag: str) -> str:
    """The one-task cogroup that ships a level graph into the
    sequential tail kernel (run_tail_distributed).

    before (round-start shape): the FULL symmetrized edge table flows
    into the single-task cogroup exchange + Arrow batch.

    after: only the canonical ``src <= dst`` half is shipped (the
    kernel's _half_edges discards mirrored rows) — the Filter under the
    edges side of FlatMapCoGroupsInPandas halves the shuffle and batch.
    """
    import graft.algos.seq_tail as st

    level_edges = big.edges
    level_vertices = (
        big.vertices()
        .join(
            big.strength().withColumnRenamed("id", "_sid"),
            F.col("id") == F.col("_sid"),
        )
        .select(
            "id", F.col("id").alias("community"),
            F.lit(1).alias("agg_count"), "k",
        )
    )
    if tag == "before":
        # round-start shape: no src<=dst pre-filter on the edges side
        import pandas as pd

        def fn(nodes_pdf, edges_pdf):
            return pd.DataFrame({"id": [], "community": []})

        nodes = level_vertices.select(
            F.lit(0).alias("_g"), "id", "community", "agg_count", "k"
        )
        edges = level_edges.select(
            F.lit(0).alias("_g"), "src", "dst", "weight"
        )
        df = (
            nodes.groupBy("_g")
            .cogroup(edges.groupBy("_g"))
            .applyInPandas(fn, schema="id long, community long")
        )
        return (
            "-- round-start shape: full symmetrized table into the"
            " one-task cogroup\n" + _fmt(df)
        )
    return (
        "-- r6 shape: only the canonical src <= dst half is shipped\n"
        + _fmt(
            st.run_tail_distributed(
                level_edges, level_vertices, "cpm", 0.05,
                big.total_edge_weight(), 1234,
            )
        )
    )


PLANS = {
    "hyper_anf_3hops_2m_edges": plan_hyper_anf,
    "neighbor_sample_2hop_2m_edges": plan_neighbor_sample,
    "wl_2rounds_2m_edges": plan_wl,
    "bsp_sweep_select_2m_edges": plan_sweep,
    "edge_derivation": plan_edge_derivation,
    "brandes_adjacency_2m_edges": plan_brandes_adjacency,
    "leiden_tail_shuttle_2m_edges": plan_leiden_tail_shuttle,
}

# plans whose builder takes the tag and reconstructs the round-start
# shape itself (added late in the round, after the live before-capture)
TAGGED = {"brandes_adjacency_2m_edges", "leiden_tail_shuttle_2m_edges"}


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(PLANS)
    spark = get_spark("graft-plans-r06", master=f"local[{bench.CPUS}]")
    big = Graph.from_undirected(
        spark.read.parquet(bench.synth_powerlaw_parquet(2_000_000))
    ).cache()
    big.edges.count()
    for name in names:
        fn = PLANS[name]
        text = fn(spark, big, tag) if name in TAGGED else fn(spark, big)
        dump(name, tag, text)
    spark.stop()


if __name__ == "__main__":
    main()
