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


PLANS = {
    "hyper_anf_3hops_2m_edges": plan_hyper_anf,
    "neighbor_sample_2hop_2m_edges": plan_neighbor_sample,
    "wl_2rounds_2m_edges": plan_wl,
    "bsp_sweep_select_2m_edges": plan_sweep,
    "edge_derivation": plan_edge_derivation,
}


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(PLANS)
    spark = get_spark("graft-plans-r06", master=f"local[{bench.CPUS}]")
    big = Graph.from_undirected(
        spark.read.parquet(bench.synth_powerlaw_parquet(2_000_000))
    ).cache()
    big.edges.count()
    for name in names:
        dump(name, tag, PLANS[name](spark, big))
    spark.stop()


if __name__ == "__main__":
    main()
