"""Isolate the local[32] per-superstep overhead: time each phase of the
truncate-per-superstep PageRank loop under config variants.

Usage: python tools/prof_scaling2.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import synth_powerlaw_edges  # noqa: E402
from graft.graph import Graph  # noqa: E402
from graft.session import get_spark  # noqa: E402
from graft import checkpoint  # noqa: E402

N_EDGES = 8_000_000
ITERS = 5


def run(cores: int, label: str, extra: dict, variant: str = "bcast") -> dict:
    spark = get_spark(f"prof2-{label}", master=f"local[{cores}]",
                      extra_conf=extra)
    pdf = synth_powerlaw_edges(n_edges=N_EDGES, n_vertices=200_000)
    g = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
    g.edges.count()
    trans = g.transition()
    n = g.num_vertices()
    ranks = checkpoint.truncate(
        g.vertices().select("id", F.lit(1.0 / n).alias("rank")))
    phases = {"inflow_write": 0.0, "readback": 0.0}
    t_all = time.perf_counter()
    for it in range(ITERS):
        inflow = (
            trans.join(ranks, trans.src == ranks.id)
            .groupBy(trans.dst.alias("id"))
            .agg((F.lit(0.15 / n) + F.lit(0.85) * F.sum(
                F.col("rank") * F.col("p"))).alias("rank"))
        )
        t0 = time.perf_counter()
        new_ranks = checkpoint.truncate(inflow)
        phases["inflow_write"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        new_ranks.count()
        phases["readback"] += time.perf_counter() - t0
        ranks = new_ranks
    total = time.perf_counter() - t_all
    spark.stop()
    return {"total": round(total, 2),
            **{k: round(v, 2) for k, v in phases.items()}}


def main() -> None:
    out = {}
    cases = [
        ("base4", 4, {"spark.sql.shuffle.partitions": "8"}),
        ("base32", 32, {"spark.sql.shuffle.partitions": "64"}),
        ("p8@32", 32, {"spark.sql.shuffle.partitions": "8"}),
        ("nobcast@32", 32, {"spark.sql.shuffle.partitions": "64",
                            "spark.sql.autoBroadcastJoinThreshold": "-1"}),
        ("noaqe@32", 32, {"spark.sql.shuffle.partitions": "64",
                          "spark.sql.adaptive.enabled": "false"}),
        ("smallheap@32", 32, {"spark.sql.shuffle.partitions": "64",
                              "spark.driver.memory": "16g"}),
    ]
    for label, cores, extra in cases:
        try:
            out[label] = run(cores, label, extra)
        except Exception as e:  # noqa: BLE001
            out[label] = f"ERR {type(e).__name__}: {e}"[:200]
        print(f"[prof2] {label}: {out[label]}", file=sys.stderr, flush=True)
        time.sleep(3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
