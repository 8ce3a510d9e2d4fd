"""Sweep the N->4N scaling job across input sizes / core counts /
reducer counts to find where the copartitioned PageRank superstep is
compute-bound on this host (the regime bench.py's official scaling
evidence runs in).

Usage: python tools/profile_scaling.py [n_edges_millions ...]
       (default: 8 16; each size runs cores x reducers combos)

Prints one JSON object {config: seconds}. Fresh SparkSession per
config; one Spark JVM at a time (sandbox constraint).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PR_ITERS, synth_powerlaw_parquet  # noqa: E402
from graft.algos.pagerank import pagerank  # noqa: E402
from graft.graph import Graph  # noqa: E402
from graft.session import get_spark  # noqa: E402


def run(cores: int, n_edges: int, sp: int) -> float:
    spark = get_spark(
        f"prof-{cores}-{n_edges}-{sp}", master=f"local[{cores}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(sp),
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    g = Graph.from_undirected(
        spark.read.parquet(synth_powerlaw_parquet(n_edges))
    ).cache()
    g.edges.count()
    g.transition(copartitioned=True)
    pagerank(g, fixed_iterations=1, join_strategy="copartition").count()
    t0 = time.perf_counter()
    pagerank(g, fixed_iterations=PR_ITERS, join_strategy="copartition",
             truncate_every=PR_ITERS).count()
    dt = time.perf_counter() - t0
    g.unpersist()
    spark.stop()
    return round(dt, 2)


def main() -> None:
    sizes = [int(a) * 1_000_000 for a in sys.argv[1:]] or [8_000_000,
                                                          16_000_000]
    out = {}
    for n_edges in sizes:
        for cores, sp in ((1, 8), (4, 8), (4, 16), (16, 32), (32, 32)):
            key = f"e{n_edges // 1_000_000}m-c{cores}-sp{sp}"
            try:
                out[key] = run(cores, n_edges, sp)
            except Exception as e:  # noqa: BLE001
                out[key] = f"ERR {e}"[:120]
            print(f"[profile] {key}: {out[key]}", file=sys.stderr, flush=True)
            time.sleep(5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
