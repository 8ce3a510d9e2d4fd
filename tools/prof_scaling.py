"""Profile per-superstep PageRank cost across core counts and strategies.

Usage: python tools/prof_scaling.py [cores ...]   (default: 4 32)

For each core count, runs 5-superstep fixed PageRank on the 8M-edge
power-law graph under several loop strategies and prints per-superstep
wall times, isolating the fixed (non-compute) cost that breaks the
N->4N scaling efficiency.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import synth_powerlaw_edges  # noqa: E402
from graft.algos.pagerank import pagerank  # noqa: E402
from graft.graph import Graph  # noqa: E402
from graft.session import get_spark  # noqa: E402

N_EDGES = 8_000_000
ITERS = 5


def run(cores: int, strategy: str) -> float:
    extra = {"spark.sql.shuffle.partitions": str(max(cores * 2, 8))}
    if strategy == "chain_noaqe":
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(f"prof-{cores}-{strategy}", master=f"local[{cores}]",
                      extra_conf=extra)
    pdf = synth_powerlaw_edges(n_edges=N_EDGES, n_vertices=200_000)
    g = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
    g.edges.count()
    pagerank(g, fixed_iterations=1).count()  # warm
    t0 = time.perf_counter()
    if strategy == "truncate1":
        pagerank(g, fixed_iterations=ITERS).count()
    elif strategy in ("chain", "chain_noaqe"):
        pagerank(g, fixed_iterations=ITERS, truncate_every=ITERS).count()
    elif strategy == "copart":
        pagerank(g, fixed_iterations=ITERS, truncate_every=ITERS,
                 join_strategy="copartition").count()
    dt = time.perf_counter() - t0
    g.unpersist()
    spark.stop()
    return round(dt, 2)


def main() -> None:
    cores_list = [int(c) for c in sys.argv[1:]] or [4, 32]
    out = {}
    for strategy in ["truncate1", "chain", "chain_noaqe", "copart"]:
        for cores in cores_list:
            key = f"{strategy}@local[{cores}]"
            try:
                out[key] = run(cores, strategy)
            except Exception as e:  # noqa: BLE001
                out[key] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[prof] {key}: {out[key]}", file=sys.stderr, flush=True)
            time.sleep(3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
