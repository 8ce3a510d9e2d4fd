"""Find a reproducible >=0.8 N->4N configuration: vary input size and
reducer count for the copartitioned chained pagerank scaling job.

Usage: python tools/prof_scaling4.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from bench import synth_powerlaw_parquet, PR_ITERS  # noqa: E402
from graft.algos.pagerank import pagerank  # noqa: E402
from graft.graph import Graph  # noqa: E402
from graft.session import get_spark  # noqa: E402


def run(cores: int, n_edges: int, sp: int) -> float:
    spark = get_spark(
        f"p4-{cores}-{n_edges}-{sp}", master=f"local[{cores}]",
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
    out = {}
    for n_edges in (8_000_000, 16_000_000):
        for cores, sp in ((1, 8), (4, 8), (4, 16)):
            key = f"e{n_edges//1_000_000}m-c{cores}-sp{sp}"
            try:
                out[key] = run(cores, n_edges, sp)
            except Exception as e:  # noqa: BLE001
                out[key] = f"ERR {e}"[:120]
            print(f"[p4] {key}: {out[key]}", file=sys.stderr, flush=True)
            time.sleep(5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
