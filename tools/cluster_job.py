"""spark-submit job for the cluster-mode N vs 4N scaling comparison.

Launched by tools/cluster_scaling.py as::

    spark-submit --master local-cluster[N,4,4096] --py-files graft.zip \
        tools/cluster_job.py --edges <parquet> --reps 2

Runs three named jobs over the given edge table and prints ONE JSON
line of marginal throughputs (differenced protocols identical to
bench.py's scaling cells, so the numbers cross-check the local[N]
records):

- Louvain BSP local-moving sweep (shuffle-bound): per-index minima of
  sweeps 2..3 across reps;
- copartition PageRank superstep (DRAM-bound): (t6 - t1)/5;
- source-parallel Brandes (CPU-bound numpy kernels over broadcast edge
  arrays): marginal per added source, (t_hi - t_lo)/(k_hi - k_lo) with
  both k values multiples of every executor-core count used, so the
  round-robin source slices stay balanced at both cluster sizes.

The ``graft`` package reaches the executors only via --py-files; the
driver resolves it from the repo checkout (same shim as graft/cli.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from graft.algos.betweenness import betweenness_centrality  # noqa: E402
from graft.algos.community import init_level, move_nodes  # noqa: E402
from graft.algos.pagerank import pagerank  # noqa: E402
from graft.graph import Graph  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("graft-cluster-scaling").getOrCreate()
    g = Graph.from_undirected(spark.read.parquet(args.edges)).cache()
    n = g.edges.count()
    m = g.total_edge_weight()

    def sweep_durs() -> list[float]:
        marks: list[float] = []
        move_nodes(
            init_level(g.edges), objective="modularity", m=m,
            max_sweeps=3, seed=1234,
            on_sweep=lambda it, nm, v: marks.append(time.perf_counter()),
        )
        return [
            round(marks[i] - marks[i - 1], 3) for i in range(1, len(marks))
        ]

    sweep_durs()  # warm-up
    reps = [sweep_durs() for _ in range(args.reps)]
    n_idx = min(len(r) for r in reps)
    per_idx = [min(r[i] for r in reps) for i in range(n_idx)]
    sweep_marginal = sum(per_idx) / len(per_idx)

    def pr(iters: int) -> float:
        t0 = time.perf_counter()
        pagerank(
            g, fixed_iterations=iters, truncate_every=iters,
            join_strategy="copartition", sequential_threshold=0,
        ).count()
        return round(time.perf_counter() - t0, 3)

    def pair_min_marginal(wall_pairs: list, span: float) -> float:
        # (min hi − min lo)/span over interleaved (lo, hi) pairs —
        # same consistent statistic as bench.py._pair_min_marginal
        # (per-pair differencing is not consistent: a burst on one
        # pair's lo run drives that pair's difference arbitrarily low
        # and a min keeps it); -1.0 = no usable estimate
        lo = min(p[0] for p in wall_pairs)
        hi = min(p[1] for p in wall_pairs)
        marginal = (hi - lo) / span
        return marginal if marginal > 0 else -1.0

    pr(1)  # warm-up
    pr_pairs = [(pr(1), pr(6)) for _ in range(args.reps)]
    pr_marginal = pair_min_marginal(pr_pairs, 5.0)

    def bt(k: int) -> float:
        t0 = time.perf_counter()
        betweenness_centrality(g, k=k, seed=7).count()
        return round(time.perf_counter() - t0, 3)

    k_lo, k_hi = 16, 80  # both divisible by 4 and 16 executor cores
    bt(k_lo)  # warm-up
    bt_pairs = [(bt(k_lo), bt(k_hi)) for _ in range(args.reps)]
    br_marginal = pair_min_marginal(bt_pairs, float(k_hi - k_lo))

    print(json.dumps({
        "sym_edge_rows": n,
        "sweep": {
            "durations_per_rep": reps,
            "marginal_sec_per_sweep": round(sweep_marginal, 3),
            "rows_per_sec": round(n / sweep_marginal, 1),
        },
        "pagerank": {
            "wall_sec_pairs": pr_pairs,
            "marginal_sec_per_superstep": round(pr_marginal, 3),
            "rows_per_sec": (
                round(n / pr_marginal, 1) if pr_marginal > 0 else None
            ),
        },
        "brandes": {
            "k_lo": k_lo,
            "k_hi": k_hi,
            "wall_sec_pairs": bt_pairs,
            "marginal_sec_per_source": round(br_marginal, 5),
            "sources_per_sec": (
                round(1.0 / br_marginal, 3) if br_marginal > 0 else None
            ),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
