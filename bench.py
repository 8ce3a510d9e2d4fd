"""Benchmark harness (driver contract + north-rule scaling evidence).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "scaling": {...}}

Scaling evidence (BASELINE.json: "throughput scaling efficiency >= 0.8
from N to 4N executors"): the identical PageRank superstep job runs on
a deterministic synthetic power-law graph at ``local[N]`` and
``local[4N]`` (same input, same seed, fresh SparkSession each), and the
JSON reports edges-processed/sec at both plus the efficiency
throughput_4N / (4 * throughput_N). Set SPARK_GRAFT_SCALE_N to change N
(default 1 → compares local[1] vs local[4]; these sizes leave shared
memory-bandwidth headroom on the 32-core sandbox host, which is the
honest per-node picture for a multi-node cluster where every node
brings its own bandwidth).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from graft.algos.components import connected_components  # noqa: E402
from graft.algos.leiden import leiden  # noqa: E402
from graft.algos.louvain import louvain  # noqa: E402
from graft.algos.pagerank import pagerank  # noqa: E402
from graft.algos.triangles import triangle_count  # noqa: E402
from graft.graph import Graph  # noqa: E402
from graft.io import (  # noqa: E402
    actor_edges_to_long,
    events_to_transcripts,
    read_table,
    transcripts_to_edges,
)
from graft.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
PR_ITERS = 5


def synth_powerlaw_edges(n_edges: int = 2_000_000, n_vertices: int = 200_000,
                         seed: int = 42):
    """Deterministic skewed (Zipf-ish) edge list as a pandas DataFrame —
    the 10^12-turn-scale stand-in: heavy-tailed actor degrees."""
    rng = np.random.default_rng(seed)
    # Zipf-like endpoint sampling: x = floor(n * u^3) concentrates mass
    # on low ids (hubs) with a long tail
    u = rng.random(n_edges) ** 3.0
    v = rng.random(n_edges)
    src = (u * n_vertices).astype(np.int64)
    dst = (v * n_vertices).astype(np.int64)
    keep = src != dst
    import pandas as pd

    return pd.DataFrame(
        {"src": src[keep], "dst": dst[keep],
         "weight": np.ones(int(keep.sum()))}
    )


def _actor_graph(spark: SparkSession, sf_dir: str):
    t = events_to_transcripts(read_table(spark, sf_dir, "events"))
    e, _ = actor_edges_to_long(transcripts_to_edges(t))
    return Graph.from_undirected(e)


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _timed(fn, name: str = ""):
    t0 = time.perf_counter()
    fn()
    dt = round(time.perf_counter() - t0, 3)
    if name:
        _log(f"{name}: {dt}s")
    return dt


def run_queries(spark: SparkSession) -> dict[str, float]:
    out: dict[str, float] = {}

    out["edge_derivation"] = _timed(
        lambda: transcripts_to_edges(
            events_to_transcripts(read_table(spark, SF_DIR, "events"))
        ).count(),
        "edge_derivation",
    )
    g = _actor_graph(spark, SF_DIR).cache()
    g.edges.count()
    out["pagerank_10iter"] = _timed(
        lambda: pagerank(g, fixed_iterations=10).count(), "pagerank_10iter"
    )
    out["connected_components"] = _timed(
        lambda: connected_components(g).count(), "connected_components"
    )
    out["triangle_count"] = _timed(lambda: triangle_count(g), "triangle_count")
    out["louvain"] = _timed(lambda: louvain(g, seed=1234).count(), "louvain")
    out["leiden"] = _timed(lambda: leiden(g, gamma=0.05, seed=1234).count(), "leiden")
    g.unpersist()
    return out


def powerlaw_throughput() -> dict[str, float]:
    """Edges/sec/superstep on a 2M-edge synthetic power-law graph, in a
    FRESH session (thousands of community-detection stages leave the
    previous session's listener queues backed up, which distorts
    per-job timing)."""
    spark = get_spark("graft-bench-powerlaw", master=f"local[{CPUS}]")
    pdf = synth_powerlaw_edges()
    big = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
    n_edges = big.edges.count()
    pagerank(big, fixed_iterations=1).count()  # warm
    t = _timed(lambda: pagerank(big, fixed_iterations=PR_ITERS).count(),
               "pagerank_powerlaw")
    big.unpersist()
    spark.stop()
    return {
        "pagerank_powerlaw_2m_edges": t,
        "_powerlaw_edges_per_sec_per_superstep": round(
            n_edges * PR_ITERS / t, 1
        ),
    }


def scaling_run(n_cores: int, n_edges_in: int = 8_000_000) -> dict:
    """Identical PageRank job at a given parallelism; fresh session.

    8M input edges (~16M symmetrized rows): large enough that executor
    compute dominates the driver-side fixed cost (analysis + one
    truncate ≈ 6s), which is what a real cluster scaling run looks like
    — the driver does not grow with the cluster."""
    spark = get_spark(
        f"graft-bench-{n_cores}",
        master=f"local[{n_cores}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(max(n_cores * 2, 8)),
        },
    )
    pdf = synth_powerlaw_edges(n_edges=n_edges_in, n_vertices=200_000)
    g = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
    n_edges = g.edges.count()
    pagerank(g, fixed_iterations=1).count()  # warm JIT + cache
    t = _timed(
        lambda: pagerank(g, fixed_iterations=PR_ITERS).count(),
        f"scaling local[{n_cores}]",
    )
    g.unpersist()
    spark.stop()
    return {
        "cores": n_cores,
        "seconds": t,
        "sym_edge_rows": n_edges,
        "edges_per_sec_per_superstep": round(n_edges * PR_ITERS / t, 1),
    }


def main() -> None:
    spark = get_spark("graft-bench", master=f"local[{CPUS}]")
    t0 = time.perf_counter()
    queries = run_queries(spark)
    total = round(time.perf_counter() - t0, 3)
    spark.stop()
    time.sleep(5)  # let the previous JVM release cores/page cache

    queries.update(powerlaw_throughput())
    time.sleep(5)
    lo = scaling_run(SCALE_N)
    time.sleep(5)
    hi = scaling_run(SCALE_N * 4)
    eff = round(
        hi["edges_per_sec_per_superstep"]
        / (4.0 * lo["edges_per_sec_per_superstep"]),
        3,
    )
    result = {
        "metric": "headline query wall time at sf (lower is better)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "scaling": {
            "job": f"pagerank fixed {PR_ITERS} supersteps, synthetic "
                   f"power-law graph ({lo['sym_edge_rows']} symmetrized "
                   "edge rows, same input + seed, fresh session per size)",
            "low": lo,
            "high": hi,
            "efficiency_n_to_4n": eff,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
