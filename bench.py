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
(default 2 → compares local[2] vs local[8]).
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
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
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


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def run_queries(spark: SparkSession) -> dict[str, float]:
    out: dict[str, float] = {}

    out["edge_derivation"] = _timed(
        lambda: transcripts_to_edges(
            events_to_transcripts(read_table(spark, SF_DIR, "events"))
        ).count()
    )
    g = _actor_graph(spark, SF_DIR).cache()
    g.edges.count()
    out["pagerank_10iter"] = _timed(
        lambda: pagerank(g, fixed_iterations=10).count()
    )
    out["connected_components"] = _timed(
        lambda: connected_components(g).count()
    )
    out["triangle_count"] = _timed(lambda: triangle_count(g))
    out["louvain"] = _timed(lambda: louvain(g, seed=1234).count())
    out["leiden"] = _timed(lambda: leiden(g, gamma=0.05, seed=1234).count())
    g.unpersist()

    # synthetic power-law graph: the throughput benchmark (edges/sec)
    pdf = synth_powerlaw_edges()
    raw = spark.createDataFrame(pdf)
    big = Graph.from_undirected(raw).cache()
    n_edges = big.edges.count()
    t = _timed(lambda: pagerank(big, fixed_iterations=PR_ITERS).count())
    out["pagerank_powerlaw_2m_edges"] = t
    out["_powerlaw_edges_per_sec_per_superstep"] = round(
        n_edges * PR_ITERS / t, 1
    )
    big.unpersist()
    return out


def scaling_run(n_cores: int) -> dict:
    """Identical PageRank job at a given parallelism; fresh session."""
    spark = get_spark(
        f"graft-bench-{n_cores}",
        master=f"local[{n_cores}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(n_cores * 2, 8))},
    )
    pdf = synth_powerlaw_edges()
    g = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
    n_edges = g.edges.count()
    pagerank(g, fixed_iterations=1).count()  # warm the JIT + cache
    t = _timed(lambda: pagerank(g, fixed_iterations=PR_ITERS).count())
    g.unpersist()
    spark.stop()
    return {
        "cores": n_cores,
        "seconds": t,
        "edges_per_sec_per_superstep": round(n_edges * PR_ITERS / t, 1),
    }


def main() -> None:
    spark = get_spark("graft-bench", master=f"local[{CPUS}]")
    t0 = time.perf_counter()
    queries = run_queries(spark)
    total = round(time.perf_counter() - t0, 3)
    spark.stop()

    lo = scaling_run(SCALE_N)
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
                   "power-law graph (2M edges, same input + seed)",
            "low": lo,
            "high": hi,
            "efficiency_n_to_4n": eff,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
