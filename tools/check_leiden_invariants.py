"""Empirically probe Leiden output invariants at a given sf: every
vertex labeled once, labels are canonical member ids, and every
community is internally connected (the Leiden guarantee).

Usage: python tools/check_leiden_invariants.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from graft.algos.components import connected_components  # noqa: E402
from graft.graph import Graph  # noqa: E402
from graft.io import actor_edges_to_long  # noqa: E402
from graft.session import get_spark  # noqa: E402
from graft.algos.leiden import leiden  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("leiden-inv", master="local[8]")
    e, _ = actor_edges_to_long(entrymod._edges_uv(spark, sf_dir))
    g = Graph.from_undirected(e).cache()
    labels = leiden(g, gamma=0.05, seed=1234).cache()
    n = labels.count()
    n_ids = labels.select("id").distinct().count()
    print(f"labeled={n} distinct_ids={n_ids}")

    # canonical labels: every community label is a member of itself
    canon_bad = (
        labels.alias("l")
        .join(
            labels.select(
                F.col("id").alias("cid"), F.col("community").alias("cc")
            ),
            (F.col("l.community") == F.col("cid"))
            & (F.col("cc") == F.col("cid")),
            "left_anti",
        )
        .count()
    )
    print(f"non_canonical_labels={canon_bad}")

    # internal connectivity: CC over the community-induced subgraph
    a = labels.select(F.col("id").alias("src"), F.col("community").alias("cs"))
    b = labels.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
    intra = (
        g.edges.join(a, "src").join(b, "dst").where(F.col("cs") == F.col("cd"))
        .select("src", "dst", "weight")
    )
    sub = Graph(edges=intra, symmetric=True)
    comps = connected_components(sub)
    pieces = (
        labels.join(comps, "id", "left")
        .select(
            "community",
            F.coalesce(F.col("comp"), F.col("id")).alias("piece"),
        )
        .groupBy("community")
        .agg(F.countDistinct("piece").alias("np"))
        .where(F.col("np") > 1)
        .count()
    )
    print(f"disconnected_communities={pieces}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
