"""Refinement scale guard (VERDICT r1 'wrong' #4): oversized communities
are split into hash sub-buckets so one community never becomes one
unbounded Arrow batch; communities under the cap are bit-identical to
the uncapped path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graft.algos.community import init_level, Level
from graft.algos.leiden import refine_partition
from graft import fixtures


def _ring_edges(n: int) -> list[tuple[int, int, float]]:
    return [(i, (i + 1) % n, 1.0) for i in range(n)]


def test_giant_community_is_split_and_completes(spark):
    """One 50k-member community refined with a 5k cap: ~10 bounded
    batches instead of one giant one; output is a complete, valid
    partition (every vertex labeled once with a member id)."""
    n = 50_000
    g_edges = fixtures.edges_df(spark, _ring_edges(n))
    level = init_level(
        g_edges.unionAll(
            g_edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    )
    # put every vertex in ONE community
    level = Level(
        edges=level.edges,
        vertices=level.vertices.withColumn("community", F.lit(0)),
    )
    refined = refine_partition(
        level, gamma=0.01, seed=7, max_community_size=5_000
    ).cache()
    assert refined.count() == n
    assert refined.select("id").distinct().count() == n
    # labels are founding-member ids
    members = level.vertices.select(F.col("id").alias("mid"))
    bad = refined.join(
        members, refined.refined == members.mid, "left_anti"
    ).count()
    assert bad == 0
    refined.unpersist()


def test_cap_is_noop_for_small_communities(spark):
    """Communities under the cap refine identically with or without it."""
    edges = []
    # 5 cliques of 8, each its own community
    for c in range(5):
        base = c * 8
        for i in range(8):
            for j in range(i + 1, 8):
                edges.append((base + i, base + j, 1.0))
    raw = fixtures.edges_df(spark, edges)
    sym = raw.unionAll(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                   "weight")
    )
    level = init_level(sym)
    level = Level(
        edges=level.edges,
        vertices=level.vertices.withColumn(
            "community", (F.col("id") / 8).cast("long")
        ),
    )
    a = {
        (r["id"], r["refined"])
        for r in refine_partition(
            level, gamma=0.1, seed=3, max_community_size=1_000_000
        ).collect()
    }
    b = {
        (r["id"], r["refined"])
        for r in refine_partition(
            level, gamma=0.1, seed=3, max_community_size=8
        ).collect()
    }
    assert a == b
