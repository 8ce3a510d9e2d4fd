"""Explicit skew handling (north_rule: "salted high-degree vertex
splitting, degree-aware repartitioning, AQE-tuned shuffles").

Defense layers for hub actors (a popular tool/role vertex in a
transcript graph can carry a constant fraction of ALL edges):

1. **AQE skew-join splitting** — on by default (graft.session); handles
   post-shuffle partition imbalance transparently.
2. **Broadcast-side gathers** — the hot gather join (SURVEY.md A2)
   broadcasts the vertex table whenever it fits, so the edge table is
   never shuffled by a skewed key at all.
3. **Salted two-phase aggregation** (this module) — for the 10^12-turn
   regime where the vertex table does NOT fit in a broadcast: the join
   key is salted so a hub's edges spread over ``n_salt`` reducers,
   partially aggregate, then combine. Equivalent results, bounded
   per-reducer load.
4. **Degree-aware repartitioning** — ``repartition_by_degree`` ranges
   vertices by degree so co-grouped work (e.g. per-community
   refinement batches) balances bytes, not keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(edges: DataFrame) -> DataFrame:
    """(id, degree) over a symmetrized edge table."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def detect_hubs(edges: DataFrame, degree_threshold: int) -> DataFrame:
    """Vertices whose degree exceeds the threshold (X5-style skew
    detector, examples/test2.py:22-26). Returns (id, degree)."""
    return degree_table(edges).where(F.col("degree") > degree_threshold)


def salted_gather(
    edges: DataFrame,
    assign: DataFrame,
    n_salt: int = 16,
) -> DataFrame:
    """Skew-proof node→community weight gather (A2 under salting).

    Semantics identical to
    ``graft.algos.community.gather_neighbor_comm_weights``:
    (id, nbr_comm, k_vc) with self-loops excluded. Differences are
    purely physical:

    - the vertex table is replicated ``n_salt`` times with a salt
      column, the edge table gets ``salt = hash(src, dst) % n_salt``,
      and the join key becomes (dst, salt) — a hub vertex's edges now
      land on ``n_salt`` distinct reducers instead of one;
    - aggregation happens per (src, nbr_comm, salt) first (bounded
      reducer input), then combines across salts.

    Use when ``assign`` is too large to broadcast; otherwise the plain
    broadcast gather wins.
    """
    salted_edges = edges.where(F.col("src") != F.col("dst")).withColumn(
        "_salt",
        F.pmod(F.xxhash64("src", "dst"), F.lit(n_salt)).cast("int"),
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1))
    ).alias("_salt")
    salted_assign = assign.select(
        F.col("id").alias("dst"), F.col("community").alias("nbr_comm"), salts
    )
    partial = (
        salted_edges.join(salted_assign, ["dst", "_salt"])
        .groupBy(F.col("src").alias("id"), "nbr_comm", "_salt")
        .agg(F.sum("weight").alias("k_partial"))
    )
    return partial.groupBy("id", "nbr_comm").agg(
        F.sum("k_partial").alias("k_vc")
    )


def repartition_by_degree(
    edges: DataFrame, num_partitions: int
) -> DataFrame:
    """Degree-aware range repartitioning of a symmetrized edge table.

    ``repartition(src)`` alone puts a hub's entire adjacency in one
    partition; ranging over (degree, src, dst) spreads each hub's edge
    block across neighboring partitions while keeping locality for
    ordinary vertices.
    """
    deg = degree_table(edges).withColumnRenamed("id", "src")
    return (
        edges.join(deg, "src")
        .repartitionByRange(num_partitions, "degree", "src", "dst")
        .drop("degree")
    )
