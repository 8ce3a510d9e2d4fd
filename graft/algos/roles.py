"""Guimerà–Amaral node roles over a community labeling.

Given a partition (e.g. Leiden/Louvain/LPA output), classify how each
vertex sits in the community structure (Guimerà & Amaral, Nature 2005):

- **participation coefficient** ``p = 1 − Σ_c (k_{i,c} / k_i)²`` — how
  evenly a vertex's edge weight spreads across communities (0 = all
  links inside one community, →1 = uniformly spread). The standard
  connector-hub vs provincial-hub discriminator.
- **within-module degree z-score** ``z = (k_in − μ_C) / σ_C`` — a
  vertex's internal strength standardized against its own community's
  members (population σ; 0 when the community is degenerate).

Complements the engine's community pipeline: Leiden says *which*
community; roles say *what each vertex does* for it — exactly the hub
classification that the skew-handling levers (salting, hub splitting)
key on at scale.

Plan shape: one gather join of the symmetrized edge table against the
(broadcastable) label table + three label-keyed hash aggs — the same
cost class as one local-moving superstep; no window, no driver collect.
Self-loops are excluded (roles describe connections to *others*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.graph import Graph


def participation_roles(graph: Graph, labels: DataFrame) -> DataFrame:
    """Returns ``(id, community, k, p_coef, z_in)`` for every labeled
    vertex: weighted degree (loops excluded), participation
    coefficient, and within-module z-score, floats rounded to 6 dp.

    ``labels`` is ``(id, <community col>)`` — the second column is
    taken as the community label whatever its name.
    """
    lab_col = [c for c in labels.columns if c != "id"][0]
    nl = labels.select("id", F.col(lab_col).alias("community"))
    ew = graph.edges.where(F.col("src") != F.col("dst"))
    kic = (
        ew.join(nl.select(F.col("id").alias("dst"),
                          F.col("community").alias("c")), "dst")
        .groupBy(F.col("src").alias("id"), "c")
        .agg(F.sum("weight").alias("kc"))
    )
    ks = kic.groupBy("id").agg(
        F.sum("kc").alias("k"),
        F.sum(F.col("kc") * F.col("kc")).alias("sumsq"),
    )
    kin = (
        kic.join(nl, "id")
        .where(F.col("c") == F.col("community"))
        .select("id", F.col("kc").alias("kin"))
    )
    base = (
        nl.join(ks, "id", "left")
        .join(kin, "id", "left")
        .select(
            "id",
            "community",
            F.coalesce("k", F.lit(0.0)).alias("k"),
            F.coalesce("sumsq", F.lit(0.0)).alias("sumsq"),
            F.coalesce("kin", F.lit(0.0)).alias("kin"),
        )
    )
    stats = base.groupBy("community").agg(
        F.avg("kin").alias("mu"), F.stddev_pop("kin").alias("sd")
    )
    return (
        base.join(stats, "community")
        .select(
            "id",
            "community",
            F.round("k", 6).alias("k"),
            F.round(
                F.when(
                    F.col("k") > 0,
                    1.0 - F.col("sumsq") / (F.col("k") * F.col("k")),
                ).otherwise(0.0),
                6,
            ).alias("p_coef"),
            F.round(
                F.when(
                    F.col("sd") > 0, (F.col("kin") - F.col("mu")) / F.col("sd")
                ).otherwise(0.0),
                6,
            ).alias("z_in"),
        )
    )
