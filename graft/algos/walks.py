"""Deterministic random-walk corpus generation (DeepWalk-style).

A 100-TB training-data pipeline materializes walk corpora as input to
skip-gram embedding training (DeepWalk / node2vec first-order walks).
The engine generates them fully distributed AND fully reproducible: the
transition at step t of walk w is chosen by a counter-based LCG draw

    x = ((w mod M) * 1103515245 + t * 12345 + seed) mod M,   M = 2^31−1
    next = sorted_neighbors(v)[ x mod degree(v) ]

— a pure arithmetic function of (walk_id, step), so the same corpus
comes out of any cluster size or partitioning, the walk table never
needs a stateful RNG, and an unrolled SQL oracle can certify the exact
rows (counter-based RNG in the Philox spirit, LCG-cheap because the
draws are index picks, not statistics).

Plan per step: the walk frontier joins the degree table (broadcast-able)
to compute the draw, then the (src, idx)-keyed indexed adjacency —
two keyed joins, no window, no driver data. The indexed adjacency is a
per-source ``row_number`` (partitioned window, shuffle-free after the
adjacency build). Walks stop early at dead-end vertices (no simple
neighbors), mirrored by the oracle's inner join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graft.algos.community import superstep_conf
from graft.checkpoint import drop_spill, truncate
from graft.graph import Graph

_LCG_M = 2147483647
_LCG_A = 1103515245
_LCG_C = 12345


def _draw(wid, step: int, seed: int):
    """The counter-based LCG draw for (walk, step) — kept within int64:
    (wid mod M) * A < 2^62. The cast matters: a 32-bit walk_id would
    overflow the multiply under ANSI mode."""
    return (wid.cast("long") % _LCG_M * F.lit(_LCG_A)
            + F.lit(step * _LCG_C + seed)) % _LCG_M


def random_walks(
    graph: Graph,
    walk_length: int = 4,
    num_walks: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Returns ``(walk_id long, step int, id)`` — ``num_walks`` walks of
    up to ``walk_length`` steps from every vertex over the simple
    (self-loop-free, unweighted) adjacency. Requires integral vertex
    ids (string-keyed graphs: renumber first, e.g.
    :func:`graft.io.actor_edges_to_long`); walk_id = id·num_walks + rep.
    """
    id_type = dict(graph.edges.dtypes)["src"]
    if id_type not in ("bigint", "int", "smallint", "tinyint", "long"):
        raise TypeError(
            f"random_walks needs integral vertex ids, got {id_type}; "
            "renumber with graft.io.actor_edges_to_long first"
        )
    adj = graph.without_self_loops().select("src", "dst").distinct()
    indexed = truncate(
        adj.withColumn(
            "idx",
            F.row_number().over(
                Window.partitionBy("src").orderBy("dst")
            ) - 1,
        )
    )
    deg = indexed.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    starts = graph.vertices().select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.lit(num_walks - 1))
        ).alias("rep"),
    ).select(
        (F.col("id").cast("long") * num_walks + F.col("rep"))
        .alias("walk_id"),
        "id",
    )

    spark = graph.edges.sparkSession
    spills = [indexed]
    parts = [starts.select("walk_id", F.lit(0).alias("step"), "id")]
    cur = starts
    with superstep_conf(spark, adj.count()):
        for t in range(1, walk_length + 1):
            idx = _draw(F.col("walk_id"), t, seed) % F.col("d")
            nxt = (
                cur.join(deg, "id")
                .select("walk_id", "id", idx.cast("int").alias("idx"))
                .join(
                    indexed.select(
                        F.col("src").alias("id"), "idx",
                        F.col("dst").alias("nid"),
                    ),
                    ["id", "idx"],
                )
                .select("walk_id", F.col("nid").alias("id"))
            )
            cur = truncate(nxt)
            spills.append(cur)
            parts.append(
                cur.select("walk_id", F.lit(t).alias("step"), "id")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out = truncate(out)
        for df in spills:
            drop_spill(df)
    return out
