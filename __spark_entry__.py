"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator Spark vs DuckDB pairs at
sf0.01 (SURVEY.md §2 coverage). The transcript source for the testdata
tables is the canonical ``events``→transcripts mapping
(graft.io.events_to_transcripts); the same SQL is replicated for the
DuckDB oracle in ``_SQL_TRANSCRIPTS`` below.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graft.graph import Graph
from graft.io import (
    actor_edges_to_long,
    events_to_transcripts,
    read_table,
    transcripts_to_edges,
)

SF0001 = "/root/testdata/sf0.001"


def _edges_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → transcripts → actor edge table (u, v, weight)."""
    t = events_to_transcripts(read_table(spark, sf_dir, "events"))
    return transcripts_to_edges(t)


def _graph(spark: SparkSession, sf_dir: str) -> tuple[Graph, DataFrame]:
    e, mapping = actor_edges_to_long(_edges_uv(spark, sf_dir))
    return Graph.from_undirected(e), mapping


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the actor link graph from sf0.001 events and
    report the top-10 most-connected actors (read → window → union →
    groupBy → orderBy → limit)."""
    uv = _edges_uv(spark, SF0001)
    sym = uv.select(
        F.col("u").alias("id"),
        F.when(F.col("u") == F.col("v"), F.col("weight") * 2)
        .otherwise(F.col("weight"))
        .alias("w"),
    ).unionAll(
        uv.where(F.col("u") != F.col("v")).select(
            F.col("v").alias("id"), F.col("weight").alias("w")
        )
    )
    return (
        sym.groupBy("id")
        .agg(F.sum("w").alias("k"), F.count(F.lit(1)).alias("degree"))
        .orderBy(F.desc("k"), "id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL building blocks (ANSI, DuckDB dialect)
# ---------------------------------------------------------------------------

# canonical events→transcripts→actor mapping, mirroring
# graft.io.events_to_transcripts + transcripts_to_edges
_SQL_ACTORS = r"""
WITH t AS (
  SELECT cast(user_id AS varchar) AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS turn_idx,
         event_type AS role,
         CASE WHEN event_type IN ('purchase', 'error')
              THEN 't' || cast(cast(regexp_extract(props, '(\d+)', 1) AS bigint)
                               % 8 AS varchar)
         END AS tool
  FROM events
), a AS (
  SELECT conv_id, turn_idx,
         coalesce('tool:' || tool, 'role:' || role) AS actor
  FROM t
), p AS (
  SELECT conv_id, actor,
         lag(actor) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_actor
  FROM a
), pairs AS (
  SELECT least(prev_actor, actor) AS u, greatest(prev_actor, actor) AS v
  FROM p WHERE prev_actor IS NOT NULL
  UNION ALL
  SELECT least('conv:' || conv_id, actor), greatest('conv:' || conv_id, actor)
  FROM a
), e AS (
  SELECT u, v, cast(count(*) AS double) AS weight FROM pairs GROUP BY u, v
)
"""

_SQL_SYM = (
    _SQL_ACTORS
    + """
, sym AS (
  SELECT u AS id, CASE WHEN u = v THEN weight * 2 ELSE weight END AS w FROM e
  UNION ALL
  SELECT v AS id, weight AS w FROM e WHERE u <> v
)
"""
)


def _q_transcript_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _edges_uv(spark, sf_dir)


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    uv = _edges_uv(spark, sf_dir)
    sym = uv.select(
        F.col("u").alias("id"),
        F.when(F.col("u") == F.col("v"), F.col("weight") * 2)
        .otherwise(F.col("weight"))
        .alias("w"),
    ).unionAll(
        uv.where(F.col("u") != F.col("v")).select(
            F.col("v").alias("id"), F.col("weight").alias("w")
        )
    )
    return sym.groupBy("id").agg(
        F.sum("w").alias("k"), F.count(F.lit(1)).alias("degree")
    )


def _q_top_hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q_degrees(spark, sf_dir).orderBy(F.desc("k"), "id").limit(10)


def _q_total_edge_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    uv = _edges_uv(spark, sf_dir)
    return uv.agg(F.sum("weight").cast("double").alias("m"))


def _q_self_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    uv = _edges_uv(spark, sf_dir)
    return uv.where(F.col("u") == F.col("v")).agg(
        F.count(F.lit(1)).alias("n_self_loops"),
        F.coalesce(F.sum("weight"), F.lit(0.0)).alias("loop_weight"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcript_edges": _q_transcript_edges,
        "degrees": _q_degrees,
        "top_hubs": _q_top_hubs,
        "total_edge_weight_m": _q_total_edge_weight,
        "self_loops": _q_self_loops,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcript_edges": _SQL_ACTORS + "SELECT u, v, weight FROM e",
        "degrees": _SQL_SYM
        + "SELECT id, sum(w) AS k, count(*) AS degree FROM sym GROUP BY id",
        "top_hubs": _SQL_SYM
        + """
SELECT id, sum(w) AS k, count(*) AS degree FROM sym GROUP BY id
ORDER BY k DESC, id LIMIT 10""",
        "total_edge_weight_m": _SQL_ACTORS
        + "SELECT cast(sum(weight) AS double) AS m FROM e",
        "self_loops": _SQL_ACTORS
        + """
SELECT count(*) AS n_self_loops,
       coalesce(sum(weight), 0.0) AS loop_weight
FROM e WHERE u = v""",
    }
