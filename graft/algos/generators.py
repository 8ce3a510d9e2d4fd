"""Deterministic distributed graph generators (cugraph
``graph_generators`` parity: reference capability envelope ships RMAT
alongside the algorithms it benchmarks).

R-MAT (Chakrabarti, Zhan & Faloutsos 2004) recursively subdivides the
adjacency matrix into quadrants with probabilities (a, b, c, d); the
classic (0.57, 0.19, 0.19, 0.05) setting reproduces the heavy-tailed
degree distributions of real link graphs — exactly the skew profile a
10^12-turn transcript graph shows, which makes this the scale-testing
input generator for the engine itself.

Scale shape: ``spark.range(n_edges)`` fans the edge ids across the
cluster and every bit of both endpoints is a pure column expression
over the md5-prefix hash of (edge_id, level, seed) — one narrow
map-only stage, NO shuffle, no driver-side materialization, no RNG
state. A 10^10-edge input is one `.write.parquet` away on any cluster
size, and any engine replays it bit-for-bit (the DuckDB oracle
regenerates the identical edge list — the same portable-hash
construction as graft.pipeline.splits / graft.algos.priority).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MOD = 2**60


def _u60(col: F.Column, salt: str) -> F.Column:
    """60-bit uniform hash — md5-prefix, engine-portable (the
    graft.pipeline.splits construction)."""
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(col, F.lit(f"#{salt}")), "UTF-8")),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def rmat_edges(
    spark: SparkSession,
    scale: int = 16,
    n_edges: int | None = None,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    drop_self_loops: bool = True,
) -> DataFrame:
    """R-MAT edge list: ``(src long, dst long, weight double)`` over
    2**scale vertices (d = 1 - a - b - c). Defaults to edge factor 16
    (n_edges = 16 · 2**scale) like the Graph500 generator.

    Deterministic in ``seed``: edge i's level-l quadrant is chosen by
    the 60-bit md5 hash of ``"{i}:{l}#rmat-{seed}"``, so the output is
    identical across engines, partitionings, and reruns. Duplicate
    edges are kept (the classic generator's multigraph output —
    ``Graph.from_undirected`` folds them); self-loops are dropped by
    default.
    """
    if not 1 <= scale <= 40:
        raise ValueError(f"scale must be in [1, 40], got {scale}")
    if min(a, b, c) < 0 or a + b + c > 1.0:
        raise ValueError(f"need a,b,c >= 0 with a+b+c <= 1, got {(a, b, c)}")
    if n_edges is None:
        n_edges = 16 * (2**scale)
    # integer thresholds on the 60-bit hash — no float comparison drift
    t1 = int(a * _MOD)
    t2 = int((a + b) * _MOD)
    t3 = int((a + b + c) * _MOD)
    salt = f"rmat-{seed}"

    df = spark.range(n_edges).toDF("eid")
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        u = _u60(
            F.concat(F.col("eid").cast("string"), F.lit(f":{lvl}")), salt
        )
        bit = F.lit(1 << (scale - 1 - lvl)).cast("long")
        # quadrants: [0,t1) -> (0,0), [t1,t2) -> (0,1),
        #            [t2,t3) -> (1,0), [t3,2^60) -> (1,1)
        src = src + F.when(u >= t2, bit).otherwise(F.lit(0))
        dst = dst + F.when(
            ((u >= t1) & (u < t2)) | (u >= t3), bit
        ).otherwise(F.lit(0))
    out = df.select(
        src.alias("src"), dst.alias("dst"), F.lit(1.0).alias("weight")
    )
    if drop_self_loops:
        out = out.where(F.col("src") != F.col("dst"))
    return out


def rmat_sql(
    scale: int = 8,
    n_edges: int | None = None,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    drop_self_loops: bool = True,
) -> str:
    """DuckDB twin of :func:`rmat_edges` — regenerates the identical
    edge list from the same md5 bits (the correctness oracle)."""
    if n_edges is None:
        n_edges = 16 * (2**scale)
    t1 = int(a * _MOD)
    t2 = int((a + b) * _MOD)
    t3 = int((a + b + c) * _MOD)

    def u(lvl: int) -> str:
        return (
            "('0x' || substr(md5(cast(eid AS varchar) || "
            f"':{lvl}#rmat-{seed}'), 1, 15))::BIGINT"
        )

    src_terms = " + ".join(
        f"(CASE WHEN {u(l)} >= {t2} "
        f"THEN {1 << (scale - 1 - l)} ELSE 0 END)"
        for l in range(scale)
    )
    dst_terms = " + ".join(
        f"(CASE WHEN ({u(l)} >= {t1} AND {u(l)} < {t2}) OR {u(l)} >= {t3} "
        f"THEN {1 << (scale - 1 - l)} ELSE 0 END)"
        for l in range(scale)
    )
    where = "WHERE src <> dst" if drop_self_loops else ""
    return f"""
WITH e AS (SELECT unnest(range(0, {n_edges})) AS eid),
edges AS (
  SELECT CAST({src_terms} AS BIGINT) AS src,
         CAST({dst_terms} AS BIGINT) AS dst,
         1.0 AS weight
  FROM e
)
SELECT src, dst, weight FROM edges {where}
"""
