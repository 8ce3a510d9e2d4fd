"""Driver-contract oracle comparison THROUGH THE DISTRIBUTED PATH
(VERDICT r2 'next round' #6).

The driver's own CORRECTNESS run executes at sf0.01, whose 161-vertex
actor graph falls below the sequential-tail threshold — its oracle rows
therefore certify the single-task tail kernels. This suite runs the
same engine-vs-DuckDB comparison at sf0.1 (~17k edge rows) with
``sequential_threshold=0`` forced, so the oracle hash certifies the BSP
superstep machinery itself: distributed PageRank, min-label CC, the
large/small-star CC mode, LPA rounds and the wedge-join triangle count.
"""

from __future__ import annotations

import math
import os

import pytest

import __spark_entry__ as entrymod
from graft.algos.components import connected_components
from graft.algos.lpa import label_propagation
from graft.algos.pagerank import pagerank
from graft.algos.triangles import triangle_count
from graft.graph import Graph
from graft.io import events_to_transcripts, read_table, transcripts_to_edges
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
    reason="sf0.1 testdata not present",
)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def actor_graph(spark):
    t = events_to_transcripts(read_table(spark, SF_DIR, "events"))
    uv = transcripts_to_edges(t).select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "weight"
    )
    g = Graph.from_undirected(uv).cache()
    g.edges.count()
    yield g
    g.unpersist()


def _canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 6)
                v = 0.0 if v == 0 else v
            vals.append((c, v))
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _duck_rows(duck, sql):
    rel = duck.sql(sql)
    cols = rel.columns
    return [dict(zip(cols, row)) for row in rel.fetchall()], cols


def _spark_rows(df):
    return [r.asDict() for r in df.collect()], df.columns


def _assert_match(df, duck, sql):
    srows, scols = _spark_rows(df)
    orows, ocols = _duck_rows(duck, sql)
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _canon(srows, scols) == _canon(orows, ocols)


def test_bsp_pagerank_matches_oracle(spark, actor_graph, duck):
    pr = pagerank(actor_graph, fixed_iterations=3, sequential_threshold=0)
    _assert_match(
        pr.select("id", F.round("rank", 6).alias("rank")),
        duck,
        entrymod.oracle_sql()["pagerank_3iter"],
    )


def test_bsp_warm_pagerank_matches_oracle(spark, actor_graph, duck):
    """The DISTRIBUTED initial_ranks branch (renormalize + superstep
    loop) against the warm-start SQL oracle — the sf0.01 contract row
    certifies the sequential warm kernel; this covers the other path."""
    r0 = actor_graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("rank")
    )
    pr = pagerank(
        actor_graph, fixed_iterations=3, sequential_threshold=0,
        initial_ranks=r0,
    )
    _assert_match(
        pr.select("id", F.round("rank", 6).alias("rank")),
        duck,
        entrymod.oracle_sql()["pagerank_warm_3iter"],
    )


@pytest.mark.parametrize("mode", ["propagate", "star"])
def test_bsp_connected_components_matches_oracle(
    spark, actor_graph, duck, mode
):
    cc = connected_components(actor_graph, mode=mode, sequential_threshold=0)
    _assert_match(cc, duck, entrymod.oracle_sql()["connected_components"])


def test_bsp_lpa_matches_oracle(spark, actor_graph, duck):
    lpa = label_propagation(actor_graph, max_iter=2)
    _assert_match(lpa, duck, entrymod.oracle_sql()["lpa_2rounds"])


def test_distributed_triangles_match_oracle(spark, actor_graph, duck):
    n = triangle_count(actor_graph, sequential_threshold=0)
    orows, _ = _duck_rows(duck, entrymod.oracle_sql()["triangle_count"])
    assert n == orows[0]["triangles"]
