"""Streaming transcript→edge ingest ≡ the batch derivation.

The equivalence pin: feeding the SAME turns through the stateful
streaming operator in two micro-batch waves (with a query restart in
between, so state round-trips the checkpoint) produces a delta log
whose compaction equals graft.io.transcripts_to_edges on the full
table — exactly, edge for edge, weight for weight.
"""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F

from graft.graph import Graph
from graft.io import actor_edges_to_long, transcripts_to_edges
from graft.streaming import (
    TRANSCRIPT_SCHEMA,
    compact_edge_deltas,
    incremental_components,
    incremental_pagerank,
    read_transcript_stream,
    start_edge_delta_sink,
    stream_degrees,
    stream_transcript_edge_deltas,
)


def _synth_turns(seed: int = 7, n_conv: int = 40):
    """Deterministic transcript rows (conv_id, turn_idx, role, text, tool, ts)."""
    rng = random.Random(seed)
    roles = ["user", "assistant", "system"]
    tools = ["search", "python", "browser", None, None]
    rows = []
    for c in range(n_conv):
        n_turns = rng.randint(2, 12)
        for t in range(n_turns):
            tool = rng.choice(tools) if rng.random() < 0.5 else None
            rows.append(
                (
                    f"c{c:03d}",
                    t,
                    rng.choice(roles),
                    f"text {c}/{t}",
                    tool,
                    None,
                )
            )
    return rows


def _write_chunks(spark, tmpdir: str, rows):
    """Split each conversation's turns at its midpoint into two parquet
    drops: chunk 1 lands first, chunk 2 arrives later (in-order per
    conversation, as an append-only log delivers)."""
    src = os.path.join(tmpdir, "turns")
    mid = {}
    for conv_id, t, *_ in rows:
        mid[conv_id] = max(mid.get(conv_id, 0), t)
    chunk1 = [r for r in rows if r[1] <= mid[r[0]] // 2]
    chunk2 = [r for r in rows if r[1] > mid[r[0]] // 2]
    # shuffle WITHIN each chunk: arrival order inside a micro-batch is
    # arbitrary; only cross-batch order per conversation is monotone
    random.Random(1).shuffle(chunk1)
    random.Random(2).shuffle(chunk2)
    df1 = spark.createDataFrame(chunk1, TRANSCRIPT_SCHEMA)
    df2 = spark.createDataFrame(chunk2, TRANSCRIPT_SCHEMA)
    df1.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    return src, df2, df1.unionAll(df2)


def _drain(spark, src: str, tmpdir: str) -> str:
    """Run the ingest query in availableNow mode until the source is dry."""
    deltas_path = os.path.join(tmpdir, "deltas")
    ckpt = os.path.join(tmpdir, "ckpt")
    turns = read_transcript_stream(spark, os.path.join(src, "*"))
    q = start_edge_delta_sink(
        stream_transcript_edge_deltas(turns), deltas_path, ckpt
    )
    q.awaitTermination()
    return deltas_path


def test_streaming_equals_batch_across_restart(spark, tmp_path):
    rows = _synth_turns()
    src, df2, full = _write_chunks(spark, str(tmp_path), rows)

    # wave 1: only chunk 1 exists
    deltas_path = _drain(spark, src, str(tmp_path))

    # wave 2: chunk 2 arrives; a NEW query restarts from the checkpoint,
    # so per-conversation state must round-trip storage
    df2.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))
    _drain(spark, src, str(tmp_path))

    got = {
        (r["u"], r["v"]): r["weight"]
        for r in compact_edge_deltas(spark, deltas_path).collect()
    }
    want = {
        (r["u"], r["v"]): r["weight"]
        for r in transcripts_to_edges(full).collect()
    }
    assert got == want


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """Re-delivered (late/replayed) turns must not double-count edges."""
    rows = _synth_turns(seed=11, n_conv=10)
    src = os.path.join(str(tmp_path), "turns")
    full = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    full.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    deltas_path = _drain(spark, src, str(tmp_path))

    # the same rows land again under a new file name (a replayed log
    # segment); every turn is at/below the high-water mark → no deltas
    full.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))
    _drain(spark, src, str(tmp_path))

    got = {
        (r["u"], r["v"]): r["weight"]
        for r in compact_edge_deltas(spark, deltas_path).collect()
    }
    want = {
        (r["u"], r["v"]): r["weight"]
        for r in transcripts_to_edges(full).collect()
    }
    assert got == want


def test_incremental_pagerank_matches_batch(spark, tmp_path):
    """Warm-started PageRank over the compacted delta log equals a cold
    PageRank over the batch-derived graph (the full streaming update
    cycle: drain → compact → warm rerun)."""
    from graft.algos.pagerank import pagerank
    from pyspark.sql import functions as SF

    rows = _synth_turns(seed=31, n_conv=12)
    src = os.path.join(str(tmp_path), "turns")
    full = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    full.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    deltas_path = _drain(spark, src, str(tmp_path))

    e = transcripts_to_edges(full).select(
        SF.col("u").alias("src"), SF.col("v").alias("dst"), "weight"
    )
    cold = {r["id"]: r["rank"]
            for r in pagerank(Graph.from_undirected(e), tol=1e-10).collect()}
    # warm-start from deliberately stale/partial ranks
    some = list(cold)[:3]
    prev = spark.createDataFrame(
        [(i, 1.0 / 3) for i in some], "id string, rank double"
    )
    got = {r["id"]: r["rank"]
           for r in incremental_pagerank(
               spark, deltas_path, prev_ranks=prev, tol=1e-10
           ).collect()}
    assert got == pytest.approx(cold, abs=1e-8)


def test_incremental_components_matches_batch(spark, tmp_path):
    """Warm-started components over the compacted delta log equal a
    cold run over the batch-derived graph (delta log grows append-only,
    so the monotone-growth precondition holds by construction)."""
    from graft.algos.components import connected_components
    from pyspark.sql import functions as SF

    rows = _synth_turns(seed=33, n_conv=12)
    src = os.path.join(str(tmp_path), "turns")
    full = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    full.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    deltas_path = _drain(spark, src, str(tmp_path))

    e = transcripts_to_edges(full).select(
        SF.col("u").alias("src"), SF.col("v").alias("dst"), "weight"
    )
    cold = {r["id"]: r["comp"]
            for r in connected_components(Graph.from_undirected(e)).collect()}
    # warm-start from labels computed on a strict subgraph (half the
    # conversations) — stale but valid under monotone growth
    sub = transcripts_to_edges(
        full.where(SF.col("conv_id") < "c006")
    ).select(SF.col("u").alias("src"), SF.col("v").alias("dst"), "weight")
    prev = connected_components(Graph.from_undirected(sub))
    prev = prev.localCheckpoint(eager=True)
    got = {r["id"]: r["comp"]
           for r in incremental_components(
               spark, deltas_path, prev_labels=prev, sequential_threshold=0
           ).collect()}
    assert got == cold


def test_stream_degrees_matches_graph_strength(spark, tmp_path):
    """The downstream streaming aggregation over the delta log equals
    Graph.strength on the batch-derived graph (weighted degree per
    actor, self-loops 2x per the modularity convention)."""
    rows = _synth_turns(seed=23, n_conv=15)
    src = os.path.join(str(tmp_path), "turns")
    full = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    full.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    deltas_path = _drain(spark, src, str(tmp_path))

    # run the degree maintenance as a streaming aggregation to a memory sink
    delta_stream = spark.readStream.schema(
        "u string, v string, w double"
    ).parquet(deltas_path)
    q = (
        stream_degrees(delta_stream)
        .writeStream.format("memory")
        .queryName("deg_test")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["actor"]: r["degree"]
        for r in spark.sql("select * from deg_test").collect()
    }

    e, mapping = actor_edges_to_long(transcripts_to_edges(full))
    g = Graph.from_undirected(e)
    want = {
        r["vid"]: r["degree"]
        for r in g.strength()
        .join(mapping, "id")
        .select("vid", F.col("k").alias("degree"))
        .collect()
    }
    assert got == pytest.approx(want)


def test_incremental_lpa_seed_continuity(spark, tmp_path):
    """Warm-started LPA over the compacted delta log: a converged seed
    on an unchanged graph is a fixpoint (returned unchanged — label ids
    stay continuous across refreshes), and vertices missing from the
    seed fall back to singleton init."""
    from pyspark.sql import functions as SF

    from graft.algos.lpa import label_propagation
    from graft.streaming import incremental_lpa

    rows = _synth_turns(seed=41, n_conv=10)
    src = os.path.join(str(tmp_path), "turns")
    full = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    full.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    deltas_path = _drain(spark, src, str(tmp_path))

    e = transcripts_to_edges(full).select(
        SF.col("u").alias("src"), SF.col("v").alias("dst"), "weight"
    )
    cold = label_propagation(Graph.from_undirected(e), max_iter=20)
    cold = cold.localCheckpoint(eager=True)
    warm = {r["id"]: r["label"]
            for r in incremental_lpa(
                spark, deltas_path, prev_labels=cold, max_iter=20
            ).collect()}
    assert warm == {r["id"]: r["label"] for r in cold.collect()}

    # partial seed: unseeded vertices singleton-init and still converge
    part = cold.limit(3).localCheckpoint(eager=True)
    got = incremental_lpa(spark, deltas_path, prev_labels=part, max_iter=20)
    assert got.count() == cold.count()
    assert got.where(SF.col("label").isNull()).count() == 0
