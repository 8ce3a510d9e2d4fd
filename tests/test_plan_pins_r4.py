"""Physical-plan pins for the late-r4 operator family: everything
stays JVM-side (no Python eval nodes in any distributed plan) and the
single-shuffle operators keep their declared exchange budgets."""

import datetime as dt

from pyspark.sql import functions as F

from graft import fixtures
from graft.graph import Graph

_PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
             "FlatMapGroupsInPandas", "PythonUDF")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_jvm_only(df, name):
    p = _plan(df)
    for node in _PY_NODES:
        assert node not in p, f"{name}: {node} in physical plan"
    return p


def _tx(spark):
    base = dt.datetime(2026, 1, 5)
    rows = [
        ("c1", i, "user" if i % 2 else "assistant", "t", None,
         base + dt.timedelta(minutes=i))
        for i in range(6)
    ]
    return spark.createDataFrame(rows, schema=fixtures.TRANSCRIPT_SCHEMA)


def test_new_ops_have_no_python_nodes(spark):
    from graft.algos.subgraph import ego_edges, quotient_edges
    from graft.algos.wl import (
        conversation_wl_fingerprints,
        wl_colors,
        windowed_wl_fingerprints,
    )
    from graft.pipeline.similarity import knn_graph, smooth_embeddings
    from graft.pipeline.textstats import top_terms
    from graft.transcripts import role_transitions, sessionize

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    t = _tx(spark)
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "a long, b long")

    _assert_jvm_only(wl_colors(g, 2), "wl_colors")
    _assert_jvm_only(
        conversation_wl_fingerprints(t), "conversation_wl_fingerprints"
    )
    _assert_jvm_only(
        windowed_wl_fingerprints(t, "week"), "windowed_wl_fingerprints"
    )
    _assert_jvm_only(ego_edges(g, 0, 2), "ego_edges")
    labels = g.vertices().select("id", F.col("id").alias("label"))
    _assert_jvm_only(quotient_edges(g, labels), "quotient_edges")
    _assert_jvm_only(sessionize(t), "sessionize")
    _assert_jvm_only(role_transitions(t), "role_transitions")
    _assert_jvm_only(smooth_embeddings(emb, pairs), "smooth_embeddings")
    import numpy as np

    _assert_jvm_only(
        knn_graph(emb, k=2, planes=np.array([[1.0, 0.0]])), "knn_graph"
    )
    _assert_jvm_only(top_terms(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    ), "top_terms")
    g.unpersist()


def test_single_shuffle_budgets(spark):
    """sessionize adds exactly ONE exchange beyond its input's own
    plan (the conv_id window); top_terms is explode + one hash agg +
    top-k (no more than 3 exchanges including the final sort)."""
    from graft.pipeline.textstats import top_terms
    from graft.transcripts import sessionize

    t = _tx(spark)
    base_ex = _plan(t).count("Exchange")
    sess_ex = _plan(sessionize(t)).count("Exchange")
    assert sess_ex - base_ex <= 1

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    assert _plan(top_terms(docs)).count("Exchange") <= 3


def test_square_rich_club_gap_pmi_plans(spark):
    """The newest family stays JVM-side too, and the tiny-k rich-club
    table broadcasts its threshold literals (no shuffle keyed on k)."""
    from graft.algos.structure import rich_club, square_count
    from graft.transcripts import actor_pmi, turn_gap_stats

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    t = _tx(spark)

    _assert_jvm_only(square_count(g), "square_count")
    rcdf = rich_club(g, ks=(1, 2, 4))
    rcdf.collect()  # finalize AQE so join strategies are visible
    rc = _assert_jvm_only(rcdf, "rich_club")
    # the k-table rides broadcast nested-loop joins (one side always
    # tiny), and the only k-keyed exchange moves map-side-combined
    # partials (<= |ks| rows per task)
    assert "BroadcastNestedLoopJoin" in rc
    _assert_jvm_only(turn_gap_stats(t), "turn_gap_stats")
    _assert_jvm_only(actor_pmi(t), "actor_pmi")
    g.unpersist()


def test_turn_gap_stats_single_shuffle(spark):
    """turn_gap_stats reuses the conv_id partitioning between the lag
    window and the groupBy: exactly ONE exchange beyond the input."""
    from graft.transcripts import turn_gap_stats

    t = _tx(spark)
    base_ex = _plan(t).count("Exchange")
    assert _plan(turn_gap_stats(t)).count("Exchange") - base_ex <= 1


def test_sparsify_spreading_reciprocity_plans(spark):
    """The second late-r4 batch is JVM-only as well; sparsify keeps a
    single exchange beyond its input (one per-src window, the
    canonicalizing distinct rides the same partitioning or AQE-local)."""
    from graft.algos.spreading import label_spreading
    from graft.algos.structure import reciprocity
    from graft.algos.subgraph import sparsify_top_k

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    _assert_jvm_only(sparsify_top_k(g, 3), "sparsify_top_k")
    _assert_jvm_only(reciprocity(g), "reciprocity")
    seeds = spark.createDataFrame([(0, "a"), (7, "b")],
                                  "id long, label string")
    _assert_jvm_only(
        label_spreading(g, seeds, rounds=1), "label_spreading"
    )
    g.unpersist()


def test_pipeline_text_ops_plan_pins(spark):
    """pii_scan/repetition_stats/decontaminate stay JVM-side;
    decontaminate's eval-side probe is broadcast (map-only on the
    corpus side — the 100-TB-safe shape) with no sort-merge join."""
    from graft.pipeline.dedup import decontaminate
    from graft.pipeline.textstats import pii_scan, repetition_stats

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} a@b.co") for i in range(8)],
        "doc_id long, text string",
    )
    _assert_jvm_only(pii_scan(docs), "pii_scan")
    _assert_jvm_only(repetition_stats(docs), "repetition_stats")
    d = decontaminate(
        docs.where(F.col("doc_id") % 3 != 0),
        docs.where(F.col("doc_id") % 3 == 0),
    )
    p = _assert_jvm_only(d, "decontaminate")
    # the shingle-probe join must broadcast the eval side (map-only on
    # the corpus side); the doc_id anchor join may shuffle — both of
    # its sides are corpus-sized, that one is AQE's call
    probe = [
        ln for ln in p.splitlines()
        if "BroadcastHashJoin" in ln and "shingle" in ln
    ]
    assert probe, f"eval-shingle probe not broadcast:\n{p}"


def test_packing_mixing_roles_plans(spark):
    """The chunking/packing/mixing/scoring family stays JVM-side:
    chunking is shuffle-FREE (pure projection + explode); sequence
    packing never runs a single-partition global window (every Window
    node carries a partition spec); the mix plan broadcasts back onto
    the corpus scan."""
    from graft.pipeline.packing import chunk_documents, pack_sequences
    from graft.pipeline.splits import mix_sources
    from graft.pipeline.textstats import unigram_logprob, zipf_alpha
    from graft.transcripts import conversation_entropy

    docs = spark.createDataFrame(
        [(i, f"tok{i} a b c d", "web" if i % 2 else "code")
         for i in range(8)],
        "doc_id long, text string, source string",
    )
    # chunking: zero exchanges beyond the input's own plan
    base_ex = _plan(docs).count("Exchange")
    ch = chunk_documents(docs, chunk_tokens=3, overlap=1)
    p = _assert_jvm_only(ch, "chunk_documents")
    assert p.count("Exchange") - base_ex == 0

    pk = pack_sequences(docs, seq_len=8)
    p = _assert_jvm_only(pk, "pack_sequences")
    # no global-sort window: every Window node names partition columns
    # (Spark prints 'Window [funcs], [part cols], [order]' — a global
    # window would leave the partition list out entirely and WARN)
    for line in p.splitlines():
        ls = line.strip().lstrip("+-*: ")
        if ls.startswith("Window "):
            assert "[bucket" in ls, f"unpartitioned window: {ls}"

    mx = mix_sources(docs, {"web": 1.0, "code": 1.0})
    mx.collect()  # finalize AQE so join strategies are visible
    p = _assert_jvm_only(mx, "mix_sources")
    assert "BroadcastHashJoin" in p  # plan rides broadcast onto the scan

    _assert_jvm_only(unigram_logprob(docs), "unigram_logprob")
    _assert_jvm_only(zipf_alpha(docs), "zipf_alpha")
    _assert_jvm_only(conversation_entropy(_tx(spark)), "conversation_entropy")

    from graft.algos.roles import participation_roles
    from graft.algos.structure import four_clique_count  # noqa: F401

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    labels = g.vertices().select("id", F.col("id").alias("community"))
    _assert_jvm_only(participation_roles(g, labels), "participation_roles")
    g.unpersist()


def test_linkpred_salton_dupspan_plans(spark):
    """The final r4 family stays JVM-side; link_pred_auc's only
    unpartitioned window runs over the histogram-sized score table (the
    one Sort in the plan sorts scores, not candidates), and
    dup_span_stats keeps its declared one-posexplode shape."""
    from graft.algos.jaccard import salton_index
    from graft.algos.linkpred import link_pred_auc
    from graft.pipeline.dedup import dup_span_stats

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    _assert_jvm_only(salton_index(g), "salton_index")

    p = _assert_jvm_only(link_pred_auc(g), "link_pred_auc")
    # the tie-corrected AUC never ranks the candidate set: exactly one
    # window (over the per-score histogram), and the aggregate after it
    # is a scalar — no rank/row_number over pair rows anywhere
    assert "row_number" not in p and "rank(" not in p
    assert p.count("Window") == 1
    g.unpersist()

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    p = _assert_jvm_only(dup_span_stats(docs, n=3), "dup_span_stats")
    # gram table generated once per side it feeds (dup-set + hits);
    # coverage explode is the bounded n-positions one, not a cross join
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_final_r4_family_plans(spark):
    """disparity / rate-anomalies / batched-PPR stay JVM-side; the
    anomaly windows are keyed (no global sort of the bucket table) and
    the disparity plan carries no wedge join or window at all."""
    import datetime as dt

    from graft.algos.pagerank import batch_personalized_pagerank
    from graft.algos.subgraph import disparity_backbone
    from graft.temporal import rate_anomalies

    g = Graph.from_undirected(
        fixtures.edges_df(spark, fixtures.clique_ring_edges())
    ).cache()
    p = _assert_jvm_only(disparity_backbone(g), "disparity_backbone")
    assert "Window" not in p and "CartesianProduct" not in p

    ev = spark.createDataFrame(
        [("a", dt.datetime(2026, 3, 1) + dt.timedelta(days=i))
         for i in range(5)],
        "event_type string, ts timestamp",
    )
    p = _assert_jvm_only(rate_anomalies(ev), "rate_anomalies")
    for line in p.splitlines():
        ls = line.strip().lstrip("+-*: ")
        if ls.startswith("Window "):
            assert "[key" in ls, f"unpartitioned window: {ls}"

    out = batch_personalized_pagerank(g, [0, 7], fixed_iterations=1)
    _assert_jvm_only(out, "batch_personalized_pagerank")
    g.unpersist()
