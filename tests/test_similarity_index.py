"""ANN index build/probe split (VERDICT r2 'what's wrong' #1).

Two guarantees:

1. Correctness — the prebuilt-index probe returns exactly the rows the
   inline (rescan-the-corpus) path returns, for both LSH and IVF.
2. Plan shape — the probe plan against a persisted index touches ONLY
   the index (bucket/list filter pushed into the parquet scan); it
   contains no quantizer ``MapInPandas`` rerun and no corpus-table scan.
"""

from __future__ import annotations

import numpy as np
import pytest

from graft.checkpoint import truncate
from graft.pipeline.similarity import (
    build_ivf_centroids,
    build_ivf_index,
    build_lsh_index,
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk_planes,
    rademacher_planes,
    write_ivf_index,
    write_lsh_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8)])
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def query(emb):
    return [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _plan(df, mode: str = "formatted") -> str:
    """The physical plan as a string (what .explain prints). Count node
    occurrences in ``mode="simple"`` (formatted lists every node twice:
    once in the tree, once in the per-node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_lsh_index_probe_matches_inline(spark, emb, query):
    planes = rademacher_planes(8, 4)
    index = truncate(build_lsh_index(emb, planes))
    via_index = lsh_bucket_topk_planes(emb, query, planes, k=10, index=index)
    inline = lsh_bucket_topk_planes(emb, query, planes, k=10)
    assert _rows(via_index) == _rows(inline)
    assert len(_rows(via_index)) > 0


def test_lsh_probe_plan_touches_only_the_index(spark, emb, query):
    planes = rademacher_planes(8, 4)
    index = truncate(build_lsh_index(emb, planes))
    probe = lsh_bucket_topk_planes(emb, query, planes, k=10, index=index)
    # exactly one scan — the index parquet; the bucket filter is pushed
    # into the source, so only candidate row groups are read
    assert _plan(probe, "simple").count("Scan parquet") == 1
    assert "PushedFilters: [IsNotNull(sig), EqualTo(sig," in _plan(probe)
    # the cached corpus table is never touched at probe time
    assert "InMemoryTableScan" not in _plan(probe, "simple")


def test_ivf_index_probe_matches_inline(spark, emb, query):
    index = truncate(build_ivf_index(emb, centroid_mod=31))
    cents = truncate(build_ivf_centroids(emb, centroid_mod=31))
    via_index = ivf_topk(
        emb, query, k=10, n_probe=2, centroid_mod=31,
        index=index, centroids=cents,
    )
    inline = ivf_topk(emb, query, k=10, n_probe=2, centroid_mod=31)
    assert _rows(via_index) == _rows(inline)
    assert len(_rows(via_index)) == 10


def test_ivf_probe_plan_has_no_quantizer_and_no_corpus_scan(
    spark, emb, query
):
    index = truncate(build_ivf_index(emb, centroid_mod=31))
    cents = truncate(build_ivf_centroids(emb, centroid_mod=31))
    probe = ivf_topk(
        emb, query, k=10, n_probe=2, centroid_mod=31,
        index=index, centroids=cents,
    )
    # the quantizer (Arrow matmul mapInPandas) must NOT run at probe time
    assert "MapInPandas" not in _plan(probe, "simple")
    # one scan: the inverted-list parquet with the list filter pushed
    # (centroid selection already happened driver-side on the persisted
    # centroid table before this plan was built)
    assert _plan(probe, "simple").count("Scan parquet") == 1
    assert "PushedFilters: [In(centroid_id," in _plan(probe)


def test_lsh_partitioned_index_prunes_files(spark, emb, query, tmp_path):
    """The persisted sig-partitioned layout (VERDICT r3 #7): the probe's
    bucket equality resolves as a PARTITION filter (whole-file skipping),
    the on-disk layout isolates each bucket's files in its own directory
    (files under the probed bucket < total index files), and the probe
    returns exactly the inline path's rows."""
    import glob

    from graft.pipeline.similarity import _query_signature

    planes = rademacher_planes(8, 4)
    path = str(tmp_path / "lsh_idx")
    index = write_lsh_index(emb, planes, path)
    probe = lsh_bucket_topk_planes(emb, query, planes, k=10, index=index)
    plan = _plan(probe)
    assert "PartitionFilters" in plan and "sig" in plan
    # the probed bucket's files are a strict subset of the index files
    qsig = _query_signature(query, planes)
    all_files = glob.glob(f"{path}/sig=*/*.parquet")
    bucket_files = glob.glob(f"{path}/sig={qsig}/*.parquet")
    assert 0 < len(bucket_files) < len(all_files)
    inline = lsh_bucket_topk_planes(emb, query, planes, k=10)
    assert _rows(probe) == _rows(inline)


def test_ivf_partitioned_index_prunes_files(spark, emb, query, tmp_path):
    """centroid_id-partitioned inverted lists: the probe's IN-list
    resolves as a PARTITION filter and only the probed list directories
    hold the candidate files."""
    import glob

    path = str(tmp_path / "ivf_idx")
    index = write_ivf_index(emb, path, centroid_mod=31)
    cents = truncate(build_ivf_centroids(emb, centroid_mod=31))
    probe = ivf_topk(
        emb, query, k=10, n_probe=2, centroid_mod=31,
        index=index, centroids=cents,
    )
    plan = _plan(probe)
    assert "PartitionFilters" in plan and "centroid_id" in plan
    assert "MapInPandas" not in _plan(probe, "simple")
    all_files = glob.glob(f"{path}/centroid_id=*/*.parquet")
    n_lists = len(glob.glob(f"{path}/centroid_id=*"))
    assert n_lists > 2  # more lists than n_probe → pruning is real
    # n_probe=2 lists can hold at most ~2/n_lists of the files
    per_list = {}
    for f in all_files:
        key = f.split("centroid_id=")[1].split("/")[0]
        per_list.setdefault(key, 0)
        per_list[key] += 1
    assert max(per_list.values()) * 2 < len(all_files)
    inline = ivf_topk(emb, query, k=10, n_probe=2, centroid_mod=31)
    assert _rows(probe) == _rows(inline)


def test_index_probe_agrees_with_exact_on_planted_neighbor(spark, emb):
    """A planted near-duplicate of vector 0 must surface as the top
    non-identical hit through the index path."""
    base = emb.where("vec_id = 0").first()["embedding"]
    rng = np.random.default_rng(11)
    near = [x + 1e-3 * float(d) for x, d in
            zip(base, rng.standard_normal(8))]
    emb2 = emb.union(
        emb.sparkSession.createDataFrame(
            [(9999, near)], "vec_id long, embedding array<double>"
        )
    )
    planes = rademacher_planes(8, 4)
    index = truncate(build_lsh_index(emb2, planes))
    got = lsh_bucket_topk_planes(
        emb2, base, planes, k=2, index=index
    ).collect()
    ids = [r["vec_id"] for r in got]
    assert ids[0] == 0 and ids[1] == 9999
    exact = cosine_topk(emb2, base, k=2).collect()
    assert [r["vec_id"] for r in exact] == ids


def test_ann_recall_zero_planes_is_perfect(spark):
    """With no hyperplanes every vector shares one bucket, so the ANN
    arm IS the exact arm — recall must be exactly 1.0 for all queries
    (end-to-end machinery check: ranking, hits, denominators)."""
    import numpy as np

    from graft.pipeline.similarity import ann_recall, rademacher_planes

    rows = [
        (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann_recall(
        emb, rademacher_planes(8, 0), query_mod=20, k=5
    ).collect()
    assert {r.query_id for r in out} == {0, 20, 40}
    assert all(r.recall == 1.0 and r.n_hit == 5 for r in out)


def test_ann_recall_matches_numpy_reference(spark):
    """2-plane bucketing vs a numpy replay of both arms."""
    import numpy as np

    from graft.pipeline.similarity import ann_recall, rademacher_planes

    rows = [
        (i, [float(((i + 1) * (d + 2)) % 13) - 6.0 for d in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = rademacher_planes(8, 2)
    got = {
        r.query_id: (r.n_ann, r.n_hit, r.recall)
        for r in ann_recall(emb, planes, query_mod=15, k=5).collect()
    }

    vecs = {i: np.array(v) for i, v in rows}
    sig = {
        i: "".join(
            "1" if float(np.dot(planes[j], v)) >= 0 else "0"
            for j in range(len(planes))
        )
        for i, v in vecs.items()
    }
    exp = {}
    for qid in (0, 15, 30):
        qv = vecs[qid]

        def _rank(ids):
            scored = sorted(
                ids,
                key=lambda i: (
                    -round(
                        float(np.dot(vecs[i], qv))
                        / (np.linalg.norm(vecs[i]) * np.linalg.norm(qv)),
                        6,
                    ),
                    i,
                ),
            )
            return scored[:5]

        exact = _rank(list(vecs))
        ann = _rank([i for i in vecs if sig[i] == sig[qid]])
        hit = len(set(exact) & set(ann))
        exp[qid] = (len(ann), hit, round(hit / 5.0, 6))
    assert got == exp


def test_multiprobe_recall_dominates_single_bucket(spark):
    """probe_bits=1 candidates are a superset of the exact-bucket arm,
    so per-query recall can only go up; _probe_signatures enumerates
    exactly the Hamming ball."""
    from graft.pipeline.similarity import (
        _probe_signatures,
        ann_recall,
        rademacher_planes,
    )

    assert _probe_signatures("0101", 0) == ["0101"]
    assert sorted(_probe_signatures("01", 1)) == ["00", "01", "11"]
    assert len(_probe_signatures("0101", 1)) == 5
    assert len(_probe_signatures("0101", 2)) == 1 + 4 + 6

    rows = [
        (i, [float(((i + 1) * (d + 2)) % 13) - 6.0 for d in range(8)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = rademacher_planes(8, 3)
    r0 = {
        r.query_id: r.recall
        for r in ann_recall(emb, planes, query_mod=15, k=5).collect()
    }
    r1 = {
        r.query_id: r.recall
        for r in ann_recall(
            emb, planes, query_mod=15, k=5, probe_bits=1
        ).collect()
    }
    assert set(r0) == set(r1)
    assert all(r1[q] >= r0[q] for q in r0)


def test_lsh_topk_probe_bits_widens_the_bucket(spark, emb, query):
    """probe_bits=1 returns at least the single-bucket rows and ranks
    identically; full Hamming ball (= n_planes) recovers exact top-k."""
    from graft.pipeline.similarity import (
        cosine_topk,
        lsh_bucket_topk_planes,
        rademacher_planes,
    )

    planes = rademacher_planes(len(query), 4)
    one = lsh_bucket_topk_planes(emb, query, planes, k=10).collect()
    mp = lsh_bucket_topk_planes(
        emb, query, planes, k=10, probe_bits=1
    ).collect()
    assert {r.vec_id for r in one} <= {r.vec_id for r in mp} or len(
        one
    ) == 10
    full = lsh_bucket_topk_planes(
        emb, query, planes, k=10, probe_bits=4
    ).collect()
    exact = cosine_topk(emb, query, k=10).collect()
    assert [(r.vec_id, r.cosine) for r in full] == [
        (r.vec_id, r.cosine) for r in exact
    ]


def test_ann_recall_ann_arm_is_an_equi_join(spark):
    """The multi-probe arm expands queries to their Hamming ball and
    hash-joins on sig — the only nested-loop join in the plan is the
    exact arm's deliberate brute-force crossJoin."""
    from graft.pipeline.similarity import ann_recall, rademacher_planes

    rows = [(i, [float(i + d) for d in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        ann_recall(emb, rademacher_planes(8, 3), query_mod=10, probe_bits=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # every nested-loop is a Cross build (the exact arm); a Hamming
    # <= b nested-loop would print a non-Cross BNLJ with a condition
    import re

    for m in re.finditer(r"BroadcastNestedLoopJoin[^\n]*", plan):
        assert "Cross" in m.group(0), m.group(0)
