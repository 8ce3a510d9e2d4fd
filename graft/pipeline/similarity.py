"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force cosine top-k against one query vector:
  ``F.zip_with`` + ``F.aggregate`` keep the dot product JVM-side
  (no Python, no UDF); one pass + one top-k.
- ``lsh_bucket_topk`` — the scale path: random-hyperplane signature
  buckets prune the candidate set before exact scoring (probing the
  query's bucket only). Hyperplanes are seeded and broadcast as
  literals.
- ``embedding_near_dups`` — all-pairs near-duplicate detection by
  cosine ≥ threshold within LSH buckets (bounded-bucket pair join, same
  skew treatment as MinHash-LSH).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.checkpoint import truncate


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cosine) — exact top-k by cosine similarity to ``query``."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.linalg.norm(query))
    cos = _dot(F.col(vec_col).cast("array<double>"), q) / (
        _norm(F.col(vec_col).cast("array<double>")) * F.lit(qn)
    )
    return (
        emb.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rademacher_planes(dim: int, n_planes: int) -> np.ndarray:
    """±1 hyperplanes derived from md5 — engine-portable: any SQL engine
    (the DuckDB oracle) reproduces the exact same coefficients, so the
    LSH bucketing itself is cross-checkable, not just the cosine math.
    coef(j, d) = +1 iff the first hex digit of md5("p{j}:{d}") is even.
    """
    import hashlib

    return np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"p{j}:{d}".encode()).hexdigest()[0], 16)
                % 2
                == 0
                else -1.0
                for d in range(dim)
            ]
            for j in range(n_planes)
        ]
    )


def _signature(vec_col, planes: np.ndarray):
    """Bit-sign signature of a vector column against fixed hyperplanes.
    Zero planes → constant signature (brute-force mode: one bucket)."""
    if len(planes) == 0:
        return F.lit("")
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec_col, plane) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return F.concat(*bits)


def build_lsh_index(
    emb: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ONE full-corpus pass computing every vector's hyperplane
    signature: ``(id_col, sig string, vec_col)``.

    This is the BUILD half of the LSH index — persist it (e.g.
    ``graft.checkpoint.truncate`` or a parquet sink, ideally
    ``.write.partitionBy("sig")`` at scale so probes prune whole
    files) and hand it to :func:`lsh_bucket_topk_planes` via
    ``index=``. The index carries the vectors (bucket → vectors, the
    standard ANN layout), so a probe is ONE scan of the index with the
    bucket filter pushed down — the corpus table is never touched
    again, let alone re-signed. The build pass is amortized over all
    queries.
    """
    v = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col), _signature(v, planes).alias("sig"), F.col(vec_col)
    )


def write_lsh_index(
    emb: DataFrame,
    planes: np.ndarray,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Build AND persist the LSH index in the partition-pruned layout:
    ``path/sig=<bucket>/...parquet`` (one directory per signature
    bucket). A probe's ``sig == qsig`` predicate then resolves as a
    PARTITION filter — Spark's file listing skips every other bucket's
    files outright (whole-file skipping, strictly stronger than the
    row-group min/max pushdown an unpartitioned index relies on). At
    10^11 vectors this is the difference between listing/opening one
    bucket directory and touching footers across the whole index.
    Returns the re-read index, ready for ``lsh_bucket_topk_planes
    (index=...)``."""
    build_lsh_index(emb, planes, vec_col, id_col).write.mode(
        "overwrite"
    ).partitionBy("sig").parquet(path)
    return emb.sparkSession.read.parquet(path)


def write_ivf_index(
    emb: DataFrame,
    path: str,
    centroid_mod: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "matmul",
) -> DataFrame:
    """Build AND persist the IVF inverted lists in the partition-pruned
    layout: ``path/centroid_id=<cid>/...parquet`` (one directory per
    list). A probe's ``centroid_id IN (...)`` predicate resolves as a
    PARTITION filter, so only the ``n_probe`` probed list directories
    are listed/read (see :func:`write_lsh_index`). Returns the re-read
    index, ready for ``ivf_topk(index=...)``."""
    build_ivf_index(emb, centroid_mod, vec_col, id_col, method).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(path)
    return emb.sparkSession.read.parquet(path)


def _query_signature(query, planes: np.ndarray) -> str:
    qv = np.asarray(query, dtype=float)
    return "".join(
        "1" if float(planes[j] @ qv) >= 0 else "0" for j in range(len(planes))
    )


def _probe_signatures(qsig: str, probe_bits: int) -> list[str]:
    """All signatures within Hamming distance ``probe_bits`` of
    ``qsig`` (multi-probe LSH, Lv et al. 2007): Σ_{i≤b} C(n, i)
    strings — a driver-bounded parameter set, never data-sized."""
    from itertools import combinations

    sigs = {qsig}
    flip = {"0": "1", "1": "0"}
    for d in range(1, probe_bits + 1):
        for idxs in combinations(range(len(qsig)), d):
            s = list(qsig)
            for i in idxs:
                s[i] = flip[s[i]]
            sigs.add("".join(s))
    return sorted(sigs)


def lsh_bucket_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket (expected candidate fraction 2^-n_planes of the corpus).
    Convenience path — signs the corpus in-query; pass a prebuilt
    ``index`` (see :func:`build_lsh_index`) to amortize that scan."""
    planes = _hyperplanes(len(query), n_planes, seed)
    return lsh_bucket_topk_planes(
        emb, query, planes, k, vec_col, id_col, index=index
    )


def lsh_bucket_topk_planes(
    emb: DataFrame,
    query: list[float],
    planes: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: DataFrame | None = None,
    probe_bits: int = 0,
) -> DataFrame:
    """:func:`lsh_bucket_topk` with caller-supplied hyperplanes (e.g.
    :func:`rademacher_planes`) so the bucketing is engine-portable and
    the DuckDB oracle can reproduce the exact candidate set.

    ``index``: a prebuilt ``(id_col, sig, vec_col)`` table from
    :func:`build_lsh_index`. When given, the probe plan is ONE scan of
    the index with filter(sig == qsig) pushed to the source → exact
    top-k over the bucket — it touches only the index (candidate rows
    after pushdown/pruning); the corpus table is not read and the
    signatures are not recomputed. When omitted (convenience /
    one-shot path) signatures are computed inline, which costs a full
    corpus pass per query.

    ``probe_bits``: multi-probe LSH (Lv et al. 2007) — also score the
    buckets within that Hamming distance of the query's signature
    (Σ_{i≤b} C(n_planes, i) buckets, a driver-bounded ``IN`` list that
    still pushes down / partition-prunes on the persisted index).
    probe_bits=1 is the standard recall-recovery knob: the neighbors a
    single-band signature loses sit overwhelmingly one flipped plane
    away (measured by :func:`ann_recall`).
    """
    sigs = _probe_signatures(_query_signature(query, planes), probe_bits)
    pred = (
        (F.col("sig") == sigs[0])
        if len(sigs) == 1
        else F.col("sig").isin(sigs)
    )
    if index is not None:
        bucketed = index.where(pred)
        return cosine_topk(bucketed, query, k, vec_col, id_col)
    v = F.col(vec_col).cast("array<double>")
    bucketed = emb.withColumn("sig", _signature(v, planes)).where(pred)
    return cosine_topk(bucketed, query, k, vec_col, id_col)


def ivf_assign(
    emb: DataFrame,
    centroid_mod: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "matmul",
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its max-cosine
    centroid. Centroids are the deterministic sample
    ``vec_id % centroid_mod == 0`` (no training loop — a seeded sample
    is the standard cheap IVF initialization, and determinism is what
    makes the assignment oracle-checkable). Ties broken toward the
    larger centroid id (cosines compared at 6 dp so the argmax decision
    is engine-portable).

    Two equivalent physical plans, identical output:

    - ``method="matmul"`` (default, the 100-TB shape): the centroid
      matrix is collected once (nlist × dim floats — in-memory by
      construction) and shipped inside an Arrow-batched ``mapInPandas``
      kernel; each batch does ONE numpy matmul + argmax. The embedding
      scan is never shuffled and no n×nlist intermediate ever
      materializes.
    - ``method="crossjoin"``: the relational formulation (broadcast
      cross join + struct-max argmax) — Catalyst-native, useful as a
      differential check of the kernel.

    Returns ``(id_col, centroid_id)``.
    """
    v = F.col(vec_col).cast("array<double>")
    cents = build_ivf_centroids(emb, centroid_mod, vec_col, id_col)
    if method == "crossjoin":
        scored = (
            emb.select(F.col(id_col), v.alias("v"))
            .crossJoin(F.broadcast(cents))
            .select(
                id_col,
                "cid",
                F.round(
                    _dot(F.col("v"), F.col("cv"))
                    / (_norm(F.col("v")) * _norm(F.col("cv"))),
                    6,
                ).alias("cos"),
            )
        )
        return (
            scored.groupBy(id_col)
            .agg(F.max(F.struct("cos", "cid")).alias("m"))
            .select(id_col, F.col("m.cid").alias("centroid_id"))
        )
    if method != "matmul":
        raise ValueError(f"unknown ivf_assign method {method!r}")

    rows = sorted(cents.collect(), key=lambda r: -r["cid"])
    if not rows:
        return emb.sparkSession.createDataFrame(
            [], f"{id_col} long, centroid_id long"
        )
    # cids in DESCENDING order: np.argmax returns the FIRST maximum, so
    # scanning larger cids first reproduces the crossjoin/SQL tie-break
    # (equal 6dp cosine -> larger centroid id wins)
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cmat = np.array([r["cv"] for r in rows], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "centroid_id": pd.Series([], dtype="int64"),
                    }
                )
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            vnorm = np.sqrt((vm * vm).sum(axis=1))
            vnorm[vnorm == 0.0] = 1.0
            cos = np.round(
                (vm @ cmat.T) / np.outer(vnorm, cnorm), 6
            )
            best = cids[np.argmax(cos, axis=1)]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "centroid_id": best}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, centroid_id long"
    )


def build_ivf_index(
    emb: DataFrame,
    centroid_mod: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "matmul",
) -> DataFrame:
    """The BUILD half of the IVF index: the full-corpus coarse-quantizer
    assignment joined back to the vectors —
    ``(id_col, centroid_id, vec_col)``, the inverted-list layout (list →
    vectors). One Arrow-matmul pass (see :func:`ivf_assign`) plus one
    co-keyed join. Persist it (ideally ``.write.partitionBy
    ("centroid_id")`` at scale so probes prune whole lists) and hand it
    to :func:`ivf_topk` via ``index=``: probes then read ONLY the probed
    lists — no full-corpus quantizer rerun, no corpus scan."""
    assign = ivf_assign(emb, centroid_mod, vec_col, id_col, method=method)
    return assign.join(emb.select(id_col, vec_col), id_col)


def build_ivf_centroids(
    emb: DataFrame,
    centroid_mod: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The (small) centroid table ``(cid, cv array<double>)`` — the other
    persisted index artifact. Probe selection scores the query against
    this table only; without it, every probe would rescan the corpus
    just to re-extract the deterministic centroid sample (the
    ``id % centroid_mod`` predicate is not a parquet-pushable filter)."""
    return emb.where(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )


def ivf_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    centroid_mod: int = 31,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose centroid is among
    the query's ``n_probe`` nearest centroids. Probe selection collects
    ``n_probe`` centroid ids (bounded by the parameter, not the data);
    the candidate filter is a semi-join on the assignment table, so the
    whole plan is scan + assignment filter + filtered exact top-k.

    ``index``: a prebuilt ``(id_col, centroid_id, vec_col)`` inverted
    list from :func:`build_ivf_index`; ``centroids``: the matching
    persisted ``(cid, cv)`` table from :func:`build_ivf_centroids`.
    With both, the probe is centroid-select over the small centroid
    table + ONE filtered scan of the inverted list — no quantizer
    rerun, no corpus scan. When omitted, both are derived from the
    corpus in-query (convenience / one-shot path)."""
    qv = [float(x) for x in query]
    q = F.array(*[F.lit(x) for x in qv])
    qn = float(np.linalg.norm(qv))
    cents = centroids if centroids is not None else build_ivf_centroids(
        emb, centroid_mod, vec_col, id_col
    )
    cos_q = F.round(
        _dot(F.col("cv"), q) / (_norm(F.col("cv")) * F.lit(qn)), 6
    )
    probe = [
        r["cid"]
        for r in cents.select("cid", cos_q.alias("cos"))
        .orderBy(F.desc("cos"), F.desc("cid"))
        .limit(n_probe)
        .collect()
    ]
    if index is not None:
        cand = index.where(F.col("centroid_id").isin(probe))
        return cosine_topk(cand, qv, k, vec_col, id_col)
    assign = ivf_assign(emb, centroid_mod, vec_col, id_col)
    cand = emb.join(
        assign.where(F.col("centroid_id").isin(probe)).select(id_col),
        id_col,
        "left_semi",
    )
    return cosine_topk(cand, qv, k, vec_col, id_col)


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 42,
    max_bucket: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: np.ndarray | None = None,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine ≥ threshold, candidates limited
    to shared LSH buckets (near-identical vectors agree on all signs with
    high probability). Pass ``planes`` (e.g. :func:`rademacher_planes`)
    for externally-reproducible bucketing; otherwise seeded Gaussian
    hyperplanes are drawn."""
    if planes is None:
        head = emb.select(vec_col).first()
        if head is None:
            return emb.sparkSession.createDataFrame(
                [], "a long, b long, cosine double"
            )
        dim = len(head[0])
        planes = _hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    sigs = emb.select(
        F.col(id_col), v.alias("v"), _signature(v, planes).alias("sig")
    ).persist()
    from pyspark.sql import Window

    w = Window.partitionBy("sig")
    capped = (
        sigs.withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.col("n") <= max_bucket)
        .drop("n")
    )
    left = capped.select(
        "sig", F.col(id_col).alias("a"), F.col("v").alias("va")
    )
    right = capped.select(
        "sig", F.col(id_col).alias("b"), F.col("v").alias("vb")
    )
    pairs = left.join(right, "sig").where(F.col("a") < F.col("b"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    out = (
        pairs.select("a", "b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
    # materialize the (small, threshold-filtered) result so the signature
    # cache can be released before returning — a session-lifetime
    # persist() leak otherwise
    out = truncate(out)
    sigs.unpersist()
    return out


def smooth_embeddings(
    emb: DataFrame,
    pairs: DataFrame,
    alpha: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One GraphSAGE-style mean-aggregation layer over a pair graph:
    ``out[id] = alpha * emb[id] + (1 - alpha) * mean(emb[nbr])``,
    components rounded to 6 dp; vectors with no neighbors pass through
    (rounded) unchanged. ``pairs`` is an undirected ``(a, b)`` edge
    list — typically :func:`embedding_near_dups` output or an ANN-kNN
    join — so this is embedding smoothing over the similarity graph:
    the standard denoising/propagation step before clustering or
    dedup-threshold tuning on a training corpus.

    Spark-first shape: symmetrize the (small) pair list, join the
    neighbor vectors, ``posexplode`` to (id, pos, val) components,
    mean per (id, pos), reassemble with an order-pinned collect. Two
    keyed shuffles of rows x dim components — declared, linear, no
    driver-sized state; the explode factor is the embedding dim.
    """
    v = F.col(vec_col).cast("array<double>")
    sym = (
        pairs.select(F.col("a").alias("id"), F.col("b").alias("nbr"))
        .unionAll(
            pairs.select(F.col("b").alias("id"), F.col("a").alias("nbr"))
        )
        .distinct()
    )
    nbr_vecs = sym.join(
        emb.select(F.col(id_col).alias("nbr"), v.alias("nv")), "nbr"
    )
    comp = nbr_vecs.select(
        "id", F.posexplode("nv").alias("pos", "val")
    )
    mean = comp.groupBy("id", "pos").agg(F.avg("val").alias("mv"))
    own = emb.select(F.col(id_col).alias("id"), v.alias("ov")).select(
        "id", F.posexplode("ov").alias("pos", "val")
    )
    outc = own.join(mean, ["id", "pos"], "left").select(
        "id",
        "pos",
        F.round(
            F.when(F.col("mv").isNull(), F.col("val")).otherwise(
                alpha * F.col("val") + (1.0 - alpha) * F.col("mv")
            ),
            6,
        ).alias("v"),
    )
    return outc.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda s: s["v"],
        ).alias(vec_col)
    ).withColumnRenamed("id", id_col)


def knn_graph(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    max_bucket: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Approximate kNN graph over the whole corpus: ``(a, b, cosine)``
    — for every vector, its top-k most-cosine-similar neighbors among
    the vectors sharing its LSH bucket (directed: a → its neighbors;
    symmetrize downstream if an undirected graph is wanted). THE
    similarity-graph builder at corpus scale: candidate generation is
    the same sign-bucket join as :func:`embedding_near_dups` (bounded
    by ``max_bucket``, never all-pairs), ranking is one window
    ``row_number() <= k`` per source — both keyed shuffles. Recall is
    bucket-local by construction (the ANN tradeoff); raise coverage
    with fewer planes or multiple seeded plane sets unioned.
    """
    if planes is None:
        head = emb.select(vec_col).first()
        if head is None:
            return emb.sparkSession.createDataFrame(
                [], "a long, b long, cosine double"
            )
        planes = _hyperplanes(len(head[0]), n_planes, seed)
    from pyspark.sql import Window

    v = F.col(vec_col).cast("array<double>")
    sigs = emb.select(
        F.col(id_col), v.alias("v"), _signature(v, planes).alias("sig")
    ).persist()
    wb = Window.partitionBy("sig")
    capped = (
        sigs.withColumn("n", F.count(F.lit(1)).over(wb))
        .where(F.col("n") <= max_bucket)
        .drop("n")
    )
    left = capped.select(
        "sig", F.col(id_col).alias("a"), F.col("v").alias("va")
    )
    right = capped.select(
        "sig", F.col(id_col).alias("b"), F.col("v").alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    # each vector carries exactly ONE signature, so the bucket join
    # emits every candidate pair once — no dedup shuffle needed
    scored = (
        left.join(right, "sig")
        .where(F.col("a") != F.col("b"))
        .select("a", "b", F.round(cos, 6).alias("cosine"))
    )
    wk = Window.partitionBy("a").orderBy(
        F.desc("cosine"), F.asc("b")
    )
    out = truncate(
        scored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    sigs.unpersist()
    return out


def ann_recall(
    emb: DataFrame,
    planes: np.ndarray,
    query_mod: int = 97,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_bits: int = 0,
) -> DataFrame:
    """Recall@k of the LSH-bucket ANN path against exact cosine top-k,
    per query — the index-quality certification every ANN deployment
    needs before trusting the approximate path. Queries are the
    deterministic corpus sample ``id % query_mod == 0``; both arms use
    the identical (cosine 6 dp DESC, id ASC) ranking, so recall
    differences measure BUCKETING loss only.

    Returns ``(query_id, n_exact, n_ann, n_hit, recall double)`` with
    ``recall = n_hit / min(k, n_exact)`` — normalized by the achievable
    hit count, so a corpus smaller than k can still score 1.0 (n_ann
    can be < k when the query's bucket is small — exactly the failure
    mode this operator exists to surface).

    Scale shape: the query set is bounded and BROADCAST into both
    arms; the exact arm is the one deliberate brute-force pass (Q × 
    corpus scored rows, the evaluation cost itself — run it on a query
    sample, which is what query_mod is); the ANN arm touches only
    sig-equal rows. Both top-k windows partition BY QUERY, so no
    global sort exists at any scale.

    ``probe_bits``: evaluate the multi-probe arm instead — candidates
    are all vectors whose signature is within that Hamming distance of
    the query's (what :func:`lsh_bucket_topk_planes` probes with the
    same setting), quantifying exactly how much recall each extra
    probed bit buys.
    """
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("vid"), v.alias("ev"))
    signed = base.withColumn("sig", _signature(F.col("ev"), planes))
    queries = signed.where(F.col("vid") % query_mod == 0).select(
        F.col("vid").alias("qid"),
        F.col("ev").alias("qv"),
        F.col("sig").alias("qsig"),
    )
    cos = F.round(
        _dot(F.col("ev"), F.col("qv"))
        / (_norm(F.col("ev")) * _norm(F.col("qv"))),
        6,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vid")

    def _topk(scored: DataFrame) -> DataFrame:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", "vid")
        )

    exact = _topk(
        base.crossJoin(F.broadcast(queries)).select(
            "qid", "vid", cos.alias("cosine")
        )
    )
    # multi-probe arm as an EQUI-join: each query row expands to its
    # Hamming-ball of signatures (index combinations are data-
    # independent, so the flip expressions enumerate driver-side;
    # Σ_{i≤b} C(n, i) strings per query), then sig = psig hash-joins —
    # never a nested-loop Hamming scan of the corpus
    from itertools import combinations

    n_planes = len(planes)

    def _flip(idxs) -> F.Column:
        chars = []
        for j in range(n_planes):
            c = F.substring("qsig", j + 1, 1)
            if j in idxs:
                c = F.when(c == "0", F.lit("1")).otherwise(F.lit("0"))
            chars.append(c)
        return F.concat(*chars) if chars else F.lit("")

    balls = [
        _flip(idxs)
        for d in range(0, probe_bits + 1)
        for idxs in combinations(range(n_planes), d)
    ]
    probes = queries.select(
        "qid", "qv", F.explode(F.array(*balls)).alias("psig")
    )
    ann = _topk(
        signed.join(
            F.broadcast(probes), F.col("sig") == F.col("psig")
        ).select("qid", "vid", cos.alias("cosine"))
    )
    n_exact = exact.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
    n_ann = ann.groupBy("qid").agg(F.count(F.lit(1)).alias("n_ann"))
    n_hit = (
        exact.join(ann, ["qid", "vid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        n_exact.join(n_ann, "qid", "left")
        .join(n_hit, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).alias("n_ann"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0))
                / F.least(F.lit(k), F.col("n_exact")),
                6,
            ).alias("recall"),
        )
    )
