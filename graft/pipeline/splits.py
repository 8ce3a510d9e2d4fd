"""Deterministic sampling and dataset split assignment.

The two bookkeeping primitives every training-data build needs at
10^12-row scale, done WITHOUT RNG state so any engine, any
partitioning, and any rerun produce the identical row set:

- :func:`deterministic_sample` — Bernoulli(p) keep-decision from the
  md5 of (key, salt). Reproducible subsampling for eval sets, ablation
  corpora, or debugging slices; changing ``salt`` draws an independent
  sample.
- :func:`assign_splits` — proportional train/val/test (any named
  fractions) assignment from the same hash, so a document's split is a
  pure function of its key: stable under reruns, ingestion order,
  cluster size, and incremental appends — the property that prevents
  train/test leakage when the corpus grows.

Both are single column expressions (no shuffle, no Python) and both
are DuckDB-replayable bit-for-bit: the decision value is the first 15
hex digits of md5, a 60-bit uniform integer (the same portable-hash
construction as graft.algos.priority and the WL recolor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 2**60


def _u60(col: F.Column, salt: str) -> F.Column:
    """60-bit uniform hash of (col, salt) — md5-prefix, engine-portable."""
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(col.cast("string"), F.lit(f"#{salt}")),
                           "UTF-8")),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def deterministic_sample(
    df: DataFrame, p: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Rows whose hash bucket falls below ``p`` — a deterministic
    Bernoulli(p) sample keyed by ``key_col``. Identical output for any
    partitioning/rerun; disjoint salts give independent samples."""
    return df.where(_u60(F.col(key_col), salt) < int(p * _MOD))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    scale: float = 1.0,
    salt: str = "wsample",
) -> DataFrame:
    """Rows kept with probability ``min(1, scale * weight)`` — the
    quality-weighted (importance) variant of
    :func:`deterministic_sample`, still a pure hash decision: a row
    survives iff its 60-bit hash falls below its OWN scaled weight.
    The standard corpus shaping move ("keep high-quality docs with
    prob ∝ quality score, epoch-stable"): deterministic under reruns,
    partitioning, and appends, and monotone in ``scale`` — raising
    the budget only ADDS rows, never swaps them, because each row's
    hash threshold moves up while its hash stays fixed.

    ``weight_col`` must be in [0, 1/scale] for exact proportionality
    (values above the cap simply always survive). One column
    expression, no shuffle, no Python.
    """
    # raw double product on purpose (no rounding step): both engines
    # evaluate w*scale*2^60 with the same IEEE ops, so the keep set is
    # bit-identical in the DuckDB oracle
    thr = F.least(
        F.col(weight_col).cast("double") * float(scale) * float(_MOD),
        F.lit(float(_MOD)),
    )
    return df.where(_u60(F.col(key_col), salt) < thr)


def assign_splits(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column assigning each row to a named fraction
    (default train/val/test = 0.9/0.05/0.05) by hash range — a pure
    function of (key, salt), so appends never reshuffle existing rows
    between splits. Weights are normalized; assignment boundaries are
    cumulative fractions of the 60-bit hash space."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    h = _u60(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = h < int(acc * _MOD)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def source_mix_plan(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
) -> DataFrame:
    """Per-source acceptance plan realizing a target corpus mixture
    (the pretraining "data mixing" step: e.g. 40% web / 30% code /
    30% papers from unbalanced raw pools).

    Solves for the largest feasible corpus: the bottleneck source is
    the one with the smallest ``n_s / w_s`` ratio; the feasible total
    is ``T = min_s(n_s / w_s)`` and each source contributes
    ``k_s = w_s * T`` docs, i.e. acceptance rate ``p_s = k_s / n_s``
    (the bottleneck source is taken whole, over-represented pools are
    down-sampled). Sources absent from ``weights`` are dropped.

    Returns ``(source, n_avail, weight, accept_rate)`` — one row per
    weighted source, rates rounded to 6 dp. Everything is one tiny
    groupBy; nothing is collected to the driver.
    """
    total = sum(weights.values())
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, w / total) for s, w in sorted(weights.items())],
        f"{source_col} string, weight double",
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_avail"))
    # LEFT join from the weight table: a weighted source with ZERO
    # available docs must drive T to 0 (the mixture is infeasible and
    # the plan says so with all-zero rates), not silently vanish and
    # let the remaining sources fill 100% of a mixture the caller
    # never asked for. Unweighted sources still drop (weights side).
    per = wdf.join(counts, source_col, "left").select(
        source_col,
        F.coalesce("n_avail", F.lit(0)).alias("n_avail"),
        "weight",
    )
    # feasible total T = min(n_s / w_s); computed in-plan (scalar agg
    # cross-joined back — source-count-sized, never data-sized)
    t = per.agg(
        F.min(F.col("n_avail") / F.col("weight")).alias("_t")
    )
    return (
        per.crossJoin(F.broadcast(t))
        .select(
            source_col,
            "n_avail",
            F.round("weight", 6).alias("weight"),
            F.round(
                F.when(
                    F.col("n_avail") > 0,
                    F.least(
                        F.lit(1.0),
                        F.col("weight") * F.col("_t") / F.col("n_avail"),
                    ),
                ).otherwise(0.0),
                6,
            ).alias("accept_rate"),
        )
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """The mixed corpus: rows selected by the :func:`source_mix_plan`
    acceptance rates via the same deterministic md5 hash-threshold rule
    as :func:`deterministic_sample` — a pure function of (key, salt),
    so the selection is identical across engines, partitionings, and
    reruns, and appending new docs never flips existing decisions.

    Realized per-source counts are hash-binomial around ``p_s * n_s``
    (exact-k selection would need a per-source global sort; the
    threshold rule is one scan, no shuffle of the corpus side — the
    plan table is broadcast). Returns the input rows + ``accept_rate``.
    """
    plan = source_mix_plan(df, weights, source_col)
    return (
        df.join(F.broadcast(plan.select(source_col, "accept_rate")),
                source_col)
        .where(
            _u60(F.col(key_col), salt)
            < (F.col("accept_rate") * F.lit(float(_MOD))).cast("long")
        )
    )
