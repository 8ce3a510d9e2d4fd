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
