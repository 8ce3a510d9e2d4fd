"""Link-prediction evaluation: deterministic edge holdout + AUC.

Completes the engine's link-prediction family (the jaccard/overlap/
sorensen/salton + Adamic-Adar/resource-allocation scorers,
``negative_samples``, ``assign_splits``) with the EVALUATION half: hold
out a deterministic fraction of edges, score the held-out positives
against distance-2 "hard" negatives on the remaining train graph with
the common-neighbor scorer, and report the tie-corrected Mann-Whitney
AUC.

Scale notes (the reason this is NOT rank-over-a-global-sort):
- the holdout is a pure hash expression (the same portable md5-prefix
  construction as graft.pipeline.splits) — no RNG state, stable under
  reruns/partitioning/appends;
- candidate scoring is ONE wedge join over the train adjacency, the
  same degree-bounded pattern as triangle counting and the pair
  scorers; hub midpoints can be capped with ``max_mid_degree``
  (hub-mediated wedges are the skew case AND the least informative
  candidates);
- ranks are never materialized: the tie-corrected AUC is computed from
  the per-score (n_pos, n_neg) histogram — AUC = Σ_s np_s·(nn_below(s)
  + nn_s/2) / (np·nn) — whose row count is bounded by the number of
  DISTINCT scores (≤ the max common-neighbor count), so the only
  ordered window in the plan runs over a histogram-sized table, not
  the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graft.graph import Graph
from graft.pipeline.splits import _MOD, _u60


def _pair_hash(salt: str) -> F.Column:
    """Portable 60-bit hash of the canonical pair key ``u|v``."""
    return _u60(F.concat_ws("|", "u", "v"), salt)


def link_pred_auc(
    graph: Graph,
    test_frac: float = 0.2,
    neg_frac: float = 1.0,
    salt: str = "lp",
    max_mid_degree: int | None = None,
) -> DataFrame:
    """Returns one row ``(n_pos long, n_neg long, auc double)``.

    Protocol: the undirected simple edge set (u < v) is split by the
    md5-prefix hash of ``u|v`` — edges below ``test_frac`` of the hash
    space are held-out positives, the rest form the train graph. Every
    distance-2 pair of the train graph is scored with its train
    common-neighbor count; pairs that are NOT edges of the ORIGINAL
    graph (train or test) are the negatives, optionally thinned to
    ``neg_frac`` by a second salt. Positives score via the same
    candidate table (a held-out edge with no surviving common neighbor
    scores 0 — kept, not dropped). AUC is the tie-corrected Mann-Whitney
    statistic, 0.5 when either class is empty; 6 dp.

    ``max_mid_degree``: skip wedge midpoints with train degree above
    the cap. At 10^12-turn scale hub actors (role:* vertices) mediate
    quadratically many wedges while carrying the least signal — cap
    them (e.g. 10^4) to bound the wedge join; the contract oracle runs
    uncapped.
    """
    if not 0.0 < test_frac < 1.0:
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    simple = graph.without_self_loops().select("src", "dst").distinct()
    und = simple.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    is_test = _pair_hash(f"{salt}-test") < int(test_frac * _MOD)
    test = und.where(is_test)
    train = und.where(~is_test)
    adj = train.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(train.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    if max_mid_degree is not None:
        deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        adj = adj.join(
            deg.where(F.col("d") <= max_mid_degree).select("src"), "src",
            "left_semi",
        )
    left = adj.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    right = adj.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    cand = (
        left.join(right, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    pos = test.join(cand, ["u", "v"], "left").select(
        F.coalesce("nc", F.lit(0)).alias("score"), F.lit(1).alias("is_pos")
    )
    neg = cand.join(und, ["u", "v"], "left_anti")
    if neg_frac < 1.0:  # the default keeps every row — skip the hash
        neg = neg.where(
            _pair_hash(f"{salt}-neg") < int(neg_frac * _MOD)
        )
    neg = neg.select(F.col("nc").alias("score"), F.lit(0).alias("is_pos"))
    hist = (
        pos.unionAll(neg)
        .groupBy("score")
        .agg(
            F.sum("is_pos").alias("np_s"),
            (F.count(F.lit(1)) - F.sum("is_pos")).alias("nn_s"),
        )
    )
    below_w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "np_s",
        "nn_s",
        F.coalesce(F.sum("nn_s").over(below_w), F.lit(0)).alias("below"),
    )
    # coalesce: an empty histogram (degenerate graph) is (0, 0, 0.5)
    n_pos = F.coalesce(F.sum("np_s"), F.lit(0))
    n_neg = F.coalesce(F.sum("nn_s"), F.lit(0))
    num = F.sum(F.col("np_s") * (F.col("below") + F.col("nn_s") / 2.0))
    return cum.agg(
        n_pos.cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
        F.round(
            F.when(n_pos * n_neg == 0, F.lit(0.5)).otherwise(
                num / (n_pos * n_neg)
            ),
            6,
        ).alias("auc"),
    )
