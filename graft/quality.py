"""Partition quality functions: CPM and modularity (SURVEY.md §2.3 A6/A7).

Both are computed from two hash aggregations — per-community internal
weight (join + filter same-community + groupBy) and per-community
strength/size sums — the closed forms that replace the reference's
naive O(V²) pair loops (custom_leiden.py:169-199) and its two-phase
CUDA reduce (csrc/src/leiden_kernel.cu:781-824 + :1273-1292).

Conventions (SURVEY.md §1.4 item 1):
- ``m`` is single-counted total edge weight, self-loops once;
- internal weight ``w_in_c`` is single-counted, self-loops once;
- strength ``k`` counts self-loops twice;
- CPM uses the single-counted Python convention
  H = Σ_c [w_in_c − γ·n_c·(n_c−1)/2].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _community_internal_weight(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """(community, w_in) — single-counted internal weight per community.

    ``edges`` symmetrized (each non-loop edge twice, loops once);
    ``assign`` = (id, community). Internal non-loop edges appear twice in
    the joined table, loops once, so w_in = (non_loop_sum)/2 + loop_sum.
    """
    a_src = assign.select(
        F.col("id").alias("src"), F.col("community").alias("c_src")
    )
    a_dst = assign.select(
        F.col("id").alias("dst"), F.col("community").alias("c_dst")
    )
    joined = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("c_src") == F.col("c_dst"))
    )
    return joined.groupBy(F.col("c_src").alias("community")).agg(
        (
            (
                F.sum(F.when(F.col("src") != F.col("dst"), F.col("weight")).otherwise(F.lit(0.0)))
                / 2.0
            )
            + F.sum(
                F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(F.lit(0.0))
            )
        ).alias("w_in")
    )


def cpm(edges: DataFrame, assign: DataFrame, gamma: float) -> float:
    """Constant Potts Model quality, single-counted convention
    (custom_leiden.py:238-260 semantics)."""
    sizes = assign.groupBy("community").agg(
        F.sum(F.coalesce(F.col("agg_count"), F.lit(1))).alias("n")
        if "agg_count" in assign.columns
        else F.count(F.lit(1)).alias("n")
    )
    w_in = _community_internal_weight(edges, assign)
    row = (
        sizes.join(w_in, "community", "left")
        .agg(
            F.sum(
                F.coalesce("w_in", F.lit(0.0))
                - F.lit(gamma) * F.col("n") * (F.col("n") - 1) / 2.0
            )
        )
        .first()
    )
    return float(row[0] or 0.0)


def conductance(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-community conductance φ(C) = cut(C) / min(vol(C), vol(V∖C)).

    ``cut`` is the single-counted weight of edges with exactly one
    endpoint in C; ``vol`` is the sum of member strengths (self-loops
    twice). A community with zero boundary-able volume (vol = 0 or
    vol = 2m) scores 0.0. Returns ``(community, cut double,
    volume double, conductance double)``.

    Cost: the same two hash aggregations the quality functions use —
    one assignment join + groupBy for cut, one for volume; no per-pair
    work, so it holds on 10^11-edge partitions.
    """
    a_src = assign.select(
        F.col("id").alias("src"), F.col("community").alias("c_src")
    )
    a_dst = assign.select(
        F.col("id").alias("dst"), F.col("community").alias("c_dst")
    )
    joined = edges.join(a_src, "src").join(a_dst, "dst")
    # symmetrized table holds each boundary edge once per direction →
    # grouping by the src side single-counts the cut per community
    cut = (
        joined.where(F.col("c_src") != F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.sum("weight").alias("cut"))
    )
    vol = joined.groupBy(F.col("c_src").alias("community")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight") * 2).otherwise(
                F.col("weight")
            )
        ).alias("volume")
    )
    two_m = edges.agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight") * 2).otherwise(
                F.col("weight")
            )
        ).alias("t")
    ).first()["t"] or 0.0
    denom = F.least(F.col("volume"), F.lit(two_m) - F.col("volume"))
    return (
        vol.join(cut, "community", "left")
        .select(
            "community",
            F.coalesce("cut", F.lit(0.0)).alias("cut"),
            "volume",
            F.when(denom > 0, F.coalesce("cut", F.lit(0.0)) / denom)
            .otherwise(F.lit(0.0))
            .alias("conductance"),
        )
    )


def edge_cut(edges: DataFrame, assign: DataFrame) -> float:
    """Total single-counted weight of edges whose endpoints lie in
    different clusters — cugraph ``analyzeClustering_edge_cut``, the
    quantity spectral balanced-cut clustering minimizes. One assignment
    join per endpoint + one global sum over the symmetrized table
    (each boundary edge appears once per direction, so the sum is
    halved)."""
    a_src = assign.select(
        F.col("id").alias("src"), F.col("community").alias("c_src")
    )
    a_dst = assign.select(
        F.col("id").alias("dst"), F.col("community").alias("c_dst")
    )
    total = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("c_src") != F.col("c_dst"))
        .agg(F.sum("weight"))
        .first()[0]
    )
    return float(total or 0.0) / 2.0


def ratio_cut(edges: DataFrame, assign: DataFrame) -> float:
    """Σ_C cut(C) / |C| — cugraph ``analyzeClustering_ratio_cut``
    (cut(C) = single-counted boundary weight of cluster C, |C| = member
    count). Clusters with no members in the edge table contribute 0.
    Same two keyed aggregations as :func:`conductance`, plus one tiny
    per-cluster join — no per-pair work at any scale."""
    a_src = assign.select(
        F.col("id").alias("src"), F.col("community").alias("c_src")
    )
    a_dst = assign.select(
        F.col("id").alias("dst"), F.col("community").alias("c_dst")
    )
    # per-cluster single-counted cut: grouping the symmetrized boundary
    # rows by the src side counts each boundary edge once per cluster
    cut = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("c_src") != F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.sum("weight").alias("cut"))
    )
    size = assign.groupBy("community").agg(F.count(F.lit(1)).alias("n"))
    total = (
        size.join(cut, "community", "left")
        .agg(F.sum(F.coalesce("cut", F.lit(0.0)) / F.col("n")))
        .first()[0]
    )
    return float(total or 0.0)


def partition_agreement(
    labels_a: DataFrame,
    labels_b: DataFrame,
    label_col: str = "community",
) -> DataFrame:
    """Agreement between two labelings: NMI and Adjusted Rand Index.

    The standard instruments for comparing community detections — e.g.
    Leiden vs Louvain on the same graph, a warm-started refresh vs a
    cold run, or an engine labeling vs ground truth (the comparisons
    the reference performs by eye across its example drivers,
    examples/test1.py:44-61). Both inputs are ``(id, <label_col>)``
    tables; agreement is computed over the inner-joined id set.

    Returns ONE row ``(n long, nmi double, ari double)``:

    - ``nmi`` = MI(A,B) / mean(H(A), H(B)) (arithmetic normalization,
      sklearn's default); defined as 1.0 when both entropies are 0
      (two trivial single-cluster partitions agree perfectly).
    - ``ari`` = (Σij C(nij,2) − E) / (½[Σi C(ai,2) + Σj C(bj,2)] − E)
      with E = Σi C(ai,2)·Σj C(bj,2)/C(n,2) (Hubert–Arabie); defined
      as 1.0 when the denominator is 0 (both partitions trivial).

    Scale shape: one id equi-join, one (label_a, label_b) contingency
    hash-agg, then all arithmetic over contingency-sized tables whose
    row count is bounded by #communities_a × #communities_b (the pairs
    that actually co-occur), never by |V| or |E|. The scalar total
    rides along as a broadcast cross join — no driver collect.
    """
    a = labels_a.select(
        F.col("id"), F.col(label_col).cast("string").alias("ca")
    )
    b = labels_b.select(
        F.col("id"), F.col(label_col).cast("string").alias("cb")
    )
    cont = (
        a.join(b, "id")
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("double").alias("nij"))
    )
    ma = cont.groupBy("ca").agg(F.sum("nij").alias("ai"))
    mb = cont.groupBy("cb").agg(F.sum("nij").alias("bj"))
    tot = cont.agg(F.sum("nij").alias("n"))

    def comb2(c):
        return F.col(c) * (F.col(c) - 1) / 2.0

    mi_row = (
        cont.join(F.broadcast(ma), "ca")
        .join(F.broadcast(mb), "cb")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("nij") / F.col("n"))
                * F.log(F.col("n") * F.col("nij") / (F.col("ai") * F.col("bj")))
            ).alias("mi"),
            F.sum(comb2("nij")).alias("s_nij"),
        )
    )
    ha_row = ma.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("ai") / F.col("n")) * F.log(F.col("ai") / F.col("n")))).alias("h_a"),
        F.sum(comb2("ai")).alias("s_a"),
    )
    hb_row = mb.crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("bj") / F.col("n")) * F.log(F.col("bj") / F.col("n")))).alias("h_b"),
        F.sum(comb2("bj")).alias("s_b"),
    )
    exp_idx = F.col("s_a") * F.col("s_b") / (F.col("n") * (F.col("n") - 1) / 2.0)
    max_idx = (F.col("s_a") + F.col("s_b")) / 2.0
    return (
        tot.crossJoin(F.broadcast(mi_row))
        .crossJoin(F.broadcast(ha_row))
        .crossJoin(F.broadcast(hb_row))
        .select(
            F.col("n").cast("long").alias("n"),
            F.when(
                F.col("h_a") + F.col("h_b") > 0,
                2.0 * F.col("mi") / (F.col("h_a") + F.col("h_b")),
            )
            .otherwise(F.lit(1.0))
            .alias("nmi"),
            F.when(
                max_idx - exp_idx != 0,
                (F.col("s_nij") - exp_idx) / (max_idx - exp_idx),
            )
            .otherwise(F.lit(1.0))
            .alias("ari"),
        )
    )


def modularity(edges: DataFrame, assign: DataFrame) -> float:
    """Q = Σ_c [Σin_c/(2m) − (Σtot_c/(2m))²] (custom_louvain.py:92-122
    semantics via the closed form, SURVEY.md §2.3 A7). Σin is the
    double-counted internal weight (= 2·w_in)."""
    strengths = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight") * 2).otherwise(
                F.col("weight")
            )
        ).alias("k")
    )
    m_row = edges.agg(
        (
            (
                F.sum("weight")
                + F.sum(
                    F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(
                        F.lit(0.0)
                    )
                )
            )
            / 2.0
        ).alias("m")
    ).first()
    m = float(m_row["m"] or 0.0)
    if m == 0:
        return 0.0
    stot = (
        assign.join(strengths, "id")
        .groupBy("community")
        .agg(F.sum("k").alias("stot"))
    )
    w_in = _community_internal_weight(edges, assign)
    row = (
        stot.join(w_in, "community", "left")
        .agg(
            F.sum(
                F.coalesce("w_in", F.lit(0.0)) * 2 / (2 * m)
                - (F.col("stot") / (2 * m)) * (F.col("stot") / (2 * m))
            )
        )
        .first()
    )
    return float(row[0] or 0.0)


def community_profile(edges: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-community dashboard row: ``(community, n_members, volume,
    cut, w_in, n_in_edges, conductance, density)`` — the summary table
    an analyst asks for right after any community detection ("how big,
    how dense, how well separated is each cluster?").

    Conventions shared with :func:`conductance` / :func:`modularity`:
    volume = member strengths (loops twice); cut = single-counted
    boundary weight; ``w_in`` = single-counted internal weight (loops
    once); ``n_in_edges`` = distinct internal simple edges; density =
    n_in_edges / C(n_members, 2) (0.0 for singletons); all floats 6 dp.

    Plan shape: the per-edge label join (two broadcast-able assignment
    joins) feeds ONE conditional-sum hash agg producing volume, cut,
    w_in, and n_in_edges together — no extra pass per metric — plus a
    member-count agg on the (vertex-sized) assignment; both aggs are
    map-side combinable and the final join keys on the community id.
    """
    a_src = assign.select(
        F.col("id").alias("src"), F.col("community").alias("c_src")
    )
    a_dst = assign.select(
        F.col("id").alias("dst"), F.col("community").alias("c_dst")
    )
    j = edges.join(a_src, "src").join(a_dst, "dst")
    loop = F.col("src") == F.col("dst")
    same = F.col("c_src") == F.col("c_dst")
    prof = j.groupBy(F.col("c_src").alias("community")).agg(
        F.sum(
            F.when(loop, F.col("weight") * 2).otherwise(F.col("weight"))
        ).alias("volume"),
        F.sum(
            F.when(~same, F.col("weight")).otherwise(F.lit(0.0))
        ).alias("cut"),
        F.sum(
            F.when(
                same,
                F.when(loop, F.col("weight")).otherwise(
                    F.col("weight") / 2
                ),
            ).otherwise(F.lit(0.0))
        ).alias("w_in"),
        F.count(
            F.when(same & (F.col("src") < F.col("dst")), F.lit(1))
        ).alias("n_in_edges"),
    )
    members = assign.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    two_m = edges.agg(
        F.sum(
            F.when(loop, F.col("weight") * 2).otherwise(F.col("weight"))
        )
    ).first()[0] or 0.0
    denom = F.least(F.col("volume"), F.lit(two_m) - F.col("volume"))
    pairs = F.col("n_members") * (F.col("n_members") - 1)
    # left join: a community of edge-less (isolated/padded) vertices
    # still gets a profile row — all-zero metrics, not a dropped row
    return members.join(prof, "community", "left").select(
        "community",
        "n_members",
        F.round(F.coalesce("volume", F.lit(0.0)), 6).alias("volume"),
        F.round(F.coalesce("cut", F.lit(0.0)), 6).alias("cut"),
        F.round(F.coalesce("w_in", F.lit(0.0)), 6).alias("w_in"),
        F.coalesce("n_in_edges", F.lit(0)).alias("n_in_edges"),
        F.round(
            F.when(denom > 0, F.coalesce("cut", F.lit(0.0)) / denom)
            .otherwise(0.0),
            6,
        ).alias("conductance"),
        F.round(
            F.when(
                pairs > 0,
                2.0 * F.coalesce("n_in_edges", F.lit(0)) / pairs,
            )
            .otherwise(0.0),
            6,
        ).alias("density"),
    )
