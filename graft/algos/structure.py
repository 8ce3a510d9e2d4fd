"""Structural graph metrics: clustering coefficient, transitivity,
degree assortativity, average neighbor degree, per-vertex square (C4)
counts, rich-club coefficients, degree-tail exponent.

The cugraph API family the engine mirrors ships these alongside the
pair-similarity scorers (reference ecosystem: examples/cugraph-cpp-api/
— networkx.clustering / transitivity / degree_assortativity_coefficient
/ average_neighbor_degree are the semantics anchors). All four are pure
DataFrame compositions over the simple (self-loop-free, deduplicated)
adjacency:

- clustering reuses the degree-ranked wedge-close join from
  :mod:`graft.algos.triangles` (one bounded shuffle) plus a degree agg;
- transitivity is 3·triangles over the wedge total Σ d(d−1)/2 — two
  scalar aggs;
- assortativity is one ``corr`` agg over the degree-joined edge list —
  the edge table is scanned once, the (small) degree table joins in
  twice, broadcast-able at any scale;
- average neighbor degree is one degree join + one groupBy-avg.

Nothing here drives data to the driver beyond O(1) scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graft.graph import Graph


def _simple_adj(graph: Graph) -> DataFrame:
    """Directed expansion of the simple graph: both orientations of each
    self-loop-free edge, deduplicated — (a, b) means a—b."""
    return (
        graph.without_self_loops()
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
    )


def _simple_degrees(adj: DataFrame) -> DataFrame:
    """(id, d) — distinct-neighbor count per vertex of the simple graph."""
    return adj.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )


def clustering_coefficient(graph: Graph) -> DataFrame:
    """Per-vertex local clustering coefficient: ``(id, clustering)`` —
    2·T(v) / (d(v)·(d(v)−1)) on the simple graph, 0.0 for vertices of
    degree < 2 (networkx.clustering convention). Every graph vertex gets
    a row, including self-loop-only ones (degree 0 → 0.0).
    """
    from graft.algos.triangles import triangles_per_vertex

    adj = _simple_adj(graph)
    deg = _simple_degrees(adj)
    tri = triangles_per_vertex(graph)
    d = F.coalesce("d", F.lit(0))
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.when(d < 2, F.lit(0.0))
            .otherwise(
                F.round(2.0 * F.col("triangles") / (d * (d - 1)), 6)
            )
            .alias("clustering"),
        )
    )


def transitivity(graph: Graph) -> float:
    """Global transitivity: 3·triangles / Σ_v C(d(v), 2) — the fraction
    of length-2 paths that close (networkx.transitivity). 0.0 on a
    wedge-free graph."""
    from graft.algos.triangles import triangle_count

    n_tri = triangle_count(graph)
    wedges = (
        _simple_degrees(_simple_adj(graph))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2))
        .first()[0]
    )
    if not wedges:
        return 0.0
    return 3.0 * n_tri / float(wedges)


def degree_assortativity(graph: Graph) -> float:
    """Degree assortativity coefficient: the Pearson correlation of the
    endpoint degrees over the (both-orientations) simple edge list —
    networkx.degree_assortativity_coefficient. NaN-free: returns 0.0
    when either marginal is constant (correlation undefined)."""
    adj = _simple_adj(graph)
    deg = _simple_degrees(adj)
    # ANSI mode makes F.corr raise DIVIDE_BY_ZERO on constant marginals;
    # assemble Pearson from its pieces and guard the denominator here
    cov, sa, sb = (
        adj.join(deg.select(F.col("id").alias("a"),
                            F.col("d").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"),
                         F.col("d").alias("db")), "b")
        .agg(
            F.covar_pop("da", "db"),
            F.stddev_pop("da"),
            F.stddev_pop("db"),
        )
        .first()
    )
    if not sa or not sb:  # null/zero: constant-degree marginals
        return 0.0
    return float(cov) / (float(sa) * float(sb))


def avg_neighbor_degree(graph: Graph) -> DataFrame:
    """Per-vertex mean neighbor degree on the simple graph:
    ``(id, knn)`` (networkx.average_neighbor_degree, unweighted). Every
    graph vertex gets a row; neighborless vertices score 0.0."""
    adj = _simple_adj(graph)
    deg = _simple_degrees(adj)
    knn = (
        adj.join(
            deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b"
        )
        .groupBy(F.col("a").alias("id"))
        .agg(F.avg("db").alias("knn"))
    )
    return graph.vertices().join(knn, "id", "left").select(
        "id", F.round(F.coalesce("knn", F.lit(0.0)), 6).alias("knn")
    )


def square_count(graph: Graph) -> DataFrame:
    """Per-vertex 4-cycle (square) counts on the simple graph:
    ``(id, squares long)`` — the number of (not necessarily induced)
    cycles u—w1—v—w2 through each vertex, the standard C4 statistic
    behind square clustering (Lind–González–Herrmann 2005 /
    networkx.square_clustering's numerator).

    Identity: every 4-cycle through x has a unique diagonal opposite y
    (the non-adjacent-in-the-cycle fourth vertex), and its two midpoints
    are common neighbors of {x, y} — so
    ``squares(x) = Σ_y C(common(x, y), 2)`` over unordered pairs, with
    each cycle counted once per member vertex via its own diagonal.

    Plan: ONE wedge self-join keyed on the shared midpoint w (the same
    shuffle class as triangle counting: Σ_w d(w)² wedge pairs — on
    hub-heavy corpora cap adjacency upstream via
    graft.algos.sampling hub caps, and AQE skew-splits the w key),
    one pair groupBy, one union-groupBy back to vertices. Nothing
    driver-sized.
    """
    adj = _simple_adj(graph)
    pairs = (
        adj.select(F.col("b").alias("u"), F.col("a").alias("w"))
        .join(adj.select(F.col("b").alias("v"), F.col("a").alias("w")), "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select(
            "u",
            "v",
            (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("s"),
        )
    )
    per = (
        pairs.select(F.col("u").alias("id"), "s")
        .unionAll(pairs.select(F.col("v").alias("id"), "s"))
        .groupBy("id")
        .agg(F.sum("s").alias("squares"))
    )
    return graph.vertices().join(per, "id", "left").select(
        "id", F.coalesce("squares", F.lit(0)).cast("long").alias("squares")
    )


def rich_club(graph: Graph, ks: tuple[int, ...] = (1, 2, 4, 8, 16)) -> DataFrame:
    """Rich-club coefficients ``(k, n_nodes, n_edges, phi)`` — for each
    degree threshold k: the vertices of simple degree > k, the simple
    edges with BOTH endpoints above threshold, and the realized density
    φ(k) = 2·E_k / (N_k·(N_k−1)) (Colizza et al. 2006, unnormalized;
    networkx.rich_club_coefficient semantics). φ is 0.0 when fewer than
    two vertices qualify. The standard probe for whether hub actors
    form their own tightly-wired core — i.e. whether hub mitigation
    must also handle hub-hub edges.

    Plan: degree agg once, two broadcast degree joins onto the
    single-counted edge list, then a tiny literal k-table cross-joined
    (broadcast) against the two aggregates — one pass over edges
    regardless of how many thresholds are asked for.
    """
    spark = graph.edges.sparkSession
    adj = _simple_adj(graph)
    deg = _simple_degrees(adj)
    und = adj.where(F.col("a") < F.col("b"))
    em = (
        und.join(
            deg.select(F.col("id").alias("a"), F.col("d").alias("da")), "a"
        )
        .join(
            deg.select(F.col("id").alias("b"), F.col("d").alias("db")), "b"
        )
        .select(F.least("da", "db").alias("m"))
    )
    ksdf = spark.createDataFrame(
        [(int(k),) for k in sorted(set(ks))], "k long"
    )
    nk = (
        F.broadcast(ksdf).crossJoin(deg)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") > F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_nodes")
        )
    )
    ek = (
        F.broadcast(ksdf).crossJoin(em)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("m") > F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_edges")
        )
    )
    n, e = F.col("n_nodes"), F.col("n_edges")
    return (
        ksdf.join(nk, "k", "left")
        .join(ek, "k", "left")
        .select(
            "k",
            F.coalesce(n, F.lit(0)).cast("long").alias("n_nodes"),
            F.coalesce(e, F.lit(0)).cast("long").alias("n_edges"),
        )
        .select(
            "k",
            "n_nodes",
            "n_edges",
            F.when(n >= 2, F.round(2.0 * e / (n * (n - 1)), 6))
            .otherwise(F.lit(0.0))
            .alias("phi"),
        )
    )


def reciprocity(graph: Graph) -> DataFrame:
    """Directed-graph reciprocity as one row ``(n_directed,
    n_reciprocal, reciprocity)`` — the fraction of distinct non-loop
    directed edges whose reverse edge also exists
    (networkx.reciprocity over the whole graph). On a transcript-derived
    actor graph this measures conversational turn-taking symmetry:
    ~1.0 = strict alternation protocols, ~0.0 = one-way pipelines
    (announcer → tool chains). Takes the DIRECTED edge table
    (graft.io.transcripts_to_directed_edges); on a symmetrized
    undirected graph it is trivially 1.0.

    Plan: one distinct + one self-join on the reversed key + one scalar
    agg — no driver-side data, broadcast-free, AQE handles skew.
    """
    de = (
        graph.without_self_loops().select("src", "dst").distinct()
    )
    rev = de.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("has_rev"),
    )
    n, r = F.col("n_directed"), F.col("n_reciprocal")
    return (
        de.join(rev, ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_directed"),
            F.sum(F.coalesce("has_rev", F.lit(0)))
            .cast("long")
            .alias("n_reciprocal"),
        )
        .select(
            "n_directed",
            "n_reciprocal",
            F.when(n == 0, F.lit(0.0))
            .otherwise(F.round(r / n, 6))
            .alias("reciprocity"),
        )
    )


def powerlaw_alpha(graph: Graph, d_min: int = 2) -> DataFrame:
    """One-row ``(alpha double, n_tail long, d_min long)`` — the
    continuous maximum-likelihood (Hill) estimate of the degree-tail
    exponent over simple degrees d >= d_min:

        alpha = 1 + n / sum(ln(d_i / (d_min - 0.5)))

    using the Clauset–Shalizi–Newman −0.5 discreteness correction. The
    standard summary of how heavy-tailed an interaction graph is — the
    number that decides whether hub mitigation (salting, adjacency
    caps) is needed on a new transcript corpus before running it.
    Cost: one degree agg + one scalar agg; nothing driver-sized.
    alpha is NULL when no tail vertex exists (empty fit). Rounded to
    6 dp so aggregation order never shows.
    """
    deg = _simple_degrees(_simple_adj(graph))
    tail = deg.where(F.col("d") >= d_min)
    return tail.agg(
        F.round(
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("d") / (d_min - 0.5))),
            6,
        ).alias("alpha"),
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(d_min).cast("long").alias("d_min"),
    )


def attribute_mixing(graph: Graph, attrs: DataFrame) -> DataFrame:
    """Categorical mixing matrix over the simple graph:
    ``(ca, cb, frac double)`` — the fraction of (both-orientations)
    self-loop-free edges whose endpoints carry categories (ca, cb)
    (networkx.attribute_mixing_matrix semantics; symmetric for
    undirected input by construction). ``attrs`` is ``(id, cat)``;
    edges with an unlabeled endpoint are excluded (inner join).

    Scale: one edge scan + two attrs joins (attrs is vertex-sized and
    usually broadcast-able) + one category-pair hash-agg; the result is
    bounded by #categories², and the normalizing total rides as a
    broadcast cross join — no driver collect.
    """
    adj = _simple_adj(graph)
    la = attrs.select(F.col("id").alias("a"), F.col("cat").alias("ca"))
    lb = attrs.select(F.col("id").alias("b"), F.col("cat").alias("cb"))
    cnt = (
        adj.join(la, "a")
        .join(lb, "b")
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = cnt.agg(F.sum("c").alias("t"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "ca", "cb", (F.col("c") / F.col("t")).alias("frac")
    )


def attribute_assortativity(graph: Graph, attrs: DataFrame) -> DataFrame:
    """Newman's categorical assortativity coefficient as ONE row
    ``(assortativity double)``:

        r = (Σ_i e_ii − Σ_i a_i b_i) / (1 − Σ_i a_i b_i)

    over the attribute mixing matrix e (attribute_mixing), with a_i/b_i
    its row/column marginals (networkx
    .attribute_assortativity_coefficient). Defined as 1.0 when every
    labeled edge stays within one category (denominator 0 — trivially
    perfectly assortative). All arithmetic happens on the
    #categories²-bounded mixing table; nothing is collected.
    """
    mix = attribute_mixing(graph, attrs)
    tr = mix.where(F.col("ca") == F.col("cb")).agg(
        F.coalesce(F.sum("frac"), F.lit(0.0)).alias("tr")
    )
    am = mix.groupBy(F.col("ca").alias("cat")).agg(F.sum("frac").alias("ai"))
    bm = mix.groupBy(F.col("cb").alias("cat")).agg(F.sum("frac").alias("bi"))
    ab = (
        am.join(bm, "cat")
        .agg(F.coalesce(F.sum(F.col("ai") * F.col("bi")), F.lit(0.0)).alias("ab"))
    )
    return (
        tr.crossJoin(F.broadcast(ab))
        .select(
            F.when(
                F.lit(1.0) - F.col("ab") != 0,
                (F.col("tr") - F.col("ab")) / (F.lit(1.0) - F.col("ab")),
            )
            .otherwise(F.lit(1.0))
            .alias("assortativity")
        )
    )


def four_clique_count(graph: Graph) -> int:
    """Global K4 (4-clique) census of the simple graph — the next
    graphlet up from triangles (networkx would spell it
    ``sum(1 for _ in enumerate_all_cliques if len == 4)``); with
    triangles and squares it completes the 3-4-vertex motif profile
    used for graph fingerprinting.

    Enumeration: ascending-id orientation — each K4 {a<b<c<d} is
    produced exactly once by extending its lexicographic triangle
    (a,b,c) with the (c,d) edge and closing (a,d),(b,d): four hash
    joins over the single-counted edge list, no correction factor.
    Same shuffle class as triangle counting (wedge joins); on
    hub-heavy graphs cap adjacency upstream (top-k sparsifier /
    sampling hub caps) exactly as for squares — the K4 count of the
    capped graph is then a documented lower bound.
    """
    se = (
        _simple_adj(graph)
        .where(F.col("a") < F.col("b"))
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    tri = (
        se.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(
            se.select(F.col("u").alias("a"), F.col("v").alias("c")), "a"
        )
        .where(F.col("b") < F.col("c"))
        .join(
            se.select(F.col("u").alias("b"), F.col("v").alias("c")),
            ["b", "c"],
            "leftsemi",
        )
    )
    k4 = (
        tri.join(
            se.select(F.col("u").alias("c"), F.col("v").alias("d")), "c"
        )
        .join(
            se.select(F.col("u").alias("a"), F.col("v").alias("d")),
            ["a", "d"],
            "leftsemi",
        )
        .join(
            se.select(F.col("u").alias("b"), F.col("v").alias("d")),
            ["b", "d"],
            "leftsemi",
        )
    )
    return k4.count()
