"""Embedding statistics and PCA/whitening — the standard conditioning
pass a training-data pipeline runs over an embedding column before
near-dup detection, ANN indexing, or clustering (mean-centering kills
the anisotropy bias in cosine scores; whitening equalizes directions so
LSH hyperplanes and IVF centroids spread evenly).

Scale shape (the part that matters at 100 TB):

- :func:`embedding_moments` — ONE Arrow-batched ``mapInPandas`` pass
  emits per-batch partial sums (count, Σx as a d-vector, ΣxxT as a
  flattened d×d matrix — d² floats per batch, independent of batch
  row count), then a pos-exploded hash-agg folds the partials. The
  embedding scan is never shuffled; the shuffled data is
  O(#batches · d²), not O(n · d²). Nothing row-scaled ever reaches
  the driver — only the final d and d² aggregates (parameter-bounded
  by the embedding dimension, 64 here).
- :func:`pca_components` — numpy ``eigh`` on the d×d covariance at the
  driver (d is small by definition; this is the same
  "tiny-dense-matrix at the driver, big scan on the cluster" split as
  the IVF coarse quantizer, graft/pipeline/similarity.py). Eigenvector
  SIGN is fixed deterministically (the largest-|coefficient| entry is
  made positive, ties to the lower index) so results are
  engine-portable.
- :func:`project_embeddings` — one Arrow-batched matmul pass maps each
  vector to its top-k scores (optionally whitened by 1/√eigenvalue);
  same kernel shape as :func:`graft.pipeline.similarity.ivf_assign`.

Oracle strategy: the MOMENTS are plain SQL (unnest + group-by) and are
hash-certified by the driver contract (`embedding_mean`,
`embedding_covariance`); the eigendecomposition has no SQL twin and is
pytest-certified against numpy on the exact same rows
(tests/test_embeddings_pca.py), including the determinism of the sign
convention and the whitening variance identity.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """Returns ``(n, mean, cov)`` — row count, d-vector mean and d×d
    POPULATION covariance of the embedding column, computed in one
    distributed pass of per-batch numpy partial sums. NULL vectors are
    skipped; raises ValueError on an effectively empty column. Only
    O(d²) scalars cross to the driver."""
    d_probe = emb.select(F.size(vec_col).alias("d")).where(
        F.col(vec_col).isNotNull()
    ).first()
    if d_probe is None:
        raise ValueError("embedding column has no non-null vectors")
    d = int(d_probe["d"])

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            m = np.array(vecs, dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [int(m.shape[0])],
                    "s": [m.sum(axis=0).tolist()],
                    "ss": [(m.T @ m).ravel().tolist()],
                }
            )

    partials = emb.select(vec_col).mapInPandas(
        fn, schema="n long, s array<double>, ss array<double>"
    )
    # partials: one tiny row per Arrow batch. Fold with a pos-keyed agg
    # (arrays aren't summable directly); d + d² groups, trivially small.
    folded = (
        partials.select(
            "n", F.posexplode(F.concat("s", "ss")).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.sum("x").alias("x"), F.sum("n").alias("cnt"))
        .collect()
    )
    if not folded:
        raise ValueError("embedding column has no non-null vectors")
    # each partial row explodes once per pos, carrying its batch count —
    # so per-pos Σn is the global n; read it off pos 0
    by_pos = {int(r["pos"]): float(r["x"]) for r in folded}
    n = int(next(r["cnt"] for r in folded if r["pos"] == 0))
    s = np.array([by_pos[i] for i in range(d)])
    ss = np.array([by_pos[d + i] for i in range(d * d)]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(
    cov: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal axes of a covariance matrix: returns
    ``(eigvals desc [k], components [k, d])``. Deterministic sign: each
    component's largest-|coefficient| entry (lowest index on ties) is
    made positive."""
    d = cov.shape[0]
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    vals = w[order]
    comps = v[:, order].T  # (k, d)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return vals, comps


def project_embeddings(
    emb: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    eigvals: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-12,
) -> DataFrame:
    """Projects each embedding onto the principal axes: returns
    ``(id_col, projected array<double>)`` with
    ``projected = components @ (x - mean)``, additionally scaled by
    ``1/sqrt(eigval + eps)`` per axis when ``eigvals`` is given (PCA
    whitening — unit variance per output dimension). One Arrow-batched
    matmul pass; the (k, d) component matrix ships with the kernel
    exactly like the IVF centroid matrix. NULL vectors are dropped."""
    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64)
    scale = None
    if eigvals is not None:
        scale = 1.0 / np.sqrt(np.asarray(eigvals, dtype=np.float64) + eps)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            keep = pdf[pdf[vec_col].notna()]
            if keep.empty:
                continue
            m = np.array(list(keep[vec_col]), dtype=np.float64)
            proj = (m - mu) @ w.T
            if scale is not None:
                proj = proj * scale
            yield pd.DataFrame(
                {
                    id_col: keep[id_col].to_numpy(),
                    "projected": list(np.round(proj, 6)),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, projected array<double>"
    )


def _nearest_cids(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Shared nearest-centroid rule: argmin squared L2, distances
    compared at 6 dp, ties to the LOWER centroid id (SQL-reproducible;
    np.argmin returns the first minimum)."""
    c = np.asarray(centroids, dtype=np.float64)
    d2 = np.round(
        (m * m).sum(axis=1)[:, None]
        - 2.0 * (m @ c.T)
        + (c * c).sum(axis=1),
        6,
    )
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment: ``(id_col, centroid_id)`` — argmin
    squared L2 distance, distances compared at 6 dp with ties going to
    the LOWER centroid id (engine-portable, SQL-reproducible). One
    Arrow-batched matmul pass; the (k, d) centroid matrix ships with
    the kernel (same shape as :func:`similarity.ivf_assign`). NULL
    vectors are dropped."""
    c = np.asarray(centroids, dtype=np.float64)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            keep = pdf[pdf[vec_col].notna()]
            if keep.empty:
                continue
            m = np.array(list(keep[vec_col]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    id_col: keep[id_col].to_numpy(),
                    "centroid_id": _nearest_cids(m, c),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, centroid_id long"
    )


def _centroid_means(
    emb: DataFrame,
    centroids: np.ndarray | None,
    k: int,
    d: int,
    prev: np.ndarray,
    vec_col: str,
    id_col: str,
) -> np.ndarray:
    """One FUSED Lloyd half-round: assign each vector in-kernel (argmin
    against ``centroids``, or the pmod(id, k) partition init when
    ``centroids`` is None) and emit per-(batch, cid) partial sums — no
    assignment table is ever joined back, so the embedding scan is
    never shuffled; ≤ k tiny rows leave each Arrow batch and only
    k·(d+1) scalars reach the driver. An emptied cluster keeps its
    previous centroid (the standard Lloyd convention)."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            keep = pdf[pdf[vec_col].notna()]
            if keep.empty:
                continue
            m = np.array(list(keep[vec_col]), dtype=np.float64)
            if centroids is None:
                # np.mod is pmod (sign of divisor): safe for any id
                cids = np.mod(keep[id_col].to_numpy(), k)
            else:
                cids = _nearest_cids(m, centroids)
            rows = []
            for cid in np.unique(cids):
                sel = m[cids == cid]
                rows.append(
                    {
                        "cid": int(cid),
                        "n": int(sel.shape[0]),
                        "s": sel.sum(axis=0).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    partials = emb.select(id_col, vec_col).mapInPandas(
        fn, schema="cid long, n long, s array<double>"
    )
    folded = (
        partials.select("cid", "n", F.posexplode("s").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.sum("x").alias("x"), F.sum("n").alias("cnt"))
        .collect()
    )
    out = prev.copy()
    sums = np.zeros((k, d))
    counts = np.zeros(k, dtype=np.int64)
    for r in folded:
        sums[int(r["cid"]), int(r["pos"])] = float(r["x"])
        counts[int(r["cid"])] = int(r["cnt"])
    nonempty = counts > 0
    out[nonempty] = sums[nonempty] / counts[nonempty, None]
    return out


def kmeans(
    emb: DataFrame,
    k: int,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd k-means over the embedding column: returns the final
    ``(id_col, centroid_id)`` assignment and the (k, d) centroid
    matrix after ``n_iter`` rounds.

    Init is the deterministic random-partition scheme: centroid j =
    mean of the vectors with ``pmod(id_col, k) == j`` — fully
    SQL-expressible, so a fixed-iteration run has an exact DuckDB twin
    (the `kmeans_2iter` contract row unrolls two Lloyd rounds).

    Per round: ONE fused Arrow-matmul pass assigns in-kernel and emits
    per-cid partial sums directly (≤ k·(d+1) scalars shuffled per
    batch) — the assignment is never materialized or joined back, so
    at 10^12-row scale each round is exactly one scan with no
    row-scaled shuffle; one final assignment pass produces the output
    table. Empty clusters keep their previous centroid."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    base = emb.where(F.col(vec_col).isNotNull())
    d_probe = base.select(F.size(vec_col).alias("d")).first()
    if d_probe is None:
        raise ValueError("embedding column has no non-null vectors")
    d = int(d_probe["d"])
    cents = _centroid_means(
        base, None, k, d, np.zeros((k, d)), vec_col, id_col
    )
    assign_cents: np.ndarray | None = None
    for _ in range(n_iter):
        assign_cents = cents
        cents = _centroid_means(
            base, assign_cents, k, d, cents, vec_col, id_col
        )
    if assign_cents is None:  # n_iter == 0: the partition init itself
        assign = base.select(
            id_col,
            F.pmod(F.col(id_col), F.lit(k)).cast("long")
            .alias("centroid_id"),
        )
    else:
        assign = kmeans_assign(base, assign_cents, vec_col, id_col)
    return assign, cents


def whiten_embeddings(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The composed convenience pass: moments → top-k PCA → whitened
    projection, ``(id_col, projected array<double>)`` with per-dimension
    unit population variance (up to eps). Two scans of the embedding
    table total (one for moments, one to project)."""
    _, mean, cov = embedding_moments(emb, vec_col)
    vals, comps = pca_components(cov, k)
    return project_embeddings(
        emb, mean, comps, eigvals=vals, vec_col=vec_col, id_col=id_col
    )
