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
