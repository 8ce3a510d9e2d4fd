"""Embedding moments + PCA/whitening vs exact numpy on the same rows."""

import numpy as np
import pytest

from graft.pipeline.embeddings import (
    embedding_moments,
    pca_components,
    project_embeddings,
    whiten_embeddings,
)


def _synth(rng, n=300, d=8):
    # anisotropic: stretch two directions so PCA has a real signal
    base = rng.standard_normal((n, d))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.5
    base += rng.standard_normal(d) * 3.0  # nonzero mean
    return base


@pytest.fixture(scope="module")
def emb_np():
    return _synth(np.random.default_rng(7))


@pytest.fixture(scope="module")
def emb_df(spark, emb_np):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(emb_np)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(5).cache()


def test_moments_match_numpy(emb_df, emb_np):
    n, mean, cov = embedding_moments(emb_df)
    assert n == len(emb_np)
    np.testing.assert_allclose(mean, emb_np.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(
        cov, np.cov(emb_np.T, bias=True), rtol=1e-8, atol=1e-10
    )


def test_moments_skip_null_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    n, mean, cov = embedding_moments(df)
    assert n == 2
    np.testing.assert_allclose(mean, [2.0, 4.0])
    np.testing.assert_allclose(cov, [[1.0, 2.0], [2.0, 4.0]])


def test_moments_empty_raises(spark):
    df = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        embedding_moments(df)


def test_pca_components_orthonormal_and_deterministic(emb_np):
    cov = np.cov(emb_np.T, bias=True)
    vals, comps = pca_components(cov, 4)
    # descending eigenvalues, orthonormal rows
    assert all(vals[i] >= vals[i + 1] for i in range(3))
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    # sign convention: the largest-|coeff| entry of each row is positive
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # matches numpy eigh up to the same convention
    w, v = np.linalg.eigh(cov)
    np.testing.assert_allclose(vals, w[::-1][:4], rtol=1e-10)
    # stretched axes dominate
    assert vals[0] > 4 * vals[2]


def test_pca_components_k_bounds(emb_np):
    cov = np.cov(emb_np.T, bias=True)
    with pytest.raises(ValueError):
        pca_components(cov, 0)
    with pytest.raises(ValueError):
        pca_components(cov, cov.shape[0] + 1)


def test_projection_matches_numpy(emb_df, emb_np):
    n, mean, cov = embedding_moments(emb_df)
    vals, comps = pca_components(cov, 3)
    got = {
        r.vec_id: np.array(r.projected)
        for r in project_embeddings(emb_df, mean, comps).collect()
    }
    want = (emb_np - emb_np.mean(axis=0)) @ comps.T
    assert len(got) == len(emb_np)
    for i, row in enumerate(want):
        np.testing.assert_allclose(got[i], np.round(row, 6), atol=2e-6)


def _kmeans_ref(x, ids, k, n_iter):
    """Exact Lloyd reference with the engine's conventions: vec_id%k
    partition init, 6-dp-rounded distances, lowest-cid ties, empty
    clusters keep their previous centroid."""
    d = x.shape[1]
    cents = np.zeros((k, d))
    assign = ids % k
    for j in range(k):
        if (assign == j).any():
            cents[j] = x[assign == j].mean(axis=0)
    for _ in range(n_iter):
        d2 = np.round(
            ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6
        )
        assign = d2.argmin(axis=1)
        for j in range(k):
            if (assign == j).any():
                cents[j] = x[assign == j].mean(axis=0)
    return assign, cents


def test_kmeans_matches_lloyd_reference(emb_df, emb_np):
    from graft.pipeline.embeddings import kmeans

    ids = np.arange(len(emb_np))
    for n_iter in (0, 2):
        adf, cents = kmeans(emb_df, k=5, n_iter=n_iter)
        got = {r.vec_id: r.centroid_id for r in adf.collect()}
        want_a, want_c = _kmeans_ref(emb_np, ids, 5, n_iter)
        assert got == {int(i): int(a) for i, a in zip(ids, want_a)}
        np.testing.assert_allclose(cents, want_c, atol=1e-9)


def test_kmeans_improves_inertia(emb_df, emb_np):
    """Lloyd monotonicity: 3 rounds never score worse than 1."""
    from graft.pipeline.embeddings import kmeans

    def inertia(adf, cents):
        a = {r.vec_id: r.centroid_id for r in adf.collect()}
        return sum(
            ((emb_np[i] - cents[a[i]]) ** 2).sum() for i in a
        )

    a1, c1 = kmeans(emb_df, k=4, n_iter=1)
    a3, c3 = kmeans(emb_df, k=4, n_iter=3)
    assert inertia(a3, c3) <= inertia(a1, c1) + 1e-9


def test_kmeans_negative_ids_use_pmod(spark):
    """Regression: negative vector ids must land in [0, k) at init
    (Spark/C-style % would emit negative cluster ids and corrupt the
    recentroid fold via numpy index wraparound)."""
    from graft.pipeline.embeddings import kmeans

    df = spark.createDataFrame(
        [(-1, [0.0, 0.0]), (-2, [1.0, 1.0]), (3, [10.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    for n_iter in (0, 1):
        adf, cents = kmeans(df, k=2, n_iter=n_iter)
        got = {r.vec_id: r.centroid_id for r in adf.collect()}
        assert set(got) == {-1, -2, 3}
        assert all(0 <= c < 2 for c in got.values())
        assert np.isfinite(cents).all()
    # init semantics: pmod(-1,2)=1, pmod(-2,2)=0, pmod(3,2)=1
    adf0, cents0 = kmeans(df, k=2, n_iter=0)
    got0 = {r.vec_id: r.centroid_id for r in adf0.collect()}
    assert got0 == {-1: 1, -2: 0, 3: 1}
    np.testing.assert_allclose(cents0[0], [1.0, 1.0])
    np.testing.assert_allclose(cents0[1], [5.0, 5.0])


def test_kmeans_validates_args(emb_df):
    from graft.pipeline.embeddings import kmeans

    with pytest.raises(ValueError):
        kmeans(emb_df, k=0)
    with pytest.raises(ValueError):
        kmeans(emb_df, k=3, n_iter=-1)


def test_whitening_gives_unit_variance(emb_df, emb_np):
    k = 4
    got = np.array(
        [r.projected for r in whiten_embeddings(emb_df, k).collect()]
    )
    assert got.shape == (len(emb_np), k)
    var = got.var(axis=0)
    np.testing.assert_allclose(var, np.ones(k), rtol=1e-3)
    # whitened dims are uncorrelated
    c = np.cov(got.T, bias=True)
    np.testing.assert_allclose(c - np.diag(np.diag(c)), 0, atol=1e-3)
