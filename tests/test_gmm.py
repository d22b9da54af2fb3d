import jax
import numpy as np
from sklearn.metrics import adjusted_rand_score
from sklearn.mixture import GaussianMixture

from neural_admixture_tpu.ops.gmm import fit_gmm


def _blobs(N=600, D=8, K=3, sep=6.0, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=sep, size=(K, D))
    labels = rng.integers(0, K, size=N)
    X = means[labels] + rng.normal(size=(N, D))
    return X.astype(np.float32), labels, means


def _assign(X, means):
    d2 = ((X[:, None, :] - means[None]) ** 2).sum(-1)
    return d2.argmin(1)


def test_gmm_recovers_blobs():
    X, labels, true_means = _blobs()
    res = fit_gmm(X, 3, jax.random.PRNGKey(0))
    got = _assign(X, np.asarray(res.means))
    assert adjusted_rand_score(labels, got) > 0.98


def test_gmm_agrees_with_sklearn_clustering():
    """Cluster-structure agreement with the reference's sklearn call
    (model/train.py:61-67) -- rank-level parity, not bitwise."""
    X, _, _ = _blobs(N=400, K=4, sep=5.0, seed=3)
    res = fit_gmm(X, 4, jax.random.PRNGKey(42))
    skl = GaussianMixture(n_components=4, n_init=5, init_params="k-means++",
                          tol=1e-4, covariance_type="full", max_iter=100,
                          random_state=42).fit(X.astype(np.float64))
    ours = _assign(X, np.asarray(res.means))
    theirs = skl.predict(X.astype(np.float64))
    assert adjusted_rand_score(ours, theirs) > 0.95


def test_gmm_weights_sum_to_one():
    X, _, _ = _blobs(N=200, K=2, seed=5)
    res = fit_gmm(X, 2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(np.sum(np.asarray(res.weights))), 1.0,
                               rtol=1e-5)
    assert np.isfinite(float(res.lower_bound))
