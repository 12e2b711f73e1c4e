"""ml module tests: kmeans/GMM clustering, kNN/SVM/logreg classification."""

import numpy as np
import jax
import jax.numpy as jnp

from opencv_tpu.ml import classifiers, clustering


def three_blobs(rng, n=150):
    c = np.array([[0.0, 0.0], [5.0, 5.0], [-4.0, 6.0]])
    x = np.concatenate([rng.normal(ci, 0.5, size=(n, 2)) for ci in c])
    y = np.repeat(np.arange(3), n)
    return x.astype(np.float32), y


def test_kmeans_recovers_blobs(rng):
    x, y = three_blobs(rng)
    res = clustering.kmeans(jax.random.PRNGKey(0), jnp.asarray(x), 3)
    centers = np.sort(np.asarray(res.centers), axis=0)
    want = np.sort(np.array([[0, 0], [5, 5], [-4, 6]], np.float32), axis=0)
    np.testing.assert_allclose(centers, want, atol=0.3)
    # labels consistent within ground-truth clusters
    labels = np.asarray(res.labels)
    for cls in range(3):
        vals, counts = np.unique(labels[y == cls], return_counts=True)
        assert counts.max() / counts.sum() > 0.98


def test_gmm_em_fits_mixture(rng):
    x, _ = three_blobs(rng)
    res = clustering.gmm_em(jax.random.PRNGKey(1), jnp.asarray(x), 3, iters=40)
    w = np.sort(np.asarray(res.weights))
    np.testing.assert_allclose(w, [1 / 3] * 3, atol=0.05)
    means = np.sort(np.asarray(res.means), axis=0)
    want = np.sort(np.array([[0, 0], [5, 5], [-4, 6]], np.float32), axis=0)
    np.testing.assert_allclose(means, want, atol=0.3)
    assert np.asarray(res.variances).max() < 1.0


def test_knn_classifier(rng):
    x, y = three_blobs(rng)
    q, qy = three_blobs(np.random.default_rng(99), n=30)
    pred = np.asarray(
        classifiers.knn_classify(jnp.asarray(x), jnp.asarray(y), jnp.asarray(q), k=7)
    )
    assert (pred == qy).mean() > 0.97


def test_linear_svm_separates(rng):
    n = 200
    x = rng.normal(size=(n, 2)).astype(np.float32)
    y = np.where(x[:, 0] + 0.5 * x[:, 1] > 0.2, 1.0, -1.0).astype(np.float32)
    model = classifiers.train_linear_svm(jnp.asarray(x), jnp.asarray(y), iters=2000)
    pred = np.sign(np.asarray(classifiers.svm_predict(model, jnp.asarray(x))))
    assert (pred == y).mean() > 0.96
    # normal direction recovered
    w = np.asarray(model.w)
    w = w / np.linalg.norm(w)
    np.testing.assert_allclose(np.abs(w @ np.array([1.0, 0.5]) / np.linalg.norm([1.0, 0.5])), 1.0, atol=0.05)


def test_logistic_regression(rng):
    n = 300
    x = rng.normal(size=(n, 3)).astype(np.float32)
    logit = 2.0 * x[:, 0] - 1.0 * x[:, 2] + 0.5
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))).astype(np.float32)
    model = classifiers.train_logistic_regression(jnp.asarray(x), jnp.asarray(y))
    p = np.asarray(classifiers.logistic_predict_proba(model, jnp.asarray(x)))
    acc = ((p > 0.5) == y).mean()
    # data is generatively noisy: compare against the Bayes-optimal
    # predictor using the TRUE weights instead of a fixed accuracy bar
    bayes = ((logit > 0) == y).mean()
    assert acc > bayes - 0.02
    w = np.asarray(model.w)
    assert w[0] > 1.0 and w[2] < -0.3  # signs/magnitudes roughly right
