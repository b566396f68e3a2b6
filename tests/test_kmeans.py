"""Tests for K-Means. Mirrors reference tests/custom_distance_kmeans_test.py
plus masked/traced-k behavior specific to the TPU design.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu import utils
from spectralcluster_tpu.ops import kmeans

MATRIX_6x2 = np.array([
    [1.0, 0.0],
    [1.1, 0.1],
    [0.0, 1.0],
    [0.1, 1.0],
    [0.9, -0.1],
    [0.0, 1.2],
])


def _block_matrix(seed=None):
  matrix = np.array([[1.0, 0, 0, 0, 0, 0]] * 400 + [[0, 1.0, 0, 0, 0, 0]] * 300
                    + [[0, 0, 2.0, 0, 0, 0]] * 200 +
                    [[0, 0, 0, 1.0, 0, 0]] * 100)
  noisy = np.random.rand(1000, 6) * 2 - 1
  return matrix + noisy * 0.1


class TestRunKmeans:

  def test_6by2_matrix_cosine_dist(self):
    labels = kmeans.run_kmeans(MATRIX_6x2, n_clusters=2, max_iter=300,
                               custom_dist="cosine")
    labels = utils.enforce_ordered_labels(labels)
    np.testing.assert_equal(np.array([0, 0, 1, 1, 0, 1]), labels)

  def test_6by2_matrix_euclidean_dist(self):
    labels = kmeans.run_kmeans(MATRIX_6x2, n_clusters=2, max_iter=300,
                               custom_dist="euclidean")
    labels = utils.enforce_ordered_labels(labels)
    np.testing.assert_equal(np.array([0, 0, 1, 1, 0, 1]), labels)

  def test_1000by6_matrix_cosine_dist(self):
    matrix = _block_matrix()
    labels = kmeans.run_kmeans(matrix, n_clusters=4, max_iter=300,
                               custom_dist="cosine")
    labels = utils.enforce_ordered_labels(labels)
    expected = np.array([0] * 400 + [1] * 300 + [2] * 200 + [3] * 100)
    np.testing.assert_equal(expected, labels)

  def test_1000by6_matrix_euclidean_dist(self):
    matrix = _block_matrix()
    labels = kmeans.run_kmeans(matrix, n_clusters=4, max_iter=300,
                               custom_dist="euclidean")
    labels = utils.enforce_ordered_labels(labels)
    expected = np.array([0] * 400 + [1] * 300 + [2] * 200 + [3] * 100)
    np.testing.assert_equal(expected, labels)

  def test_falsy_custom_dist_uses_plain_kmeans(self):
    labels = kmeans.run_kmeans(MATRIX_6x2, n_clusters=2, max_iter=10,
                               custom_dist=None)
    labels = utils.enforce_ordered_labels(labels)
    np.testing.assert_equal(np.array([0, 0, 1, 1, 0, 1]), labels)

  def test_callable_metric(self):
    def sq_diff(u, v):
      return jnp.sum((u - v) ** 2)

    labels = kmeans.run_kmeans(MATRIX_6x2, n_clusters=2, max_iter=300,
                               custom_dist=sq_diff)
    labels = utils.enforce_ordered_labels(labels)
    np.testing.assert_equal(np.array([0, 0, 1, 1, 0, 1]), labels)

  def test_mahalanobis(self):
    labels = kmeans.run_kmeans(MATRIX_6x2, n_clusters=2, max_iter=300,
                               custom_dist="mahalanobis")
    labels = utils.enforce_ordered_labels(labels)
    assert labels.shape == (6,)
    assert len(np.unique(labels)) == 2


class TestMaskedKmeans:
  """TPU-specific: traced n_clusters + padded rows."""

  def test_traced_k_matches_concrete(self):
    x = jnp.asarray(MATRIX_6x2, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    concrete = kmeans.kmeans_fit(x, 2, key, custom_dist="cosine",
                                 max_iter=300)

    @jax.jit
    def jitted(x, n):
      return kmeans.kmeans_fit(x, n, key, custom_dist="cosine", max_iter=300,
                               k_max=4)

    traced = jitted(x, jnp.asarray(2))
    np.testing.assert_equal(
        utils.enforce_ordered_labels(np.asarray(concrete)),
        utils.enforce_ordered_labels(np.asarray(traced)))

  def test_padded_rows_ignored(self):
    x = jnp.zeros((10, 2)).at[:6].set(jnp.asarray(MATRIX_6x2))
    w = (jnp.arange(10) < 6).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    labels = kmeans.kmeans_fit(x, 2, key, custom_dist="cosine", max_iter=300,
                               k_max=2, sample_weight=w)
    got = utils.enforce_ordered_labels(np.asarray(labels)[:6])
    np.testing.assert_equal(np.array([0, 0, 1, 1, 0, 1]), got)


class TestCustomKMeansClass:

  def test_with_given_centroids(self):
    km = kmeans.CustomKMeans(n_clusters=2,
                             centroids=MATRIX_6x2[[0, 2]].astype(np.float32),
                             max_iter=10, custom_dist="cosine")
    labels = utils.enforce_ordered_labels(km.predict(MATRIX_6x2))
    np.testing.assert_equal(np.array([0, 0, 1, 1, 0, 1]), labels)

  def test_random_init(self):
    km = kmeans.CustomKMeans(n_clusters=2, max_iter=10, custom_dist="cosine")
    labels = km.predict(MATRIX_6x2)
    assert labels.shape == (6,)

  def test_validation(self):
    import pytest
    with pytest.raises(ValueError):
      kmeans.CustomKMeans(n_clusters=2, max_iter=0).predict(MATRIX_6x2)
    with pytest.raises(ValueError):
      kmeans.CustomKMeans(n_clusters=10).predict(MATRIX_6x2)
    with pytest.raises(ValueError):
      kmeans.CustomKMeans(n_clusters=2,
                          centroids=np.zeros((3, 2))).predict(MATRIX_6x2)
