"""Tests for affinity, eigen utilities and label utilities.

Golden values mirror reference tests/utils_test.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralcluster_tpu import utils
from spectralcluster_tpu.ops import affinity as affinity_ops
from spectralcluster_tpu.ops import eigen as eigen_ops
from spectralcluster_tpu.types import EigenGapType


class TestComputeAffinityMatrix:

  def test_4by2_matrix(self):
    matrix = np.array([[3, 4], [-4, 3], [6, 8], [-3, -4]], dtype=np.float32)
    affinity = np.asarray(affinity_ops.compute_affinity_matrix(
        jnp.asarray(matrix)))
    expected = np.array([[1, 0.5, 1, 0], [0.5, 1, 0.5, 0.5], [1, 0.5, 1, 0],
                         [0, 0.5, 0, 1]])
    np.testing.assert_allclose(expected, affinity, atol=1e-6)


class TestSortedEigh:

  def test_descend_ascend(self):
    matrix = np.array([[1, 2], [3, 4], [1, 3]], dtype=np.float32)
    affinity = affinity_ops.compute_affinity_matrix(jnp.asarray(matrix))
    w, v = eigen_ops.sorted_eigh(affinity, descend=True)
    assert w.shape == (3,)
    assert v.shape == (3, 3)
    assert w[0] > w[1] > w[2]
    w2, v2 = eigen_ops.sorted_eigh(affinity, descend=False)
    assert w2[0] < w2[1] < w2[2]


class TestComputeNumberOfClusters:

  def test_5_values(self):
    eigenvalues = jnp.array([1.0, 0.9, 0.8, 0.2, 0.1])
    n, gap = eigen_ops.compute_number_of_clusters(eigenvalues)
    assert int(n) == 3
    np.testing.assert_allclose(4.0, float(gap), atol=0.01)

  def test_max_clusters(self):
    eigenvalues = jnp.array([1.0, 0.9, 0.8, 0.7, 0.6, 0.5])
    n1, g1 = eigen_ops.compute_number_of_clusters(eigenvalues)
    assert int(n1) == 5
    np.testing.assert_allclose(1.2, float(g1), atol=0.01)
    n2, g2 = eigen_ops.compute_number_of_clusters(eigenvalues, max_clusters=2)
    assert int(n2) == 2
    np.testing.assert_allclose(1.125, float(g2), atol=0.01)

  def test_ascend(self):
    eigenvalues = jnp.array([1.0, 0.9, 0.8, 0.2, 0.1])
    n, gap = eigen_ops.compute_number_of_clusters(
        eigenvalues, max_clusters=3, descend=False)
    assert int(n) == 2
    np.testing.assert_allclose(0.88, float(gap), atol=0.01)

  def test_stop_eigenvalue_break(self):
    # Once an eigenvalue drops below stop_eigenvalue, later gaps are ignored.
    eigenvalues = jnp.array([1.0, 0.5, 0.001, 0.0001, 0.00001])
    n, _ = eigen_ops.compute_number_of_clusters(
        eigenvalues, stop_eigenvalue=0.01)
    assert int(n) == 2

  def test_normalized_diff(self):
    eigenvalues = jnp.array([1.0, 0.9, 0.8, 0.2, 0.1])
    n, gap = eigen_ops.compute_number_of_clusters(
        eigenvalues, eigengap_type=EigenGapType.NormalizedDiff)
    assert int(n) == 3
    np.testing.assert_allclose(0.6, float(gap), atol=0.01)

  def test_masked_matches_unmasked(self):
    vals = jnp.array([1.0, 0.9, 0.8, 0.2, 0.1])
    padded = jnp.concatenate([vals, jnp.array([-1e6, -1e6 - 1])])
    n, gap = eigen_ops.compute_number_of_clusters(padded, n_valid=5)
    assert int(n) == 3
    np.testing.assert_allclose(4.0, float(gap), atol=0.01)

  def test_type_error(self):
    with pytest.raises(TypeError):
      eigen_ops.compute_number_of_clusters(
          jnp.array([1.0, 0.5]), eigengap_type="Ratio")


class TestEnforceOrderedLabels:

  def test_small_array(self):
    labels = np.array([2, 2, 1, 0, 3, 3, 1])
    expected = np.array([0, 0, 1, 2, 3, 3, 1])
    np.testing.assert_equal(expected, utils.enforce_ordered_labels(labels))

  def test_jnp_variant_matches(self):
    rng = np.random.RandomState(0)
    for _ in range(5):
      labels = rng.randint(0, 6, size=20)
      np.testing.assert_equal(
          utils.enforce_ordered_labels(labels),
          np.asarray(utils.enforce_ordered_labels_jnp(jnp.asarray(labels))))


class TestGetClusterCentroids:

  def test_get_centroids(self):
    embeddings = np.array([[1, 2], [3, 4], [5, 6], [7, 8], [9, 0]])
    labels = np.array([0, 1, 1, 2, 0])
    expected = np.array([[5, 1], [4, 5], [7, 8]])
    np.testing.assert_equal(expected,
                            utils.get_cluster_centroids(embeddings, labels))

  def test_jnp_variant(self):
    embeddings = jnp.array([[1.0, 2], [3, 4], [5, 6], [7, 8], [9, 0]])
    labels = jnp.array([0, 1, 1, 2, 0])
    out = np.asarray(
        utils.get_cluster_centroids_jnp(embeddings, labels, 3))
    np.testing.assert_allclose(np.array([[5, 1], [4, 5], [7, 8]]), out)


class TestChainLabels:

  def test_chain(self):
    pre_labels = np.array([0, 0, 1, 1, 2, 3, 1, 1, 5, 4])
    main_labels = np.array([0, 0, 1, 1, 1, 1])
    expected = np.array([0, 0, 0, 0, 1, 1, 0, 0, 1, 1])
    np.testing.assert_equal(expected,
                            utils.chain_labels(pre_labels, main_labels))

  def test_none_pre_labels(self):
    main_labels = np.array([0, 1, 1])
    np.testing.assert_equal(main_labels,
                            utils.chain_labels(None, main_labels))

  def test_bad_shape(self):
    pre_labels = np.array([0, 0, 1, 1, 2, 3, 1, 1, 5, 4])
    main_labels = np.array([0, 0, 1, 1, 1])
    with pytest.raises(ValueError):
      utils.chain_labels(pre_labels, main_labels)
