"""Tests for Laplacian variants. Golden values mirror reference
tests/laplacian_test.py; the similarity forms are verified spectrally.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralcluster_tpu.ops import affinity as affinity_ops
from spectralcluster_tpu.ops import eigen as eigen_ops
from spectralcluster_tpu.ops import laplacian as lap_ops
from spectralcluster_tpu.types import LaplacianType


def _affinity():
  matrix = np.array([[3, 4], [-4, 3], [6, 8], [-3, -4]], dtype=np.float32)
  return affinity_ops.compute_affinity_matrix(jnp.asarray(matrix))


class TestComputeLaplacian:

  def test_affinity(self):
    affinity = _affinity()
    out = lap_ops.compute_laplacian(affinity, LaplacianType.Affinity)
    np.testing.assert_allclose(np.asarray(affinity), np.asarray(out))

  def test_unnormalized(self):
    out = lap_ops.compute_laplacian(_affinity(), LaplacianType.Unnormalized)
    expected = np.array([[1.5, -0.5, -1, 0], [-0.5, 1.5, -0.5, -0.5],
                         [-1, -0.5, 1.5, 0], [0, -0.5, 0, 0.5]])
    np.testing.assert_allclose(expected, np.asarray(out), atol=1e-5)

  def test_graph_cut(self):
    out = lap_ops.compute_laplacian(_affinity(), LaplacianType.GraphCut)
    expected = np.array([[0.6, -0.2, -0.4, 0], [-0.2, 0.6, -0.2, -0.26],
                         [-0.4, -0.2, 0.6, 0], [0, -0.26, 0, 0.33]])
    np.testing.assert_allclose(expected, np.asarray(out), atol=0.01)

  def test_random_walk(self):
    out = lap_ops.compute_laplacian(_affinity(), LaplacianType.RandomWalk)
    expected = np.array([[0.6, -0.2, -0.4, 0], [-0.2, 0.6, -0.2, -0.2],
                         [-0.4, -0.2, 0.6, 0], [0, -0.33, 0, 0.33]])
    np.testing.assert_allclose(expected, np.asarray(out), atol=0.01)

  def test_type_error(self):
    with pytest.raises(TypeError):
      lap_ops.compute_laplacian(_affinity(), "GraphCut")


class TestLaplacianSimilarity:
  """The similarity forms must have the same spectrum as the direct forms,
  and recover the direct forms' eigenvectors (up to sign/normalization)."""

  @pytest.mark.parametrize("lap_type", [
      LaplacianType.Unnormalized, LaplacianType.GraphCut,
      LaplacianType.RandomWalk
  ])
  def test_spectrum_matches_general_eig(self, lap_type):
    affinity = _affinity()
    direct = np.asarray(
        lap_ops.compute_laplacian(affinity, lap_type), dtype=np.float64)
    w_direct = np.sort(np.linalg.eigvals(direct).real)

    m, scale = lap_ops.laplacian_similarity(affinity, lap_type)
    w_sym, v = eigen_ops.sorted_eigh_similarity(m, scale, descend=False)
    np.testing.assert_allclose(w_direct, np.asarray(w_sym), atol=1e-4)

    # v must be true eigenvectors of the direct (possibly asymmetric) matrix.
    v = np.asarray(v, dtype=np.float64)
    w = np.asarray(w_sym, dtype=np.float64)
    residual = direct @ v - v * w[None, :]
    assert np.abs(residual).max() < 1e-4
    # Unit columns (LAPACK eig convention).
    np.testing.assert_allclose(np.linalg.norm(v, axis=0), 1.0, atol=1e-5)
