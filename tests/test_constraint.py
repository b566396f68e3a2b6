"""Tests for constraint operations. Golden values mirror reference
tests/constraint_test.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralcluster_tpu import constraint
from spectralcluster_tpu.types import (ConstraintName, ConstraintOptions,
                                       IntegrationType)

AFFINITY = jnp.array([[1, 0.25, 0], [0.31, 1, 0], [0, 0, 1.0]])
Q = jnp.array([[1, 1, 0], [1, 1, 0], [0, 0, 0.0]])


class TestAffinityIntegration:

  def test_3by3_matrix(self):
    out = constraint.affinity_integration(AFFINITY, Q, IntegrationType.Max)
    expected = np.array([[1, 1, 0], [1, 1, 0], [0, 0, 1]])
    np.testing.assert_allclose(np.asarray(out), expected, atol=0.01)

  def test_average(self):
    out = constraint.affinity_integration(AFFINITY, Q, IntegrationType.Average)
    expected = 0.5 * (np.asarray(AFFINITY) + np.asarray(Q))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


class TestConstraintPropagation:

  def test_3by3_matrix(self):
    out = constraint.constraint_propagation(AFFINITY, Q, alpha=0.6)
    expected = np.array([[1, 0.97, 0], [1.03, 1, 0], [0, 0, 1]])
    np.testing.assert_allclose(np.asarray(out), expected, atol=0.01)

  def _lu_ground_truth(self, a, q, alpha):
    """Reference closed form in float64 (reference constraint.py:137-164)."""
    a = np.asarray(a, np.float64)
    q = np.asarray(q, np.float64)
    d = a.sum(axis=1)
    inv_sqrt = 1.0 / (np.sqrt(d) + 1e-10)
    a_norm = inv_sqrt[:, None] * a * inv_sqrt[None, :]
    m = np.eye(a.shape[0]) - alpha * a_norm
    f = (1 - alpha) ** 2 * np.linalg.inv(m) @ q @ np.linalg.inv(m)
    pos = f > 0
    return (1 - (1 - f * pos) * (1 - a * pos)) + (1 + f * ~pos) * (a * ~pos)

  @pytest.mark.parametrize("alpha", [0.2, 0.4, 0.6, 0.9])
  def test_neumann_matches_lu_ground_truth(self, alpha):
    # The matmul-only fixed-point solve must reproduce the dense-inverse
    # closed form to float32 accuracy at every preset-relevant alpha
    # (0.4 = turntodiarize preset, 0.6 = reference default).
    rng = np.random.RandomState(0)
    x = rng.randn(64, 8)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    a = ((x @ x.T) + 1) / 2
    scores = rng.rand(64)
    scores[::7] = 0.0
    q = constraint.ConstraintMatrix(scores, threshold=0.5).compute_diagonals()
    out, res = constraint.constraint_propagation(
        jnp.asarray(a, jnp.float32), jnp.asarray(q, jnp.float32),
        alpha=alpha, with_residual=True)
    expected = self._lu_ground_truth(a, q, alpha)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-5)
    assert float(res) <= constraint._NEUMANN_TOL

  def test_asymmetric_affinity_matches_lu(self):
    # E2CP applied after refinement can see an asymmetric matrix; the
    # left/right fixed-point solves must still match the general closed
    # form (no transpose shortcuts).
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32) * 0.5
    np.fill_diagonal(a, 1.0)
    q = np.zeros((32, 32))
    q[0, 1] = q[1, 0] = 1.0
    q[2, 3] = q[3, 2] = -1.0
    out = constraint.constraint_propagation(
        jnp.asarray(a, jnp.float32), jnp.asarray(q, jnp.float32), alpha=0.6)
    expected = self._lu_ground_truth(a, q, 0.6)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-5)

  def test_high_alpha_lu_fallback(self):
    # alpha >= _NEUMANN_ALPHA_MAX routes to the dense LU solve (no
    # geometric-convergence guarantee for the iteration).
    out, res = constraint.constraint_propagation(
        AFFINITY, Q, alpha=0.97, with_residual=True)
    expected = self._lu_ground_truth(AFFINITY, Q, 0.97)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)
    assert float(res) == 0.0

  def test_masked_matches_unmasked(self):
    n = 6
    padded_a = jnp.zeros((n, n)).at[:3, :3].set(AFFINITY)
    padded_q = jnp.zeros((n, n)).at[:3, :3].set(Q)
    out = constraint.constraint_propagation(padded_a, padded_q, alpha=0.6,
                                            n_valid=3)
    unpadded = constraint.constraint_propagation(AFFINITY, Q, alpha=0.6)
    np.testing.assert_allclose(np.asarray(out)[:3, :3], np.asarray(unpadded),
                               atol=1e-5)
    assert np.all(np.asarray(out)[3:, :] == 0)


class TestAdjustAffinityDispatch:

  def test_propagation_options(self):
    opts = ConstraintOptions(
        constraint_name=ConstraintName.ConstraintPropagation,
        apply_before_refinement=True,
        constraint_propagation_alpha=0.6)
    out = constraint.adjust_affinity(AFFINITY, Q, opts)
    expected = np.array([[1, 0.97, 0], [1.03, 1, 0], [0, 0, 1]])
    np.testing.assert_allclose(np.asarray(out), expected, atol=0.01)

  def test_integration_options(self):
    opts = ConstraintOptions(
        constraint_name=ConstraintName.AffinityIntegration,
        apply_before_refinement=False,
        integration_type=IntegrationType.Max)
    out = constraint.adjust_affinity(AFFINITY, Q, opts)
    np.testing.assert_allclose(
        np.asarray(out), np.array([[1, 1, 0], [1, 1, 0], [0, 0, 1]]),
        atol=0.01)


class TestConstraintMatrix:

  def test_3by3_constraint_matrix(self):
    speaker_turn_scores = [0, 0, 14.308253288269043]
    out = constraint.ConstraintMatrix(
        speaker_turn_scores, threshold=1).compute_diagonals()
    expected = np.array([[0, 1, 0], [1, 0, -1], [0, -1, 0]])
    np.testing.assert_equal(out, expected)

  def test_3by3_constraint_matrix_threshold(self):
    speaker_turn_scores = [0, 0, 0.12095779925584793]
    out = constraint.ConstraintMatrix(
        speaker_turn_scores, threshold=1).compute_diagonals()
    expected = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 0]])
    np.testing.assert_equal(out, expected)

  def test_negative_score_raises(self):
    with pytest.raises(ValueError):
      constraint.ConstraintMatrix([0, -1.0])
