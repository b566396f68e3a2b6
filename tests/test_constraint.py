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
