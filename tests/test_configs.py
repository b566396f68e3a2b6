"""Tests for preset configs. Mirrors reference tests/configs_test.py."""

import numpy as np

from spectralcluster_tpu import configs, constraint, utils

MATRIX_6x2 = np.array([
    [1.0, 0.0],
    [1.1, 0.1],
    [0.0, 1.0],
    [0.1, 1.0],
    [0.9, -0.1],
    [0.0, 1.2],
])
EXPECTED_6x2 = np.array([0, 0, 1, 1, 0, 1])


class TestIcassp2018:

  def test_1000by6_matrix(self):
    matrix = np.array([[1.0, 0, 0, 0, 0, 0]] * 400 +
                      [[0, 1.0, 0, 0, 0, 0]] * 300 +
                      [[0, 0, 2.0, 0, 0, 0]] * 200 +
                      [[0, 0, 0, 1.0, 0, 0]] * 100)
    noisy = np.random.rand(1000, 6) * 2 - 1
    matrix = matrix + noisy * 0.1
    labels = configs.make_icassp2018_clusterer().predict(matrix)
    labels = utils.enforce_ordered_labels(labels)
    expected = np.array([0] * 400 + [1] * 300 + [2] * 200 + [3] * 100)
    np.testing.assert_equal(expected, labels)


class TestTurnToDiarize:

  def test_6by2_matrix(self):
    speaker_turn_scores = [0, 0, 1.5, 0, 1.5, 1.5]
    constraint_matrix = constraint.ConstraintMatrix(
        speaker_turn_scores, threshold=1).compute_diagonals()
    clusterer = configs.make_turntodiarize_clusterer()
    labels = clusterer.predict(MATRIX_6x2, constraint_matrix)
    labels = utils.enforce_ordered_labels(labels)
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_6by2_matrix_no_constraint(self):
    clusterer = configs.make_turntodiarize_clusterer()
    labels = clusterer.predict(MATRIX_6x2, constraint_matrix=None)
    labels = utils.enforce_ordered_labels(labels)
    np.testing.assert_equal(EXPECTED_6x2, labels)
