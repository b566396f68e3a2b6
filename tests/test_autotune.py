"""Tests for AutoTune. Mirrors reference tests/autotune_test.py, including the
white-box test driving _compute_eigenvectors_ncluster through a hand-built
ratio callback.
"""

import numpy as np

from spectralcluster_tpu import autotune
from spectralcluster_tpu.clusterer import SpectralClusterer
from spectralcluster_tpu.ops import affinity as affinity_ops
from spectralcluster_tpu.types import (LaplacianType, RefinementName,
                                       RefinementOptions, ThresholdType)


class TestAutotune:

  def test_get_percentile_range(self):
    at = autotune.AutoTune(
        p_percentile_min=0.60, p_percentile_max=0.66,
        init_search_step=0.01, search_level=1)
    expected = [0.60, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66]
    np.testing.assert_allclose(np.array(at.get_percentile_range()),
                               np.array(expected), atol=0.01)

  def test_update_percentile_range(self):
    at = autotune.AutoTune(
        p_percentile_min=0.4, p_percentile_max=0.9,
        init_search_step=0.1, search_level=1)
    got = at.update_percentile_range(0.5, 0.8, 0.05)
    expected = [0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80]
    np.testing.assert_allclose(np.array(got), np.array(expected), atol=0.01)

  def test_6by2matrix_tune(self):
    matrix = np.array([
        [1.0, 0.0],
        [1.1, 0.1],
        [0.0, 1.0],
        [0.1, 1.0],
        [0.9, -0.1],
        [0.0, 1.2],
    ])
    refinement_options = RefinementOptions(
        thresholding_type=ThresholdType.Percentile,
        refinement_sequence=(RefinementName.RowWiseThreshold,))
    at = autotune.AutoTune(
        p_percentile_min=0.60, p_percentile_max=0.95,
        init_search_step=0.05, search_level=1)
    clusterer = SpectralClusterer(
        max_clusters=2,
        refinement_options=refinement_options,
        autotune=at,
        laplacian_type=LaplacianType.GraphCut,
        row_wise_renorm=True)

    affinity = np.asarray(
        affinity_ops.compute_affinity_matrix(matrix.astype(np.float32)))

    def p_percentile_to_ratio(p_percentile):
      eigenvectors, n_clusters, max_delta_norm = (
          clusterer._compute_eigenvectors_ncluster(
              affinity, p_percentile=p_percentile))
      ratio = (1 - p_percentile) / max_delta_norm
      return ratio, eigenvectors, n_clusters

    eigenvectors, n_clusters, p_percentile = at.tune(p_percentile_to_ratio)
    assert eigenvectors.shape == (6, 6)
    assert n_clusters == 2
    assert p_percentile == 0.6

  def test_multi_level_narrows_range(self):
    # The hierarchical search halves the step and narrows around the winner.
    calls = []

    def batch_eval(ps):
      calls.append(np.array(ps))
      ratios = (np.array(ps) - 0.7) ** 2
      fake_v = np.zeros((len(ps), 3, 3))
      fake_n = np.full(len(ps), 2)
      return ratios, fake_v, fake_n

    at = autotune.AutoTune(
        p_percentile_min=0.5, p_percentile_max=0.9,
        init_search_step=0.1, search_level=3)
    _, n, best_p = at.tune_batched(batch_eval)
    assert n == 2
    assert abs(best_p - 0.7) < 0.1
    assert len(calls) >= 2
    assert at.search_step < 0.1
