"""Tests for AutoTune. Mirrors reference tests/autotune_test.py, including the
white-box test driving _compute_eigenvectors_ncluster through a hand-built
ratio callback.
"""

import numpy as np
import pytest

import conftest

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


@pytest.mark.skipif(not conftest.reference_available(),
                    reason="reference package not available")
class TestAutotuneDeepSearchParity:
  """Differential test of tune() vs the reference at search_level>=3.

  The reference loop (reference autotune.py:76-132) has subtle semantics:
  memoized candidates are skipped via float-keyed dict membership; the winner
  index is taken within the *full* candidate range; `min_ratio` resets to inf
  at each level, so the final result is the best among the LAST level's
  un-searched candidates (possibly worse than a previous level's global best);
  and a level with no new candidates narrows around a stale index. We assert
  identical callback-invocation sequences and identical outputs.
  """

  @staticmethod
  def _make_callback(record, ratio_fn):
    def cb(p):
      record.append(float(p))
      # Eigenvector payload tags which candidate produced the winner.
      return ratio_fn(p), np.full((4, 4), p), int(1 + round(p * 100) % 5)
    return cb

  def _run_both(self, ratio_fn, **kwargs):
    ref = conftest.import_reference()
    ours_calls, ref_calls = [], []
    at_ours = autotune.AutoTune(**kwargs)
    at_ref = ref.AutoTune(**kwargs)
    got_ours = at_ours.tune(self._make_callback(ours_calls, ratio_fn))
    got_ref = at_ref.tune(self._make_callback(ref_calls, ratio_fn))
    # Exact same candidate sequence, including memoized-candidate skips
    # across levels (bitwise-equal linspace regeneration).
    assert ours_calls == ref_calls
    v1, n1, p1 = got_ours
    v2, n2, p2 = got_ref
    assert p1 == p2
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # The final search state narrows identically.
    assert at_ours.search_step == at_ref.search_step
    assert at_ours.p_percentile_min == at_ref.p_percentile_min
    assert at_ours.p_percentile_max == at_ref.p_percentile_max
    return p1, len(ours_calls)

  @pytest.mark.parametrize("level", [1, 2, 3, 5])
  @pytest.mark.parametrize("pmin,pmax,step", [
      (0.60, 0.95, 0.01),   # turn-to-diarize preset grid
      (0.40, 0.90, 0.10),   # coarse grid: strong level overlap -> memo skips
      (0.60, 0.95, 0.05),
  ])
  def test_multimodal_ratio(self, level, pmin, pmax, step):
    # Multimodal proxy: narrowing decisions and level winners are nontrivial.
    def ratio_fn(p):
      return float(np.sin(37.0 * p) + 0.5 * np.cos(11.0 * p) + (p - 0.8) ** 2)

    self._run_both(ratio_fn, p_percentile_min=pmin, p_percentile_max=pmax,
                   init_search_step=step, search_level=level)

  @pytest.mark.parametrize("level", [2, 3, 4])
  def test_sharp_spike_last_level_wins_quirk(self, level):
    # A single sharp dip at one level-1 grid point: later levels' linspace
    # rarely regenerates it bitwise, so the reference's per-level min_ratio
    # reset makes a *worse* later candidate the final winner. We must agree.
    grid = np.linspace(0.60, 0.95, int(np.ceil((0.95 - 0.60) / 0.05)))
    spike = float(grid[len(grid) // 2])

    def ratio_fn(p):
      return -100.0 if float(p) == spike else float((p - 0.9) ** 2)

    self._run_both(ratio_fn, p_percentile_min=0.60, p_percentile_max=0.95,
                   init_search_step=0.05, search_level=level)

  def test_memoized_level_keeps_previous_winner(self):
    # Narrowed range that regenerates only already-searched values exercises
    # the no-new-candidates branch (stale winner + stale index narrowing).
    def ratio_fn(p):
      return float(abs(p - 0.75))

    self._run_both(ratio_fn, p_percentile_min=0.50, p_percentile_max=1.00,
                   init_search_step=0.25, search_level=4)
