"""Tests for refinement ops. Golden values mirror reference
tests/refinement_test.py; masked variants are checked for padding-invariance.
"""

import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu.ops import refinement as ref_ops
from spectralcluster_tpu.types import (RefinementName, RefinementOptions,
                                       SymmetrizeType, ThresholdType)

M3 = jnp.array([[1.0, 2, 3], [3, 4, 5], [4, 2, 1]])
M3F = jnp.array([[0.5, 2.0, 3.0], [3.0, 4.0, 5.0], [4.0, 2.0, 1.0]])


class TestCropDiagonal:

  def test_3by3_matrix(self):
    out = np.asarray(ref_ops.crop_diagonal(M3))
    expected = np.array([[3, 2, 3], [3, 5, 5], [4, 2, 4]])
    np.testing.assert_equal(expected, out)

  def test_masked_matches(self):
    padded = jnp.zeros((6, 6)).at[:3, :3].set(M3)
    out = np.asarray(ref_ops.crop_diagonal(padded, n_valid=3))[:3, :3]
    np.testing.assert_equal(np.array([[3, 2, 3], [3, 5, 5], [4, 2, 4]]), out)

  def test_all_negative_rows_match_reference(self):
    # Reference zero-fills the diagonal and includes it in the row max
    # (refinement.py:146-150), so all-negative rows get a 0 diagonal —
    # reachable via a user-injected affinity_function.
    neg = jnp.array([[-1.0, -2.0], [-3.0, -4.0]])
    out = np.asarray(ref_ops.crop_diagonal(neg))
    np.testing.assert_equal(np.array([[0.0, -2.0], [-3.0, 0.0]]), out)

  def test_single_element(self):
    out = np.asarray(ref_ops.crop_diagonal(jnp.array([[5.0]])))
    np.testing.assert_equal(np.array([[0.0]]), out)
    assert np.isfinite(out).all()


class TestGaussianBlur:

  def test_3by3_matrix(self):
    out = np.asarray(ref_ops.gaussian_blur(M3, sigma=1))
    expected = np.array([[2.12, 2.61, 3.10], [2.76, 2.90, 3.06],
                         [3.16, 2.78, 2.46]])
    np.testing.assert_allclose(expected, out, atol=0.01)

  def test_masked_matches(self):
    padded = jnp.zeros((8, 8)).at[:3, :3].set(M3)
    out = np.asarray(ref_ops.gaussian_blur(padded, sigma=1, n_valid=3))
    unmasked = np.asarray(ref_ops.gaussian_blur(M3, sigma=1))
    np.testing.assert_allclose(unmasked, out[:3, :3], atol=1e-5)
    assert np.all(out[3:, :] == 0) and np.all(out[:, 3:] == 0)


class TestRowWiseThreshold:

  def test_percentile(self):
    out = np.asarray(ref_ops.row_wise_threshold(
        M3F, 0.5, 0.01, ThresholdType.Percentile))
    expected = np.array([[0.005, 2.0, 3.0], [0.03, 4.0, 5.0],
                         [4.0, 2.0, 0.01]])
    np.testing.assert_allclose(expected, out, atol=0.001)

  def test_row_max(self):
    out = np.asarray(ref_ops.row_wise_threshold(
        M3F, 0.5, 0.01, ThresholdType.RowMax))
    expected = np.array([[0.005, 2.0, 3.0], [3.0, 4.0, 5.0], [4.0, 2.0, 0.01]])
    np.testing.assert_allclose(expected, out, atol=0.001)

  def test_binarization(self):
    out = np.asarray(ref_ops.row_wise_threshold(
        M3F, 0.5, 0.01, ThresholdType.RowMax, with_binarization=True))
    expected = np.array([[0.005, 1.0, 1.0], [1.0, 1.0, 1.0], [1.0, 1.0, 0.01]])
    np.testing.assert_allclose(expected, out, atol=0.001)

  def test_preserve_diagonal(self):
    out = np.asarray(ref_ops.row_wise_threshold(
        M3F, 0.5, 0.01, ThresholdType.RowMax, with_binarization=True,
        preserve_diagonal=True))
    expected = np.ones((3, 3))
    np.testing.assert_allclose(expected, out, atol=0.001)

  def test_masked_percentile_matches(self):
    padded = jnp.zeros((7, 7)).at[:3, :3].set(M3F)
    out = np.asarray(ref_ops.row_wise_threshold(
        padded, 0.5, 0.01, ThresholdType.Percentile, n_valid=3))[:3, :3]
    unmasked = np.asarray(ref_ops.row_wise_threshold(
        M3F, 0.5, 0.01, ThresholdType.Percentile))
    np.testing.assert_allclose(unmasked, out, atol=1e-6)


class TestSymmetrize:

  def test_max(self):
    out = np.asarray(ref_ops.symmetrize(M3))
    np.testing.assert_equal(np.array([[1, 3, 4], [3, 4, 5], [4, 5, 1]]), out)

  def test_average(self):
    out = np.asarray(ref_ops.symmetrize(M3, SymmetrizeType.Average))
    np.testing.assert_equal(
        np.array([[1, 2.5, 3.5], [2.5, 4, 3.5], [3.5, 3.5, 1]]), out)


class TestDiffuse:

  def test_2by2_matrix(self):
    out = np.asarray(ref_ops.diffuse(jnp.array([[1.0, 2], [3, 4]])))
    np.testing.assert_equal(np.array([[5, 11], [11, 25]]), out)


class TestRowWiseNormalize:

  def test_3by3_matrix(self):
    out = np.asarray(ref_ops.row_wise_normalize(M3F))
    expected = np.array([[0.167, 0.667, 1.0], [0.6, 0.8, 1.0],
                         [1.0, 0.5, 0.25]])
    np.testing.assert_allclose(expected, out, atol=0.001)


class TestAnalyzeSymmetry:

  def test_icassp2018_is_rownorm_tail(self):
    seq = (RefinementName.CropDiagonal, RefinementName.GaussianBlur,
           RefinementName.RowWiseThreshold, RefinementName.Symmetrize,
           RefinementName.Diffuse, RefinementName.RowWiseNormalize)
    assert ref_ops.analyze_symmetry(seq) == ref_ops.ROWNORM_TAIL

  def test_turntodiarize_is_symmetric(self):
    seq = (RefinementName.RowWiseThreshold, RefinementName.Symmetrize)
    assert ref_ops.analyze_symmetry(seq) == ref_ops.SYMMETRIC

  def test_empty_sequence(self):
    assert ref_ops.analyze_symmetry(None) == ref_ops.SYMMETRIC
    assert ref_ops.analyze_symmetry(()) == ref_ops.SYMMETRIC

  def test_threshold_only_is_general(self):
    assert ref_ops.analyze_symmetry(
        (RefinementName.RowWiseThreshold,)) == ref_ops.GENERAL

  def test_split_at_threshold(self):
    seq = (RefinementName.CropDiagonal, RefinementName.RowWiseThreshold,
           RefinementName.Symmetrize)
    prefix, suffix = ref_ops.split_at_threshold(seq)
    assert prefix == (RefinementName.CropDiagonal,)
    assert suffix == (RefinementName.RowWiseThreshold,
                      RefinementName.Symmetrize)


class TestApplySequence:

  def test_full_sequence_runs(self):
    opts = RefinementOptions(
        gaussian_blur_sigma=1,
        p_percentile=0.95,
        refinement_sequence=(RefinementName.CropDiagonal,
                             RefinementName.GaussianBlur,
                             RefinementName.RowWiseThreshold,
                             RefinementName.Symmetrize,
                             RefinementName.Diffuse,
                             RefinementName.RowWiseNormalize))
    out = ref_ops.apply_refinement_sequence(M3F, opts)
    assert out.shape == (3, 3)
    # RowWiseNormalize makes every row max 1.
    np.testing.assert_allclose(np.max(np.asarray(out), axis=1), 1.0,
                               atol=1e-6)


class TestGetRefinementOperator:
  """Reference-compatible operator-object factory (refinement.py:102-133)."""

  def test_all_ops_match_direct_application(self):
    rng = np.random.RandomState(0)
    a = rng.rand(8, 8)
    opts = RefinementOptions(p_percentile=0.8)
    for name in RefinementName:
      op = opts.get_refinement_operator(name)
      direct = np.asarray(ref_ops.apply_refinement_op(
          jnp.asarray(a), name, opts))
      np.testing.assert_allclose(op.refine(a), direct, atol=1e-6)

  def test_input_validation(self):
    import pytest
    op = RefinementOptions().get_refinement_operator(
        RefinementName.CropDiagonal)
    with pytest.raises(ValueError):
      op.refine(np.zeros(3))
    with pytest.raises(TypeError):
      # Reference check_input (refinement.py:52-56) rejects non-ndarrays.
      op.refine([[1.0, 0.5], [0.5, 1.0]])
    with pytest.raises(TypeError):
      RefinementOptions().get_refinement_operator("CropDiagonal")
