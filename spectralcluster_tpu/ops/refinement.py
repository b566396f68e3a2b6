"""Affinity-refinement operations as pure, fusable JAX functions.

The reference implements these as a Python loop of operator objects
(refinement.py:136-245); here each op is a pure fn ``(N,N) -> (N,N)`` and a
refinement *sequence* is composed at trace time, so XLA fuses the whole chain
(crop-diag → blur → threshold → symmetrize → diffuse → row-normalize) into a
few kernels around the Diffuse matmul.

Two additional things the TPU design needs that the reference does not:

1. **Masked variants.** Every op takes an optional traced ``n_valid`` so a
   padded, fixed-shape pipeline (required for jit/pjit batching) reproduces the
   unpadded semantics exactly on the valid block. Invariant: padded rows/cols
   are zero on entry and are re-zeroed on exit of every op.

2. **Symmetry-structure analysis** (``analyze_symmetry``). The reference uses
   the general LAPACK ``eig`` because RowWiseThreshold / RowWiseNormalize break
   symmetry (utils.py:59). On TPU only symmetric ``eigh`` is available, so we
   statically analyze the refinement sequence: if the final matrix is symmetric
   we use eigh directly; if the sequence ends in RowWiseNormalize applied to a
   symmetric matrix S, then A = D_r^{-1} S (D_r = diag of row maxima) is
   *similar* to the symmetric D_r^{-1/2} S D_r^{-1/2}, which has identical
   eigenvalues and eigenvectors v = D_r^{-1/2} u. Both reference presets
   (configs.py:21-28, :49-51) fall into these two cases.
"""

from __future__ import annotations

import typing

import jax.numpy as jnp

from spectralcluster_tpu.ops import blur as blur_ops
from spectralcluster_tpu.ops import quantile as quantile_ops
from spectralcluster_tpu.types import (RefinementName, RefinementOptions,
                                       SymmetrizeType, ThresholdType)


def _valid_mask(n: int, n_valid) -> jnp.ndarray:
  return jnp.arange(n) < n_valid


def mask_padding(mat: jnp.ndarray, n_valid=None) -> jnp.ndarray:
  """Zero out rows/cols beyond n_valid (no-op when n_valid is None)."""
  if n_valid is None:
    return mat
  v = _valid_mask(mat.shape[0], n_valid)
  return jnp.where(v[:, None] & v[None, :], mat, 0.0)


def crop_diagonal(mat: jnp.ndarray, n_valid=None) -> jnp.ndarray:
  """Replace each diagonal element by the max off-diagonal value of its row.

  Reference refinement.py:136-151.
  """
  n = mat.shape[0]
  eye = jnp.eye(n, dtype=bool)
  # The reference zero-fills the diagonal and takes the row max *including*
  # those zeros (refinement.py:146-150), so the result is always >= 0 even
  # for all-negative rows (reachable via a user affinity_function) and is
  # well-defined at N=1. Padded columns are -inf, dominated by the 0 diagonal.
  off = jnp.where(eye, 0.0, mat)
  if n_valid is not None:
    v = _valid_mask(n, n_valid)
    off = jnp.where(v[None, :], off, -jnp.inf)
  row_max = jnp.max(off, axis=1)
  out = jnp.where(eye, row_max[:, None], mat)
  return mask_padding(out, n_valid)


def gaussian_blur(mat: jnp.ndarray, sigma: float, n_valid=None) -> jnp.ndarray:
  """scipy-compatible truncated Gaussian blur (reference refinement.py:154-162)."""
  if n_valid is None:
    return blur_ops.gaussian_blur(mat, sigma)
  return mask_padding(blur_ops.gaussian_blur_masked(mat, sigma, n_valid),
                      n_valid)


def row_wise_threshold(mat: jnp.ndarray,
                       p_percentile,
                       soft_multiplier: float = 0.01,
                       thresholding_type: ThresholdType = ThresholdType.RowMax,
                       with_binarization: bool = False,
                       preserve_diagonal: bool = False,
                       n_valid=None) -> jnp.ndarray:
  """Row-wise (soft) thresholding. Reference refinement.py:165-210.

  ``p_percentile`` may be a traced scalar (AutoTune vmaps over it).
  """
  n = mat.shape[0]
  eye = jnp.eye(n, dtype=bool)
  a = jnp.where(eye, 0.0, mat) if preserve_diagonal else mat
  if thresholding_type == ThresholdType.RowMax:
    if n_valid is None:
      row_max = jnp.max(a, axis=1)
    else:
      v = _valid_mask(n, n_valid)
      row_max = jnp.max(jnp.where(v[None, :], a, -jnp.inf), axis=1)
    threshold = row_max[:, None] * p_percentile
  elif thresholding_type == ThresholdType.Percentile:
    if n_valid is None:
      sorted_rows = quantile_ops.sort_rows(a)
      threshold = quantile_ops.quantile_from_sorted(
          sorted_rows, p_percentile)[:, None]
    else:
      sorted_rows = quantile_ops.sort_rows_masked(a, n_valid)
      threshold = quantile_ops.quantile_from_sorted_masked(
          sorted_rows, p_percentile, n_valid)[:, None]
  else:
    raise ValueError("Unsupported thresholding_type")
  is_smaller = a < threshold
  if with_binarization:
    out = jnp.where(is_smaller, a * soft_multiplier, 1.0)
  else:
    out = jnp.where(is_smaller, a * soft_multiplier, a)
  if preserve_diagonal:
    out = jnp.where(eye, 1.0, out)
  return mask_padding(out, n_valid)


def symmetrize(mat: jnp.ndarray,
               symmetrize_type: SymmetrizeType = SymmetrizeType.Max,
               n_valid=None) -> jnp.ndarray:
  """Reference refinement.py:213-226."""
  if symmetrize_type == SymmetrizeType.Max:
    return jnp.maximum(mat, mat.T)
  elif symmetrize_type == SymmetrizeType.Average:
    return 0.5 * (mat + mat.T)
  raise ValueError("Unsupported symmetrize_type.")


def diffuse(mat: jnp.ndarray, n_valid=None) -> jnp.ndarray:
  """A @ A^T (reference refinement.py:229-234). Padded rows/cols stay zero."""
  return jnp.matmul(mat, mat.T, preferred_element_type=jnp.float32)


def row_wise_normalize(mat: jnp.ndarray, n_valid=None) -> jnp.ndarray:
  """Divide each row by its max (reference refinement.py:237-245)."""
  d = row_max_scale(mat, n_valid)
  out = mat / d[:, None]
  return mask_padding(out, n_valid)


def row_max_scale(mat: jnp.ndarray, n_valid=None) -> jnp.ndarray:
  """Row maxima used by RowWiseNormalize; padded rows get scale 1."""
  n = mat.shape[0]
  if n_valid is None:
    return jnp.max(mat, axis=1)
  v = _valid_mask(n, n_valid)
  row_max = jnp.max(jnp.where(v[None, :], mat, -jnp.inf), axis=1)
  return jnp.where(v, row_max, 1.0)


def apply_refinement_op(mat: jnp.ndarray,
                        name: RefinementName,
                        options: RefinementOptions,
                        p_percentile=None,
                        n_valid=None) -> jnp.ndarray:
  """Apply one named refinement op (reference refinement.py:102-133 factory)."""
  if name == RefinementName.CropDiagonal:
    return crop_diagonal(mat, n_valid)
  elif name == RefinementName.GaussianBlur:
    return gaussian_blur(mat, options.gaussian_blur_sigma, n_valid)
  elif name == RefinementName.RowWiseThreshold:
    p = options.p_percentile if p_percentile is None else p_percentile
    return row_wise_threshold(
        mat, p, options.thresholding_soft_multiplier,
        options.thresholding_type, options.thresholding_with_binarization,
        options.thresholding_preserve_diagonal, n_valid)
  elif name == RefinementName.Symmetrize:
    return symmetrize(mat, options.symmetrize_type, n_valid)
  elif name == RefinementName.Diffuse:
    return diffuse(mat, n_valid)
  elif name == RefinementName.RowWiseNormalize:
    return row_wise_normalize(mat, n_valid)
  raise ValueError(f"Unknown refinement operation: {name}")


def _pallas_applicable(mat: jnp.ndarray) -> bool:
  """Pallas fusion is worth it (and tileable) only for larger matrices on TPU."""
  import jax
  return jax.default_backend() == "tpu" and mat.shape[0] >= 256


def apply_refinement_sequence(
    mat: jnp.ndarray,
    options: RefinementOptions,
    sequence: typing.Optional[typing.Sequence[RefinementName]] = None,
    p_percentile=None,
    n_valid=None,
    use_pallas: bool = False) -> jnp.ndarray:
  """Apply a full refinement sequence (composed and fused at trace time).

  With ``use_pallas`` (TPU only), bandwidth-bound stages are replaced by the
  fused Pallas kernels in kernels/fused.py where the op pattern allows:
  CropDiagonal, and RowWiseThreshold+Symmetrize as one pass — both threshold
  types (RowMax / Percentile), both symmetrize types, binarization,
  preserve_diagonal, and traced p_percentile (AutoTune candidates) included.
  Semantics are identical (tested against the jnp twins).
  """
  seq = tuple(options.refinement_sequence if sequence is None else sequence)
  if not seq:
    return mat
  pallas_ok = use_pallas and _pallas_applicable(mat)
  if pallas_ok:
    from spectralcluster_tpu.kernels import fused as fused_kernels
  i = 0
  while i < len(seq):
    name = seq[i]
    if (pallas_ok and name == RefinementName.RowWiseThreshold
        and i + 1 < len(seq) and seq[i + 1] == RefinementName.Symmetrize):
      # Fused RowWiseThreshold + Symmetrize: covers BOTH threshold types,
      # both symmetrize types, binarization, preserve_diagonal, and traced
      # p_percentile (every AutoTune candidate) — the per-row threshold
      # vector is computed outside the kernel (O(N) / one row sort) and the
      # O(N^2) apply+symmetrize is one pass over A and its transposed tiles.
      p = options.p_percentile if p_percentile is None else p_percentile
      preserve = options.thresholding_preserve_diagonal
      if options.thresholding_type == ThresholdType.RowMax:
        rmax = fused_kernels.row_max_pallas(
            mat, exclude_diagonal=preserve, n_valid=n_valid)
        thr = rmax * p
      else:  # ThresholdType.Percentile
        a = jnp.where(jnp.eye(mat.shape[0], dtype=bool), 0.0,
                      mat) if preserve else mat
        if n_valid is None:
          thr = quantile_ops.quantile_from_sorted(
              quantile_ops.sort_rows(a), p)[:, None]
        else:
          thr = quantile_ops.quantile_from_sorted_masked(
              quantile_ops.sort_rows_masked(a, n_valid), p, n_valid)[:, None]
      mat = fused_kernels.threshold_symmetrize_general_pallas(
          mat, thr, options.thresholding_soft_multiplier,
          options.thresholding_with_binarization, preserve,
          average=(options.symmetrize_type == SymmetrizeType.Average))
      mat = mask_padding(mat, n_valid)
      i += 2
      continue
    if pallas_ok and name == RefinementName.CropDiagonal:
      mat = mask_padding(fused_kernels.crop_diagonal_pallas(
          mat, n_valid=n_valid), n_valid)
      i += 1
      continue
    if pallas_ok and name == RefinementName.RowWiseNormalize:
      # Reachable on the GENERAL-structure path only (symmetric pipelines
      # absorb the trailing row normalization into the eigh similarity
      # transform, see _symmetric_eig_operand); e.g. a user-injected
      # asymmetric affinity with the icassp2018 sequence.
      mat = mask_padding(fused_kernels.row_wise_normalize_pallas(
          mat, n_valid=n_valid), n_valid)
      i += 1
      continue
    mat = apply_refinement_op(mat, name, options, p_percentile, n_valid)
    i += 1
  return mat


# ---------------------------------------------------------------------------
# Static structure analysis for the eigensolver choice.
# ---------------------------------------------------------------------------

SYMMETRIC = "symmetric"          # final matrix is symmetric -> plain eigh
ROWNORM_TAIL = "rownorm_tail"    # A = D_r^{-1} S, S symmetric -> eigh + diag similarity
GENERAL = "general"              # no exploitable structure -> host general eig


def analyze_symmetry(
    sequence: typing.Optional[typing.Sequence[RefinementName]],
    input_symmetric: bool = True) -> str:
  """Statically classify the symmetry structure of a refinement output.

  Symmetry propagation rules (for a symmetric input):
    CropDiagonal, GaussianBlur: preserve symmetry.
    Symmetrize, Diffuse: always produce a symmetric matrix.
    RowWiseThreshold, RowWiseNormalize: break symmetry.
  """
  sym = input_symmetric
  if not sequence:
    return SYMMETRIC if sym else GENERAL
  sym_before = sym
  for name in sequence:
    sym_before = sym
    if name in (RefinementName.CropDiagonal, RefinementName.GaussianBlur):
      pass
    elif name in (RefinementName.Symmetrize, RefinementName.Diffuse):
      sym = True
    else:  # RowWiseThreshold, RowWiseNormalize
      sym = False
  if sym:
    return SYMMETRIC
  if sequence[-1] == RefinementName.RowWiseNormalize and sym_before:
    return ROWNORM_TAIL
  return GENERAL


def split_at_threshold(
    sequence: typing.Sequence[RefinementName]
) -> typing.Tuple[typing.Tuple[RefinementName, ...],
                  typing.Tuple[RefinementName, ...]]:
  """Split a sequence into (prefix before RowWiseThreshold, suffix from it).

  AutoTune only varies p_percentile, which only affects RowWiseThreshold and
  everything after it — the prefix is computed once and the suffix is vmapped
  over candidates (SURVEY.md §3.2).
  """
  seq = tuple(sequence)
  for i, name in enumerate(seq):
    if name == RefinementName.RowWiseThreshold:
      return seq[:i], seq[i:]
  return seq, ()
