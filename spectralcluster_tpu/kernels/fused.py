"""Pallas TPU kernels for the hot refinement-path ops.

These fuse the bandwidth-bound elementwise/reduction stages of the pipeline
so each N×N matrix crosses HBM once per fused stage instead of once per op:

  * ``affinity_pallas`` — cosine affinity: row-normalized matmul on the MXU
    with the (cos+1)/2 affine fused into the tile epilogue.
  * ``row_max_pallas`` — tiled row-max reduction (optionally excluding the
    diagonal), the reduction feeding CropDiagonal / RowWiseThreshold /
    RowWiseNormalize.
  * ``threshold_symmetrize_general_pallas`` — RowWiseThreshold + Symmetrize
    in ONE pass (both threshold and symmetrize types, binarization,
    preserve_diagonal): reads the (i,j) and (j,i) tiles, applies the soft
    threshold to both, writes max/average of the two — eliminating the
    separate transpose materialization.
  * ``crop_diagonal_pallas`` / ``row_wise_normalize_pallas`` — the remaining
    bandwidth-bound refinement stages as row_max + apply passes.

Each kernel has a jnp twin in ops/ (the source of truth for semantics);
tests run the kernels in interpreter mode against the twins. The pipeline
uses them only on TPU backends (pipeline.PipelineConfig.use_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile(n: int) -> int:
  for t in (512, 256, 128):
    if n % t == 0:
      return t
  return n  # small matrices: single tile


# ---------------------------------------------------------------------------
# Affinity
# ---------------------------------------------------------------------------


def _affinity_kernel(xn_ref, xnt_ref, out_ref):
  # Precision pinned INSIDE the kernel: the affinity contract is exact-f32
  # cosine regardless of the ambient jax.default_matmul_precision, and
  # Mosaic only lowers DEFAULT/HIGHEST dot precision (an ambient "high"
  # would otherwise fail to compile the kernel).
  dot = jnp.dot(xn_ref[:], xnt_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
  out_ref[:] = (dot + 1.0) * 0.5


def affinity_pallas(embeddings: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
  """Cosine affinity ((cos+1)/2) as a tiled MXU kernel."""
  n, d = embeddings.shape
  norms = jnp.linalg.norm(embeddings, axis=1, keepdims=True)
  xn = embeddings / norms
  t = _tile(n)
  grid = (n // t, n // t)
  return pl.pallas_call(
      _affinity_kernel,
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      grid=grid,
      in_specs=[
          pl.BlockSpec((t, d), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((d, t), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(xn, xn.T)


# ---------------------------------------------------------------------------
# Row max (reduction over column tiles)
# ---------------------------------------------------------------------------


def _row_max_kernel(nv_ref, a_ref, out_ref, *, exclude_diagonal, t):
  i = pl.program_id(0)
  j = pl.program_id(1)
  a = a_ref[:]
  cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) + j * t
  a = jnp.where(cols < nv_ref[0, 0], a, -jnp.inf)
  if exclude_diagonal:
    # Match the reference's CropDiagonal (refinement.py:146-150): the diagonal
    # is zero-filled and *included* in the max, so the result is >= 0 even for
    # all-negative rows and well-defined when the row has no other valid col.
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * t
    a = jnp.where(rows == cols, 0.0, a)
  tile_max = jnp.max(a, axis=1, keepdims=True)

  @pl.when(j == 0)
  def _():
    out_ref[:] = tile_max

  @pl.when(j > 0)
  def _():
    out_ref[:] = jnp.maximum(out_ref[:], tile_max)


def row_max_pallas(mat: jnp.ndarray, exclude_diagonal: bool = False,
                   n_valid=None, interpret: bool = False) -> jnp.ndarray:
  """Row maxima over the first ``n_valid`` columns; returns shape (N, 1).

  Padding-aware: columns ≥ n_valid are excluded from the max (matters for
  matrices with negative entries, where a zero-padded column would
  otherwise win). Padded *rows* get -inf maxima (0.0 with exclude_diagonal,
  whose zeroed diagonal dominates); callers re-mask.

  ``exclude_diagonal`` replaces the diagonal by 0.0 before the max — the
  reference CropDiagonal semantics — rather than dropping it.
  """
  n = mat.shape[0]
  t = _tile(n)
  grid = (n // t, n // t)
  nv = jnp.asarray(n if n_valid is None else n_valid,
                   jnp.int32).reshape(1, 1)
  out = pl.pallas_call(
      functools.partial(_row_max_kernel, exclude_diagonal=exclude_diagonal,
                        t=t),
      out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((t, t), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((t, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(nv, mat)
  return out


# ---------------------------------------------------------------------------
# Fused RowWiseThreshold(RowMax) + Symmetrize(Max)
# ---------------------------------------------------------------------------


def _thresh_sym_kernel(a_ref, atile_ref, trow_ref, tcol_ref, out_ref, *,
                       multiplier, binarize, preserve_diagonal, average,
                       tile):
  i = pl.program_id(0)
  j = pl.program_id(1)
  a = a_ref[:]            # tile (i, j) of A
  at = atile_ref[:].T     # tile (j, i) of A, transposed in VMEM == A^T[i, j]
  trow = trow_ref[:]      # (t, 1) thresholds for rows i of this tile
  tcol = tcol_ref[:].T    # (1, t) thresholds for rows j (the tile's columns)
  if preserve_diagonal:
    # Reference refinement.py:185-186: zero the diagonal before thresholding
    # (the threshold *statistics* already saw the zeroed diagonal — the
    # caller computes `trow` from the diag-zeroed matrix), then restore to 1.
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * tile
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) + j * tile
    a = jnp.where(rows == cols, 0.0, a)
    at = jnp.where(rows == cols, 0.0, at)

  def thresh(x, m):
    is_smaller = x < m
    if binarize:
      return jnp.where(is_smaller, x * multiplier, 1.0)
    return jnp.where(is_smaller, x * multiplier, x)

  ta = thresh(a, trow)
  tat = thresh(at, tcol)
  out = 0.5 * (ta + tat) if average else jnp.maximum(ta, tat)
  if preserve_diagonal:
    out = jnp.where(rows == cols, 1.0, out)
  out_ref[:] = out


def threshold_symmetrize_general_pallas(
    mat: jnp.ndarray,
    thresholds: jnp.ndarray,
    multiplier: float = 0.01,
    binarize: bool = False,
    preserve_diagonal: bool = False,
    average: bool = False,
    interpret: bool = False) -> jnp.ndarray:
  """Sym(T(A), T(A)^T) where T is per-row soft thresholding, one pass.

  ``thresholds`` is the (N, 1) per-row threshold vector — row_max * p for
  ThresholdType.RowMax or the row percentile for ThresholdType.Percentile
  (reference refinement.py:187-197); computing it outside the kernel makes a
  *traced* p_percentile (every AutoTune run) fused-path eligible. ``average``
  selects Symmetrize(Average) vs (Max); ``preserve_diagonal`` applies the
  zero-then-restore-to-1 diagonal semantics. A^T tiles come from a second
  BlockSpec over the SAME array with a swapped index map + an in-VMEM tile
  transpose — no N×N transposed copy in HBM.
  """
  n = mat.shape[0]
  t = _tile(n)
  grid = (n // t, n // t)
  return pl.pallas_call(
      functools.partial(_thresh_sym_kernel, multiplier=multiplier,
                        binarize=binarize,
                        preserve_diagonal=preserve_diagonal,
                        average=average, tile=t),
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      grid=grid,
      in_specs=[
          pl.BlockSpec((t, t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
          pl.BlockSpec((t, t), lambda i, j: (j, i), memory_space=pltpu.VMEM),
          pl.BlockSpec((t, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((t, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(mat, mat, thresholds, thresholds)


# ---------------------------------------------------------------------------
# Fused CropDiagonal apply (given off-diagonal row maxima)
# ---------------------------------------------------------------------------


def _crop_diag_kernel(a_ref, rmax_ref, out_ref, *, t):
  i = pl.program_id(0)
  j = pl.program_id(1)
  a = a_ref[:]
  rows = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * t
  cols = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) + j * t
  out_ref[:] = jnp.where(rows == cols, rmax_ref[:], a)


def crop_diagonal_pallas(mat: jnp.ndarray, n_valid=None,
                         interpret: bool = False):
  """CropDiagonal: diag <- max of off-diagonal row values (two tiled passes)."""
  n = mat.shape[0]
  t = _tile(n)
  rmax = row_max_pallas(mat, exclude_diagonal=True, n_valid=n_valid,
                        interpret=interpret)
  grid = (n // t, n // t)
  return pl.pallas_call(
      functools.partial(_crop_diag_kernel, t=t),
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      grid=grid,
      in_specs=[
          pl.BlockSpec((t, t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
          pl.BlockSpec((t, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(mat, rmax)


# ---------------------------------------------------------------------------
# Fused RowWiseNormalize apply
# ---------------------------------------------------------------------------


def _row_norm_kernel(a_ref, rmax_ref, out_ref):
  out_ref[:] = a_ref[:] / rmax_ref[:]


def row_wise_normalize_pallas(mat: jnp.ndarray, n_valid=None,
                              interpret: bool = False):
  n = mat.shape[0]
  t = _tile(n)
  rmax = row_max_pallas(mat, n_valid=n_valid, interpret=interpret)
  grid = (n // t, n // t)
  return pl.pallas_call(
      _row_norm_kernel,
      out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
      grid=grid,
      in_specs=[
          pl.BlockSpec((t, t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
          pl.BlockSpec((t, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(mat, rmax)
