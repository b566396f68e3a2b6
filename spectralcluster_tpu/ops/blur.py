"""Separable 2-D Gaussian blur with scipy-compatible semantics.

Replaces ``scipy.ndimage.gaussian_filter`` (used at reference refinement.py:162)
with a TPU-friendly formulation: the truncated 1-D Gaussian kernel is applied
as a sum of (2r+1) shifted adds over a reflect-padded matrix, once along rows
and once along columns. XLA fuses the shifted adds into a tight VPU loop —
O((2r+1)·N²) with perfect locality; no gather/scatter, no dynamic shapes.

Numerics match scipy defaults exactly:
  - truncate = 4.0, radius r = int(truncate * sigma + 0.5)
  - kernel w[k] ∝ exp(-k² / (2σ²)), normalized to sum 1
  - boundary mode "reflect" = (d c b a | a b c d) = jnp.pad mode="symmetric"
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
  radius = int(truncate * float(sigma) + 0.5)
  x = np.arange(-radius, radius + 1, dtype=np.float64)
  w = np.exp(-0.5 * (x / float(sigma)) ** 2)
  return (w / w.sum()).astype(np.float32)


def _blur_axis0(mat: jnp.ndarray, w: np.ndarray) -> jnp.ndarray:
  r = (len(w) - 1) // 2
  n = mat.shape[0]
  padded = jnp.pad(mat, ((r, r), (0, 0)), mode="symmetric")
  out = jnp.zeros_like(mat)
  for k in range(len(w)):
    out = out + w[k] * padded[k:k + n, :]
  return out


def gaussian_blur(mat: jnp.ndarray, sigma: float,
                  truncate: float = 4.0) -> jnp.ndarray:
  """2-D Gaussian blur of a square matrix (scipy gaussian_filter parity)."""
  if sigma <= 0:
    return mat
  w = _gaussian_kernel(sigma, truncate)
  out = _blur_axis0(mat, w)
  out = _blur_axis0(out.T, w).T
  return out


def gaussian_blur_masked(mat: jnp.ndarray, sigma: float, n_valid: jnp.ndarray,
                         truncate: float = 4.0) -> jnp.ndarray:
  """Blur only the top-left (n_valid, n_valid) block of a padded matrix.

  Reflect padding is emulated at the dynamic boundary by mirroring indices
  about ``n_valid`` — needed so padded pipelines produce bit-identical results
  to an unpadded run on the valid block.
  """
  if sigma <= 0:
    return mat
  w = _gaussian_kernel(sigma, truncate)
  r = (len(w) - 1) // 2
  n = mat.shape[0]
  idx = jnp.arange(n)

  def reflect(i):
    # Reflect into [0, n_valid): mode "symmetric" (…c b a | a b c | c b a…),
    # periodic with period 2*n_valid — handles any radius vs. n_valid.
    m = jnp.mod(i, 2 * n_valid)
    return jnp.where(m >= n_valid, 2 * n_valid - 1 - m, m)

  def blur0(m):
    out = jnp.zeros_like(m)
    for k in range(len(w)):
      src = reflect(idx + (k - r))
      out = out + w[k] * m[src, :]
    return out

  out = blur0(mat)
  out = blur0(out.T).T
  valid = idx < n_valid
  keep = valid[:, None] & valid[None, :]
  return jnp.where(keep, out, mat)
