"""Graph Laplacian variants, with symmetric-similarity forms for TPU eigh.

Reference: laplacian.py:24-60. Numerics (including the eps placement inside
the two normalizations, laplacian.py:51 and :56) are matched exactly.

TPU-specific addition: ``laplacian_similarity`` returns, for each variant, a
*symmetric* matrix with the same spectrum plus the diagonal scaling needed to
recover the original eigenvectors — this is what lets the whole pipeline run
on XLA's symmetric eigensolver instead of LAPACK's general one:

  RandomWalk:  L_rw = D̃^{-1} L  with D̃ = diag(d + eps)
               = D̃^{-1/2} (D̃^{-1/2} L D̃^{-1/2}) D̃^{1/2}
               → eigh(D̃^{-1/2} L D̃^{-1/2}); eigvecs v = D̃^{-1/2} u. Exact.
"""

from __future__ import annotations

import typing

import jax.numpy as jnp

from spectralcluster_tpu.types import EPS, LaplacianType


def _degree(affinity: jnp.ndarray, n_valid=None) -> jnp.ndarray:
  if n_valid is None:
    return jnp.sum(affinity, axis=1)
  v = jnp.arange(affinity.shape[0]) < n_valid
  return jnp.sum(jnp.where(v[None, :], affinity, 0.0), axis=1)


def compute_laplacian(affinity: jnp.ndarray,
                      laplacian_type: LaplacianType = LaplacianType.GraphCut,
                      eps: float = EPS,
                      n_valid=None) -> jnp.ndarray:
  """Direct port of the reference semantics (laplacian.py:24-60)."""
  if not isinstance(laplacian_type, LaplacianType):
    raise TypeError("laplacian_type must be a LaplacianType")
  if laplacian_type == LaplacianType.Affinity:
    return affinity
  d = _degree(affinity, n_valid)
  lap = jnp.diag(d) - affinity
  if laplacian_type == LaplacianType.Unnormalized:
    return lap
  elif laplacian_type == LaplacianType.RandomWalk:
    scale = 1.0 / (d + eps)
    return scale[:, None] * lap
  elif laplacian_type == LaplacianType.GraphCut:
    scale = 1.0 / (jnp.sqrt(d) + eps)
    return scale[:, None] * lap * scale[None, :]
  raise ValueError("Unsupported laplacian_type.")


def laplacian_similarity(
    affinity: jnp.ndarray,
    laplacian_type: LaplacianType,
    eps: float = EPS,
    n_valid=None,
) -> typing.Tuple[jnp.ndarray, typing.Optional[jnp.ndarray]]:
  """Return (symmetric matrix M, eigvec scale s) for the requested variant.

  The variant's matrix has the same eigenvalues as M, and eigenvectors
  v = s[:, None] * u (u = eigenvectors of M); s None means v = u.
  Requires a symmetric ``affinity``.
  """
  if laplacian_type == LaplacianType.Affinity:
    return affinity, None
  d = _degree(affinity, n_valid)
  lap = jnp.diag(d) - affinity
  if laplacian_type == LaplacianType.Unnormalized:
    return lap, None
  elif laplacian_type == LaplacianType.GraphCut:
    scale = 1.0 / (jnp.sqrt(d) + eps)
    return scale[:, None] * lap * scale[None, :], None
  elif laplacian_type == LaplacianType.RandomWalk:
    # Exact similarity including the reference's eps: D̃ = d + eps.
    d_tilde = d + eps
    inv_sqrt = 1.0 / jnp.sqrt(d_tilde)
    m = inv_sqrt[:, None] * lap * inv_sqrt[None, :]
    return m, inv_sqrt
  raise ValueError("Unsupported laplacian_type.")
