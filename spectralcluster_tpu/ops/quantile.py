"""Row-wise quantiles with numpy-compatible linear interpolation.

Replaces ``np.percentile(..., axis=1)`` (reference refinement.py:192-197).
Design: one row sort (``jax.lax.sort`` via jnp.sort, O(N log N) per row on
the VPU) followed by a linearly-interpolated gather. The sorted rows are
exposed separately so that AutoTune can sort once and evaluate *many*
candidate percentiles against the same sorted rows (SURVEY.md §3.2 — the
batched-candidate win).
"""

from __future__ import annotations

import jax.numpy as jnp


def sort_rows(mat: jnp.ndarray) -> jnp.ndarray:
  return jnp.sort(mat, axis=1)


def quantile_from_sorted(sorted_rows: jnp.ndarray, q) -> jnp.ndarray:
  """Linear-interpolated quantile q in [0,1] of each pre-sorted row.

  Matches np.percentile's default "linear" method: virtual index
  h = q*(n-1); result = s[floor(h)] + frac(h) * (s[ceil(h)] - s[floor(h)]).
  Returns shape (N,) for scalar q, or (Q, N) for a vector of qs.
  """
  n = sorted_rows.shape[1]
  q = jnp.asarray(q)
  h = q * (n - 1)
  lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, n - 1)
  hi = jnp.clip(lo + 1, 0, n - 1)
  frac = h - lo.astype(sorted_rows.dtype)
  if q.ndim == 0:
    s_lo = sorted_rows[:, lo]
    s_hi = sorted_rows[:, hi]
    return s_lo + frac * (s_hi - s_lo)
  s_lo = sorted_rows[:, lo]        # (N, Q)
  s_hi = sorted_rows[:, hi]
  return (s_lo + frac[None, :] * (s_hi - s_lo)).T


def row_quantile(mat: jnp.ndarray, q) -> jnp.ndarray:
  return quantile_from_sorted(sort_rows(mat), q)


def sort_rows_masked(mat: jnp.ndarray, n_valid) -> jnp.ndarray:
  """Sort rows of a padded matrix so the first n_valid entries per row are the
  sorted valid values (padding is pushed to +inf at the tail)."""
  n = mat.shape[1]
  col_valid = jnp.arange(n) < n_valid
  shifted = jnp.where(col_valid[None, :], mat, jnp.inf)
  return jnp.sort(shifted, axis=1)


def quantile_from_sorted_masked(sorted_rows: jnp.ndarray, q,
                                n_valid) -> jnp.ndarray:
  """Quantile over only the first ``n_valid`` (valid) entries of sorted rows.

  Same linear interpolation as above but with a dynamic effective length, so a
  padded pipeline reproduces the unpadded percentile bit-for-bit.
  """
  q = jnp.asarray(q)
  n_valid = jnp.asarray(n_valid)
  h = q * (n_valid - 1).astype(sorted_rows.dtype)
  lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, n_valid - 1)
  hi = jnp.clip(lo + 1, 0, n_valid - 1)
  frac = h - lo.astype(sorted_rows.dtype)
  if q.ndim == 0:
    s_lo = sorted_rows[:, lo]
    s_hi = sorted_rows[:, hi]
    return s_lo + frac * (s_hi - s_lo)
  s_lo = sorted_rows[:, lo]
  s_hi = sorted_rows[:, hi]
  return (s_lo + frac[None, :] * (s_hi - s_lo)).T
