"""Constrained clustering operations (Turn-to-Diarize).

Replaces reference constraint.py:
  * AffinityIntegration (constraint.py:95-117): elementwise max/average.
  * ConstraintPropagation / E2CP (constraint.py:120-164): the closed form
    F* = (1-α)² (I - α·Ā)⁻¹ Q (I - α·Ā)⁻¹ is computed with two linear
    *solves* instead of an explicit matrix inverse (TPU-friendly: LU solve
    streams through the MXU and avoids forming/multiplying the O(N³) inverse;
    same O(N³) complexity but ~3x fewer flops and better numerics).
  * ConstraintMatrix from speaker-turn scores (constraint.py:167-201),
    built host-side as a tri-diagonal ±1 numpy matrix (tiny, sequential).

All adjust functions are pure jnp and jit/vmap-compatible.
"""

from __future__ import annotations

import typing

import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu.types import (EPS, ConstraintName, ConstraintOptions,
                                       IntegrationType)


def affinity_integration(affinity: jnp.ndarray,
                         constraint_matrix: jnp.ndarray,
                         integration_type: IntegrationType) -> jnp.ndarray:
  if integration_type == IntegrationType.Max:
    return jnp.maximum(affinity, constraint_matrix)
  elif integration_type == IntegrationType.Average:
    return 0.5 * (affinity + constraint_matrix)
  raise ValueError(f"Unsupported integration type: {integration_type}")


def constraint_propagation(affinity: jnp.ndarray,
                           constraint_matrix: jnp.ndarray,
                           alpha: float = 0.6,
                           n_valid=None) -> jnp.ndarray:
  """E2CP constraint propagation (Lu & Ip, ECCV 2010), via solves.

  Matches reference constraint.py:137-164: normalize Ā = D^{-1/2} A D^{-1/2}
  (with the reference's eps placement 1/(sqrt(d)+eps)), propagate, then
  adjust:  F*>0: 1-(1-F*)(1-A);  F*≤0: (1+F*)·A.
  """
  n = affinity.shape[0]
  if n_valid is None:
    d = jnp.sum(affinity, axis=1)
  else:
    v = jnp.arange(n) < n_valid
    d = jnp.sum(jnp.where(v[None, :], affinity, 0.0), axis=1)
  inv_sqrt = 1.0 / (jnp.sqrt(d) + EPS)
  a_norm = inv_sqrt[:, None] * affinity * inv_sqrt[None, :]
  m = jnp.eye(n, dtype=affinity.dtype) - alpha * a_norm
  if n_valid is not None:
    # Padded coordinates: keep M = I there (solve is identity on them).
    v = jnp.arange(n) < n_valid
    keep = v[:, None] & v[None, :]
    m = jnp.where(keep, m, jnp.eye(n, dtype=affinity.dtype))
  # F = (1-α)² M⁻¹ Q M⁻¹ via two solves (no explicit inverse):
  # B = M⁻¹Q, then F = B M⁻¹ = solve(Mᵀ, Bᵀ)ᵀ — valid for asymmetric M too.
  b = jnp.linalg.solve(m, constraint_matrix)
  f = (1.0 - alpha) ** 2 * jnp.linalg.solve(m.T, b.T).T
  is_positive = f > 0
  affinity1 = 1.0 - (1.0 - f * is_positive) * (1.0 - affinity * is_positive)
  affinity2 = (1.0 + f * (~is_positive)) * (affinity * (~is_positive))
  return affinity1 + affinity2


def adjust_affinity(affinity: jnp.ndarray,
                    constraint_matrix: jnp.ndarray,
                    options: ConstraintOptions,
                    n_valid=None) -> jnp.ndarray:
  """Dispatch on the constraint method (reference constraint.py:44-49).

  Shape validation mirrors the reference ABC's check_input
  (constraint.py:52-76); shapes are static at trace time, so these are
  plain Python errors even under jit.
  """
  if affinity.ndim != 2 or affinity.shape[0] != affinity.shape[1]:
    raise ValueError("affinity must be a 2-D square matrix")
  if (constraint_matrix.ndim != 2
      or constraint_matrix.shape[0] != constraint_matrix.shape[1]):
    raise ValueError("constraint matrix must be a 2-D square matrix")
  if affinity.shape != constraint_matrix.shape:
    raise ValueError(
        "affinity and constraint matrix must have the same shape")
  if options.constraint_name == ConstraintName.AffinityIntegration:
    out = affinity_integration(affinity, constraint_matrix,
                               options.integration_type)
  elif options.constraint_name == ConstraintName.ConstraintPropagation:
    out = constraint_propagation(affinity, constraint_matrix,
                                 options.constraint_propagation_alpha, n_valid)
  else:
    raise ValueError(f"Unsupported constraint: {options.constraint_name}")
  if n_valid is not None:
    v = jnp.arange(affinity.shape[0]) < n_valid
    out = jnp.where(v[:, None] & v[None, :], out, 0.0)
  return out


class ConstraintMatrix:
  """Build a pairwise constraint matrix from speaker-turn scores.

  Reference constraint.py:167-201: score 0 ⇒ must-link (+1) between
  neighboring turns; score > threshold ⇒ cannot-link (−1); otherwise no
  constraint. The first score is unused.
  """

  def __init__(self,
               speaker_turn_scores: typing.Sequence[float],
               threshold: float = 1):
    if any(score < 0 for score in speaker_turn_scores):
      raise ValueError("Speaker turn score must be larger or equal to 0.")
    self.speaker_turn_scores = list(speaker_turn_scores)
    self.threshold = threshold

  def compute_diagonals(self) -> np.ndarray:
    num_turns = len(self.speaker_turn_scores)
    scores = np.asarray(self.speaker_turn_scores[1:], dtype=np.float64)
    off = np.zeros(max(num_turns - 1, 0))
    off[scores == 0] = 1.0
    off[scores > self.threshold] = -1.0
    constraint_matrix = np.zeros((num_turns, num_turns))
    if num_turns > 1:
      idx = np.arange(num_turns - 1)
      constraint_matrix[idx, idx + 1] = off
      constraint_matrix[idx + 1, idx] = off
    return constraint_matrix
