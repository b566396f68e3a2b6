"""Constrained clustering operations (Turn-to-Diarize).

Replaces reference constraint.py:
  * AffinityIntegration (constraint.py:95-117): elementwise max/average.
  * ConstraintPropagation / E2CP (constraint.py:120-164): the closed form
    F* = (1-α)² (I - α·Ā)⁻¹ Q (I - α·Ā)⁻¹ is computed MATMUL-ONLY via two
    certified fixed-point (truncated-Neumann) solves instead of
    `np.linalg.inv` — see constraint_propagation. On this TPU toolchain a
    dense LU/triangular solve with an (N, N) right-hand side compiles into
    per-panel buffer chains measured at 16.4 GB for one N=10240 solve
    (ops/dc.py `matrix_sign` docstring) — the exact wall the D&C
    eigensolver was built around; plain matmuls stream through the MXU
    with a constant number of (N, N) buffers. ρ(αĀ) ≤ α < 1 makes the
    iteration geometrically convergent with an ANALYTIC truncation bound,
    and the per-step fixed-point residual equals the true linear-system
    residual, so convergence is certified in-graph for free.
  * ConstraintMatrix from speaker-turn scores (constraint.py:167-201),
    built host-side as a tri-diagonal ±1 numpy matrix (tiny, sequential).

All adjust functions are pure jnp and jit/vmap-compatible.
"""

from __future__ import annotations

import math
import typing

import jax
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


# Relative fixed-point tolerance for the E2CP Neumann solves: comfortably
# below the adjust formula's sensitivity and at the float32 accumulation
# noise floor of the O(N^3) matmuls themselves.
_NEUMANN_TOL = 1e-6

# Above this α the analytic step count explodes (J ~ log(tol)/log(α)) and
# ρ(αĀ) ≈ 1 convergence is no longer a given; fall back to the dense LU
# solve. The reference default is α=0.6 and the Turn-to-Diarize preset uses
# α=0.4, both deep inside the iterative regime; the LU escape exists for
# exotic user configs at small N (at N≥~10k it hits the measured 16 GB
# triangular-solve compile wall — documented, not reachable from presets).
_NEUMANN_ALPHA_MAX = 0.95


def _neumann_cap(alpha: float, tol: float = _NEUMANN_TOL) -> int:
  """Iteration cap: analytic J with ‖Σ_{j>J}(αĀ)^j‖ ≤ α^{J+1}/(1−α) ≤ tol
  (valid for ρ(Ā) ≤ 1, which holds for the D^{-1/2}AD^{-1/2} normalization
  of a nonnegative affinity), doubled as margin for the asymmetric edge
  cases where ρ(Ā) can slightly exceed α's contraction estimate."""
  if alpha <= 0.0:
    return 1
  j = math.ceil((math.log(tol) + math.log(1.0 - alpha)) / math.log(alpha))
  return int(max(8, min(2 * j, 512)))


def _fixed_point_solve(q, mul, alpha: float, max_steps: int):
  """Solve (I − α·Op) X = Q by the Horner/fixed-point iteration
  X ← Q + α·Op(X), matmul-only.

  ``mul`` applies Op as a left- or right-multiplication by the normalized
  affinity (so one call covers both of E2CP's solves, including the
  asymmetric case without any transposes). The per-step update IS the
  residual: X_{k+1} − X_k = Q + α·Op(X_k) − X_k = −((I − α·Op)X_k − Q),
  so the convergence gate is exact and costs no extra matmul. Returns
  (X, rel_res) with rel_res = ‖(I − α·Op)X_prev − Q‖_F / ‖Q‖_F; the
  returned X is one contraction better than the certified residual.
  """
  qn = jnp.maximum(jnp.linalg.norm(q), EPS)

  def cond(state):
    _, res, k = state
    return jnp.logical_and(res > _NEUMANN_TOL, k < max_steps)

  def body(state):
    x, _, k = state
    x_next = q + alpha * mul(x)
    res = jnp.linalg.norm(x_next - x) / qn
    return x_next, res, k + 1

  x, res, _ = jax.lax.while_loop(
      cond, body, (q, jnp.asarray(jnp.inf, q.dtype), jnp.asarray(0, jnp.int32)))
  return x, res


def constraint_propagation(affinity: jnp.ndarray,
                           constraint_matrix: jnp.ndarray,
                           alpha: float = 0.6,
                           n_valid=None,
                           with_residual: bool = False) -> jnp.ndarray:
  """E2CP constraint propagation (Lu & Ip, ECCV 2010), matmul-only.

  Matches reference constraint.py:137-164: normalize Ā = D^{-1/2} A D^{-1/2}
  (with the reference's eps placement 1/(sqrt(d)+eps)), propagate
  F* = (1−α)² (I − αĀ)⁻¹ Q (I − αĀ)⁻¹, then adjust:
  F*>0: 1−(1−F*)(1−A);  F*≤0: (1+F*)·A.

  The two inverses are applied via certified fixed-point (truncated
  Neumann) iterations — geometrically convergent because ρ(αĀ) ≤ α < 1 —
  instead of a dense LU solve, which on this TPU toolchain compiles into
  >16 GB per-panel buffer chains at N≥10k (see module docstring). The
  iteration count is residual-gated in-graph with an analytic cap; at the
  reference's α the solve costs ~2×15 (N, N) matmuls, each streaming
  through the MXU. α ≥ 0.95 (no geometric-convergence guarantee) falls
  back to the dense solve.

  With ``with_residual=True`` also returns the worst relative
  linear-system residual of the two solves (a scalar; ~1e-6 on success) —
  host-orchestrated callers can read it back as a certificate.
  """
  n = affinity.shape[0]
  if n_valid is None:
    d = jnp.sum(affinity, axis=1)
  else:
    v = jnp.arange(n) < n_valid
    d = jnp.sum(jnp.where(v[None, :], affinity, 0.0), axis=1)
  inv_sqrt = 1.0 / (jnp.sqrt(d) + EPS)
  a_norm = inv_sqrt[:, None] * affinity * inv_sqrt[None, :]
  if n_valid is not None:
    # Padded coordinates: Ā = 0 there, i.e. M = I − αĀ acts as the identity
    # (the padded block of Q passes through and is masked by the caller).
    v = jnp.arange(n) < n_valid
    a_norm = jnp.where(v[:, None] & v[None, :], a_norm, 0.0)

  alpha = float(alpha)
  if alpha >= _NEUMANN_ALPHA_MAX:
    m = jnp.eye(n, dtype=affinity.dtype) - alpha * a_norm
    b = jnp.linalg.solve(m, constraint_matrix)
    f = (1.0 - alpha) ** 2 * jnp.linalg.solve(m.T, b.T).T
    res = jnp.asarray(0.0, affinity.dtype)
  else:
    cap = _neumann_cap(alpha)
    mul_l = lambda x: jnp.matmul(  # noqa: E731
        a_norm, x, preferred_element_type=jnp.float32)
    mul_r = lambda x: jnp.matmul(  # noqa: E731
        x, a_norm, preferred_element_type=jnp.float32)
    b, res_l = _fixed_point_solve(constraint_matrix, mul_l, alpha, cap)
    c, res_r = _fixed_point_solve(b, mul_r, alpha, cap)
    f = (1.0 - alpha) ** 2 * c
    res = jnp.maximum(res_l, res_r)
  is_positive = f > 0
  affinity1 = 1.0 - (1.0 - f * is_positive) * (1.0 - affinity * is_positive)
  affinity2 = (1.0 + f * (~is_positive)) * (affinity * (~is_positive))
  out = affinity1 + affinity2
  if with_residual:
    return out, res
  return out


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
