"""Eigendecomposition and eigengap cluster-count selection, TPU-first.

Replaces the reference's LAPACK general ``np.linalg.eig`` (utils.py:44-71) and
the Python eigengap loop (utils.py:74-130).

Key TPU restructurings:
  * Symmetric eigendecomposition (XLA ``eigh``) everywhere the pipeline
    structure allows, via diagonal similarity transforms (see
    ops/refinement.py docstring and ops/laplacian.py). Eigenvectors are
    renormalized to unit columns, matching LAPACK eig's convention; column
    *sign* remains arbitrary in both implementations, which is irrelevant for
    the downstream K-Means under any metric invariant to reflections.
  * The eigengap scan is a masked vectorized reduction instead of a Python
    loop with `break` — jit/vmap-compatible, so AutoTune can evaluate all
    candidate percentiles with a single batched eigh.
  * A host-callback general eig is kept as an escape hatch for user-supplied
    asymmetric affinity functions with no exploitable structure.
  * ``topk_eigh_subspace``: sharded-friendly randomized subspace iteration
    for the top-k eigenpairs when N is too large for one chip's full eigh.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu.types import EPS, EigenGapType


def _sort_eigs(w: jnp.ndarray, v: jnp.ndarray,
               descend: bool) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  order = jnp.argsort(-w if descend else w, stable=True)
  return w[order], v[:, order]


def sorted_eigh(mat: jnp.ndarray,
                descend: bool = True) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """Symmetric eigendecomposition with eigenvalues sorted as requested."""
  w, v = jnp.linalg.eigh(mat)
  if descend:
    return w[::-1], v[:, ::-1]
  return w, v


def sorted_eigh_similarity(
    sym_mat: jnp.ndarray,
    vec_scale: typing.Optional[jnp.ndarray],
    descend: bool = True,
    n_valid=None) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """eigh of a symmetric similarity form; recover original eigenvectors.

  If A = S_d^{-1} M S_d (diagonal similarity), pass M and the per-row scale
  s = diag(S_d^{-1}): eigenvalues are shared, eigenvectors v = s * u, then
  renormalized to unit 2-norm columns (LAPACK eig convention, utils.py:59).
  """
  w, u = sorted_eigh(sym_mat, descend)
  return w, recover_similarity_eigenvectors(u, vec_scale, n_valid)


def recover_similarity_eigenvectors(
    u: jnp.ndarray,
    vec_scale: typing.Optional[jnp.ndarray],
    n_valid=None) -> jnp.ndarray:
  """Map eigenvectors of the symmetric similarity form back to the original.

  v = s * u, renormalized to unit 2-norm columns (the LAPACK eig convention,
  utils.py:59); with ``n_valid``, norms are taken over valid rows only.
  """
  if vec_scale is None:
    return u
  v = vec_scale[:, None] * u
  if n_valid is None:
    norms = jnp.linalg.norm(v, axis=0)
  else:
    valid = (jnp.arange(v.shape[0]) < n_valid)[:, None]
    norms = jnp.linalg.norm(jnp.where(valid, v, 0.0), axis=0)
  return v / jnp.where(norms > 0, norms, 1.0)


def sorted_eig_general_host(
    mat: jnp.ndarray,
    descend: bool = True) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """General (non-symmetric) eigendecomposition via a host callback.

  LAPACK dgeev has no TPU lowering; this is the documented escape hatch for
  user-injected asymmetric affinity functions (reference behavior:
  utils.py:44-71 with `.real`). Not used by any built-in config.
  """
  n = mat.shape[0]
  dtype = mat.dtype

  def _host_eig(m):
    w, v = np.linalg.eig(np.asarray(m, dtype=np.float64))
    return w.real.astype(dtype), v.real.astype(dtype)

  w, v = jax.pure_callback(
      _host_eig,
      (jax.ShapeDtypeStruct((n,), dtype), jax.ShapeDtypeStruct((n, n), dtype)),
      mat, vmap_method="sequential")
  return _sort_eigs(w, v, descend)


def snap_small_eigenvalues(w: jnp.ndarray, n_valid=None,
                           tol: float = 1e-5,
                           wmax=None) -> jnp.ndarray:
  """Snap eigenvalues below solver noise to exact zero.

  The reference computes in float64 where a structurally-zero eigenvalue comes
  out ~1e-12 (positive), making the Ratio eigengap w[i-1]/(w[i]+eps) huge. In
  float32 the same eigenvalue is ±1e-7 with random sign — a negative value
  silently flips the ratio's sign and changes n_clusters. Snapping |w| <
  tol·max|w| to 0 restores the exact-arithmetic semantics (the +eps guard then
  reproduces the huge ratio). ``n_valid`` keeps padded sentinel eigenvalues
  out of the max and untouched.

  ``wmax`` (traced scalar) overrides the in-array max|w|: top-k solvers hand
  back only the t EXTREME eigenvalues, and on the ascending (Laplacian) path
  those are the smallest — max|w| over them can sit orders of magnitude
  below the full spectrum's, reviving the sign-flip hazard the snap exists
  to prevent. Pass the solver's spectral-norm estimate instead
  (ops/dc.py eigh_topk_dc returns it).
  """
  if n_valid is None:
    valid = jnp.ones(w.shape, dtype=bool)
  else:
    valid = jnp.arange(w.shape[0]) < n_valid
  if wmax is None:
    wmax = jnp.max(jnp.where(valid, jnp.abs(w), 0.0))
  snap = valid & (jnp.abs(w) < tol * wmax)
  return jnp.where(snap, 0.0, w)


# ---------------------------------------------------------------------------
# Eigengap-based number-of-clusters selection (reference utils.py:74-130).
# ---------------------------------------------------------------------------


def compute_number_of_clusters(
    eigenvalues: jnp.ndarray,
    max_clusters: typing.Optional[int] = None,
    stop_eigenvalue: float = 1e-2,
    eigengap_type: EigenGapType = EigenGapType.Ratio,
    descend: bool = True,
    eps: float = EPS,
    n_valid=None,
    wmax=None) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """Masked, jit-compatible eigengap scan.

  Semantics match the reference loop exactly:
    descend (utils.py:117-128): for i in [1, range_end), stop at the first i
      with eigenvalues[i-1] < stop_eigenvalue; delta = w[i-1]/(w[i]+eps)
      (Ratio) or (w[i-1]-w[i])/max(w) (NormalizedDiff); first maximal delta
      wins; if no delta > 0, returns (0, 0).
    ascend (utils.py:106-115): for i in [1, range_end-1), delta uses
      (w[i+1], w[i]) and the winner index is i+1 (the first eigenvalue of a
      Laplacian is ~0 so i starts at 1).

  ``n_valid`` (traced) restricts the scan and the NormalizedDiff max to the
  first n_valid eigenvalues of a padded problem. ``wmax`` (traced scalar)
  overrides the NormalizedDiff denominator max(w) — required when
  ``eigenvalues`` holds only the t extreme values of an ascending scan (see
  snap_small_eigenvalues).

  Returns traced (n_clusters:int32, max_delta:float) — callers needing a
  Python int do one scalar device sync.
  """
  if not isinstance(eigengap_type, EigenGapType):
    raise TypeError("eigengap_type must be a EigenGapType")
  n = eigenvalues.shape[0]
  range_end = n
  if max_clusters and max_clusters + 1 < range_end:
    range_end = max_clusters + 1

  idx = jnp.arange(n)
  if n_valid is None:
    n_valid_arr = jnp.asarray(n, dtype=jnp.int32)
  else:
    n_valid_arr = jnp.asarray(n_valid, dtype=jnp.int32)

  if descend:
    if n < 2:
      return jnp.asarray(0, jnp.int32), jnp.asarray(0.0, eigenvalues.dtype)
    lead = eigenvalues[:-1]      # w[i-1] for i = 1..n-1
    lag = eigenvalues[1:]        # w[i]
    # Break: iteration i runs only while all previous w[j-1] >= stop.
    alive = jnp.cumprod((lead >= stop_eigenvalue).astype(jnp.int32)) > 0
    pos = idx[:-1] + 1           # the loop variable i
    in_range = (pos < range_end) & (pos < n_valid_arr)
    if eigengap_type == EigenGapType.Ratio:
      delta = lead / (lag + eps)
    else:
      if wmax is None:
        wmax = jnp.max(jnp.where(idx < n_valid_arr, eigenvalues, -jnp.inf))
      delta = (lead - lag) / wmax
    masked = jnp.where(alive & in_range, delta, -jnp.inf)
    best = jnp.max(masked)
    best_i = jnp.argmax(masked) + 1
    n_clusters = jnp.where(best > 0, best_i, 0).astype(jnp.int32)
    return n_clusters, jnp.maximum(best, 0.0)
  else:
    if n < 3:
      return jnp.asarray(0, jnp.int32), jnp.asarray(0.0, eigenvalues.dtype)
    cur = eigenvalues[1:-1]      # w[i] for i = 1..n-2
    nxt = eigenvalues[2:]        # w[i+1]
    pos = idx[1:-1]              # the loop variable i
    in_range = (pos < range_end - 1) & (pos + 1 < n_valid_arr)
    if eigengap_type == EigenGapType.Ratio:
      delta = nxt / (cur + eps)
    else:
      if wmax is None:
        wmax = jnp.max(jnp.where(idx < n_valid_arr, eigenvalues, -jnp.inf))
      delta = (nxt - cur) / wmax
    masked = jnp.where(in_range, delta, -jnp.inf)
    best = jnp.max(masked)
    best_i = jnp.argmax(masked) + 2   # index i means i+1 clusters
    n_clusters = jnp.where(best > 0, best_i, 0).astype(jnp.int32)
    return n_clusters, jnp.maximum(best, 0.0)


# ---------------------------------------------------------------------------
# Sentinel handling for padded eigenproblems.
# ---------------------------------------------------------------------------


def apply_padding_sentinels(mat: jnp.ndarray, n_valid,
                            descend: bool) -> jnp.ndarray:
  """Make padded coordinates spectrally inert.

  Zeroes padded rows/cols and writes distinct sentinel values on the padded
  diagonal so that (a) the matrix stays exactly block-diagonal — padded
  eigenvectors are coordinate vectors, never mixing with the valid subspace —
  and (b) after sorting, padded eigenvalues land *past the end* of the scan
  direction (bottom for descending, top for ascending).

  Sentinel magnitude is scaled to the valid block's Gershgorin bound
  (max absolute row sum ≥ every |eigenvalue|): eigensolver backward error is
  relative to ‖A‖, so fixed huge sentinels (e.g. 1e6) would inject O(‖sent‖·ε)
  absolute error into the *valid* eigenvalues — observed as completely wrong
  eigengaps on TPU's f32 eigh.
  """
  n = mat.shape[0]
  idx = jnp.arange(n)
  v = idx < n_valid
  keep = v[:, None] & v[None, :]
  out = jnp.where(keep, mat, 0.0)
  bound = jnp.max(jnp.sum(jnp.where(keep, jnp.abs(out), 0.0), axis=1))
  base = 1.25 * bound + 1.0
  step = 0.01 * bound + 0.01
  sign = -1.0 if descend else 1.0
  sentinels = sign * (base + idx.astype(mat.dtype) * step)
  diag_vals = jnp.where(v, jnp.diag(out), sentinels)
  return out - jnp.diag(jnp.diag(out)) + jnp.diag(diag_vals)


# ---------------------------------------------------------------------------
# Top-k eigensolver for sharded large-N problems.
# ---------------------------------------------------------------------------


def cholqr2_shifted(y: jnp.ndarray) -> jnp.ndarray:
  """Orthonormalize a tall-skinny panel with shift-stabilized CholeskyQR2.

  MATMUL-ONLY (plus an O(b³) Cholesky/triangular-solve on the tiny (b, b)
  Gram): on TPU this replaces Householder QR, whose per-panel
  dynamic-update-slice chain is both slow to execute (sequential, off-MXU)
  and pathologically slow for XLA to compile when it sits inside a
  while_loop body (measured: the top-k solver's escalation loop with
  jnp.linalg.qr cold-compiled for >20 min at N=10240 through this
  environment's remote-compile tunnel). The Gram matmul row-shards cleanly
  (GSPMD inserts one psum), unlike QR.

  The shift keeps Cholesky from breaking down when the panel is
  ill-conditioned (power-iterated panels align toward the dominant
  eigenvector; κ(Gram) = κ(panel)²); the second pass restores orthogonality
  to working precision. Residual-gated callers (topk_eigh_subspace) escalate
  iterations if orthogonality loss ever degrades the Ritz residuals.
  """
  b = y.shape[1]

  def one_pass(y, delta_rel):
    gram = jnp.matmul(y.T, y, preferred_element_type=jnp.float32)
    delta = delta_rel * jnp.maximum(jnp.max(jnp.diag(gram)), 1e-30)
    r = jnp.linalg.cholesky(gram + delta * jnp.eye(b, dtype=y.dtype))
    return jax.scipy.linalg.solve_triangular(r, y.T, lower=True).T

  for _ in range(2):
    # Breakdown guard (r5): after one multiplication by an operator with a
    # dominant low-rank top, the panel's numerical rank collapses and
    # rounding can push the 1e-6-shifted Gram indefinite — Cholesky then
    # yields NaNs that poison the whole basis (observed on-chip at
    # N=20480, k=4, under the 6-pass "highest" matmul mode; the NaN
    # propagates through every later iteration). Retry the pass with a
    # 1e-2 shift — heavily damped but always positive-definite; the
    # second CholQR2 pass (or the next iteration's) restores
    # orthogonality, and residual-gated callers escalate if quality
    # suffered. jnp.where (not lax.cond) keeps it vmap/shard-friendly;
    # the extra pass is O(N b^2), negligible next to the (N,N)(N,b)
    # iteration matmul.
    y1 = one_pass(y, 1e-6)
    ok = jnp.all(jnp.isfinite(y1))
    y = jnp.where(ok, y1, one_pass(y, 1e-2))
  return y


def topk_eigh_subspace_masked(
    mat: jnp.ndarray,
    k: int,
    key: jax.Array,
    largest: bool,
    n_valid=None,
    num_iters: int = 24,
    residual_tol: typing.Optional[float] = None,
    max_iters: int = 384,
    drift_tol: typing.Optional[float] = None,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """topk_eigh_subspace on the VALID block of a sentinel-padded matrix.

  The ascending (largest=False) case must NOT see apply_padding_sentinels'
  pad diagonal: sentinel magnitudes grow with the pad index (up to tens of
  times the valid Gershgorin bound at deep pads), so the default
  full-matrix Gershgorin shift lands at the sentinel scale and the whole
  valid spectrum collapses into a relative band of ~1e-4 of the shifted
  operator — block power iteration then cannot separate the bottom
  eigenvalues within the iteration budget (observed: Turn-to-Diarize at
  N=4096 → pad 4864 returned garbage bottom-8 values on the chip, r5).
  Here the pad block is rebuilt as exact zeros with diagonal = bound + 1
  (just past the ascending scan end) and the shift comes from the VALID
  block's Gershgorin bound: valid eigenvalues shift into [1, bound+1],
  pads to exactly 0 — never captured, healthy separation.

  The descending case is masked too (r5): sentinel magnitudes reach
  ~124x the valid bound at deep pad buckets (base + i*step with the
  GLOBAL index i), so block power iteration amplifies pad coordinates
  ~124^t faster than any valid direction — after a handful of iterations
  the float32 basis is pure pad coordinates and every Ritz value is a
  sentinel. This was latent in every padded descending subspace run
  (bench legs run unpadded, and the padded test compared the two subspace
  routes against each other — both wrong identically); first exposed by
  the k=4/k=7 multi-speaker runs at N=10240 (pad 12288), where the
  headline solver returned n_clusters=2. With the pad block zeroed
  (diagonal 0), pads never amplify and decay out of the basis under
  orthonormalization.
  """
  if n_valid is None:
    return topk_eigh_subspace(mat, k, key, num_iters=num_iters,
                              largest=largest, residual_tol=residual_tol,
                              max_iters=max_iters, drift_tol=drift_tol)
  n = mat.shape[0]
  v = jnp.arange(n) < n_valid
  keep = v[:, None] & v[None, :]
  mm = jnp.where(keep, mat, 0.0)
  if largest:
    return topk_eigh_subspace(mm, k, key, num_iters=num_iters, largest=True,
                              residual_tol=residual_tol, max_iters=max_iters,
                              drift_tol=drift_tol)
  bound = jnp.max(jnp.sum(jnp.abs(mm), axis=1))
  shift = bound + 1.0
  op_m = mm + jnp.diag(jnp.where(v, 0.0, shift))
  return topk_eigh_subspace(op_m, k, key, num_iters=num_iters, largest=False,
                            shift=shift, residual_tol=residual_tol,
                            max_iters=max_iters, drift_tol=drift_tol)


def topk_eigh_subspace(
    mat: jnp.ndarray,
    k: int,
    key: jax.Array,
    num_iters: int = 24,
    oversample: int = 8,
    largest: bool = True,
    shift: typing.Optional[float] = None,
    residual_tol: typing.Optional[float] = None,
    max_iters: int = 384,
    drift_tol: typing.Optional[float] = None,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """Randomized subspace (block power) iteration for extreme eigenpairs.

  For N x N sharded across chips, each iteration is one sharded (N,N)x(N,b)
  matmul + a matmul-only CholeskyQR2 orthonormalization (see
  cholqr2_shifted) — the collectives are inserted by GSPMD from the
  sharding annotations on ``mat``. For smallest eigenpairs of a PSD matrix,
  iterate on (shift*I - M); ``shift`` defaults to a Gershgorin upper bound.

  Accuracy guardrail: with ``residual_tol`` set, after the initial
  ``num_iters`` the iteration escalates in ``num_iters``-sized chunks (up to
  ``max_iters`` total) until the worst top-k eigenpair residual
  max_i ‖M v_i − λ_i v_i‖ / max|λ| drops below the tolerance. Weak-eigengap
  spectra (exactly where the reference's eigengap scan, utils.py:74-130, is
  most sensitive) can mis-rank eigenvalues at a fixed 24 iterations; the
  residual check detects and fixes this inside the compiled graph
  (lax.while_loop — one extra (N,N)x(N,b) matmul per chunk).

  ``drift_tol`` adds a VALUE-settled early exit to the escalation: stop
  when max_i |λ_i − λ_i_prev_chunk| / max|λ| ≤ drift_tol even though some
  pair's residual is still above residual_tol. Rationale: spectra with a
  dense bulk (e.g. a normalized Laplacian's interior at the T2D sweep
  sizes) have neighbors ~1e-3 apart whose per-PAIR residuals converge at
  ratio (shift−λ_{i+1})/(shift−λ_i) ≈ 0.9998 — thousands of iterations —
  while the Ritz VALUES (all the eigengap scan consumes) settle inside
  the bulk's spread within a few chunks. A pair still migrating ACROSS a
  gap has large drift, so gap decisions stay protected; only intra-
  cluster ordering (gap-irrelevant) is left unresolved. Callers whose
  downstream consumes EIGENVECTORS with per-pair certificates (ops/dc.py)
  must keep drift_tol=None — a drift-stall there would surface as a
  certificate failure rather than silent inaccuracy.
  """
  n = mat.shape[0]
  b = min(n, k + oversample)
  if not largest:
    if shift is None:
      shift = jnp.max(jnp.sum(jnp.abs(mat), axis=1))
    op = lambda x: shift * x - jnp.matmul(mat, x,
                                          preferred_element_type=jnp.float32)
  else:
    op = lambda x: jnp.matmul(mat, x, preferred_element_type=jnp.float32)

  def iterate(q, steps):
    def body(_, q):
      return cholqr2_shifted(op(q))
    return jax.lax.fori_loop(0, steps, body, q)

  def rayleigh_ritz(q):
    """Ritz pairs of the ORIGINAL matrix + worst relative top-k residual."""
    mq = jnp.matmul(mat, q, preferred_element_type=jnp.float32)
    t = q.T @ mq
    t = 0.5 * (t + t.T)
    w_small, u_small = jnp.linalg.eigh(t)
    if largest:
      w_small, u_small = w_small[::-1], u_small[:, ::-1]
    v = q @ u_small[:, :k]
    mv = mq @ u_small[:, :k]
    res = jnp.linalg.norm(mv - v * w_small[None, :k], axis=0)
    scale = jnp.maximum(jnp.max(jnp.abs(w_small)), 1e-30)
    return w_small[:k], v, jnp.max(res) / scale

  q = cholqr2_shifted(jax.random.normal(key, (n, b), dtype=mat.dtype))
  q = iterate(q, num_iters)

  if residual_tol is None:
    w, v, _ = rayleigh_ritz(q)
    return w, v

  dtol = -1.0 if drift_tol is None else drift_tol

  def cond(state):
    q, it, res, drift, _ = state
    return (res > residual_tol) & (drift > dtol) & (it < max_iters)

  def loop_body(state):
    q, it, _, _, w_prev = state
    q = iterate(q, num_iters)
    w_new, _, res = rayleigh_ritz(q)
    scale = jnp.maximum(jnp.max(jnp.abs(w_new)), 1e-30)
    drift = jnp.max(jnp.abs(w_new - w_prev)) / scale
    return q, it + num_iters, res, drift, w_new

  w0, _, res0 = rayleigh_ritz(q)
  q, _, _, _, _ = jax.lax.while_loop(
      cond, loop_body,
      (q, jnp.asarray(num_iters, jnp.int32), res0,
       jnp.asarray(jnp.inf, mat.dtype), w0))
  w, v, _ = rayleigh_ritz(q)
  return w, v
