"""Model-sharded clustering for N too large for one chip.

The N×N affinity/Laplacian is row-sharded over the mesh's ``model`` axis
(N=20k fp32 → 1.6 GB per matrix plus temporaries; BASELINE.json pod config).
All ops are expressed as ordinary jnp with sharding constraints — GSPMD
inserts the collectives (all-gather of the (N,d) embedding block for the
affinity matmul, all-to-all for Symmetrize's transpose, psum for reductions)
over ICI. With ``use_ring_affinity`` the affinity stage instead runs the
explicit ring-ppermute exchange (parallel/ring.py): P-1 hops of the small
(N/P, d) block instead of materializing a full (N, d) replica per device —
the win case is large d where the gathered replica pressures HBM.

The eigensolver is randomized subspace iteration (ops/eigen.py
topk_eigh_subspace): only the top/bottom (max_clusters+1+oversample)
eigenpairs are needed, each iteration is one row-sharded (N,N)x(N,b) matmul
+ a tiny replicated QR — O(N²b) instead of full eigh's O(N³), and it scales
across chips. Accuracy: iterative, converges geometrically in the spectral
gaps; exact-parity workloads at single-chip sizes should use the default
full-eigh path instead.

Refinement → symmetric-operand construction is shared with the monolithic
and staged pipelines (pipeline._symmetric_eig_operand), so the masked-
padding semantics (Gershgorin-scaled sentinels, rownorm-tail similarity
transform) are identical by construction; non-divisible N is padded
automatically and carried as ``n_valid`` through the masked ops.
"""

from __future__ import annotations

import dataclasses
import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu import pipeline as pipeline_lib
from spectralcluster_tpu.ops import affinity as affinity_ops
from spectralcluster_tpu.ops import eigen as eigen_ops
from spectralcluster_tpu.ops import kmeans as kmeans_ops
from spectralcluster_tpu.ops import refinement as refinement_ops
from spectralcluster_tpu.parallel import mesh as mesh_lib
from spectralcluster_tpu.parallel import ring as ring_lib
from spectralcluster_tpu.precision import precise
from spectralcluster_tpu.types import EigenGapType, LaplacianType


def _power_iterate_lambda_max(mat: jnp.ndarray, key: jax.Array,
                              n_valid=None, iters: int = 12) -> jnp.ndarray:
  """Largest-eigenvalue estimate via power iteration (sharded matvecs).

  With padding, ``mat`` carries sentinel diagonal values outside the valid
  block; starting from a vector zeroed on the padded coordinates keeps the
  iteration exactly inside the valid subspace (the sentinel-padded matrix
  is block diagonal), so the estimate is the VALID block's λ_max.
  """
  v = jax.random.normal(key, (mat.shape[0],), dtype=mat.dtype)
  if n_valid is not None:
    v = jnp.where(jnp.arange(mat.shape[0]) < n_valid, v, 0.0)

  def body(_, v):
    v = jnp.matmul(mat, v, preferred_element_type=jnp.float32)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

  v = jax.lax.fori_loop(0, iters, body,
                        v / jnp.maximum(jnp.linalg.norm(v), 1e-30))
  return jnp.dot(v, jnp.matmul(mat, v, preferred_element_type=jnp.float32))


@functools.lru_cache(maxsize=16)
def make_sharded_cluster_fn(cfg: pipeline_lib.PipelineConfig, mesh,
                            num_iters: int = 24, oversample: int = 8,
                            use_ring_affinity: bool = False):
  """Compile a model-sharded large-N clustering step.

  Returns fn(embeddings (N,d), key[, n_valid]) -> (labels (N,), n_clusters);
  pass ``n_valid`` when the embeddings are padded (labels beyond it are 0).
  Requires cfg.max_clusters; refinement structure must be symmetric or
  rownorm-tail (same condition as the eigh path). ``use_ring_affinity``
  builds the affinity by ring-ppermute block exchange instead of GSPMD's
  all-gather (see module docstring).
  """
  if cfg.max_clusters is None:
    raise ValueError("sharded path requires max_clusters")
  k = cfg.max_clusters + 1
  rows = mesh_lib.row_sharding(mesh, 2)

  descend = cfg.laplacian_type in (None, LaplacianType.Affinity)
  structure = refinement_ops.analyze_symmetry(
      cfg.refinement_options.refinement_sequence, cfg.affinity_symmetric)
  if structure == refinement_ops.GENERAL or (
      not descend and structure != refinement_ops.SYMMETRIC):
    raise ValueError(
        "sharded path requires a symmetric / rownorm-tail refinement "
        "structure (no general eigensolver exists on device)")
  # Pallas kernels are single-device custom calls GSPMD cannot partition —
  # force the plain jnp op forms for every stage of the sharded graph.
  cfg = dataclasses.replace(cfg, use_pallas=False)
  ring_fn = ring_lib.make_ring_affinity_fn(mesh) if use_ring_affinity else None

  @precise
  def step(embeddings, key, n_valid=None):
    embeddings = jax.lax.with_sharding_constraint(embeddings, rows)
    eig_key, lmax_key, km_key = jax.random.split(key, 3)
    if ring_fn is not None:
      affinity = ring_fn(embeddings)
    else:
      affinity = affinity_ops.compute_affinity_matrix(embeddings)
    affinity = refinement_ops.mask_padding(affinity, n_valid)
    affinity = jax.lax.with_sharding_constraint(affinity, rows)

    # Refinement → symmetric operand (+ eigvec scale), sentinels applied:
    # the same code path as the monolithic/staged pipelines.
    mat, vec_scale = pipeline_lib._symmetric_eig_operand(
        affinity, cfg, None, None, n_valid, structure)
    mat = jax.lax.with_sharding_constraint(mat, rows)

    w, u = eigen_ops.topk_eigh_subspace(
        mat, k, eig_key, num_iters=num_iters, oversample=oversample,
        largest=descend, residual_tol=cfg.subspace_residual_tol,
        max_iters=cfg.subspace_max_iters)
    v = eigen_ops.recover_similarity_eigenvectors(u, vec_scale, n_valid)
    w = eigen_ops.snap_small_eigenvalues(w, tol=cfg.eigenvalue_snap_tol)
    if not descend and cfg.eigengap_type == EigenGapType.NormalizedDiff:
      # Ascending NormalizedDiff normalizes by the LARGEST eigenvalue
      # (reference utils.py:109-110), which the bottom-k iteration doesn't
      # produce — estimate it with a short power iteration and append it so
      # the masked scan's max sees it (the scan range excludes the last slot).
      lam_max = _power_iterate_lambda_max(mat, lmax_key, n_valid)
      w = jnp.concatenate([w, lam_max[None]])
    n_gap, _ = eigen_ops.compute_number_of_clusters(
        w, max_clusters=cfg.max_clusters,
        stop_eigenvalue=cfg.stop_eigenvalue,
        eigengap_type=cfg.eigengap_type, descend=descend)
    n_clusters = n_gap
    if cfg.min_clusters is not None:
      n_clusters = jnp.maximum(n_clusters, cfg.min_clusters)

    emb = pipeline_lib.spectral_embeddings_from_eigs(
        v, n_clusters, cfg.max_clusters, cfg.row_wise_renorm, n_valid)
    emb = jax.lax.with_sharding_constraint(emb, rows)
    n = emb.shape[0]
    if n_valid is None:
      weight = jnp.ones((n,), dtype=emb.dtype)
    else:
      weight = (jnp.arange(n) < n_valid).astype(emb.dtype)
    labels = kmeans_ops.kmeans_fit(
        emb, n_clusters, km_key, custom_dist=cfg.custom_dist,
        max_iter=cfg.max_iter, k_max=cfg.max_clusters, sample_weight=weight)
    if n_valid is not None:
      labels = jnp.where(jnp.arange(n) < n_valid, labels, 0)
    return labels, n_clusters

  return jax.jit(step)


def cluster_large_sharded(
    embeddings: np.ndarray,
    cfg: pipeline_lib.PipelineConfig,
    mesh=None,
    key: typing.Optional[jax.Array] = None,
    num_iters: int = 24,
    use_ring_affinity: bool = False,
) -> typing.Tuple[np.ndarray, int]:
  """Cluster one large recording with the N×N work sharded across chips.

  N that does not divide the model axis is padded up automatically and
  masked through the pipeline (``n_valid``), matching every other entry
  point's pad-internally contract.
  """
  if mesh is None:
    mesh = mesh_lib.make_mesh(dp=1, mp=None)
  if key is None:
    key = jax.random.PRNGKey(0)
  mp = mesh.shape["model"]
  n = embeddings.shape[0]
  n_pad = -(-n // mp) * mp
  fn = make_sharded_cluster_fn(cfg, mesh, num_iters=num_iters,
                               use_ring_affinity=use_ring_affinity)
  x = jnp.asarray(embeddings, jnp.float32)
  if n_pad != n:
    x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    labels, n_clusters = fn(x, key, jnp.asarray(n, jnp.int32))
  else:
    labels, n_clusters = fn(x, key)
  return np.asarray(labels)[:n], int(n_clusters)
