"""Model-sharded clustering for N too large for one chip.

The N×N affinity/Laplacian is row-sharded over the mesh's ``model`` axis
(N=20k fp32 → 1.6 GB per matrix plus temporaries; BASELINE.json pod config).
All ops are expressed as ordinary jnp with sharding constraints — GSPMD
inserts the collectives (all-gather of the (N,d) embedding block for the
affinity matmul, all-to-all for Symmetrize's transpose, psum for reductions)
over ICI.

The eigensolver is randomized subspace iteration (ops/eigen.py
topk_eigh_subspace): only the top/bottom (max_clusters+1+oversample)
eigenpairs are needed, each iteration is one row-sharded (N,N)x(N,b) matmul
+ a tiny replicated QR — O(N²b) instead of full eigh's O(N³), and it scales
across chips. Accuracy: iterative, converges geometrically in the spectral
gaps; exact-parity workloads at single-chip sizes should use the default
full-eigh path instead.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from spectralcluster_tpu import pipeline as pipeline_lib
from spectralcluster_tpu.ops import affinity as affinity_ops
from spectralcluster_tpu.ops import eigen as eigen_ops
from spectralcluster_tpu.ops import kmeans as kmeans_ops
from spectralcluster_tpu.ops import laplacian as laplacian_ops
from spectralcluster_tpu.ops import refinement as refinement_ops
from spectralcluster_tpu.parallel import mesh as mesh_lib
from spectralcluster_tpu.precision import precise
from spectralcluster_tpu.types import EigenGapType, LaplacianType


def _power_iterate_lambda_max(mat: jnp.ndarray, key: jax.Array,
                              iters: int = 12) -> jnp.ndarray:
  """Largest-eigenvalue estimate via power iteration (sharded matvecs)."""
  v = jax.random.normal(key, (mat.shape[0],), dtype=mat.dtype)

  def body(_, v):
    v = jnp.matmul(mat, v, preferred_element_type=jnp.float32)
    return v / jnp.linalg.norm(v)

  v = jax.lax.fori_loop(0, iters, body, v / jnp.linalg.norm(v))
  return jnp.dot(v, jnp.matmul(mat, v, preferred_element_type=jnp.float32))


@functools.lru_cache(maxsize=16)
def make_sharded_cluster_fn(cfg: pipeline_lib.PipelineConfig, mesh,
                            num_iters: int = 24, oversample: int = 8):
  """Compile a model-sharded large-N clustering step.

  Returns fn(embeddings (N,d), key) -> (labels (N,), n_clusters).
  Requires cfg.max_clusters; refinement structure must be symmetric or
  rownorm-tail (same condition as the eigh path).
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

  @precise
  def step(embeddings, key):
    embeddings = jax.lax.with_sharding_constraint(embeddings, rows)
    affinity = affinity_ops.compute_affinity_matrix(embeddings)
    affinity = jax.lax.with_sharding_constraint(affinity, rows)
    seq = cfg.refinement_options.refinement_sequence or ()

    if structure == refinement_ops.ROWNORM_TAIL and descend:
      s = refinement_ops.apply_refinement_sequence(
          affinity, cfg.refinement_options, sequence=seq[:-1])
      s = jax.lax.with_sharding_constraint(s, rows)
      d = refinement_ops.row_max_scale(s)
      inv_sqrt = 1.0 / jnp.sqrt(d)
      mat = inv_sqrt[:, None] * s * inv_sqrt[None, :]
      vec_scale = inv_sqrt
    else:
      refined = refinement_ops.apply_refinement_sequence(
          affinity, cfg.refinement_options, sequence=seq)
      refined = jax.lax.with_sharding_constraint(refined, rows)
      if descend:
        mat, vec_scale = refined, None
      else:
        mat, vec_scale = laplacian_ops.laplacian_similarity(
            refined, cfg.laplacian_type)
    mat = jax.lax.with_sharding_constraint(mat, rows)

    w, u = eigen_ops.topk_eigh_subspace(
        mat, k, key, num_iters=num_iters, oversample=oversample,
        largest=descend, residual_tol=cfg.subspace_residual_tol,
        max_iters=cfg.subspace_max_iters)
    v = eigen_ops.recover_similarity_eigenvectors(u, vec_scale)
    w = eigen_ops.snap_small_eigenvalues(w, tol=cfg.eigenvalue_snap_tol)
    if not descend and cfg.eigengap_type == EigenGapType.NormalizedDiff:
      # Ascending NormalizedDiff normalizes by the LARGEST eigenvalue
      # (reference utils.py:109-110), which the bottom-k iteration doesn't
      # produce — estimate it with a short power iteration and append it so
      # the masked scan's max sees it (the scan range excludes the last slot).
      lam_max = _power_iterate_lambda_max(mat, key)
      w = jnp.concatenate([w, lam_max[None]])
    n_gap, _ = eigen_ops.compute_number_of_clusters(
        w, max_clusters=cfg.max_clusters,
        stop_eigenvalue=cfg.stop_eigenvalue,
        eigengap_type=cfg.eigengap_type, descend=descend)
    n_clusters = n_gap
    if cfg.min_clusters is not None:
      n_clusters = jnp.maximum(n_clusters, cfg.min_clusters)

    emb = pipeline_lib.spectral_embeddings_from_eigs(
        v, n_clusters, cfg.max_clusters, cfg.row_wise_renorm)
    emb = jax.lax.with_sharding_constraint(emb, rows)
    labels = kmeans_ops.kmeans_fit(
        emb, n_clusters, key, custom_dist=cfg.custom_dist,
        max_iter=cfg.max_iter, k_max=cfg.max_clusters)
    return labels, n_clusters

  return jax.jit(step)


def cluster_large_sharded(
    embeddings: np.ndarray,
    cfg: pipeline_lib.PipelineConfig,
    mesh=None,
    key: typing.Optional[jax.Array] = None,
    num_iters: int = 24,
) -> typing.Tuple[np.ndarray, int]:
  """Cluster one large recording with the N×N work sharded across chips."""
  if mesh is None:
    mesh = mesh_lib.make_mesh(dp=1, mp=None)
  if key is None:
    key = jax.random.PRNGKey(0)
  mp = mesh.shape["model"]
  n = embeddings.shape[0]
  n_pad = -(-n // mp) * mp
  if n_pad != n:
    raise ValueError(
        f"N={n} must be divisible by the model axis ({mp}); pad input first.")
  fn = make_sharded_cluster_fn(cfg, mesh, num_iters=num_iters)
  labels, n_clusters = fn(jnp.asarray(embeddings, jnp.float32), key)
  return np.asarray(labels), int(n_clusters)
