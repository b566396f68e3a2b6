"""Data-parallel batched clustering driver.

Clusters a batch of padded utterances in one compiled step, sharded over the
mesh's ``batch`` axis — the pod-scale "1024 utterances data-parallel" path of
BASELINE.json. Each utterance runs the fully-jitted masked pipeline
(pipeline.spectral_cluster_fixed_k) under vmap; XLA batches the eigh and
K-Means across utterances and GSPMD partitions the whole step across
devices with no hand-written collectives.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu import pipeline as pipeline_lib
from spectralcluster_tpu.parallel import mesh as mesh_lib
from spectralcluster_tpu.precision import precise


@functools.lru_cache(maxsize=16)
def make_batched_cluster_fn(cfg: pipeline_lib.PipelineConfig, mesh):
  """Compile a DP-sharded batched clustering step.

  Returns fn(embeddings (B,N,d), n_valid (B,), keys (B,2)) ->
  (labels (B,N), n_clusters (B,)). B must be divisible by the mesh's batch
  axis size.
  """

  @precise
  def step(embeddings, n_valid, keys, constraint_matrices=None):
    embeddings = jax.lax.with_sharding_constraint(
        embeddings, mesh_lib.batch_sharding(mesh, 3))

    def one(emb, nv, key, cm):
      labels, n_clusters, _, _ = pipeline_lib.spectral_cluster_fixed_k(
          emb, key, cfg, cm, nv)
      return labels, n_clusters

    if constraint_matrices is None:
      labels, n_clusters = jax.vmap(
          lambda e, nv, k: one(e, nv, k, None))(embeddings, n_valid, keys)
    else:
      constraint_matrices = jax.lax.with_sharding_constraint(
          constraint_matrices, mesh_lib.batch_sharding(mesh, 3))
      labels, n_clusters = jax.vmap(one)(embeddings, n_valid, keys,
                                         constraint_matrices)
    labels = jax.lax.with_sharding_constraint(
        labels, mesh_lib.batch_sharding(mesh, 2))
    return labels, n_clusters

  return jax.jit(step, static_argnames=())


def cluster_batch(
    utterances: typing.Sequence[np.ndarray],
    cfg: pipeline_lib.PipelineConfig,
    mesh=None,
    seed: int = 0,
    constraint_matrices: typing.Optional[
        typing.Sequence[np.ndarray]] = None,
) -> typing.List[np.ndarray]:
  """Cluster many variable-length utterances data-parallel.

  Pads every utterance to a common bucket, shards the batch over the mesh,
  and returns per-utterance label arrays (trimmed to true lengths).
  ``constraint_matrices`` (one per utterance, or None) enables the
  constrained Turn-to-Diarize configs — with cfg.autotune set, the whole
  constrained + auto-tuned batch runs as one compiled step.
  """
  if mesh is None:
    mesh = mesh_lib.make_mesh()
  dp = mesh.shape["batch"]
  lengths = [u.shape[0] for u in utterances]
  d = utterances[0].shape[1]
  n_pad = pipeline_lib.pad_bucket(max(lengths))
  b = len(utterances)
  b_pad = -(-b // dp) * dp
  batch = np.zeros((b_pad, n_pad, d), dtype=np.float32)
  n_valid = np.ones((b_pad,), dtype=np.int32)
  for i, u in enumerate(utterances):
    batch[i, :u.shape[0]] = u
    n_valid[i] = u.shape[0]
  keys = jax.vmap(jax.random.PRNGKey)(seed + np.arange(b_pad))
  fn = make_batched_cluster_fn(cfg, mesh)
  if constraint_matrices is not None:
    if len(constraint_matrices) != b:
      raise ValueError("need one constraint matrix per utterance")
    cms = np.zeros((b_pad, n_pad, n_pad), dtype=np.float32)
    for i, cm in enumerate(constraint_matrices):
      k = lengths[i]
      cms[i, :k, :k] = cm
    labels, _ = fn(jnp.asarray(batch), jnp.asarray(n_valid), keys,
                   jnp.asarray(cms))
  else:
    labels, _ = fn(jnp.asarray(batch), jnp.asarray(n_valid), keys)
  labels = np.asarray(labels)
  return [labels[i, :lengths[i]] for i in range(b)]
