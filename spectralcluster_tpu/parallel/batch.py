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
  def step(embeddings, n_valid, keys):
    embeddings = jax.lax.with_sharding_constraint(
        embeddings, mesh_lib.batch_sharding(mesh, 3))

    def one(emb, nv, key):
      labels, n_clusters, _, _ = pipeline_lib.spectral_cluster_fixed_k(
          emb, key, cfg, None, nv)
      return labels, n_clusters

    labels, n_clusters = jax.vmap(one)(embeddings, n_valid, keys)
    labels = jax.lax.with_sharding_constraint(
        labels, mesh_lib.batch_sharding(mesh, 2))
    return labels, n_clusters

  return jax.jit(step)


def cluster_batch(
    utterances: typing.Sequence[np.ndarray],
    cfg: pipeline_lib.PipelineConfig,
    mesh=None,
    seed: int = 0,
) -> typing.List[np.ndarray]:
  """Cluster many variable-length utterances data-parallel.

  Pads every utterance to a common bucket, shards the batch over the mesh,
  and returns per-utterance label arrays (trimmed to true lengths).
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
  labels, _ = fn(jnp.asarray(batch), jnp.asarray(n_valid), keys)
  labels = np.asarray(labels)
  return [labels[i, :lengths[i]] for i in range(b)]
