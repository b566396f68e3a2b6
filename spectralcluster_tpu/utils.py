"""Utility functions: affinity/eigen wrappers and label utilities.

Mirrors the reference's ``utils`` module surface (utils.py) so reference
users can port imports 1:1. The numerical functions are thin host-facing
wrappers over the compiled ops in ops/ (numpy in / numpy out); label
utilities are host numpy with jnp variants for use inside jitted pipelines.
"""

from __future__ import annotations

import typing

import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu.types import EPS, EigenGapType  # noqa: F401 (re-export)


def compute_affinity_matrix(embeddings: np.ndarray) -> np.ndarray:
  """Cosine affinity in [0,1] (reference utils.py:20-41), computed on device."""
  from spectralcluster_tpu.ops import affinity as affinity_ops
  return np.asarray(affinity_ops.compute_affinity_matrix(
      jnp.asarray(embeddings, jnp.float32)))


def compute_sorted_eigenvectors(
    input_matrix: np.ndarray,
    descend: bool = True) -> typing.Tuple[np.ndarray, np.ndarray]:
  """Sorted eigendecomposition (reference utils.py:44-71).

  Symmetric inputs use the device eigh; asymmetric inputs fall back to the
  host general solver (LAPACK has no TPU lowering — the compiled pipelines
  avoid this case entirely via similarity transforms, see ops/eigen.py).
  """
  from spectralcluster_tpu.ops import eigen as eigen_ops
  m = np.asarray(input_matrix, dtype=np.float64)
  if np.allclose(m, m.T, atol=1e-12):
    w, v = eigen_ops.sorted_eigh(jnp.asarray(m, jnp.float32), descend=descend)
    return np.asarray(w), np.asarray(v)
  w, v = np.linalg.eig(m)
  w, v = w.real, v.real
  order = np.argsort(-w if descend else w)
  return w[order], v[:, order]


def compute_number_of_clusters(
    eigenvalues: np.ndarray,
    max_clusters: typing.Optional[int] = None,
    stop_eigenvalue: float = 1e-2,
    eigengap_type: EigenGapType = EigenGapType.Ratio,
    descend: bool = True,
    eps: float = EPS) -> typing.Tuple[int, float]:
  """Eigengap cluster-count selection (reference utils.py:74-130)."""
  from spectralcluster_tpu.ops import eigen as eigen_ops
  n, gap = eigen_ops.compute_number_of_clusters(
      jnp.asarray(eigenvalues), max_clusters=max_clusters,
      stop_eigenvalue=stop_eigenvalue, eigengap_type=eigengap_type,
      descend=descend, eps=eps)
  return int(n), float(gap)


def enforce_ordered_labels(labels: np.ndarray) -> np.ndarray:
  """First-appearance relabeling -> permutation-invariant label sequences.

  Reference utils.py:133-156.
  """
  labels = np.asarray(labels)
  new_labels = labels.copy()
  label_map = {}
  for element in labels.tolist():
    if element not in label_map:
      label_map[element] = len(label_map)
  for key, val in label_map.items():
    new_labels[labels == key] = val
  return new_labels


def enforce_ordered_labels_jnp(labels: jnp.ndarray) -> jnp.ndarray:
  """Jit-compatible first-appearance relabeling (O(N²) broadcast compare)."""
  n = labels.shape[0]
  idx = jnp.arange(n)
  same = labels[None, :] == labels[:, None]          # (N, N)
  first = jnp.min(jnp.where(same, idx[None, :], n), axis=1)  # first occurrence
  # Rank of each first-occurrence index among distinct first occurrences.
  is_first = first == idx
  rank_of_index = jnp.cumsum(is_first.astype(jnp.int32)) - 1
  return rank_of_index[first]


def get_cluster_centroids(embeddings: np.ndarray,
                          labels: np.ndarray) -> np.ndarray:
  """Per-label mean embeddings. Reference utils.py:159-177."""
  embeddings = np.asarray(embeddings)
  labels = np.asarray(labels)
  n_clusters = int(labels.max()) + 1
  centroids = [
      embeddings[labels == i, :].mean(axis=0) for i in range(n_clusters)
  ]
  return np.stack(centroids)


def get_cluster_centroids_jnp(embeddings: jnp.ndarray, labels: jnp.ndarray,
                              n_clusters: int) -> jnp.ndarray:
  """Jit-compatible centroid computation (one-hot matmul, static n_clusters)."""
  onehot = (labels[:, None] == jnp.arange(n_clusters)[None, :]).astype(
      embeddings.dtype)
  counts = jnp.sum(onehot, axis=0)
  sums = jnp.matmul(onehot.T, embeddings, preferred_element_type=jnp.float32)
  return sums / jnp.maximum(counts[:, None], 1.0)


def chain_labels(pre_labels: typing.Optional[np.ndarray],
                 main_labels: np.ndarray) -> np.ndarray:
  """Compose pre-clusterer labels with main-clusterer labels.

  Reference utils.py:180-206 (including the shape-mismatch ValueError).
  """
  if pre_labels is None:
    return main_labels
  pre_labels = np.asarray(pre_labels)
  main_labels = np.asarray(main_labels)
  u1 = int(pre_labels.max()) + 1
  if u1 != main_labels.shape[0]:
    raise ValueError(
        "pre_labels has {} values while main_labels has {} rows.".format(
            u1, main_labels.shape[0]))
  return main_labels[pre_labels.astype(np.int64)].astype(np.float64)
