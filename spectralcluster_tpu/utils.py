"""Label utilities: ordered relabeling, label chaining, centroids.

Host (numpy) versions mirror reference utils.py:133-206 exactly; jnp variants
are provided for use inside jitted pipelines (first-appearance relabeling as a
vectorized reduction instead of a Python dict loop).
"""

from __future__ import annotations

import typing

import jax.numpy as jnp
import numpy as np


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
