"""Custom-distance K-Means, TPU-native.

Replaces reference custom_distance_kmeans.py:13-141:
  * k-means++ initialization with an explicit JAX PRNG key (replacing
    sklearn's ``random_state=0``; documented divergence — labels still match
    on separable data, which is what the reference's own tests rely on).
  * Lloyd iterations as a ``lax.while_loop`` with the reference's exact
    convergence rule (custom_distance_kmeans.py:120-133): iterate up to
    max_iter+1 assignment rounds, stopping when the mean assigned distance is
    within (1 - tol) of the previous round, and returning the labels of the
    stopping round.
  * Assignment distances via batched pairwise kernels (ops/affinity.py) —
    O(N·k·d) matmuls on the MXU; centroid updates via a one-hot matmul
    (scatter-free segment mean).
  * Fully masked: supports a *traced* number of clusters (centroid columns
    ≥ n_clusters get +inf distance) and padded rows (weight-0 samples), so
    the whole pipeline jits with static shapes even though the eigengap
    makes n_clusters data-dependent.

Known reference quirks NOT replicated (SURVEY.md §2a quirks a-c): the
unreachable NameError path, the index-0 centroid-update skip
(``[0]``-is-falsy bug), and the silent max_iter override when custom_dist is
falsy (we honor 300 in that branch as the reference does).
"""

from __future__ import annotations

import functools
import math
import typing

import jax
import jax.numpy as jnp

from spectralcluster_tpu.ops import affinity as affinity_ops


def _sqeuclidean_to_points(x: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
  return affinity_ops.cdist_sqeuclidean(x, pts)


def kmeans_plusplus(
    x: jnp.ndarray,
    k_max: int,
    key: jax.Array,
    sample_weight: typing.Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Greedy k-means++ seeding (sklearn-style local trials), seeded PRNG.

  Selection always uses squared-euclidean potentials — as in the reference,
  where sklearn's k-means++ provides init even for custom-distance K-Means
  (custom_distance_kmeans.py:38-43).
  Returns (k_max, d) centers.
  """
  n, d = x.shape
  if sample_weight is None:
    sample_weight = jnp.ones((n,), dtype=x.dtype)
  w = sample_weight
  keys = jax.random.split(key, k_max + 1)

  c0 = jax.random.categorical(keys[0], jnp.log(w + 1e-30))
  centers = jnp.zeros((k_max, d), dtype=x.dtype).at[0].set(x[c0])
  closest = _sqeuclidean_to_points(x, x[c0][None, :])[:, 0]
  closest = jnp.where(w > 0, closest, 0.0)
  trials = 2 + int(math.log(max(k_max, 1)))

  def step(j, carry):
    centers, closest = carry
    logits = jnp.where(w > 0, jnp.log(closest + 1e-30), -jnp.inf)
    cand = jax.random.categorical(keys[j], logits, shape=(trials,))
    d_cand = _sqeuclidean_to_points(x, x[cand])          # (N, trials)
    new_closest = jnp.minimum(closest[:, None], d_cand)
    new_closest = jnp.where((w > 0)[:, None], new_closest, 0.0)
    pots = jnp.sum(new_closest * w[:, None], axis=0)
    best = jnp.argmin(pots)
    centers = centers.at[j].set(x[cand[best]])
    return centers, new_closest[:, best]

  if k_max > 1:
    centers, _ = jax.lax.fori_loop(1, k_max, step, (centers, closest))
  return centers


def lloyd_iterations(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    n_clusters,
    dist_fn: typing.Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    max_iter: int = 10,
    tol: float = 0.001,
    sample_weight: typing.Optional[jnp.ndarray] = None,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """Reference CustomKMeans.predict semantics as a lax.while_loop.

  ``n_clusters`` may be traced (≤ centroids.shape[0]); surplus centroid slots
  are masked out of the assignment. Returns (labels, centroids).
  """
  n = x.shape[0]
  k_max = centroids.shape[0]
  if sample_weight is None:
    sample_weight = jnp.ones((n,), dtype=x.dtype)
  w = sample_weight
  w_total = jnp.sum(w)
  col_ok = jnp.arange(k_max) < n_clusters

  def assign(c):
    dist = dist_fn(x, c)
    dist = jnp.where(col_ok[None, :], dist, jnp.inf)
    labels = jnp.argmin(dist, axis=1)
    mind = jnp.min(dist, axis=1)
    mean_dist = jnp.sum(jnp.where(w > 0, mind, 0.0) * w) / w_total
    return labels, mean_dist

  def cond(state):
    it, _, _, _, done = state
    return ~done

  def body(state):
    it, prev, c, _, _ = state
    labels, mean_dist = assign(c)
    stop = ((mean_dist <= prev) & (mean_dist >= (1.0 - tol) * prev)) | (
        it >= max_iter)
    onehot = (labels[:, None] == jnp.arange(k_max)[None, :]).astype(x.dtype)
    onehot = onehot * w[:, None]
    counts = jnp.sum(onehot, axis=0)                     # (k_max,)
    sums = jnp.matmul(onehot.T, x, preferred_element_type=jnp.float32)
    new_c = jnp.where(counts[:, None] > 0, sums / counts[:, None], c)
    c = jnp.where(stop, c, new_c)
    return it + 1, mean_dist, c, labels, stop

  labels0 = jnp.zeros((n,), dtype=jnp.int32)
  init = (jnp.asarray(0, jnp.int32), jnp.asarray(0.0, x.dtype), centroids,
          labels0, jnp.asarray(False))
  _, _, centroids, labels, _ = jax.lax.while_loop(cond, body, init)
  return labels.astype(jnp.int32), centroids


def standard_lloyd(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    n_clusters,
    max_iter: int = 300,
    tol: float = 1e-4,
    sample_weight: typing.Optional[jnp.ndarray] = None,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
  """Plain euclidean Lloyd (the reference's `custom_dist falsy` sklearn branch,
  custom_distance_kmeans.py:33-36): run until centers move < tol or max_iter."""
  n = x.shape[0]
  k_max = centroids.shape[0]
  if sample_weight is None:
    sample_weight = jnp.ones((n,), dtype=x.dtype)
  w = sample_weight
  col_ok = jnp.arange(k_max) < n_clusters

  def cond(state):
    _, _, done = state
    return ~done

  def body(state):
    it, c, _ = state
    dist = affinity_ops.cdist_sqeuclidean(x, c)
    dist = jnp.where(col_ok[None, :], dist, jnp.inf)
    labels = jnp.argmin(dist, axis=1)
    onehot = (labels[:, None] == jnp.arange(k_max)[None, :]).astype(x.dtype)
    onehot = onehot * w[:, None]
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.matmul(onehot.T, x, preferred_element_type=jnp.float32)
    new_c = jnp.where(counts[:, None] > 0, sums / counts[:, None], c)
    shift = jnp.sum((new_c - c) ** 2)
    done = (shift < tol) | (it + 1 >= max_iter)
    return it + 1, new_c, done

  init = (jnp.asarray(0, jnp.int32), centroids, jnp.asarray(False))
  _, centroids, _ = jax.lax.while_loop(cond, body, init)
  dist = affinity_ops.cdist_sqeuclidean(x, centroids)
  dist = jnp.where(col_ok[None, :], dist, jnp.inf)
  return jnp.argmin(dist, axis=1).astype(jnp.int32), centroids


def kmeans_fit(
    x: jnp.ndarray,
    n_clusters,
    key: jax.Array,
    custom_dist: typing.Union[str, typing.Callable, None] = "cosine",
    max_iter: int = 10,
    tol: float = 0.001,
    k_max: typing.Optional[int] = None,
    sample_weight: typing.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
  """Full K-Means: seeded k-means++ init, then Lloyd with the chosen metric.

  Mirrors reference run_kmeans (custom_distance_kmeans.py:13-52): falsy
  ``custom_dist`` means plain euclidean K-Means with max_iter=300; otherwise
  k-means++ provides the initial centroids for the custom-distance loop.
  ``k_max`` makes the call jittable with traced n_clusters.
  """
  if k_max is None:
    k_max = int(n_clusters)
  centroids = kmeans_plusplus(x, k_max, key, sample_weight)
  if not custom_dist:
    labels, _ = standard_lloyd(x, centroids, n_clusters, max_iter=300,
                               sample_weight=sample_weight)
    return labels
  dist_fn = affinity_ops.get_distance_fn(custom_dist)
  labels, _ = lloyd_iterations(x, centroids, n_clusters, dist_fn,
                               max_iter=max_iter, tol=tol,
                               sample_weight=sample_weight)
  return labels


class CustomKMeans:
  """API-parity shell for the reference's CustomKMeans dataclass
  (custom_distance_kmeans.py:55-141): hold config + optional initial
  centroids, cluster with .predict(). Backed by the compiled Lloyd loop.
  """

  def __init__(self,
               n_clusters: typing.Optional[int] = None,
               centroids=None,
               max_iter: int = 10,
               tol: float = 0.001,
               custom_dist: typing.Union[str, typing.Callable] = "cosine",
               seed: int = 0):
    self.n_clusters = n_clusters
    self.centroids = centroids
    self.max_iter = max_iter
    self.tol = tol
    self.custom_dist = custom_dist
    self.seed = seed

  def predict(self, embeddings):
    import numpy as np
    x = jnp.asarray(embeddings, jnp.float32)
    n_samples = x.shape[0]
    if self.max_iter <= 0:
      raise ValueError("Number of iterations should be a positive number,"
                       " got %d instead" % self.max_iter)
    if n_samples < self.n_clusters:
      raise ValueError("n_samples=%d should be >= n_clusters=%d" %
                       (n_samples, self.n_clusters))
    if self.centroids is None:
      # Reference uses unseeded random choice here; we use a seeded draw.
      key = jax.random.PRNGKey(self.seed)
      idx = jax.random.choice(key, n_samples, (self.n_clusters,),
                              replace=False)
      centroids = x[idx]
    else:
      centroids = jnp.asarray(self.centroids, jnp.float32)
      if centroids.shape[0] != self.n_clusters:
        raise ValueError("The shape of the initial centroids (%s)"
                         "does not match the number of clusters %d" %
                         (str(centroids.shape), self.n_clusters))
      if centroids.shape[1] != x.shape[1]:
        raise ValueError(
            "The number of features of the initial centroids %d"
            "does not match the number of features of the data %d." %
            (centroids.shape[1], x.shape[1]))
    dist_fn = affinity_ops.get_distance_fn(self.custom_dist)
    labels, final = lloyd_iterations(
        x, centroids, self.n_clusters, dist_fn, max_iter=self.max_iter,
        tol=self.tol)
    self.centroids = np.asarray(final)
    return np.asarray(labels)


@functools.lru_cache(maxsize=256)
def _kmeans_jit(k_max: int, custom_dist, max_iter: int, tol: float):
  """Jitted kmeans_fit, cached per static configuration."""

  def fn(x, n_clusters, key, weight):
    return kmeans_fit(x, n_clusters, key, custom_dist=custom_dist,
                      max_iter=max_iter, tol=tol, k_max=k_max,
                      sample_weight=weight)

  from spectralcluster_tpu.precision import precise_jit
  return precise_jit(fn)


def run_kmeans(spectral_embeddings,
               n_clusters: int,
               custom_dist: typing.Union[str, typing.Callable],
               max_iter: int,
               key: typing.Optional[jax.Array] = None):
  """Drop-in replacement for reference run_kmeans — the injectable
  ``post_eigen_cluster_function`` contract (spectral_clusterer.py:82-84).

  The extra optional ``key`` threads explicit PRNG state; defaults to a fixed
  seed (the deterministic analog of the reference's random_state=0). Inputs
  are row-padded to shape buckets so repeated calls with growing N (streaming)
  hit the jit cache.
  """
  import numpy as np

  from spectralcluster_tpu import pipeline as pipeline_lib

  if key is None:
    key = jax.random.PRNGKey(0)
  x_np = np.asarray(spectral_embeddings, dtype=np.float32)
  n, d = x_np.shape
  # Row padding is safe for row-local metrics; mahalanobis (global covariance)
  # and user callables see the padded rows, so run those at exact shape.
  padding_safe = isinstance(custom_dist, str) and custom_dist != "mahalanobis"
  b = pipeline_lib.pad_bucket(n) if (padding_safe or not custom_dist) else n
  if b != n:
    x_np = np.concatenate([x_np, np.zeros((b - n, d), np.float32)], axis=0)
  weight = (np.arange(b) < n).astype(np.float32)
  fn = _kmeans_jit(int(n_clusters), custom_dist, int(max_iter), 0.001)
  labels = fn(jnp.asarray(x_np), jnp.asarray(int(n_clusters)), key,
              jnp.asarray(weight))
  return np.asarray(jax.device_get(labels))[:n]
