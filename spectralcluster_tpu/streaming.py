"""Multi-stage streaming clustering (arXiv:2210.13690).

Replaces reference multi_stage_clusterer.py. Host orchestration around the
compiled batch pipeline, with streaming state held in an explicit, immutable
pytree (`MultiStageState`) — trivially checkpointable/serializable (a genuine
improvement over the reference's scattered mutable attributes,
multi_stage_clusterer.py:113-123; SURVEY.md §5 checkpoint/resume).

Stages per input embedding (streaming_predict):
  N == 1            -> label [0]
  N ≤ U1            -> main clusterer (which itself falls back to AHC when
                       N < L, via fallback options)
  N > U1            -> AHC pre-cluster to U1 centroids -> spectral on
                       centroids -> chain labels
  cache hits U2     -> dynamic compression: cache <- U1 centroids
Deflicker: none / order-based / Hungarian matching against previous output.
"""

from __future__ import annotations

import dataclasses
import typing

import numpy as np

from spectralcluster_tpu import ahc as ahc_lib
from spectralcluster_tpu import utils
from spectralcluster_tpu.clusterer import SpectralClusterer
from spectralcluster_tpu.hungarian import linear_sum_assignment
from spectralcluster_tpu.types import (Deflicker, FallbackClustererType,
                                       SingleClusterCondition)


def match_labels(current: np.ndarray, previous: np.ndarray) -> np.ndarray:
  """Match current labels to previous via Hungarian on the overlap-count
  matrix (reference multi_stage_clusterer.py:32-64)."""
  current = utils.enforce_ordered_labels(np.asarray(current)).astype(np.int32)
  previous = np.asarray(previous).astype(np.int32)
  current_crop = current[:-1]
  if current_crop.shape != previous.shape:
    raise ValueError("current must have one more element than previous.")
  num_current = int(current_crop.max()) + 1
  num_previous = max(int(previous.max()) + 1, num_current)

  # Vectorized overlap-count cost matrix.
  cost = np.zeros((num_current, num_previous), dtype=np.int32)
  np.add.at(cost, (current_crop, previous), 1)

  row_ind, col_ind = linear_sum_assignment(cost, maximize=True)
  label_map = dict(zip(row_ind.tolist(), col_ind.tolist()))
  new_labels = current.copy()
  for i in range(int(current.max()) + 1):
    if i in label_map:
      new_labels[current == i] = label_map[i]
  return new_labels


@dataclasses.dataclass(frozen=True)
class MultiStageState:
  """Immutable streaming state — a pytree of plain arrays/ints."""
  cache: typing.Optional[np.ndarray] = None
  num_embeddings: int = 0
  compression_labels: typing.Optional[np.ndarray] = None
  previous_output: typing.Optional[np.ndarray] = None

  def to_dict(self) -> dict:
    return {
        "cache": None if self.cache is None else np.asarray(self.cache),
        "num_embeddings": self.num_embeddings,
        "compression_labels": (None if self.compression_labels is None else
                               np.asarray(self.compression_labels)),
        "previous_output": (None if self.previous_output is None else
                            np.asarray(self.previous_output)),
    }

  @classmethod
  def from_dict(cls, d: dict) -> "MultiStageState":
    return cls(cache=d.get("cache"),
               num_embeddings=int(d.get("num_embeddings", 0)),
               compression_labels=d.get("compression_labels"),
               previous_output=d.get("previous_output"))

  def save(self, path: str) -> None:
    """Checkpoint the streaming state to an .npz file."""
    d = {k: v for k, v in self.to_dict().items() if v is not None}
    d["num_embeddings"] = np.asarray(self.num_embeddings)
    np.savez(path, **d)

  @classmethod
  def load(cls, path: str) -> "MultiStageState":
    with np.load(path, allow_pickle=False) as z:
      d = {k: z[k] for k in z.files}
    return cls(cache=d.get("cache"),
               num_embeddings=int(d["num_embeddings"]),
               compression_labels=d.get("compression_labels"),
               previous_output=d.get("previous_output"))


class MultiStageClusterer:
  """Streaming multi-stage clusterer (reference multi_stage_clusterer.py:67+)."""

  def __init__(self,
               main_clusterer: SpectralClusterer,
               fallback_threshold: float = 0.5,
               L: int = 50,
               U1: int = 100,
               U2: int = 600,
               deflicker: Deflicker = Deflicker.NoDeflicker):
    self.deflicker = deflicker
    self.main = main_clusterer
    if self.main.max_spectral_size:
      raise ValueError(
          "Do not set max_spectral_size for SpectralClusterer when"
          "using MultiStageClusterer.")
    # Reconfigure the main clusterer's fallback behavior (the reference
    # mutates the options object in place, multi_stage_clusterer.py:90-105;
    # our options are frozen so we swap in a replaced copy).
    self.main.fallback_options = self.main.fallback_options.replace(
        spectral_min_embeddings=L,
        agglomerative_threshold=fallback_threshold,
        single_cluster_condition=SingleClusterCondition.FallbackClusterer,
        fallback_clusterer_type=FallbackClustererType.Agglomerative)
    self.U1 = U1
    self.U2 = U2
    self.state = MultiStageState()
    # Derived cache for the steady-state AHC: (cache array object this was
    # built from, row-normalized cache, cosine distance matrix). Purely a
    # host-side memo — NOT part of the checkpointable state (rebuilt on the
    # first step after a load/reset/compression).
    self._dist_memo: typing.Optional[tuple] = None

  # Convenience accessors mirroring the reference's attributes.
  @property
  def num_embeddings(self) -> int:
    return self.state.num_embeddings

  @property
  def cache(self):
    return self.state.cache

  @property
  def compression_labels(self):
    """Reference-compatible accessor (multi_stage_clusterer.py:118)."""
    return self.state.compression_labels

  @property
  def previous_output(self):
    """Reference-compatible accessor (multi_stage_clusterer.py:123)."""
    return self.state.previous_output

  def reset(self):
    self.state = MultiStageState()
    self._dist_memo = None

  def _cosine_dist(self, prev_cache, cache: np.ndarray) -> np.ndarray:
    """Cosine distance matrix of the cache, updated incrementally.

    Per step the cache grows by exactly one row, so the (N-1)x(N-1) prefix of
    the distance matrix is unchanged — recomputing it from scratch (the
    reference's sklearn call does, multi_stage_clusterer.py:156) costs
    O(N^2 d) per step; the incremental update costs O(N d). Distances are
    computed with the same normalize-then-dot formula as
    ahc.cosine_distance_matrix (values identical up to BLAS summation-order
    ulps). The memo is keyed on the previous cache array object, so any
    non-append transition (compression, reset, checkpoint load) rebuilds.
    """
    n = cache.shape[0]
    memo = self._dist_memo
    if (memo is not None and memo[0] is prev_cache
        and memo[1].shape[0] == n - 1):
      xn_prev, dist_prev = memo[1], memo[2]
      v = np.asarray(cache[-1], dtype=np.float64)
      vn = v / np.linalg.norm(v)
      cross = 1.0 - xn_prev @ vn
      xn = np.empty((n, xn_prev.shape[1]), dtype=np.float64)
      xn[:-1] = xn_prev
      xn[-1] = vn
      dist = np.empty((n, n), dtype=np.float64)
      dist[: n - 1, : n - 1] = dist_prev
      dist[: n - 1, -1] = cross
      dist[-1, : n - 1] = cross
      dist[-1, -1] = 0.0
    else:
      x = np.asarray(cache, dtype=np.float64)
      xn = x / np.linalg.norm(x, axis=1, keepdims=True)
      dist = 1.0 - xn @ xn.T
      np.fill_diagonal(dist, 0.0)
    self._dist_memo = (cache, xn, dist)
    return dist

  def streaming_predict(self, embedding: np.ndarray) -> np.ndarray:
    """One embedding in; the full (corrected) label history out."""
    state = self.state
    embedding = np.asarray(embedding)
    num_embeddings = state.num_embeddings + 1

    if num_embeddings == 1:
      final_labels = np.array([0])
      self.state = MultiStageState(
          cache=embedding, num_embeddings=1,
          compression_labels=state.compression_labels,
          previous_output=final_labels)
      return final_labels

    cache = np.vstack([state.cache, embedding])
    compression_labels = state.compression_labels

    if num_embeddings <= self.U1:
      final_labels = self.main.predict(cache)
      self.state = MultiStageState(
          cache=cache, num_embeddings=num_embeddings,
          compression_labels=compression_labels,
          previous_output=final_labels)
      return final_labels

    # Pre-clusterer stage.
    if compression_labels is not None:
      compression_labels = np.append(compression_labels,
                                     compression_labels.max() + 1)
    dist = self._cosine_dist(state.cache, cache)
    pre_labels = ahc_lib.ahc_labels(dist, linkage="complete",
                                    n_clusters=self.U1)
    pre_centroids = utils.get_cluster_centroids(cache, pre_labels)
    main_labels = self.main.predict(pre_centroids)
    final_labels = utils.chain_labels(
        compression_labels, utils.chain_labels(pre_labels, main_labels))

    # Dynamic compression.
    if cache.shape[0] == self.U2:
      compression_labels = utils.chain_labels(compression_labels, pre_labels)
      cache = pre_centroids

    # Deflicker.
    if num_embeddings > 1:
      if self.deflicker == Deflicker.OrderBased:
        final_labels = utils.enforce_ordered_labels(final_labels)
      elif self.deflicker == Deflicker.Hungarian:
        final_labels = match_labels(final_labels, state.previous_output)

    self.state = MultiStageState(
        cache=cache, num_embeddings=num_embeddings,
        compression_labels=compression_labels,
        previous_output=final_labels)
    return final_labels

  def streaming_predict_batch(self, embeddings: np.ndarray,
                              stride: int = 1) -> np.ndarray:
    """Feed many embeddings; return the final corrected label history.

    TPU-throughput extension (not in the reference API): the expensive
    re-cluster (AHC + spectral) runs only every ``stride`` steps while the
    cache/compression state is maintained exactly as in per-step streaming —
    the final output equals ``streaming_predict`` called per embedding
    whenever (num_embeddings - 1) is a multiple of ``stride`` at the end.
    With stride=1 this is just a loop over streaming_predict.
    """
    if stride > 1 and self.deflicker == Deflicker.Hungarian:
      raise ValueError(
          "Hungarian deflicker needs consecutive outputs; use stride=1.")
    embeddings = np.atleast_2d(np.asarray(embeddings))
    out = None
    total = embeddings.shape[0]
    for idx, e in enumerate(embeddings):
      is_last = idx == total - 1
      if stride > 1 and not is_last:
        n_after = self.state.num_embeddings + 1
        # Cheap path: append to cache without re-clustering, except at
        # stage boundaries (first input, U1 crossing, U2 compression) where
        # state transitions must run.
        crosses = (n_after == 1 or n_after == self.U1 + 1
                   or (self.state.cache is not None
                       and self.state.cache.shape[0] + 1 == self.U2))
        if not crosses and (n_after - 1) % stride != 0:
          cache = (e if self.state.cache is None
                   else np.vstack([self.state.cache, e]))
          compression_labels = self.state.compression_labels
          if compression_labels is not None:
            # Each cache entry needs its own compressed-group id, exactly as
            # the per-step path would have appended.
            compression_labels = np.append(compression_labels,
                                           compression_labels.max() + 1)
          self.state = MultiStageState(
              cache=cache, num_embeddings=n_after,
              compression_labels=compression_labels,
              previous_output=self.state.previous_output)
          continue
      out = self.streaming_predict(e)
    return out
