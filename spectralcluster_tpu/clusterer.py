"""SpectralClusterer — the batch orchestrator.

Host-level shell around the compiled pipeline (pipeline.py). API-compatible
with reference spectral_clusterer.py:29-314 (same constructor knobs, same
`predict(embeddings[, constraint_matrix])`), with the injectable
`affinity_function` / `post_eigen_cluster_function` extension points
preserved.

Differences by design (all documented in SURVEY.md §7):
  * Options are immutable; AutoTune passes p_percentile as a traced argument
    instead of mutating refinement options mid-predict
    (reference spectral_clusterer.py:277).
  * The refine→eig→gap stage is one jitted function, cached per
    (config, shape); AutoTune evaluates whole candidate batches with a single
    vmapped call (one batched eigh).
  * Randomness (k-means++ init) is an explicit PRNG seed (default 0), the
    deterministic analog of the reference's random_state=0.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

from spectralcluster_tpu import ahc as ahc_lib
from spectralcluster_tpu import fallback as fallback_lib
from spectralcluster_tpu import pipeline as pipeline_lib
from spectralcluster_tpu import utils
from spectralcluster_tpu.observability import StageTimings
from spectralcluster_tpu.autotune import AutoTune
from spectralcluster_tpu.ops import affinity as affinity_ops
from spectralcluster_tpu.ops import kmeans as kmeans_ops
from spectralcluster_tpu.precision import precise_jit
from spectralcluster_tpu.types import (ClusterResult,
                                       ConstraintOptions, EigenGapType,
                                       EigenSolver, FallbackOptions,
                                       LaplacianType, RefinementName,
                                       RefinementOptions)


_AFFINITY_JIT = precise_jit(affinity_ops.compute_affinity_matrix)

_TRIDIAG_JIT = precise_jit(
    lambda main, up, lo: (jnp.diag(main) + jnp.diag(up, 1) + jnp.diag(lo, -1)))


@functools.lru_cache(maxsize=32)
def _adjust_affinity_jit(options):
  from spectralcluster_tpu import constraint as constraint_lib
  return precise_jit(lambda a, q: constraint_lib.adjust_affinity(a, q, options))


class SpectralClusterer:
  """Batch spectral clustering (reference spectral_clusterer.py parity)."""

  def __init__(
      self,
      min_clusters: typing.Optional[int] = None,
      max_clusters: typing.Optional[int] = None,
      refinement_options: typing.Optional[RefinementOptions] = None,
      autotune: typing.Optional[AutoTune] = None,
      fallback_options: typing.Optional[FallbackOptions] = None,
      laplacian_type: typing.Optional[LaplacianType] = None,
      stop_eigenvalue: float = 1e-2,
      row_wise_renorm: bool = False,
      custom_dist: typing.Union[str, typing.Callable] = "cosine",
      max_iter: int = 300,
      constraint_options: typing.Optional[ConstraintOptions] = None,
      eigengap_type: EigenGapType = EigenGapType.Ratio,
      max_spectral_size: typing.Optional[int] = None,
      affinity_function: typing.Optional[typing.Callable] = None,
      post_eigen_cluster_function: typing.Optional[typing.Callable] = None,
      seed: int = 0,
      eigensolver: EigenSolver = EigenSolver.Auto,
      staged_execution_min_n: typing.Optional[int] = 8192,
      staged_stage_timings: bool = False):
    self.min_clusters = min_clusters
    self.max_clusters = max_clusters
    self.refinement_options = refinement_options or RefinementOptions()
    self.autotune = autotune
    self.fallback_options = fallback_options or FallbackOptions()
    self.laplacian_type = laplacian_type
    self.stop_eigenvalue = stop_eigenvalue
    self.row_wise_renorm = row_wise_renorm
    self.custom_dist = custom_dist
    self.max_iter = max_iter
    self.constraint_options = constraint_options
    self.eigengap_type = eigengap_type
    self.max_spectral_size = max_spectral_size
    self.affinity_function = affinity_function
    self.post_eigen_cluster_function = post_eigen_cluster_function
    self.seed = seed
    self.eigensolver = eigensolver
    # Above this padded size, the fast path runs as three jit programs split
    # at the eigh boundary (pipeline.spectral_cluster_fixed_k_staged): a
    # single monolithic program's XLA compile-time memory grows steeply with
    # N and can exhaust the compiler long before the runtime working set
    # threatens HBM. None disables staging.
    self.staged_execution_min_n = staged_execution_min_n
    # When True, ClusterResult.timings additionally carries real (blocking)
    # per-stage durations of the staged executor (staged_prep / staged_eigh
    # / staged_dc / staged_subspace / staged_finish) — at the cost of
    # defeating async-dispatch pipelining; keep False on latency paths.
    self.staged_stage_timings = staged_stage_timings

  # -- compiled-stage plumbing ------------------------------------------------

  def _config(self) -> pipeline_lib.PipelineConfig:
    return pipeline_lib.PipelineConfig(
        refinement_options=self.refinement_options,
        constraint_options=self.constraint_options,
        laplacian_type=self.laplacian_type,
        min_clusters=self.min_clusters,
        max_clusters=self.max_clusters,
        stop_eigenvalue=self.stop_eigenvalue,
        eigengap_type=self.eigengap_type,
        row_wise_renorm=self.row_wise_renorm,
        custom_dist=self.custom_dist,
        max_iter=self.max_iter,
        eigensolver=self.eigensolver,
        affinity_symmetric=self.affinity_function is None)

  @staticmethod
  @functools.lru_cache(maxsize=64)
  def _eig_fn(cfg: pipeline_lib.PipelineConfig, with_constraint: bool,
              with_p: bool):
    """Jitted refine→eig→gap stage, cached per static config.

    Inputs are shape-bucket padded (pipeline_lib.pad_bucket) with a traced
    ``n_valid``, so streaming workloads with growing N compile O(log N) times.
    """

    def run(affinity, n_valid, constraint_matrix, p):
      return pipeline_lib.refine_and_eigendecompose(
          affinity, cfg,
          p_percentile=(p if with_p else None),
          constraint_matrix=(constraint_matrix if with_constraint else None),
          n_valid=n_valid)

    if with_p and with_constraint:
      return precise_jit(lambda a, n, c, p: run(a, n, c, p))
    if with_p:
      return precise_jit(lambda a, n, p: run(a, n, None, p))
    if with_constraint:
      return precise_jit(lambda a, n, c: run(a, n, c, None))
    return precise_jit(lambda a, n: run(a, n, None, None))

  @staticmethod
  @functools.lru_cache(maxsize=64)
  def _eig_batched_fn(cfg: pipeline_lib.PipelineConfig, with_constraint: bool):
    """Jitted vmap over candidate p_percentiles — one batched eigh.

    When max_clusters is set, the returned eigenvector stacks are trimmed
    on-device to the k columns downstream K-Means can ever read — transfers
    (B, N, k) instead of (B, N, N) back to the host per search level.
    """
    k_cap = None
    if cfg.max_clusters is not None:
      k_cap = max(cfg.max_clusters, cfg.min_clusters or 0)

    def one(affinity, n_valid, constraint_matrix, p):
      w, v, n, delta = pipeline_lib.refine_and_eigendecompose(
          affinity, cfg, p_percentile=p,
          constraint_matrix=constraint_matrix, n_valid=n_valid)
      if k_cap is not None:
        v = v[:, :k_cap]
      return w, v, n, delta

    if with_constraint:
      return precise_jit(
          lambda a, n, c, ps: jax.vmap(lambda p: one(a, n, c, p))(ps))
    return precise_jit(
        lambda a, n, ps: jax.vmap(lambda p: one(a, n, None, p))(ps))

  @staticmethod
  @functools.lru_cache(maxsize=64)
  def _fast_fn(cfg: pipeline_lib.PipelineConfig):
    """Single-dispatch fully-jitted predict (embeddings → labels).

    Used when no host-side stage (autotune memoization, constraint handling,
    injected callables, single-cluster check) sits in the middle — one device
    round-trip instead of three, which dominates streaming throughput.
    """

    def run(embeddings, n_valid, key):
      return pipeline_lib.spectral_cluster_fixed_k(
          embeddings, key, cfg, None, n_valid)

    return precise_jit(run)

  def _fast_path_applicable(self, constraint_matrix) -> bool:
    # Mahalanobis is the one metric that is not row-local: scipy's default
    # VI is the inverse covariance of vstack([X, centroids])
    # (custom_distance_kmeans.py:123-125), so the fast path's padded zero
    # rows and surplus centroid slots would change VI for the *valid* rows.
    # run_kmeans special-cases it host-side (ops/kmeans.py); route there.
    # User callables are safe: get_distance_fn vmaps them pairwise, so padded
    # rows cannot influence valid rows' distances.
    padding_safe_metric = self.custom_dist != "mahalanobis"
    return (self.autotune is None and constraint_matrix is None
            and self.max_clusters is not None
            and self.affinity_function is None
            and self.post_eigen_cluster_function is None
            and padding_safe_metric
            and self.min_clusters != 1)

  @staticmethod
  def _pad_square(mat) -> typing.Tuple[jnp.ndarray, int]:
    """Pad to the shape bucket. Device arrays are padded ON DEVICE: a host
    round trip of an (N, N) float32 costs ~40 ms/MB through a tunneled
    backend (~17 s for the 420 MB N=10240 matrix) — the transfer, not the
    compute, dominated the r5 Turn-to-Diarize profile."""
    n = mat.shape[0]
    b = pipeline_lib.pad_bucket(n)
    if isinstance(mat, jnp.ndarray):
      mat = mat.astype(jnp.float32)
      if b == n:
        return mat, n
      return jnp.pad(mat, ((0, b - n), (0, b - n))), n
    if b == n:
      return jnp.asarray(mat, dtype=jnp.float32), n
    out = np.zeros((b, b), dtype=np.float32)
    out[:n, :n] = np.asarray(mat, dtype=np.float32)
    return jnp.asarray(out), n

  @staticmethod
  def _upload_constraint(cm: np.ndarray) -> jnp.ndarray:
    """Stage a host constraint matrix onto the device.

    The library-built ConstraintMatrix is tri-diagonal (reference
    constraint.py:167-201): detecting that costs O(nnz) on the host and
    shrinks the upload from N² floats (~420 MB at N=10240, ~17 s through
    the tunnel) to two diagonals. Dense/general constraints upload as-is.
    """
    cm = np.asarray(cm)
    n = cm.shape[0]
    if n >= 1024:
      ii, jj = np.nonzero(cm)
      if ii.size <= 4 * n and np.all(np.abs(ii - jj) <= 1):
        main = np.ascontiguousarray(np.diag(cm)).astype(np.float32)
        up = np.ascontiguousarray(np.diagonal(cm, 1)).astype(np.float32)
        lo = np.ascontiguousarray(np.diagonal(cm, -1)).astype(np.float32)
        return _TRIDIAG_JIT(jnp.asarray(main), jnp.asarray(up),
                            jnp.asarray(lo))
    return jnp.asarray(cm, dtype=jnp.float32)

  def _compute_eigenvectors_ncluster(self,
                                     affinity,
                                     constraint_matrix=None,
                                     p_percentile=None):
    """Refine + eigendecompose + eigengap.

    White-box API parity with reference spectral_clusterer.py:108-168
    (returns (eigenvectors, n_clusters, max_delta_norm)), with p_percentile
    as an explicit argument instead of options mutation.
    """
    v, n, delta, _ = self._eig_stage(affinity, constraint_matrix, p_percentile)
    return v, n, delta

  def _eig_stage(self, affinity, constraint_matrix=None, p_percentile=None,
                 cfg=None):
    """Like _compute_eigenvectors_ncluster but also returns eigenvalues."""
    if cfg is None:
      cfg = self._config()
      if constraint_matrix is not None:
        # Same host-side symmetry routing as predict(): an asymmetric
        # constraint must not feed eigh a one-triangle view (the white-box
        # path is reachable directly, reference spectral_clusterer.py:108).
        cm = np.asarray(constraint_matrix)
        constraint_symmetric = bool(np.array_equal(cm, cm.T))
        if not constraint_symmetric and self.eigensolver in (
            EigenSolver.Eigh, EigenSolver.SubspaceIteration):
          raise ValueError(
              f"EigenSolver.{self.eigensolver.name} requires a symmetric "
              "constraint matrix; use EigenSolver.Auto or HostGeneral.")
        cfg = cfg.replace(constraint_symmetric=constraint_symmetric)
    num = affinity.shape[0]
    aff_padded, n_valid = self._pad_square(affinity)
    with_c = constraint_matrix is not None
    with_p = p_percentile is not None
    if self._staged_eig_applicable(cfg, aff_padded.shape[0], with_c):
      # Large N: per-candidate staged evaluator (three small programs) —
      # the monolithic refine+eig program exceeds the compile wall at
      # N>=8192 on this toolchain. Returns k_cap eigenvector columns (all
      # downstream K-Means can read), like the staged fixed-k executor.
      cm = self._pad_square(np.asarray(constraint_matrix))[0] if with_c else None
      out = pipeline_lib.eig_topk_staged(
          aff_padded, cfg, constraint_matrix=cm,
          n_valid=jnp.asarray(n_valid, jnp.int32), p_percentile=p_percentile)
      w, v, n, delta = jax.device_get(out)
      return (np.asarray(v)[:num], int(n), float(delta),
              np.asarray(w)[:num])
    fn = self._eig_fn(cfg, with_c, with_p)
    args = [aff_padded, jnp.asarray(n_valid, jnp.int32)]
    if with_c:
      cm_padded, _ = self._pad_square(np.asarray(constraint_matrix))
      args.append(cm_padded)
    if with_p:
      args.append(jnp.asarray(p_percentile, dtype=jnp.float32))
    w, v, n, delta = jax.device_get(fn(*args))  # one batched fetch (1 RTT)
    return (np.asarray(v)[:num, :num], int(n), float(delta),
            np.asarray(w)[:num])

  def _staged_eig_applicable(self, cfg, n_pad: int, with_constraint: bool):
    return (self.staged_execution_min_n is not None
            and n_pad >= self.staged_execution_min_n
            and pipeline_lib._staged_eig_applicable(cfg, with_constraint))

  # -- fallback & size-reduction paths ---------------------------------------

  def _reduce_size_and_predict(self, embeddings: np.ndarray) -> ClusterResult:
    """AHC size reduction then recursive spectral clustering
    (reference spectral_clusterer.py:170-199). Returns the inner spectral
    run's ClusterResult with labels chained through the AHC pre-labels, so
    eigenvalues/max_delta/best_p observability survives the reduction."""
    ahc_labels = ahc_lib.agglomerative_cluster(
        embeddings, metric="cosine", linkage="complete",
        n_clusters=self.max_spectral_size)
    ahc_centroids = utils.get_cluster_centroids(embeddings, ahc_labels)
    inner = self.predict_with_details(ahc_centroids)
    inner.labels = utils.chain_labels(ahc_labels, np.asarray(inner.labels))
    return inner

  # -- main entry -------------------------------------------------------------

  def predict(
      self,
      embeddings: np.ndarray,
      constraint_matrix: typing.Optional[np.ndarray] = None) -> np.ndarray:
    """Cluster embeddings; returns (N,) labels.

    Control flow mirrors reference spectral_clusterer.py:201-314.
    """
    result = self.predict_with_details(embeddings, constraint_matrix)
    return result.labels

  def predict_with_details(
      self,
      embeddings: np.ndarray,
      constraint_matrix: typing.Optional[np.ndarray] = None) -> ClusterResult:
    timings = StageTimings()
    if not isinstance(embeddings, (np.ndarray, jnp.ndarray)):
      raise TypeError("embeddings must be a numpy array")
    if len(embeddings.shape) != 2:
      raise ValueError("embeddings must be 2-dimensional")
    embeddings = np.asarray(embeddings)
    num_embeddings = embeddings.shape[0]

    constraint_symmetric = True
    if constraint_matrix is not None:
      constraint_matrix = np.asarray(constraint_matrix)
      if (constraint_matrix.ndim != 2 or constraint_matrix.shape !=
          (num_embeddings, num_embeddings)):
        raise ValueError(
            "constraint matrix must be a square matrix matching embeddings: "
            f"expected ({num_embeddings}, {num_embeddings}), got "
            f"{constraint_matrix.shape}")
      # The TPU path uses eigh (reads one triangle); an asymmetric constraint
      # must route to the general eigensolver like the reference's np.linalg
      # .eig would handle it (constraint.py:52-76 only checks squareness).
      constraint_symmetric = bool(
          np.array_equal(constraint_matrix, constraint_matrix.T))
      if not constraint_symmetric and self.eigensolver in (
          EigenSolver.Eigh, EigenSolver.SubspaceIteration):
        raise ValueError(
            f"EigenSolver.{self.eigensolver.name} requires a symmetric "
            "constraint matrix; use EigenSolver.Auto or HostGeneral.")

    # Tiny inputs: fallback clusterer (spectral_clusterer.py:230-234).
    if num_embeddings < self.fallback_options.spectral_min_embeddings:
      clusterer = fallback_lib.FallbackClusterer(self.fallback_options)
      with timings.stage("fallback"):
        labels = clusterer.predict(embeddings)
      return ClusterResult(labels=labels,
                           n_clusters=int(np.unique(labels).size),
                           timings=timings.as_dict())

    # Oversized inputs: AHC reduction (spectral_clusterer.py:236-247).
    if (self.max_spectral_size is not None
        and num_embeddings > self.max_spectral_size):
      if constraint_matrix is not None:
        raise RuntimeError(
            "Cannot handle constraint_matrix when max_spectral_size is set")
      if (self.max_spectral_size < 2 or
          (self.max_clusters and self.max_spectral_size <= self.max_clusters)
          or
          (self.min_clusters and self.max_spectral_size <= self.min_clusters)):
        raise ValueError("max_spectral_size should be a relatively big number")
      with timings.stage("ahc_reduce"):
        result = self._reduce_size_and_predict(embeddings)
      # Surface the inner spectral run's observability fields; fold its
      # stage timings under the reduction's wall clock.
      inner_timings = result.timings or {}
      result.timings = {**{f"inner_{k}": v for k, v in inner_timings.items()},
                        **timings.as_dict()}
      result.n_clusters = int(np.unique(result.labels).size)
      return result

    cfg = self._config()

    # Fast path: the whole pipeline in one compiled dispatch.
    if self._fast_path_applicable(constraint_matrix):
      n_pad = pipeline_lib.pad_bucket(num_embeddings)
      x = np.zeros((n_pad, embeddings.shape[1]), dtype=np.float32)
      x[:num_embeddings] = embeddings
      use_staged = (self.staged_execution_min_n is not None
                    and n_pad >= self.staged_execution_min_n
                    and pipeline_lib._staged_applicable(cfg, False))
      with timings.stage("pipeline"):
        if use_staged:
          out = pipeline_lib.spectral_cluster_fixed_k_staged(
              jnp.asarray(x), jax.random.PRNGKey(self.seed), cfg,
              n_valid=jnp.asarray(num_embeddings, jnp.int32),
              timings=(timings if self.staged_stage_timings else None))
        else:
          out = self._fast_fn(cfg)(
              jnp.asarray(x), jnp.asarray(num_embeddings, jnp.int32),
              jax.random.PRNGKey(self.seed))
        # One batched fetch: each separate np.asarray()/int() is its own
        # device->host transfer, which on a tunneled backend costs a full
        # RTT — the dominant per-step cost of the streaming orchestrator.
        labels, n_clusters, eigenvalues, max_delta = jax.device_get(out)
      return ClusterResult(
          labels=np.asarray(labels)[:num_embeddings],
          n_clusters=int(n_clusters),
          eigenvalues=np.asarray(eigenvalues)[:num_embeddings],
          max_delta_norm=float(max_delta),
          timings=timings.as_dict())

    # The (N, N) affinity stays DEVICE-RESIDENT through constraint
    # adjustment, padding and the eig stage: each host round trip costs
    # ~40 ms/MB through a tunneled backend, and the previous
    # fetch→adjust→fetch→pad flow moved ~3 N² floats (~11 s at N=4096,
    # dominating the whole constrained predict).
    with timings.stage("affinity"):
      if self.affinity_function is None:
        affinity = _AFFINITY_JIT(jnp.asarray(embeddings, dtype=jnp.float32))
      else:
        affinity = np.asarray(self.affinity_function(embeddings))

    # Single-vs-multi cluster decision (spectral_clusterer.py:253-256).
    if self.min_clusters == 1:
      with timings.stage("single_cluster_check"):
        single = fallback_lib.check_single_cluster(self.fallback_options,
                                                   embeddings,
                                                   np.asarray(affinity))
      if single:
        return ClusterResult(labels=np.zeros(num_embeddings, dtype=np.int64),
                             n_clusters=1, timings=timings.as_dict())

    # Constraint before refinement (spectral_clusterer.py:259-264).
    cm_for_stage = None
    if constraint_matrix is not None:
      if (self.constraint_options is not None
          and self.constraint_options.apply_before_refinement):
        adjust = _adjust_affinity_jit(self.constraint_options)
        with timings.stage("constraint"):
          affinity = adjust(jnp.asarray(affinity, dtype=jnp.float32),
                            self._upload_constraint(constraint_matrix))
        if not constraint_symmetric:
          # The adjusted affinity is now asymmetric; let the static symmetry
          # analysis decide whether the refinement sequence restores symmetry.
          cfg = cfg.replace(affinity_symmetric=False)
      else:
        cm_for_stage = np.asarray(constraint_matrix)
        cfg = cfg.replace(constraint_symmetric=constraint_symmetric)

    best_p = None
    if self.autotune:
      seq = self.refinement_options.refinement_sequence or ()
      if RefinementName.RowWiseThreshold not in seq:
        raise ValueError(
            "AutoTune is only effective when the refinement sequence "
            "contains RowWiseThreshold")
      aff_padded, n_valid = self._pad_square(affinity)
      n_valid_j = jnp.asarray(n_valid, jnp.int32)
      batched = self._eig_batched_fn(cfg, cm_for_stage is not None)
      if cm_for_stage is not None:
        cm_padded, _ = self._pad_square(cm_for_stage)

      # Eigenvalues/eigengap per candidate, keyed by p so the winner's
      # observability fields survive tune_batched (which only returns
      # eigenvectors/n_clusters/best_p, reference autotune.py:76-132).
      eig_details: dict = {}

      def batch_eval(ps: np.ndarray):
        ps_j = jnp.asarray(ps, dtype=jnp.float32)
        if cm_for_stage is not None:
          w, v, n, delta = batched(aff_padded, n_valid_j, cm_padded, ps_j)
        else:
          w, v, n, delta = batched(aff_padded, n_valid_j, ps_j)
        delta = np.asarray(delta)
        w = np.asarray(w)
        for p, wi, di in zip(ps, w, delta):
          eig_details[float(p)] = (wi[:num_embeddings], float(di))
        ratios = np.array([
            self.autotune.ratio_from_proxy(p, d) for p, d in zip(ps, delta)
        ])
        return ratios, np.asarray(v)[:, :num_embeddings, :num_embeddings], (
            np.asarray(n))

      def batch_eval_staged(ps: np.ndarray):
        # Large-N sweep: per-candidate staged evaluator instead of the
        # vmapped monolith (whose B-candidate batched eigh exceeds the
        # compile wall at N>=8192 — VERDICT r4 item 1, the piece that kept
        # Turn-to-Diarize off the chip at scale). p is a traced argument,
        # so all candidates share three compiled programs; the dispatches
        # queue asynchronously and one fetch drains the sweep.
        outs = [
            pipeline_lib.eig_topk_staged(
                aff_padded, cfg,
                constraint_matrix=(cm_padded if cm_for_stage is not None
                                   else None),
                n_valid=n_valid_j, p_percentile=float(p)) for p in ps
        ]
        ratios, vs, ns = [], [], []
        for p, out in zip(ps, outs):
          wi, vi, ni, di = jax.device_get(out)
          eig_details[float(p)] = (np.asarray(wi)[:num_embeddings], float(di))
          ratios.append(self.autotune.ratio_from_proxy(p, float(di)))
          vs.append(np.asarray(vi)[:num_embeddings])
          ns.append(int(ni))
        return np.array(ratios), np.stack(vs), np.array(ns)

      staged_sweep = self._staged_eig_applicable(
          cfg, aff_padded.shape[0], cm_for_stage is not None)
      with timings.stage("eig"):
        eigenvectors, n_clusters, best_p = self.autotune.tune_batched(
            batch_eval_staged if staged_sweep else batch_eval)
      eigenvalues, max_delta = eig_details[best_p]
    else:
      with timings.stage("eig"):
        eigenvectors, n_clusters, max_delta, eigenvalues = (
            self._eig_stage(affinity, cm_for_stage, cfg=cfg))

    if self.min_clusters is not None:
      n_clusters = max(n_clusters, self.min_clusters)

    spectral_embeddings = eigenvectors[:, :n_clusters]
    if self.row_wise_renorm:
      rows_norm = np.linalg.norm(spectral_embeddings, axis=1, ord=2)
      spectral_embeddings = spectral_embeddings / rows_norm.reshape(
          num_embeddings, 1)

    with timings.stage("kmeans"):
      if self.post_eigen_cluster_function is not None:
        labels = self.post_eigen_cluster_function(
            spectral_embeddings=spectral_embeddings,
            n_clusters=n_clusters,
            custom_dist=self.custom_dist,
            max_iter=self.max_iter)
      else:
        labels = kmeans_ops.run_kmeans(
            spectral_embeddings=spectral_embeddings,
            n_clusters=n_clusters,
            custom_dist=self.custom_dist,
            max_iter=self.max_iter,
            key=jax.random.PRNGKey(self.seed))
    return ClusterResult(
        labels=np.asarray(labels),
        n_clusters=int(n_clusters),
        eigenvalues=eigenvalues,
        max_delta_norm=float(max_delta) if max_delta is not None else 0.0,
        best_p_percentile=best_p,
        timings=timings.as_dict())
