"""Data-parallel batched clustering driver.

Clusters a batch of padded utterances in one compiled step, sharded over the
mesh's ``batch`` axis — the pod-scale "1024 utterances data-parallel" path of
BASELINE.json. Each utterance runs the fully-jitted masked pipeline
(pipeline.spectral_cluster_fixed_k) under vmap; XLA batches the eigh and
K-Means across utterances and GSPMD partitions the whole step across
devices with no hand-written collectives.

``cluster_batch_autotuned`` extends this to MULTI-LEVEL AutoTune: each
hierarchical search level evaluates every utterance's un-memoized candidate
grid as ONE sharded batched-eigh dispatch ((B, C) candidates vmapped over
both axes), the level narrowing runs host-side per utterance with the exact
reference semantics (autotune.py:76-132 — winner among the level's NEW
candidates, ±max(2, len//8) narrowing, step halving, memoization), and one
final batched dispatch runs K-Means on the winning eigenvectors. A
search_level-L constrained+auto-tuned batch therefore costs L+1 dispatches
total, versus B × (candidates × L) sequential eigendecompositions in the
reference.
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

_CAST_F32 = jax.jit(lambda x: x.astype(jnp.float32))


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


@functools.lru_cache(maxsize=16)
def make_batched_autotune_eval_fn(cfg: pipeline_lib.PipelineConfig, mesh,
                                  with_constraint: bool):
  """One AutoTune level for a whole batch: (B, C) candidate p_percentiles
  through affinity-once + vmapped refine→eigh→gap. Returns
  (eigenvectors (B, C, N, k_cap), n_clusters (B, C), deltas (B, C))."""
  k_cap = max(cfg.max_clusters, cfg.min_clusters or 0)

  @precise
  def step(embeddings, n_valid, ps, constraint_matrices=None):
    embeddings = jax.lax.with_sharding_constraint(
        embeddings, mesh_lib.batch_sharding(mesh, 3))

    def one(emb, nv, p_row, cm):
      affinity = pipeline_lib.prepare_affinity(emb, cfg, cm, nv)

      def cand(p):
        _, v, n, delta = pipeline_lib.refine_and_eigendecompose(
            affinity, cfg, p_percentile=p, constraint_matrix=cm, n_valid=nv)
        return v[:, :k_cap], n, delta

      return jax.vmap(cand)(p_row)

    if constraint_matrices is None:
      vs, ns, deltas = jax.vmap(
          lambda e, nv, pr: one(e, nv, pr, None))(embeddings, n_valid, ps)
    else:
      constraint_matrices = jax.lax.with_sharding_constraint(
          constraint_matrices, mesh_lib.batch_sharding(mesh, 3))
      vs, ns, deltas = jax.vmap(one)(embeddings, n_valid, ps,
                                     constraint_matrices)
    return vs, ns, deltas

  return jax.jit(step)


@functools.lru_cache(maxsize=16)
def make_batched_kmeans_fn(cfg: pipeline_lib.PipelineConfig, mesh):
  """Final AutoTune stage: batched K-Means on the winning eigenvectors."""

  @precise
  def step(vs, n_gap, n_valid, keys):
    vs = jax.lax.with_sharding_constraint(
        vs, mesh_lib.batch_sharding(mesh, 3))

    def one(v, ng, nv, key):
      return pipeline_lib._cluster_from_eigs(v, ng, cfg, key, nv, 0.001)

    return jax.vmap(one)(vs, n_gap, n_valid, keys)

  return jax.jit(step)


def cluster_batch_autotuned(
    utterances: typing.Sequence[np.ndarray],
    cfg: pipeline_lib.PipelineConfig,
    autotune,
    mesh=None,
    seed: int = 0,
    constraint_matrices: typing.Optional[
        typing.Sequence[np.ndarray]] = None,
) -> typing.List[np.ndarray]:
  """Multi-level auto-tuned DP batch clustering (one dispatch per level).

  ``autotune`` is an autotune.AutoTune TEMPLATE: its range/step/level/proxy
  parameters seed an independent per-utterance hierarchical search (the
  narrowed level-2+ grids are data-dependent, so each utterance carries its
  own range state), with the exact reference memoization and narrowing
  semantics (reference autotune.py:76-132). cfg.autotune must be None (this
  driver IS the autotune loop); cfg.max_clusters is required.
  """
  from spectralcluster_tpu.autotune import MIN_SEARCH_STEP

  if cfg.autotune is not None:
    raise ValueError("cluster_batch_autotuned drives the search itself; "
                     "leave cfg.autotune unset")
  if cfg.max_clusters is None:
    raise ValueError("cluster_batch_autotuned requires cfg.max_clusters")
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
  with_constraint = constraint_matrices is not None
  cms = None
  if with_constraint:
    if len(constraint_matrices) != b:
      raise ValueError("need one constraint matrix per utterance")
    cms = np.zeros((b_pad, n_pad, n_pad), dtype=np.float32)
    for i, cm in enumerate(constraint_matrices):
      k = lengths[i]
      cms[i, :k, :k] = cm
    cms = jnp.asarray(cms)
  batch = jnp.asarray(batch)
  n_valid_j = jnp.asarray(n_valid)
  eval_fn = make_batched_autotune_eval_fn(cfg, mesh, with_constraint)

  # Per-utterance search state, mirroring autotune.AutoTune.tune_batched.
  class _State:
    def __init__(self):
      self.p_min = autotune.p_percentile_min
      self.p_max = autotune.p_percentile_max
      self.step = autotune.init_search_step if hasattr(
          autotune, "init_search_step") else autotune.search_step
      self.searched = {}
      self.best_index = None
      self.best_p = None
      self.best_v = None
      self.best_n = None
      self.done = False

    def p_range(self):
      num = int(np.ceil((self.p_max - self.p_min) / self.step))
      return list(np.linspace(self.p_min, self.p_max, num))

  states = [_State() for _ in range(b_pad)]

  for _ in range(autotune.search_level):
    ranges = [s.p_range() for s in states]
    news = [[(i, p) for i, p in enumerate(r) if p not in s.searched]
            for s, r in zip(states, ranges)]
    c_max = max((len(nw) for nw in news), default=0)
    if c_max > 0:
      # Rows with fewer un-memoized candidates than c_max are padded by
      # repeating their last candidate (results beyond len(nw) are ignored
      # below). This burns some batched-eigh lanes when counts are uneven —
      # but the alternatives are worse on this hardware: compacting active
      # rows or per-row candidate counts changes the dispatch SHAPE every
      # level, and each new shape is a fresh XLA compile (minutes through a
      # remote-compile tunnel vs milliseconds of wasted lanes; level 1 is
      # always uniform, so waste only appears in the narrowed tail levels).
      ps = np.zeros((b_pad, c_max), dtype=np.float32)
      for bi, nw in enumerate(news):
        row = [p for _, p in nw] or [states[bi].best_p or 0.5]
        ps[bi] = (row + [row[-1]] * c_max)[:c_max]
      if with_constraint:
        vs, ns, deltas = eval_fn(batch, n_valid_j, jnp.asarray(ps), cms)
      else:
        vs, ns, deltas = eval_fn(batch, n_valid_j, jnp.asarray(ps))
      vs, ns, deltas = np.asarray(vs), np.asarray(ns), np.asarray(deltas)
      for bi, (s, nw) in enumerate(zip(states, news)):
        if not nw:
          continue
        cand_ps = np.array([ranges[bi][i] for i, _ in nw])
        ratios = np.array([
            autotune.ratio_from_proxy(float(p), float(dl))
            for p, dl in zip(cand_ps, deltas[bi, :len(nw)])])
        for p, r in zip(cand_ps, ratios):
          s.searched[float(p)] = float(r)
        w = int(np.argmin(ratios))
        s.best_index = nw[w][0]
        s.best_p = float(cand_ps[w])
        s.best_v = vs[bi, w]
        s.best_n = int(ns[bi, w])
    # Narrow every utterance's range (reference autotune.py:112-131).
    for s, r in zip(states, ranges):
      if s.done or not r or len(r) == 1 or s.step < MIN_SEARCH_STEP:
        s.done = True
        continue
      local = max(2, len(r) // 8)
      start = max(0, s.best_index - local)
      end = min(len(r) - 1, s.best_index + local)
      s.step = s.step / 2
      s.p_min, s.p_max = r[start], r[end]

  for s in states:
    if s.best_v is None:
      raise ValueError("AutoTune search range is empty; check "
                       "p_percentile_min/max/init_search_step.")

  finish_fn = make_batched_kmeans_fn(cfg, mesh)
  best_vs = jnp.asarray(np.stack([s.best_v for s in states]))
  n_gap = jnp.asarray(np.array([s.best_n for s in states], np.int32))
  keys = jax.vmap(jax.random.PRNGKey)(seed + np.arange(b_pad))
  labels, _ = finish_fn(best_vs, n_gap, n_valid_j, keys)
  labels = np.asarray(labels)
  return [labels[i, :lengths[i]] for i in range(b)]


def cluster_batch_streamed(
    utterances: typing.Sequence[np.ndarray],
    cfg: pipeline_lib.PipelineConfig,
    mesh=None,
    seed: int = 0,
    chunk: int = 16,
    window: int = 4,
    constraint_matrices: typing.Optional[
        typing.Sequence[np.ndarray]] = None,
    transfer_dtype=None,
) -> typing.List[np.ndarray]:
  """Chunked DP batch clustering with transfer/compute overlap.

  Keeps up to ``window`` chunks in flight: stage chunk i+1..i+window and
  dispatch their compute while chunk i's labels are fetched — JAX's async
  dispatch queues transfers and programs without blocking. Peak extra HBM
  = window × chunk × N × d floats (16 MB/chunk at the bench shape).

  MEASURED CAVEAT (r5, 1024×N=1024 on the tunneled chip): overlap alone
  does NOT move the e2e number here — the tunnel is BANDWIDTH-bound
  (~40 ms/MB × 16 chunks × 64 MB ≈ 43 s of the 45.5 s e2e), and compute
  (0.13 s/chunk) already hides inside the transfer stream, windowed or
  not. The lever that actually moves e2e is sending fewer bytes:
  ``transfer_dtype=jnp.bfloat16`` ships embeddings at half width and
  casts to float32 on device before the pipeline runs (compute precision
  unchanged). Embedding rounding at 2^-8 relative perturbs cosine
  affinities ~1e-3 — label-identical on separated data, but NOT
  bit-parity: keep the float32 default where reference parity is gated.

  All chunks share one padded shape bucket (one compile). Returns
  per-utterance label arrays exactly like cluster_batch.
  """
  if mesh is None:
    mesh = mesh_lib.make_mesh()
  dp = mesh.shape["batch"]
  if chunk % dp:
    chunk = -(-chunk // dp) * dp
  b = len(utterances)
  lengths = [u.shape[0] for u in utterances]
  d = utterances[0].shape[1]
  n_pad = pipeline_lib.pad_bucket(max(lengths))
  with_constraint = constraint_matrices is not None
  if with_constraint and len(constraint_matrices) != b:
    raise ValueError("need one constraint matrix per utterance")
  fn = make_batched_cluster_fn(cfg, mesh)

  host_dtype = (np.dtype(jnp.bfloat16.dtype) if transfer_dtype is not None
                and transfer_dtype == jnp.bfloat16 else
                np.dtype(transfer_dtype) if transfer_dtype is not None
                else np.float32)

  def stage(lo):
    hi = min(lo + chunk, b)
    batch = np.zeros((chunk, n_pad, d), dtype=host_dtype)
    n_valid = np.ones((chunk,), dtype=np.int32)
    for j, u in enumerate(utterances[lo:hi]):
      batch[j, :u.shape[0]] = u.astype(host_dtype)
      n_valid[j] = u.shape[0]
    keys = jax.vmap(jax.random.PRNGKey)(seed + lo + np.arange(chunk))
    staged = jax.device_put(batch)
    if host_dtype != np.float32:
      staged = _CAST_F32(staged)
    args = [staged, jax.device_put(n_valid), keys]
    if with_constraint:
      cms = np.zeros((chunk, n_pad, n_pad), dtype=np.float32)
      for j, cm in enumerate(constraint_matrices[lo:hi]):
        k = lengths[lo + j]
        cms[j, :k, :k] = cm
      args.append(jax.device_put(cms))
    labels, _ = fn(*args)
    return labels

  out: typing.List[np.ndarray] = []
  inflight: typing.List[typing.Tuple[int, typing.Any]] = []
  for lo in range(0, b, chunk):
    inflight.append((lo, stage(lo)))
    if len(inflight) >= window:
      flo, flabels = inflight.pop(0)
      arr = np.asarray(jax.device_get(flabels))
      out.extend(arr[j, :lengths[flo + j]]
                 for j in range(min(chunk, b - flo)))
  for flo, flabels in inflight:
    arr = np.asarray(jax.device_get(flabels))
    out.extend(arr[j, :lengths[flo + j]] for j in range(min(chunk, b - flo)))
  return out


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
