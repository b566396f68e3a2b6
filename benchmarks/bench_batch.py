"""Utterances-clustered-per-second benchmark (BASELINE.json metric).

Clusters a batch of utterances in one compiled DP step (parallel/batch.py)
on whatever devices are available and reports utterances/s. On one chip this
measures how well XLA batches the eigh+kmeans across utterances; on a mesh
it additionally measures DP scaling.

With ``chunk`` (4th arg) the batch streams through in chunk-sized
dispatches of ONE compiled program — how the BASELINE.json "1024
utterances" config actually runs on a single chip, whose HBM fits ~10-20
N=1024 full-eigh pipeline lanes at a time but not 1024 (VERDICT r3 item 4:
execute the stated scale, don't extrapolate from B=16). Every utterance's
labels are checked against its generated ground truth.

Usage: python benchmarks/bench_batch.py [batch] [n_per_utt] [d] [chunk]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from spectralcluster_tpu import configs, pipeline
from spectralcluster_tpu.parallel import batch as batch_lib
from spectralcluster_tpu.parallel import mesh as mesh_lib


def main(batch=16, n=1024, d=256, chunk=0):
  from spectralcluster_tpu import utils

  chunk = chunk or batch
  if batch % chunk:
    raise ValueError("batch must divide into equal chunks (one compile)")
  rng = np.random.RandomState(0)
  utts, truths = [], []
  for i in range(batch):
    k = 2 + (i % 3)
    centers = rng.randn(k, d) * 3
    # Block-ordered speaker labels — the regime the blur-based icassp2018
    # preset recovers EXACTLY (same family as the N=10240 headline
    # fixture), which is what makes exact ground-truth match a usable
    # correctness gate. Short-turn or per-frame-shuffled fixtures make the
    # preset over-cluster identically in our pipeline and the reference
    # (verified bit-for-bit at N=256: same n_pred and accuracy on all 6
    # utterances), so they gate nothing.
    labels = np.repeat(np.arange(k), -(-n // k))[:n]
    utts.append((centers[labels] + rng.randn(n, d) * 0.4).astype(np.float32))
    truths.append(labels)

  import os

  from spectralcluster_tpu.types import EigenSolver
  solver = os.environ.get("SCT_BATCH_SOLVER")
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=(EigenSolver[solver] if solver else EigenSolver.Auto),
      matmul_precision=os.environ.get("SCT_BATCH_PRECISION", "highest"))
  mesh = mesh_lib.make_mesh()

  def full_pass():
    out = []
    for i in range(0, batch, chunk):
      out.extend(batch_lib.cluster_batch(utts[i:i + chunk], cfg, mesh=mesh))
    return out

  # End-to-end from host arrays (includes host->device staging; through this
  # sandbox's tunnel that transfer is ~40 ms/MB and dominates).
  t0 = time.time()
  preds = full_pass()
  compile_s = time.time() - t0
  repeats = 2 if batch > 256 else 3
  times = []
  for _ in range(repeats):
    t0 = time.time()
    preds = full_pass()
    times.append(time.time() - t0)
  e2e = float(np.median(times))

  # Streamed e2e: same chunks, but with up to `window` chunks in flight so
  # H2D staging overlaps compute and the D2H fetches (VERDICT r4 item 7).
  times = []
  preds_s = None
  for _ in range(repeats):
    t0 = time.time()
    preds_s = batch_lib.cluster_batch_streamed(utts, cfg, mesh=mesh,
                                               chunk=chunk, window=4)
    times.append(time.time() - t0)
  e2e_streamed = float(np.median(times))
  # Permutation-invariant: the streamed driver seeds each chunk by its
  # batch offset (distinct PRNG streams), the serial loop reuses seed=0.
  assert all(
      np.array_equal(utils.enforce_ordered_labels(a),
                     utils.enforce_ordered_labels(b))
      for a, b in zip(preds, preds_s)), (
      "streamed driver diverged from the serial chunked driver")

  # Correctness gate: permutation-invariant exact match per utterance.
  matches = sum(
      bool(np.array_equal(utils.enforce_ordered_labels(p),
                          utils.enforce_ordered_labels(t)))
      for p, t in zip(preds, truths))

  # Device-resident compute on one chunk: inputs staged once, outputs
  # (labels) fetched every call — what a serving deployment with async
  # input streaming sees.
  fn = batch_lib.make_batched_cluster_fn(cfg, mesh)
  batch_arr = jnp.asarray(np.stack(utts[:chunk]))
  n_valid = jnp.asarray(np.full((chunk,), n, np.int32))
  keys = jax.vmap(jax.random.PRNGKey)(np.arange(chunk))
  jax.device_get(fn(batch_arr, n_valid, keys))
  times = []
  for _ in range(5):
    t0 = time.time()
    jax.device_get(fn(batch_arr, n_valid, keys))
    times.append(time.time() - t0)
  resident = float(np.median(times))

  print(f"devices={len(jax.devices())} batch={batch} N={n} d={d} "
        f"chunk={chunk} compile={compile_s:.1f}s e2e={e2e:.3f}s "
        f"e2e_streamed={e2e_streamed:.3f}s "
        f"resident/chunk={resident:.3f}s "
        f"gt_match={matches}/{batch} "
        f"=> {batch / e2e:.1f} utt/s e2e, "
        f"{batch / e2e_streamed:.1f} utt/s streamed, "
        f"{chunk / resident:.1f} utt/s device-resident", flush=True)
  print(json.dumps({
      "devices": len(jax.devices()), "backend": jax.default_backend(),
      "batch": batch, "n": n, "d": d, "chunk": chunk,
      "solver": solver or "Auto",
      "compile_s": round(compile_s, 1), "e2e_s": round(e2e, 3),
      "e2e_streamed_s": round(e2e_streamed, 3),
      "resident_chunk_s": round(resident, 3),
      "gt_match": matches,
      "utt_per_s_e2e": round(batch / e2e, 1),
      "utt_per_s_streamed": round(batch / e2e_streamed, 1),
      "utt_per_s_resident": round(chunk / resident, 1)}), flush=True)


if __name__ == "__main__":
  args = [int(a) for a in sys.argv[1:]]
  main(*args)
