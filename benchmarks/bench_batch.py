"""Utterances-clustered-per-second benchmark (BASELINE.json metric).

Clusters a batch of utterances in one compiled DP step (parallel/batch.py)
on whatever devices are available and reports utterances/s. On one chip this
measures how well XLA batches the eigh+kmeans across utterances; on a mesh
it additionally measures DP scaling.

Usage: python benchmarks/bench_batch.py [batch] [n_per_utt]
"""

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


def main(batch=16, n=1024, d=256):
  rng = np.random.RandomState(0)
  utts = []
  for i in range(batch):
    k = 2 + (i % 3)
    centers = rng.randn(k, d) * 3
    labels = rng.randint(0, k, size=n)
    utts.append((centers[labels] + rng.randn(n, d) * 0.4).astype(np.float32))

  import os

  from spectralcluster_tpu.types import EigenSolver
  solver = os.environ.get("SCT_BATCH_SOLVER")
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=(EigenSolver[solver] if solver else EigenSolver.Auto),
      matmul_precision=os.environ.get("SCT_BATCH_PRECISION", "highest"))
  mesh = mesh_lib.make_mesh()

  # End-to-end from host arrays (includes host->device staging; through this
  # sandbox's tunnel that transfer is ~40 ms/MB and dominates).
  t0 = time.time()
  batch_lib.cluster_batch(utts, cfg, mesh=mesh)
  compile_s = time.time() - t0
  times = []
  for _ in range(3):
    t0 = time.time()
    batch_lib.cluster_batch(utts, cfg, mesh=mesh)
    times.append(time.time() - t0)
  e2e = float(np.median(times))

  # Device-resident compute: inputs staged once, outputs (labels) fetched
  # every call — what a serving deployment with async input streaming sees.
  fn = batch_lib.make_batched_cluster_fn(cfg, mesh)
  batch_arr = jnp.asarray(np.stack(utts))
  n_valid = jnp.asarray(np.full((batch,), n, np.int32))
  keys = jax.vmap(jax.random.PRNGKey)(np.arange(batch))
  jax.device_get(fn(batch_arr, n_valid, keys))
  times = []
  for _ in range(5):
    t0 = time.time()
    jax.device_get(fn(batch_arr, n_valid, keys))
    times.append(time.time() - t0)
  resident = float(np.median(times))

  print(f"devices={len(jax.devices())} batch={batch} N={n} d={d} "
        f"compile={compile_s:.1f}s e2e={e2e:.3f}s "
        f"resident={resident:.3f}s "
        f"=> {batch / e2e:.1f} utt/s e2e, "
        f"{batch / resident:.1f} utt/s device-resident")


if __name__ == "__main__":
  args = [int(a) for a in sys.argv[1:]]
  main(*args)
