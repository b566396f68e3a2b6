"""True device latency: run the pipeline K times inside ONE compiled call.

The single-call numbers in bench.py include this sandbox's ~100-200 ms
dispatch RTT; chaining K pipeline executions inside one jit (fori_loop with
PRNG-fold dependent keys, label-sum carried to prevent DCE) amortizes the
dispatch and reveals per-clustering device time.

Usage: python benchmarks/bench_device_loop.py [n] [k_loops]
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
from spectralcluster_tpu.precision import precise
from spectralcluster_tpu.types import EigenSolver


def main(n=2048, k_loops=10, solver=None):
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=(EigenSolver[solver] if solver else EigenSolver.Auto))
  rng = np.random.RandomState(0)
  centers = rng.randn(2, 256) * 3
  labels_true = np.repeat(np.arange(2), n // 2)
  x = jnp.asarray(
      (centers[labels_true] + rng.randn(n, 256) * 0.4), jnp.float32)

  @precise
  def run_many(emb, base_key):
    def body(i, acc):
      key = jax.random.fold_in(base_key, i)
      labels, n_c, _, _ = pipeline.spectral_cluster_fixed_k(emb, key, cfg)
      return acc + jnp.sum(labels) + n_c

    return jax.lax.fori_loop(0, k_loops, body, jnp.asarray(0, jnp.int32))

  fn = jax.jit(run_many)
  key = jax.random.PRNGKey(0)
  t0 = time.time()
  jax.block_until_ready(fn(x, key))
  compile_s = time.time() - t0
  t0 = time.time()
  jax.block_until_ready(fn(x, key))
  total = time.time() - t0
  per = (total) / k_loops
  print(f"backend={jax.default_backend()} N={n} loops={k_loops} "
        f"solver={solver or 'Auto'} compile={compile_s:.1f}s "
        f"loop_total={total:.3f}s => device per-clustering ≈ {per * 1e3:.1f} ms")


if __name__ == "__main__":
  args = sys.argv[1:]
  main(int(args[0]) if args else 2048,
       int(args[1]) if len(args) > 1 else 10,
       args[2] if len(args) > 2 else None)
