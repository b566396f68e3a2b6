"""Streaming throughput microbenchmark (multi-stage clusterer).

Simulates a long recording streamed one embedding at a time through
MultiStageClusterer with production-like L/U1/U2 and reports steady-state
steps/s at several stream positions. The per-step cost is bounded by the U2
cache (dynamic compression), so throughput is flat in recording length —
the property that makes 100k-segment recordings feasible
(arXiv:2210.13690; BASELINE.json streaming config).

Usage: python benchmarks/bench_streaming.py [n_steps]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from spectralcluster_tpu import configs
from spectralcluster_tpu.clusterer import SpectralClusterer
from spectralcluster_tpu.streaming import MultiStageClusterer


def main(n_steps=1500):
  rng = np.random.RandomState(0)
  centers = rng.randn(4, 64) * 3
  speakers = rng.randint(0, 4, size=n_steps)
  stream = centers[speakers] + rng.randn(n_steps, 64) * 0.3

  main_clusterer = SpectralClusterer(
      min_clusters=2, max_clusters=7,
      refinement_options=configs.icassp2018_refinement_options())
  ms = MultiStageClusterer(main_clusterer=main_clusterer,
                           fallback_threshold=0.5, L=50, U1=100, U2=600)

  checkpoints = sorted({100, 300, 600, 1000, 2000, 3000, 5000, n_steps})
  checkpoints = [c for c in checkpoints if c <= n_steps]
  curve = []
  t0 = time.time()
  last_t, last_i = t0, 0
  for i, e in enumerate(stream, 1):
    ms.streaming_predict(e)
    if i in checkpoints:
      now = time.time()
      rate = (i - last_i) / (now - last_t)
      curve.append({"step": i, "steps_per_s": round(rate, 2),
                    "cache": int(ms.cache.shape[0])})
      print(f"step {i:6d}: {rate:7.2f} steps/s "
            f"(cache={ms.cache.shape[0]})", flush=True)
      last_t, last_i = now, i
  total = time.time() - t0
  print(f"total: {n_steps} steps in {total:.1f}s "
        f"({n_steps / total:.2f} steps/s)")
  print(json.dumps({"n_steps": n_steps, "total_s": round(total, 1),
                    "steps_per_s": round(n_steps / total, 2),
                    "backend": jax.default_backend(), "curve": curve}),
        flush=True)


if __name__ == "__main__":
  main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
