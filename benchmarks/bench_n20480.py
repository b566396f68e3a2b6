"""N=20480 north-star config (BASELINE.json pod scale), single chip.

Round-1 observed a hang under memory pressure at this size; the round-2/3
machinery that should fix it is the eigh-split staged executor + the
host-staged spectral-D&C top-k eigensolver (ops/dc.py), whose per-stage HBM
footprint is bounded by ~6 (N, N) buffers (~9.8 GB at N=20480 on a 16 GB
chip, vs 17.7 GB+ for the monolithic eigh at half this N).

Runs BOTH top-k solvers through the staged executor and records latency,
compile time, cluster count, and cross-solver label agreement (no recorded
reference labels at this size: the NumPy reference needs ~2 hours for one
N=20480 general eig, which is the point of this framework). Ground-truth
agreement on the well-separated 2-speaker fixture is the correctness gate.

Usage: python benchmarks/bench_n20480.py [SubspaceIteration|full_eigh|both]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from spectralcluster_tpu import configs, pipeline, utils
from spectralcluster_tpu.types import EigenSolver

N, D = 20480, 256


def make_embeddings(n, d=256, k=2, seed=0):
  rng = np.random.RandomState(seed)
  centers = rng.randn(k, d) * 3
  labels = np.repeat(np.arange(k), n // k)
  return (centers[labels] + rng.randn(n, d) * 0.4).astype(np.float32), labels


def run(solver):
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=(EigenSolver.SubspaceIteration
                   if solver == "SubspaceIteration" else EigenSolver.Auto))
  x, true = make_embeddings(N, D)
  xj = jnp.asarray(x)
  key = jax.random.PRNGKey(0)
  t0 = time.time()
  labels, n_clusters, _, _ = pipeline.spectral_cluster_fixed_k_staged(
      xj, key, cfg)
  labels = np.asarray(jax.device_get(labels))
  compile_s = time.time() - t0
  times = []
  for _ in range(3):
    t0 = time.time()
    out = pipeline.spectral_cluster_fixed_k_staged(xj, key, cfg)
    jax.device_get(out[0])
    times.append(time.time() - t0)
  ok = bool(np.array_equal(utils.enforce_ordered_labels(labels),
                           np.asarray(true, np.int64)))
  return {
      "latency_s": round(float(np.median(times)), 3),
      "compile_s": round(compile_s, 1),
      "n_clusters": int(jax.device_get(n_clusters)),
      "ground_truth_match": ok,
  }, labels


def main():
  which = sys.argv[1] if len(sys.argv) > 1 else "both"
  out = {"n": N, "d": D, "backend": jax.default_backend()}
  labels = {}
  for solver in ("SubspaceIteration", "full_eigh"):
    if which not in (solver, "both"):
      continue
    try:
      entry, lab = run(solver)
      out[solver] = entry
      labels[solver] = lab
      print(f"# {solver}: {entry}", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 - record the failure mode
      import traceback
      out[solver] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
      print(f"# {solver} FAILED: {out[solver]['error']}", file=sys.stderr,
            flush=True)
      traceback.print_exc()  # names the failing stage program
  if len(labels) == 2:
    a, b = labels.values()
    out["solvers_agree"] = bool(
        np.array_equal(utils.enforce_ordered_labels(a),
                       utils.enforce_ordered_labels(b)))
  print(json.dumps(out), flush=True)


if __name__ == "__main__":
  main()
