"""Multi-speaker record-size validation (VERDICT r4 item 2).

Every record-size exact-route hardware run through r4 was the same
well-separated 2-cluster fixture — the kept-side solve at t1>2, the
merge/dedup, and the eigengap at k>2 had never run on the chip at record
sizes. This bench runs k=4 and k=7 block-ordered speaker fixtures (same
family as the headline fixture; k=7 sits at the icassp2018 preset's
max_clusters cap, so t=8 reads one bulk eigenvalue past the dominant
cluster) at a given N through THREE solver routes:

  * SubspaceIteration (the headline solver),
  * full_eigh via the certified-iterative fast route (the r5 default),
  * full_eigh with the fast route disabled — the sign-chain spectral
    SPLIT machinery (kept-side t1=k solve, deflated remainder, merge),

recording latency, cluster count, ground-truth match, and cross-route
label agreement. Reference parity is reported when
benchmarks/reference_labels_multi.npz carries labels for (n, k).

Usage: timeout 580 python benchmarks/bench_multispeaker.py N [k ...]
Appends rows to benchmarks/multispeaker_r5.json.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from spectralcluster_tpu import configs, pipeline, utils  # noqa: E402
from spectralcluster_tpu.ops import dc as dc_ops  # noqa: E402
from spectralcluster_tpu.types import EigenSolver  # noqa: E402

OUT = os.path.join(REPO, "benchmarks", "multispeaker_r5.json")
REF = os.path.join(REPO, "benchmarks", "reference_labels_multi.npz")


def make_embeddings_k(n, k, d=256, seed=0):
  rng = np.random.RandomState(seed)
  centers = rng.randn(k, d) * 3
  labels = np.repeat(np.arange(k), -(-n // k))[:n]
  return (centers[labels] + rng.randn(n, d) * 0.4).astype(np.float32), labels


def run_route(x, solver, n):
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=solver)
  key = jax.random.PRNGKey(0)
  # SCT_MS_EXACT=1: run at the exact problem shape with no padding mask —
  # the record-run methodology at N=20480, whose pad bucket (24064) puts
  # the prep program's temporaries past the 16 GB HBM (measured 21.6 GB).
  # Padded-path coverage at record size comes from the N=10240 runs
  # (bucket 12288).
  if os.environ.get("SCT_MS_EXACT") == "1":
    xj = jnp.asarray(x)
    nv = None
  else:
    n_pad = pipeline.pad_bucket(n)
    xp = np.zeros((n_pad, x.shape[1]), np.float32)
    xp[:n] = x
    xj = jnp.asarray(xp)
    nv = jnp.asarray(n, jnp.int32)

  def call():
    labels, n_clusters, _, _ = pipeline.spectral_cluster_fixed_k_staged(
        xj, key, cfg, n_valid=nv)
    return jax.device_get((labels, n_clusters))

  t0 = time.time()
  labels, n_clusters = call()
  compile_s = time.time() - t0
  times = []
  for _ in range(2):
    t0 = time.time()
    labels, n_clusters = call()
    times.append(time.time() - t0)
  return (utils.enforce_ordered_labels(np.asarray(labels)[:n]),
          int(n_clusters), round(float(np.median(times)), 4),
          round(compile_s, 1))


def main():
  n = int(sys.argv[1])
  ks = [int(a) for a in sys.argv[2:]] or [4, 7]
  rows = []
  if os.path.exists(OUT):
    with open(OUT) as f:
      rows = json.load(f)
  ref_db = {}
  if os.path.exists(REF):
    with np.load(REF) as z:
      ref_db = {kk: z[kk] for kk in z.files}
  for k in ks:
    x, truth = make_embeddings_k(n, k)
    truth_o = utils.enforce_ordered_labels(truth)
    results = {}
    for tag, solver, fast in [
        ("SubspaceIteration", EigenSolver.SubspaceIteration, True),
        ("full_eigh_iter", EigenSolver.Auto, True),
        ("full_eigh_split", EigenSolver.Auto, False),
    ]:
      dc_ops._TRY_ITERATIVE_FIRST = fast
      try:
        labels, n_clusters, lat, comp = run_route(x, solver, n)
      finally:
        dc_ops._TRY_ITERATIVE_FIRST = True
      ref = ref_db.get(f"labels_{n}_k{k}")
      results[tag] = {
          "latency_s": lat, "compile_s": comp, "n_clusters": n_clusters,
          "gt_match": bool(np.array_equal(labels, truth_o)),
          "parity": (None if ref is None else
                     bool(np.array_equal(labels, np.asarray(ref, np.int64)))),
          "_labels": labels,
      }
      print(f"# N={n} k={k} {tag}: lat={lat}s compile={comp}s "
            f"n={n_clusters} gt={results[tag]['gt_match']} "
            f"parity={results[tag]['parity']}", file=sys.stderr, flush=True)
    tags = list(results)
    agree = all(
        np.array_equal(results[tags[0]]["_labels"], results[t]["_labels"])
        for t in tags[1:])
    for r in results.values():
      r.pop("_labels")
    row = {"n": n, "k": k, "cross_route_agreement": agree,
           "backend": jax.default_backend(), "routes": results}
    print(json.dumps(row), flush=True)
    rows = [r for r in rows if not (r["n"] == n and r["k"] == k)] + [row]
    with open(OUT + ".tmp", "w") as f:
      json.dump(sorted(rows, key=lambda r: (r["n"], r["k"])), f, indent=2)
    os.replace(OUT + ".tmp", OUT)


if __name__ == "__main__":
  main()
