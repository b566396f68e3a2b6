"""Measure the NumPy reference at N=20480 for real (VERDICT r4 item 4).

BASELINE.md's north-star speedups at N=20480 were extrapolations ("NumPy
needs >~6800 s"); benchmarks/baseline_numpy.json topped out at 10240 and
reference_labels.npz had no labels_20480, so 20480 runs gated on ground
truth instead of reference parity. This one-shot background run closes
both: it times ref predict() end-to-end + eig-only on the bench fixture
(bench.make_embeddings, same seed), appends the row to baseline_numpy.json,
and records labels_20480 into reference_labels.npz.

Run: nohup ./run_cpu.sh python benchmarks/measure_numpy_20480.py \
       > benchmarks/numpy20480.log 2>&1 &
Reference: /root/reference/spectralcluster/spectral_clusterer.py:201.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

import spectralcluster as ref  # noqa: E402

from bench import make_embeddings  # noqa: E402

BASELINE = os.path.join(REPO, "benchmarks", "baseline_numpy.json")
LABELS = os.path.join(REPO, "benchmarks", "reference_labels.npz")
N = 20480


def main():
  x = make_embeddings(N).astype(np.float64)
  clusterer = ref.SpectralClusterer(
      min_clusters=2, max_clusters=7,
      refinement_options=ref.RefinementOptions(
          gaussian_blur_sigma=1, p_percentile=0.95,
          refinement_sequence=ref.configs.ICASSP2018_REFINEMENT_SEQUENCE),
      custom_dist="cosine")
  print(f"predict() at N={N} starting...", flush=True)
  t0 = time.time()
  labels = clusterer.predict(x)
  total = time.time() - t0
  print(f"predict done in {total:.1f}s, "
        f"n_clusters={np.unique(labels).size}", flush=True)

  # Record the labels FIRST (the valuable artifact), atomically.
  existing = {}
  if os.path.exists(LABELS):
    with np.load(LABELS) as z:
      existing = {k: z[k] for k in z.files}
  existing[f"labels_{N}"] = ref.utils.enforce_ordered_labels(
      labels).astype(np.int16)
  tmp = LABELS + ".tmp.npz"
  np.savez_compressed(tmp, **existing)
  os.replace(tmp, LABELS)
  print("labels recorded", flush=True)

  # eig-only timing on the refined matrix (same shape as the small-N rows).
  aff = ref.utils.compute_affinity_matrix(x)
  refined = aff.copy()
  for name in ref.configs.ICASSP2018_REFINEMENT_SEQUENCE:
    refined = clusterer.refinement_options.get_refinement_operator(
        name).refine(refined)
  print("refinement done; timing np.linalg.eig...", flush=True)
  t0 = time.time()
  np.linalg.eig(refined)
  eig_only = time.time() - t0
  print(f"eig-only {eig_only:.1f}s", flush=True)

  with open(BASELINE) as f:
    payload = json.load(f)
  payload["results"][str(N)] = {
      "predict_s": total, "eig_s": eig_only,
      "n_unique": int(np.unique(labels).size)}
  tmpj = BASELINE + ".tmp"
  with open(tmpj, "w") as f:
    json.dump(payload, f, indent=2)
  os.replace(tmpj, BASELINE)
  print("baseline row written; all done", flush=True)


if __name__ == "__main__":
  main()
