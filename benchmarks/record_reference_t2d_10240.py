"""Reference-equivalent Turn-to-Diarize labels at N=10240.

A direct reference run needs ~11 dgeev(10240) for the autotune sweep
(hours, and the dgeev code path segfaulted at 20480 on this host). The
Turn-to-Diarize eig operand is the GraphCut NORMALIZED LAPLACIAN — exactly
symmetric — so `np.linalg.eigh` computes the identical eigensystem. This
recorder runs the UNMODIFIED reference predict() with
`ref.utils.compute_sorted_eigenvectors` monkeypatched to use eigh on
(verified-)symmetric inputs: every other semantic — E2CP, autotune
memoization/narrowing, eigengap, k-means — is the reference's own code.

Records labels_10240 into benchmarks/reference_labels_t2d.npz and the
evaluation time into baseline_t2d.json as `eigh_equiv_s`.

Usage: setsid nohup ./run_cpu.sh python \
    benchmarks/record_reference_t2d_10240.py > benchmarks/rec_t2d10240.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import spectralcluster as ref  # noqa: E402

from t2d_fixture import make_t2d_fixture  # noqa: E402

LABELS = os.path.join(REPO, "benchmarks", "reference_labels_t2d.npz")
BASE = os.path.join(REPO, "benchmarks", "baseline_t2d.json")
N = 10240


def _eigh_sorted(input_matrix, descend=True):
  m = np.asarray(input_matrix, np.float64)
  asym = np.abs(m - m.T).max()
  assert asym <= 1e-10 * max(np.abs(m).max(), 1e-30), (
      f"operand not symmetric (asym={asym:.2e}); eigh substitution invalid")
  w, v = np.linalg.eigh(0.5 * (m + m.T))
  order = np.argsort(-w) if descend else np.argsort(w)
  return w[order], v[:, order]


def main():
  ref.utils.compute_sorted_eigenvectors = _eigh_sorted
  ref.spectral_clusterer.utils.compute_sorted_eigenvectors = _eigh_sorted
  x, scores, truth = make_t2d_fixture(N)
  cm = ref.constraint.ConstraintMatrix(scores, threshold=1)
  clusterer = ref.SpectralClusterer(
      min_clusters=2, max_clusters=7,
      refinement_options=ref.RefinementOptions(
          thresholding_soft_multiplier=0.01,
          thresholding_type=ref.ThresholdType.Percentile,
          thresholding_with_binarization=True,
          thresholding_preserve_diagonal=True,
          symmetrize_type=ref.SymmetrizeType.Average,
          refinement_sequence=ref.configs.TURNTODIARIZE_REFINEMENT_SEQUENCE),
      autotune=ref.AutoTune(p_percentile_min=0.40, p_percentile_max=0.95,
                            init_search_step=0.05, search_level=1),
      laplacian_type=ref.LaplacianType.GraphCut,
      row_wise_renorm=True, custom_dist="cosine",
      constraint_options=ref.constraint.ConstraintOptions(
          constraint_name=ref.constraint.ConstraintName.ConstraintPropagation,
          apply_before_refinement=True, constraint_propagation_alpha=0.4))
  print("predicting...", flush=True)
  t0 = time.time()
  labels = clusterer.predict(x.astype(np.float64), cm.compute_diagonals())
  dt = time.time() - t0
  ordered = ref.utils.enforce_ordered_labels(labels).astype(np.int16)
  gt = ref.utils.enforce_ordered_labels(truth)
  print(f"done {dt:.1f}s n={np.unique(labels).size} "
        f"gt_match={bool(np.array_equal(ordered, gt))}", flush=True)

  db = {}
  if os.path.exists(LABELS):
    with np.load(LABELS) as z:
      db = {k: z[k] for k in z.files}
  db[f"labels_{N}"] = ordered
  tmp = LABELS + ".tmp.npz"
  np.savez_compressed(tmp, **db)
  os.replace(tmp, LABELS)

  with open(BASE) as f:
    payload = json.load(f)
  payload["results"].setdefault(str(N), {})
  payload["results"][str(N)].update({
      "eigh_equiv_s": dt,
      "n_unique": int(np.unique(labels).size),
      "note": ("reference pipeline with eigh substituted for eig on the "
               "symmetric GraphCut Laplacian (identical math; direct dgeev "
               "x11 would take hours and is segfault-prone at scale on "
               "this host)"),
  })
  with open(BASE + ".tmp", "w") as f:
    json.dump(payload, f, indent=2)
  os.replace(BASE + ".tmp", BASE)
  print("written", flush=True)


if __name__ == "__main__":
  main()
