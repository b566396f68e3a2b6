"""Record the NumPy reference's Turn-to-Diarize labels + timing (one-time).

Runs the upstream turntodiarize_clusterer (reference configs.py:72-80 —
GraphCut + E2CP + AutoTune) on the shared t2d_fixture and records:
  * benchmarks/reference_labels_t2d.npz  labels_{n} (ordered, int16)
  * benchmarks/baseline_t2d.json         predict_s per N (the speedup
    denominators for the constrained pipeline — the reference publishes no
    numbers of its own, SURVEY.md §6)

Usage: ./run_cpu.sh python benchmarks/record_reference_t2d.py 1024 2048 4096
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


def main():
  sizes = [int(s) for s in sys.argv[1:]] or [1024, 2048, 4096]
  labels_db = {}
  if os.path.exists(LABELS):
    with np.load(LABELS) as z:
      labels_db = {k: z[k] for k in z.files}
  base = {"host": "cpu-numpy-lapack", "d": 256, "k": 4,
          "config": "turntodiarize", "results": {}}
  if os.path.exists(BASE):
    with open(BASE) as f:
      base = json.load(f)
  for n in sizes:
    key = f"labels_{n}"
    if key in labels_db and str(n) in base["results"]:
      print(f"N={n}: already recorded", flush=True)
      continue
    x, scores, truth = make_t2d_fixture(n)
    cm = ref.constraint.ConstraintMatrix(scores, threshold=1)
    # Fresh clusterer per N: the reference AutoTune carries search state.
    clusterer = ref.configs.TurnToDiarizeClusterer() if hasattr(
        ref.configs, "TurnToDiarizeClusterer") else None
    if clusterer is None:
      clusterer = ref.SpectralClusterer(
          min_clusters=2, max_clusters=7,
          refinement_options=ref.refinement.RefinementOptions(
              thresholding_soft_multiplier=0.01,
              thresholding_type=ref.ThresholdType.Percentile,
              thresholding_with_binarization=True,
              thresholding_preserve_diagonal=True,
              symmetrize_type=ref.SymmetrizeType.Average,
              refinement_sequence=ref.configs.
              TURNTODIARIZE_REFINEMENT_SEQUENCE),
          autotune=ref.AutoTune(
              p_percentile_min=0.40, p_percentile_max=0.95,
              init_search_step=0.05, search_level=1),
          laplacian_type=ref.LaplacianType.GraphCut,
          row_wise_renorm=True,
          custom_dist="cosine",
          constraint_options=ref.constraint.ConstraintOptions(
              constraint_name=ref.constraint.ConstraintName.
              ConstraintPropagation,
              apply_before_refinement=True,
              constraint_propagation_alpha=0.4))
    print(f"N={n}: predicting...", flush=True)
    t0 = time.time()
    labels = clusterer.predict(x.astype(np.float64), cm.compute_diagonals())
    dt = time.time() - t0
    ordered = ref.utils.enforce_ordered_labels(labels).astype(np.int16)
    labels_db[key] = ordered
    tmp = LABELS + ".tmp.npz"
    np.savez_compressed(tmp, **labels_db)
    os.replace(tmp, LABELS)
    # Ground-truth agreement (the fixture is well-separated; the reference
    # should recover the 4 speakers — record whatever it does).
    gt = ref.utils.enforce_ordered_labels(truth)
    base["results"][str(n)] = {
        "predict_s": dt,
        "n_unique": int(np.unique(labels).size),
        "matches_ground_truth": bool(np.array_equal(ordered, gt)),
    }
    with open(BASE + ".tmp", "w") as f:
      json.dump(base, f, indent=2)
    os.replace(BASE + ".tmp", BASE)
    print(f"N={n}: {dt:.1f}s, n_clusters={base['results'][str(n)]['n_unique']}"
          f", gt_match={base['results'][str(n)]['matches_ground_truth']}",
          flush=True)
  print("done", flush=True)


if __name__ == "__main__":
  main()
