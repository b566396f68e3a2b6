"""Reference-equivalent N=20480 labels via a float64 similarity eigh.

The actual reference binary CANNOT complete N=20480 on this host: its
np.linalg.eig (LAPACK dgeev via OpenBLAS) segfaulted ~3.8 h into
predict() (`dmesg`: segfault in libscipy_openblas64, r5 2026-08-21).
This script evaluates the SAME reference pipeline — reference affinity,
reference refinement operators, reference eigengap, reference k-means —
replacing only the general eigendecomposition of the final
row-normalized matrix A = D^{-1} S with the mathematically identical
symmetric form: eigh(D^{-1/2} S D^{-1/2}) in float64, eigenvectors
recovered as D^{-1/2} u (cosine k-means is invariant to the per-row
positive rescaling). This is the exact similarity-transform identity the
TPU framework itself is built on (ops/eigen.py; SURVEY.md §2b row 1),
here executed in float64 NumPy as the parity oracle.

Records labels_20480 into benchmarks/reference_labels.npz and the
evaluation time (NOT comparable to a reference predict_s — dgeev would
be several times slower and in fact crashes) into baseline_numpy.json as
`eigh_equiv_s` with a `reference_segfault` note.

Usage (single-threaded BLAS is REQUIRED — the multithreaded OpenBLAS
dgemm/dgeev kernels segfault nondeterministically at this size on this
host, see dmesg):
  OPENBLAS_NUM_THREADS=1 nohup ./run_cpu.sh \
      python benchmarks/record_reference_20480_eigh.py
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
from spectralcluster import custom_distance_kmeans  # noqa: E402

from bench import make_embeddings  # noqa: E402

LABELS = os.path.join(REPO, "benchmarks", "reference_labels.npz")
BASELINE = os.path.join(REPO, "benchmarks", "baseline_numpy.json")
N = 20480


def main():
  x = make_embeddings(N).astype(np.float64)
  t0 = time.time()
  clusterer = ref.configs.icassp2018_clusterer
  aff = ref.utils.compute_affinity_matrix(x)
  refined = aff
  seq = list(ref.configs.ICASSP2018_REFINEMENT_SEQUENCE)
  assert seq[-1] == ref.RefinementName.RowWiseNormalize
  for name in seq[:-1]:
    refined = clusterer.refinement_options.get_refinement_operator(
        name).refine(refined)
    print(f"{name}: done ({time.time() - t0:.0f}s)", flush=True)
  # RowWiseNormalize: A = D^{-1} S, D = diag(row max) (ref refinement.py:
  # 237-245). eig(A) == similarity: eigh(D^{-1/2} S D^{-1/2}), v = D^{-1/2}u.
  d = np.max(refined, axis=1)
  assert (d > 0).all()
  inv_sqrt = 1.0 / np.sqrt(d)
  m = inv_sqrt[:, None] * refined * inv_sqrt[None, :]
  m = 0.5 * (m + m.T)
  print(f"similarity operand built ({time.time() - t0:.0f}s); eigh...",
        flush=True)
  w, u = np.linalg.eigh(m)
  print(f"eigh done ({time.time() - t0:.0f}s)", flush=True)
  order = np.argsort(-w)
  w = w[order]
  v = (inv_sqrt[:, None] * u)[:, order]
  n_clusters, _ = ref.utils.compute_number_of_clusters(
      w, max_clusters=clusterer.max_clusters,
      stop_eigenvalue=clusterer.stop_eigenvalue,
      eigengap_type=clusterer.eigengap_type, descend=True)
  n_clusters = max(n_clusters, clusterer.min_clusters)
  emb = v[:, :n_clusters]
  labels = custom_distance_kmeans.run_kmeans(
      emb, n_clusters=n_clusters, custom_dist="cosine", max_iter=300)
  total = time.time() - t0
  ordered = ref.utils.enforce_ordered_labels(labels).astype(np.int16)
  print(f"n_clusters={n_clusters}, total {total:.0f}s", flush=True)

  db = {}
  if os.path.exists(LABELS):
    with np.load(LABELS) as z:
      db = {k: z[k] for k in z.files}
  db[f"labels_{N}"] = ordered
  tmp = LABELS + ".tmp.npz"
  np.savez_compressed(tmp, **db)
  os.replace(tmp, LABELS)

  with open(BASELINE) as f:
    payload = json.load(f)
  payload["results"].setdefault(str(N), {})
  payload["results"][str(N)].update({
      "eigh_equiv_s": total,
      "n_unique": int(np.unique(labels).size),
      "reference_segfault": (
          "np.linalg.eig (OpenBLAS dgeev) segfaulted ~3.8h into the true "
          "reference predict() at this size on this host (r5); labels here "
          "are the reference pipeline evaluated with the mathematically "
          "identical float64 similarity eigh. predict_s extrapolation "
          "(O(N^3) from 851s at 10240): >=6800s."),
  })
  # A parity-gated speedup needs SOME denominator: use the O(N^3)
  # extrapolation, marked as such.
  payload["results"][str(N)].setdefault("predict_s", 6800.0)
  payload["results"][str(N)]["predict_s_is_extrapolated"] = True
  with open(BASELINE + ".tmp", "w") as f:
    json.dump(payload, f, indent=2)
  os.replace(BASELINE + ".tmp", BASELINE)
  print("written", flush=True)


if __name__ == "__main__":
  main()
