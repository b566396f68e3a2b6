"""Record the NumPy reference's labels on the bench fixture (one-time).

bench.py asserts permutation-invariant label parity against these before
printing its speedup metric — the quality bit demanded by VERDICT r1 item 1.
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

import spectralcluster as ref  # noqa: E402

from bench import make_embeddings  # noqa: E402

OUT = os.path.join(REPO, "benchmarks", "reference_labels.npz")


def main():
  sizes = [int(s) for s in sys.argv[1:]] or [512, 1024, 2048, 4096, 10240]
  existing = {}
  if os.path.exists(OUT):
    with np.load(OUT) as z:
      existing = {k: z[k] for k in z.files}
  for n in sizes:
    key = f"labels_{n}"
    if key in existing:
      print(f"N={n}: already recorded")
      continue
    x = make_embeddings(n).astype(np.float64)
    labels = ref.configs.icassp2018_clusterer.predict(x)
    existing[key] = ref.utils.enforce_ordered_labels(labels).astype(np.int16)
    np.savez_compressed(OUT, **existing)
    print(f"N={n}: recorded, n_clusters={len(np.unique(labels))}")


if __name__ == "__main__":
  main()
