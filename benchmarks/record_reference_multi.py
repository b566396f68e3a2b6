"""Record reference labels for the multi-speaker record-size fixtures.

Direct reference (NumPy dgeev) runs at N=10240 for k=4 and k=7 — upgrades
bench_multispeaker's parity field from null to a real differential gate.
Usage: ./run_cpu.sh python benchmarks/record_reference_multi.py 10240 4 7
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import spectralcluster as ref  # noqa: E402

from bench_multispeaker import make_embeddings_k  # noqa: E402

OUT = os.path.join(REPO, "benchmarks", "reference_labels_multi.npz")


def main():
  n = int(sys.argv[1])
  ks = [int(a) for a in sys.argv[2:]] or [4, 7]
  db = {}
  if os.path.exists(OUT):
    with np.load(OUT) as z:
      db = {k: z[k] for k in z.files}
  for k in ks:
    key = f"labels_{n}_k{k}"
    if key in db:
      print(f"{key}: already recorded", flush=True)
      continue
    x, truth = make_embeddings_k(n, k)
    t0 = time.time()
    labels = ref.configs.icassp2018_clusterer.predict(x.astype(np.float64))
    dt = time.time() - t0
    ordered = ref.utils.enforce_ordered_labels(labels).astype(np.int16)
    db[key] = ordered
    tmp = OUT + ".tmp.npz"
    np.savez_compressed(tmp, **db)
    os.replace(tmp, OUT)
    gt = ref.utils.enforce_ordered_labels(truth)
    print(f"{key}: {dt:.1f}s n={np.unique(labels).size} "
          f"gt_match={bool(np.array_equal(ordered, gt))}", flush=True)


if __name__ == "__main__":
  main()
