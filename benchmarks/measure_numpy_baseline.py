"""Measure the reference (NumPy/LAPACK) pipeline on this host.

Writes benchmarks/baseline_numpy.json: end-to-end predict() seconds and the
eig-only seconds for the icassp2018 config at several N (d=256, 2 speakers).
These are the denominators for bench.py's speedup metric (the reference
publishes no numbers of its own — SURVEY.md §6).
"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, "/root/reference")
import spectralcluster as ref

OUT = os.path.join(os.path.dirname(__file__), "baseline_numpy.json")

def make_embeddings(n, d=256, k=2, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 3
    labels = np.repeat(np.arange(k), n // k)
    return centers[labels] + rng.randn(n, d) * 0.4

results = {}
for n in [512, 1024, 2048, 4096, 10240]:
    x = make_embeddings(n)
    clusterer = ref.SpectralClusterer(
        min_clusters=2, max_clusters=7,
        refinement_options=ref.RefinementOptions(
            gaussian_blur_sigma=1, p_percentile=0.95,
            refinement_sequence=ref.configs.ICASSP2018_REFINEMENT_SEQUENCE),
        custom_dist="cosine")
    t0 = time.time()
    labels = clusterer.predict(x)
    total = time.time() - t0

    # eig-only timing on the refined matrix
    aff = ref.utils.compute_affinity_matrix(x)
    refined = aff.copy()
    for name in ref.configs.ICASSP2018_REFINEMENT_SEQUENCE:
        refined = clusterer.refinement_options.get_refinement_operator(
            name).refine(refined)
    t0 = time.time()
    np.linalg.eig(refined)
    eig_only = time.time() - t0

    results[str(n)] = {"predict_s": total, "eig_s": eig_only,
                       "n_unique": int(np.unique(labels).size)}
    print(n, results[str(n)], flush=True)
    with open(OUT, "w") as f:
        json.dump({"host": "cpu-numpy-lapack", "d": 256, "config":
                   "icassp2018", "results": results}, f, indent=2)
print("written", OUT)
