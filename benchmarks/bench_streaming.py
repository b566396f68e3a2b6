"""Streaming throughput microbenchmark (multi-stage clusterer).

Simulates a long recording streamed one embedding at a time through
MultiStageClusterer with production-like L/U1/U2 and reports steady-state
steps/s at several stream positions. The per-step cost is bounded by the U2
cache (dynamic compression), so throughput is flat in recording length —
the property that makes 100k-segment recordings feasible
(arXiv:2210.13690; BASELINE.json streaming config).

Usage: python benchmarks/bench_streaming.py [n_steps] [stride]

With stride > 1 the expensive re-cluster runs every `stride` steps via
MultiStageClusterer.streaming_predict_batch (state transitions — U1
crossing, U2 compressions — still run exactly; see streaming.py), which is
what makes a full 100k-segment recording measurable in ~1 h wall on this
tunneled chip. Integrity checks at the end: the final label history covers
every segment, labels are contiguous small ints, and the recording chained
through the expected number of dynamic compressions.
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


def main(n_steps=1500, stride=1):
  rng = np.random.RandomState(0)
  centers = rng.randn(4, 64) * 3
  speakers = rng.randint(0, 4, size=n_steps)
  stream = centers[speakers] + rng.randn(n_steps, 64) * 0.3

  main_clusterer = SpectralClusterer(
      min_clusters=2, max_clusters=7,
      refinement_options=configs.icassp2018_refinement_options())
  ms = MultiStageClusterer(main_clusterer=main_clusterer,
                           fallback_threshold=0.5, L=50, U1=100, U2=600)

  checkpoints = sorted({100, 300, 600, 1000, 2000, 3000, 5000, 10000, 20000,
                        30000, 50000, 75000, n_steps})
  checkpoints = [c for c in checkpoints if c <= n_steps]
  # The U2-bounded cache compresses every (U2 - U1) appended segments once
  # past the first window; at 100k steps that is ~199 compressions —
  # exactly the repeated-compression regime only a long run exercises.
  expected_compressions = max(0, 1 + (n_steps - 600) // 500) if (
      n_steps >= 600) else 0
  curve = []
  out = None
  t0 = time.time()
  last_t, last_i = t0, 0
  pos = 0
  for cp in checkpoints:
    chunk = stream[pos:cp]
    if stride > 1:
      out = ms.streaming_predict_batch(chunk, stride=stride)
    else:
      for e in chunk:
        out = ms.streaming_predict(e)
    pos = cp
    now = time.time()
    rate = (cp - last_i) / (now - last_t)
    curve.append({"step": cp, "steps_per_s": round(rate, 2),
                  "cache": int(ms.cache.shape[0]),
                  "compressed_groups": (
                      0 if ms.compression_labels is None
                      else int(ms.compression_labels.max()) + 1)})
    print(f"step {cp:6d}: {rate:7.2f} steps/s "
          f"(cache={ms.cache.shape[0]}, "
          f"history={0 if out is None else len(out)})", flush=True)
    last_t, last_i = now, cp
  total = time.time() - t0

  # --- Label-history integrity (VERDICT r3 item 5) ---------------------
  # The final output must label EVERY segment ever streamed (chained back
  # through every dynamic compression), with contiguous small-int labels.
  # chain_labels returns float labels (reference-parity quirk) — cast.
  out = np.asarray(out).astype(np.int64)
  assert out.shape == (n_steps,), (
      f"history length {out.shape} != {n_steps}: compression chain broken")
  uniq = np.unique(out)
  assert uniq.min() >= 0 and uniq.max() < 20, f"label range bad: {uniq}"
  if n_steps >= 600:
    # compression_labels maps every original segment to a live cache row
    # group; after ~200 chained compressions it must still cover the whole
    # stream one-entry-per-segment.
    assert ms.compression_labels is not None, "no compression ever ran"
    n_covered = len(ms.compression_labels)
    assert n_covered == n_steps, (
        f"compression_labels covers {n_covered} != {n_steps}")
  # Majority label per true speaker should be distinct for a well-separated
  # 4-speaker fixture (quality signal, not exact parity: stride skips
  # intermediate re-clusters by design).
  purity = np.mean([
      np.bincount(out[speakers == s]).max() / max(1, (speakers == s).sum())
      for s in range(4)])
  print(f"total: {n_steps} steps in {total:.1f}s "
        f"({n_steps / total:.2f} steps/s), purity={purity:.3f}, "
        f"~{expected_compressions} compressions expected")
  print(json.dumps({"n_steps": n_steps, "stride": stride,
                    "total_s": round(total, 1),
                    "steps_per_s": round(n_steps / total, 2),
                    "purity": round(float(purity), 4),
                    "history_len": int(out.shape[0]),
                    "n_labels": int(uniq.max()) + 1,
                    "backend": jax.default_backend(), "curve": curve}),
        flush=True)


if __name__ == "__main__":
  main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500,
       int(sys.argv[2]) if len(sys.argv) > 2 else 1)
