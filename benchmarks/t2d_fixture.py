"""Canonical Turn-to-Diarize bench fixture (embeddings + turn scores).

Shared by the TPU bench leg (bench_turntodiarize.py) and the reference
recorder (record_reference_t2d.py) so parity is apples-to-apples.

Multi-speaker by design (k=4 contiguous speaker blocks): VERDICT r4 item 2
asked for record-size evidence beyond the 2-cluster icassp fixture, and
the constrained pipeline's eigengap runs at k>2 here. Turn scores follow
the reference semantics (constraint.py:167-201): score[i] relates segment
i-1 to i; 0 => must-link, > threshold(=1) => cannot-link, else neutral.
"""
import numpy as np


def make_t2d_fixture(n, d=256, k=4, seed=0):
  rng = np.random.RandomState(seed)
  centers = rng.randn(k, d) * 3
  labels = np.repeat(np.arange(k), n // k)
  if labels.size < n:  # n not divisible by k: pad with the last speaker
    labels = np.concatenate([labels, np.full(n - labels.size, k - 1)])
  x = (centers[labels] + rng.randn(n, d) * 0.4).astype(np.float32)
  scores = np.zeros(n)
  for i in range(1, n):
    if labels[i] != labels[i - 1]:
      scores[i] = 2.0       # cannot-link at every speaker change
    elif i % 2:
      scores[i] = 0.5       # neutral
    # else 0.0: must-link for half the within-speaker adjacencies
  return x, scores, labels
