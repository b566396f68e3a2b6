"""Differential parity fuzzing vs the reference across config space.

Sweeps representative combinations of (laplacian × eigengap × threshold
variants × symmetrize × renorm × constraints) on well-separated fixtures and
asserts permutation-invariant label equality with the reference package plus
eigengap agreement. This is the broadest anti-regression net for the
behavior surface (SURVEY.md §2a defaults table).
"""

import itertools

import numpy as np
import pytest

import conftest

if not conftest.reference_available():  # pragma: no cover
  pytest.skip("reference package not available", allow_module_level=True)

ref = conftest.import_reference()

from spectralcluster_tpu import types, utils  # noqa: E402
from spectralcluster_tpu.clusterer import SpectralClusterer  # noqa: E402

SEQ_FULL = "full"        # icassp2018 6-op sequence
SEQ_TTD = "ttd"          # threshold+symmetrize
SEQ_EMPTY = "empty"

_REF_SEQS = {
    SEQ_FULL: ref.configs.ICASSP2018_REFINEMENT_SEQUENCE,
    SEQ_TTD: ref.configs.TURNTODIARIZE_REFINEMENT_SEQUENCE,
    SEQ_EMPTY: [],
}
_OUR_SEQS = {
    SEQ_FULL: tuple(types.RefinementName[n.name]
                    for n in ref.configs.ICASSP2018_REFINEMENT_SEQUENCE),
    SEQ_TTD: (types.RefinementName.RowWiseThreshold,
              types.RefinementName.Symmetrize),
    SEQ_EMPTY: (),
}


def _fixture(seed, n=60, d=16, k=3):
  rng = np.random.RandomState(seed)
  centers = np.eye(k, d) * 5.0
  labels = np.repeat(np.arange(k), n // k)
  return centers[labels] + rng.randn(n, d) * 0.25, labels


def _build_pair(seq_key, laplacian, eigengap, threshold, binarize,
                preserve_diag, symmetrize, renorm, p):
  ref_opts = ref.RefinementOptions(
      gaussian_blur_sigma=1,
      p_percentile=p,
      thresholding_soft_multiplier=0.01,
      thresholding_type=getattr(ref.ThresholdType, threshold),
      thresholding_with_binarization=binarize,
      thresholding_preserve_diagonal=preserve_diag,
      symmetrize_type=getattr(ref.SymmetrizeType, symmetrize),
      refinement_sequence=_REF_SEQS[seq_key])
  ref_clusterer = ref.SpectralClusterer(
      min_clusters=2, max_clusters=7,
      refinement_options=ref_opts,
      laplacian_type=(getattr(ref.LaplacianType, laplacian)
                      if laplacian else None),
      eigengap_type=getattr(ref.EigenGapType, eigengap),
      row_wise_renorm=renorm)

  our_opts = types.RefinementOptions(
      gaussian_blur_sigma=1,
      p_percentile=p,
      thresholding_soft_multiplier=0.01,
      thresholding_type=getattr(types.ThresholdType, threshold),
      thresholding_with_binarization=binarize,
      thresholding_preserve_diagonal=preserve_diag,
      symmetrize_type=getattr(types.SymmetrizeType, symmetrize),
      refinement_sequence=_OUR_SEQS[seq_key])
  our_clusterer = SpectralClusterer(
      min_clusters=2, max_clusters=7,
      refinement_options=our_opts,
      laplacian_type=(getattr(types.LaplacianType, laplacian)
                      if laplacian else None),
      eigengap_type=getattr(types.EigenGapType, eigengap),
      row_wise_renorm=renorm)
  return ref_clusterer, our_clusterer


# A representative sweep (kept moderate to bound test runtime): every
# laplacian with both sequences, both eigengaps, both thresholds, and the
# binarize/preserve/symmetrize/renorm variants in rotation.
_COMBOS = []
_rot = itertools.cycle([
    (False, False, "Max", False, 0.95),
    (True, False, "Average", True, 0.9),
    (False, True, "Max", True, 0.8),
    (True, True, "Average", False, 0.95),
])
for seq_key in (SEQ_FULL, SEQ_TTD):
  for laplacian in (None, "GraphCut", "RandomWalk", "Unnormalized"):
    for eigengap in ("Ratio", "NormalizedDiff"):
      for threshold in ("RowMax", "Percentile"):
        binarize, preserve, symmetrize, renorm, p = next(_rot)
        _COMBOS.append((seq_key, laplacian, eigengap, threshold, binarize,
                        preserve, symmetrize, renorm, p))
_COMBOS.append((SEQ_EMPTY, "GraphCut", "Ratio", "RowMax", False, False,
                "Max", True, 0.95))
_COMBOS.append((SEQ_EMPTY, None, "Ratio", "RowMax", False, False,
                "Max", False, 0.95))


@pytest.mark.parametrize("combo", _COMBOS,
                         ids=lambda c: "-".join(str(x) for x in c))
def test_label_parity(combo):
  x, true = _fixture(seed=11)
  ref_clusterer, our_clusterer = _build_pair(*combo)
  ref_labels = ref.utils.enforce_ordered_labels(ref_clusterer.predict(x))
  our_labels = utils.enforce_ordered_labels(our_clusterer.predict(x))
  np.testing.assert_equal(ref_labels, our_labels)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_constrained_parity_sweep(seed):
  x, _ = _fixture(seed=seed, n=30, d=12, k=2)
  rng = np.random.RandomState(seed)
  scores = [0.0] + [float(v) for v in rng.rand(29) * 2.0]
  cm = ref.ConstraintMatrix(scores, threshold=1).compute_diagonals()
  for name, before in (("ConstraintPropagation", True),
                       ("AffinityIntegration", False)):
    ref_c = ref.SpectralClusterer(
        min_clusters=2, max_clusters=7,
        refinement_options=ref.RefinementOptions(
            thresholding_type=ref.ThresholdType.Percentile,
            thresholding_with_binarization=True,
            thresholding_preserve_diagonal=True,
            symmetrize_type=ref.SymmetrizeType.Average,
            refinement_sequence=ref.configs.TURNTODIARIZE_REFINEMENT_SEQUENCE),
        constraint_options=ref.ConstraintOptions(
            constraint_name=getattr(ref.ConstraintName, name),
            apply_before_refinement=before,
            integration_type=ref.IntegrationType.Max,
            constraint_propagation_alpha=0.4),
        laplacian_type=ref.LaplacianType.GraphCut,
        row_wise_renorm=True)
    our_c = SpectralClusterer(
        min_clusters=2, max_clusters=7,
        refinement_options=types.RefinementOptions(
            thresholding_type=types.ThresholdType.Percentile,
            thresholding_with_binarization=True,
            thresholding_preserve_diagonal=True,
            symmetrize_type=types.SymmetrizeType.Average,
            refinement_sequence=(types.RefinementName.RowWiseThreshold,
                                 types.RefinementName.Symmetrize)),
        constraint_options=types.ConstraintOptions(
            constraint_name=getattr(types.ConstraintName, name),
            apply_before_refinement=before,
            integration_type=types.IntegrationType.Max,
            constraint_propagation_alpha=0.4),
        laplacian_type=types.LaplacianType.GraphCut,
        row_wise_renorm=True)
    np.testing.assert_equal(
        ref.utils.enforce_ordered_labels(ref_c.predict(x, cm)),
        utils.enforce_ordered_labels(our_c.predict(x, cm)),
        err_msg=f"constraint={name} before={before}")


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_staged_constrained_autotuned_parity_sweep(seed):
  # The r5 staged per-candidate sweep (eig_topk_staged) forced on at small
  # N must agree with the reference on the FULL constrained + auto-tuned
  # Turn-to-Diarize configuration — the path the chip runs at N>=8192.
  from spectralcluster_tpu import configs as our_configs
  from spectralcluster_tpu.autotune import AutoTune
  x, _ = _fixture(seed=seed, n=48, d=12, k=3)
  rng = np.random.RandomState(seed)
  scores = [0.0] + [float(v) for v in rng.rand(47) * 2.0]
  cm = ref.ConstraintMatrix(scores, threshold=1).compute_diagonals()
  ref_c = ref.SpectralClusterer(
      min_clusters=2, max_clusters=7,
      refinement_options=ref.RefinementOptions(
          thresholding_type=ref.ThresholdType.Percentile,
          thresholding_with_binarization=True,
          thresholding_preserve_diagonal=True,
          symmetrize_type=ref.SymmetrizeType.Average,
          refinement_sequence=ref.configs.TURNTODIARIZE_REFINEMENT_SEQUENCE),
      constraint_options=ref.constraint.ConstraintOptions(
          constraint_name=ref.constraint.ConstraintName.ConstraintPropagation,
          apply_before_refinement=True,
          constraint_propagation_alpha=0.4),
      autotune=ref.AutoTune(p_percentile_min=0.40, p_percentile_max=0.95,
                            init_search_step=0.05, search_level=1),
      laplacian_type=ref.LaplacianType.GraphCut,
      row_wise_renorm=True, custom_dist="cosine")
  ours = our_configs.make_turntodiarize_clusterer()
  ours.staged_execution_min_n = 32   # force the staged sweep at toy N
  ref_labels = ref.utils.enforce_ordered_labels(ref_c.predict(x, cm))
  our_labels = utils.enforce_ordered_labels(ours.predict(x, cm))
  np.testing.assert_equal(ref_labels, our_labels)
