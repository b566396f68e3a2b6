"""Canonical preset configurations (reference configs.py parity).

`icassp2018_clusterer` — "Speaker Diarization with LSTM" (ICASSP 2018):
full 6-op refinement sequence, no Laplacian, eigengap on the refined affinity
(reference configs.py:21-43).

`turntodiarize_clusterer` — "Turn-to-Diarize" (ICASSP 2022): percentile
thresholding with binarization, GraphCut Laplacian, constraint propagation
(α=0.4, before refinement), AutoTune over p ∈ [0.40, 0.95] step 0.05
(reference configs.py:49-80).

Presets are provided both as factory functions (fresh, independently seeded
instances — recommended) and as module-level instances matching the reference
import style.
"""

from __future__ import annotations

from spectralcluster_tpu.autotune import AutoTune
from spectralcluster_tpu.clusterer import SpectralClusterer
from spectralcluster_tpu.types import (ConstraintName, ConstraintOptions,
                                       LaplacianType, RefinementName,
                                       RefinementOptions, SymmetrizeType,
                                       ThresholdType)

ICASSP2018_REFINEMENT_SEQUENCE = (
    RefinementName.CropDiagonal,
    RefinementName.GaussianBlur,
    RefinementName.RowWiseThreshold,
    RefinementName.Symmetrize,
    RefinementName.Diffuse,
    RefinementName.RowWiseNormalize,
)

TURNTODIARIZE_REFINEMENT_SEQUENCE = (
    RefinementName.RowWiseThreshold,
    RefinementName.Symmetrize,
)


def icassp2018_refinement_options() -> RefinementOptions:
  return RefinementOptions(
      gaussian_blur_sigma=1,
      p_percentile=0.95,
      thresholding_soft_multiplier=0.01,
      thresholding_type=ThresholdType.RowMax,
      refinement_sequence=ICASSP2018_REFINEMENT_SEQUENCE)


def make_icassp2018_clusterer() -> SpectralClusterer:
  return SpectralClusterer(
      min_clusters=2,
      max_clusters=7,
      autotune=None,
      laplacian_type=None,
      refinement_options=icassp2018_refinement_options(),
      custom_dist="cosine")


def turntodiarize_refinement_options() -> RefinementOptions:
  return RefinementOptions(
      thresholding_soft_multiplier=0.01,
      thresholding_type=ThresholdType.Percentile,
      thresholding_with_binarization=True,
      thresholding_preserve_diagonal=True,
      symmetrize_type=SymmetrizeType.Average,
      refinement_sequence=TURNTODIARIZE_REFINEMENT_SEQUENCE)


def turntodiarize_constraint_options() -> ConstraintOptions:
  return ConstraintOptions(
      constraint_name=ConstraintName.ConstraintPropagation,
      apply_before_refinement=True,
      constraint_propagation_alpha=0.4)


def make_turntodiarize_auto_tune() -> AutoTune:
  return AutoTune(
      p_percentile_min=0.40,
      p_percentile_max=0.95,
      init_search_step=0.05,
      search_level=1)


def make_turntodiarize_clusterer() -> SpectralClusterer:
  return SpectralClusterer(
      min_clusters=2,
      max_clusters=7,
      refinement_options=turntodiarize_refinement_options(),
      constraint_options=turntodiarize_constraint_options(),
      autotune=make_turntodiarize_auto_tune(),
      laplacian_type=LaplacianType.GraphCut,
      row_wise_renorm=True,
      custom_dist="cosine")


# Module-level instances for reference-style imports. NOTE: AutoTune carries
# search-state; prefer the factories when running many predicts.
icassp2018_clusterer = make_icassp2018_clusterer()
turntodiarize_clusterer = make_turntodiarize_clusterer()
