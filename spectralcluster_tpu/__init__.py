"""spectralcluster_tpu — a TPU-native speaker-diarization clustering framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
wq2012/SpectralCluster (see SURVEY.md): spectral clustering with refinement
operations, constrained clustering (Turn-to-Diarize), auto-tune, fallback and
naive clusterers, and multi-stage streaming clustering — plus TPU-first
additions: compiled fused pipelines, batched/sharded execution over device
meshes, and explicit-PRNG determinism.

Public surface mirrors reference __init__.py:14-43.
"""

from spectralcluster_tpu import configs
from spectralcluster_tpu.ahc import agglomerative_cluster
from spectralcluster_tpu.autotune import AutoTune
from spectralcluster_tpu.clusterer import SpectralClusterer
from spectralcluster_tpu.constraint import ConstraintMatrix
from spectralcluster_tpu.fallback import (FallbackClusterer, NaiveClusterer,
                                           check_single_cluster)
from spectralcluster_tpu.ops.kmeans import CustomKMeans, run_kmeans
from spectralcluster_tpu.pipeline import (PipelineConfig,
                                          spectral_cluster_fixed_k,
                                          spectral_cluster_fixed_k_staged)
from spectralcluster_tpu.streaming import MultiStageClusterer, match_labels
from spectralcluster_tpu.types import (AutoTuneProxy, ClusterResult,
                                       ConstraintName, ConstraintOptions,
                                       Deflicker, EigenGapType, EigenSolver,
                                       FallbackClustererType, FallbackOptions,
                                       IntegrationType, LaplacianType,
                                       RefinementName, RefinementOptions,
                                       SingleClusterCondition, SymmetrizeType,
                                       ThresholdType)
from spectralcluster_tpu.utils import (chain_labels, enforce_ordered_labels,
                                       get_cluster_centroids)

ICASSP2018_REFINEMENT_SEQUENCE = configs.ICASSP2018_REFINEMENT_SEQUENCE
TURNTODIARIZE_REFINEMENT_SEQUENCE = configs.TURNTODIARIZE_REFINEMENT_SEQUENCE

__version__ = "0.1.0"

__all__ = [
    "AutoTune", "AutoTuneProxy", "ClusterResult", "ConstraintMatrix",
    "ConstraintName", "ConstraintOptions", "Deflicker", "EigenGapType",
    "EigenSolver", "FallbackClusterer", "FallbackClustererType",
    "FallbackOptions", "IntegrationType", "LaplacianType",
    "MultiStageClusterer", "NaiveClusterer", "PipelineConfig",
    "RefinementName", "RefinementOptions", "SingleClusterCondition",
    "SpectralClusterer", "SymmetrizeType", "ThresholdType",
    "CustomKMeans", "agglomerative_cluster", "chain_labels",
    "check_single_cluster", "configs", "run_kmeans",
    "enforce_ordered_labels", "get_cluster_centroids", "match_labels",
    "spectral_cluster_fixed_k",
    "spectral_cluster_fixed_k_staged",
    "ICASSP2018_REFINEMENT_SEQUENCE", "TURNTODIARIZE_REFINEMENT_SEQUENCE",
]
