"""Tests for SpectralClusterer. Mirrors reference
tests/spectral_clusterer_test.py fixtures and expected labels.
"""

import numpy as np
import pytest

from spectralcluster_tpu import utils
from spectralcluster_tpu.autotune import AutoTune
from spectralcluster_tpu.clusterer import SpectralClusterer
from spectralcluster_tpu.configs import ICASSP2018_REFINEMENT_SEQUENCE
from spectralcluster_tpu.types import (AutoTuneProxy, EigenGapType,
                                       RefinementName,
                                       FallbackOptions, LaplacianType,
                                       RefinementOptions, SingleClusterCondition,
                                       ThresholdType)

MATRIX_6x2 = np.array([
    [1.0, 0.0],
    [1.1, 0.1],
    [0.0, 1.0],
    [0.1, 1.0],
    [0.9, -0.1],
    [0.0, 1.2],
])
EXPECTED_6x2 = np.array([0, 0, 1, 1, 0, 1])


def _block_matrix():
  matrix = np.array([[1.0, 0, 0, 0, 0, 0]] * 400 + [[0, 1.0, 0, 0, 0, 0]] * 300
                    + [[0, 0, 2.0, 0, 0, 0]] * 200 +
                    [[0, 0, 0, 1.0, 0, 0]] * 100)
  # Unseeded noise, as in the reference tests (margin-based robustness).
  noisy = np.random.rand(1000, 6) * 2 - 1
  return matrix + noisy * 0.1


EXPECTED_1000 = np.array([0] * 400 + [1] * 300 + [2] * 200 + [3] * 100)


def _refinement_options(p_percentile=0.95, gaussian_blur_sigma=0):
  return RefinementOptions(
      gaussian_blur_sigma=gaussian_blur_sigma,
      p_percentile=p_percentile,
      refinement_sequence=ICASSP2018_REFINEMENT_SEQUENCE)


class TestSpectralClusterer:

  def test_6by2_matrix(self):
    clusterer = SpectralClusterer(
        refinement_options=_refinement_options())
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_1000by6_matrix(self):
    clusterer = SpectralClusterer(
        refinement_options=_refinement_options(p_percentile=0.2),
        stop_eigenvalue=0.01)
    labels = utils.enforce_ordered_labels(clusterer.predict(_block_matrix()))
    np.testing.assert_equal(EXPECTED_1000, labels)

  def test_1000by6_matrix_reduce_dimension(self):
    clusterer = SpectralClusterer(
        refinement_options=_refinement_options(p_percentile=0.2),
        stop_eigenvalue=0.01,
        max_spectral_size=100)
    labels = utils.enforce_ordered_labels(clusterer.predict(_block_matrix()))
    np.testing.assert_equal(EXPECTED_1000, labels)

  def test_6by2_matrix_eigengap_normalizeddiff(self):
    clusterer = SpectralClusterer(
        refinement_options=_refinement_options(),
        eigengap_type=EigenGapType.NormalizedDiff)
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_6by2_matrix_normalized_laplacian(self):
    clusterer = SpectralClusterer(
        min_clusters=2,
        refinement_options=_refinement_options(),
        laplacian_type=LaplacianType.GraphCut,
        row_wise_renorm=True)
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_6by2_matrix_random_walk_laplacian(self):
    clusterer = SpectralClusterer(
        min_clusters=2,
        refinement_options=_refinement_options(),
        laplacian_type=LaplacianType.RandomWalk,
        row_wise_renorm=True)
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_6by2_matrix_unnormalized_laplacian(self):
    clusterer = SpectralClusterer(
        min_clusters=2,
        refinement_options=_refinement_options(),
        laplacian_type=LaplacianType.Unnormalized,
        row_wise_renorm=True)
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_min_max_clusters_fixed(self):
    # min_clusters == max_clusters pins the number of clusters.
    clusterer = SpectralClusterer(
        min_clusters=2, max_clusters=2,
        refinement_options=_refinement_options())
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_6by2_matrix_auto_tune(self):
    refinement_options = RefinementOptions(
        thresholding_type=ThresholdType.Percentile,
        refinement_sequence=(RefinementName.RowWiseThreshold,))
    at = AutoTune(p_percentile_min=0.60, p_percentile_max=0.95,
                  init_search_step=0.05, search_level=1)
    clusterer = SpectralClusterer(
        max_clusters=2,
        refinement_options=refinement_options,
        autotune=at,
        laplacian_type=LaplacianType.GraphCut,
        row_wise_renorm=True)
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_2by2_matrix_auto_tune(self):
    matrix = np.array([[1.0, 0.0], [0.0, 1.0]])
    refinement_options = RefinementOptions(
        thresholding_type=ThresholdType.Percentile,
        refinement_sequence=(RefinementName.RowWiseThreshold,))
    at = AutoTune(p_percentile_min=0.60, p_percentile_max=0.95,
                  init_search_step=0.05, search_level=1,
                  proxy=AutoTuneProxy.PercentileOverNME)
    clusterer = SpectralClusterer(
        max_clusters=2,
        refinement_options=refinement_options,
        autotune=at,
        fallback_options=FallbackOptions(spectral_min_embeddings=3),
        laplacian_type=LaplacianType.GraphCut,
        row_wise_renorm=True)
    labels = utils.enforce_ordered_labels(clusterer.predict(matrix))
    np.testing.assert_equal(np.array([0, 1]), labels)

  def test_1000by6_matrix_auto_tune(self):
    refinement_options = RefinementOptions(
        thresholding_type=ThresholdType.Percentile,
        refinement_sequence=(RefinementName.RowWiseThreshold,))
    at = AutoTune(p_percentile_min=0.9, p_percentile_max=0.95,
                  init_search_step=0.03, search_level=1)
    clusterer = SpectralClusterer(
        max_clusters=4,
        refinement_options=refinement_options,
        autotune=at,
        laplacian_type=LaplacianType.GraphCut,
        row_wise_renorm=True)
    labels = utils.enforce_ordered_labels(clusterer.predict(_block_matrix()))
    np.testing.assert_equal(EXPECTED_1000, labels)

  def test_autotune_requires_threshold(self):
    refinement_options = RefinementOptions(refinement_sequence=())
    clusterer = SpectralClusterer(
        refinement_options=refinement_options, autotune=AutoTune())
    with pytest.raises(ValueError):
      clusterer.predict(MATRIX_6x2)

  def test_single_cluster_all_affinity(self):
    tight = np.array([[1.0, 0.0], [1.0, 0.05], [0.99, -0.02], [1.02, 0.01]])
    clusterer = SpectralClusterer(
        min_clusters=1,
        refinement_options=_refinement_options(),
        fallback_options=FallbackOptions(
            single_cluster_condition=SingleClusterCondition.AllAffinity,
            single_cluster_affinity_threshold=0.75))
    labels = clusterer.predict(tight)
    np.testing.assert_equal(np.zeros(4), labels)

  def test_fallback_spectral_min_embeddings(self):
    clusterer = SpectralClusterer(
        refinement_options=_refinement_options(),
        fallback_options=FallbackOptions(spectral_min_embeddings=10))
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_input_validation(self):
    clusterer = SpectralClusterer(refinement_options=_refinement_options())
    with pytest.raises(TypeError):
      clusterer.predict([[1.0, 2.0]])
    with pytest.raises(ValueError):
      clusterer.predict(np.zeros(5))

  def test_max_spectral_size_with_constraint_raises(self):
    clusterer = SpectralClusterer(
        refinement_options=_refinement_options(), max_spectral_size=4)
    with pytest.raises(RuntimeError):
      clusterer.predict(MATRIX_6x2, constraint_matrix=np.eye(6))

  def test_max_spectral_size_too_small_raises(self):
    clusterer = SpectralClusterer(
        min_clusters=4,
        refinement_options=_refinement_options(), max_spectral_size=4)
    with pytest.raises(ValueError):
      clusterer.predict(np.random.rand(10, 4))

  def test_custom_affinity_function(self):
    def affinity_fn(embeddings):
      x = np.asarray(embeddings, dtype=np.float64)
      x = x / np.linalg.norm(x, axis=1, keepdims=True)
      return ((x @ x.T) + 1.0) / 2.0

    clusterer = SpectralClusterer(
        refinement_options=_refinement_options(),
        affinity_function=affinity_fn)
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)

  def test_custom_post_eigen_cluster_function(self):
    calls = {}

    def post_fn(spectral_embeddings, n_clusters, custom_dist, max_iter):
      calls["n_clusters"] = n_clusters
      from spectralcluster_tpu.ops import kmeans
      return kmeans.run_kmeans(spectral_embeddings, n_clusters, custom_dist,
                               max_iter)

    clusterer = SpectralClusterer(
        refinement_options=_refinement_options(),
        post_eigen_cluster_function=post_fn)
    labels = utils.enforce_ordered_labels(clusterer.predict(MATRIX_6x2))
    np.testing.assert_equal(EXPECTED_6x2, labels)
    assert calls["n_clusters"] == 2


class TestSubspaceEigensolver:
  """EigenSolver.SubspaceIteration: top-k O(N²k) path matches full eigh."""

  def test_matches_full_eigh_labels(self):
    from spectralcluster_tpu.types import EigenSolver
    rng = np.random.RandomState(0)
    centers = np.eye(3, 16) * 4
    true = np.repeat(np.arange(3), 40)
    x = centers[true] + rng.randn(120, 16) * 0.2
    kwargs = dict(min_clusters=2, max_clusters=7,
                  refinement_options=_refinement_options())
    full = SpectralClusterer(**kwargs)
    sub = SpectralClusterer(eigensolver=EigenSolver.SubspaceIteration,
                            **kwargs)
    np.testing.assert_equal(
        utils.enforce_ordered_labels(full.predict(x)),
        utils.enforce_ordered_labels(sub.predict(x)))

  def test_laplacian_path(self):
    from spectralcluster_tpu.types import EigenSolver
    rng = np.random.RandomState(1)
    centers = np.eye(2, 8) * 4
    true = np.repeat(np.arange(2), 30)
    x = centers[true] + rng.randn(60, 8) * 0.2
    # Symmetric refinement output (threshold+symmetrize) — the rownorm-tail
    # sequence plus a Laplacian is a general-eig case that SubspaceIteration
    # correctly refuses.
    sub = SpectralClusterer(
        min_clusters=2, max_clusters=4,
        refinement_options=RefinementOptions(
            thresholding_type=ThresholdType.Percentile,
            p_percentile=0.7,
            refinement_sequence=(RefinementName.RowWiseThreshold,
                                 RefinementName.Symmetrize)),
        laplacian_type=LaplacianType.GraphCut,
        row_wise_renorm=True,
        eigensolver=EigenSolver.SubspaceIteration)
    labels = utils.enforce_ordered_labels(sub.predict(x))
    np.testing.assert_equal(utils.enforce_ordered_labels(true), labels)

  def test_requires_max_clusters(self):
    from spectralcluster_tpu.types import EigenSolver
    c = SpectralClusterer(refinement_options=_refinement_options(),
                          eigensolver=EigenSolver.SubspaceIteration)
    with pytest.raises(ValueError):
      c.predict(MATRIX_6x2)


class TestAsymmetricConstraint:
  """An asymmetric user constraint matrix must route to the general
  eigensolver (eigh reads one triangle and would silently mis-cluster)."""

  @staticmethod
  def _data():
    rng = np.random.RandomState(1)
    centers = rng.randn(2, 16) * 3
    emb = centers[np.repeat(np.arange(2), 12)] + rng.randn(24, 16) * 0.3
    cm = rng.randn(24, 24) * 0.2
    return emb, cm

  @pytest.mark.parametrize("apply_before", [True, False])
  def test_matches_reference(self, apply_before):
    import sys
    sys.path.insert(0, "/root/reference")
    try:
      import spectralcluster as ref
    finally:
      sys.path.pop(0)
    from spectralcluster_tpu.types import (ConstraintName, ConstraintOptions)
    emb, cm = self._data()
    ref_clusterer = ref.SpectralClusterer(
        min_clusters=2, max_clusters=4,
        refinement_options=ref.RefinementOptions(
            p_percentile=0.7,
            refinement_sequence=[ref.RefinementName.RowWiseThreshold]),
        constraint_options=ref.ConstraintOptions(
            constraint_name=ref.ConstraintName.ConstraintPropagation,
            apply_before_refinement=apply_before,
            constraint_propagation_alpha=0.4))
    expected = utils.enforce_ordered_labels(ref_clusterer.predict(emb, cm))
    ours = SpectralClusterer(
        min_clusters=2, max_clusters=4,
        refinement_options=RefinementOptions(
            p_percentile=0.7,
            refinement_sequence=(RefinementName.RowWiseThreshold,)),
        constraint_options=ConstraintOptions(
            constraint_name=ConstraintName.ConstraintPropagation,
            apply_before_refinement=apply_before,
            constraint_propagation_alpha=0.4))
    np.testing.assert_equal(
        expected, utils.enforce_ordered_labels(ours.predict(emb, cm)))

  def test_shape_mismatch_raises(self):
    emb, cm = self._data()
    c = SpectralClusterer(refinement_options=_refinement_options())
    with pytest.raises(ValueError, match="square matrix matching"):
      c.predict(emb, cm[:-1, :-1])

  def test_tpu_solver_rejects_asymmetric(self):
    from spectralcluster_tpu.types import (ConstraintName, ConstraintOptions,
                                           EigenSolver)
    emb, cm = self._data()
    c = SpectralClusterer(
        min_clusters=2, max_clusters=4,
        refinement_options=_refinement_options(),
        constraint_options=ConstraintOptions(
            constraint_name=ConstraintName.ConstraintPropagation,
            apply_before_refinement=True),
        eigensolver=EigenSolver.Eigh)
    with pytest.raises(ValueError, match="symmetric constraint"):
      c.predict(emb, cm)

  def test_white_box_path_routes_asymmetric(self):
    # The direct _compute_eigenvectors_ncluster path must apply the same
    # host-side symmetry routing as predict() (round-1 advisor finding):
    # an asymmetric constraint with the default cfg must not silently feed
    # eigh a one-triangle view.
    import sys
    sys.path.insert(0, "/root/reference")
    try:
      import spectralcluster as ref
    finally:
      sys.path.pop(0)
    from spectralcluster_tpu.types import (ConstraintName, ConstraintOptions,
                                           EigenSolver)
    emb, cm = self._data()
    from spectralcluster_tpu.ops import affinity as affinity_ops
    import jax.numpy as jnp
    aff = np.asarray(affinity_ops.compute_affinity_matrix(
        jnp.asarray(emb, jnp.float32)))

    copts = ConstraintOptions(
        constraint_name=ConstraintName.ConstraintPropagation,
        apply_before_refinement=False, constraint_propagation_alpha=0.4)
    ours = SpectralClusterer(
        min_clusters=2, max_clusters=4,
        refinement_options=RefinementOptions(
            p_percentile=0.7,
            refinement_sequence=(RefinementName.RowWiseThreshold,
                                 RefinementName.Symmetrize)),
        constraint_options=copts)
    theirs = ref.SpectralClusterer(
        min_clusters=2, max_clusters=4,
        refinement_options=ref.RefinementOptions(
            p_percentile=0.7,
            refinement_sequence=[ref.RefinementName.RowWiseThreshold,
                                 ref.RefinementName.Symmetrize]),
        constraint_options=ref.ConstraintOptions(
            constraint_name=ref.ConstraintName.ConstraintPropagation,
            apply_before_refinement=False,
            constraint_propagation_alpha=0.4))
    _, n_ref, d_ref = theirs._compute_eigenvectors_ncluster(aff.copy(), cm)
    _, n_ours, d_ours = ours._compute_eigenvectors_ncluster(aff, cm)
    assert n_ours == n_ref
    np.testing.assert_allclose(d_ours, d_ref, rtol=5e-3)
    # And the TPU-only solvers still refuse the asymmetric constraint here.
    strict = SpectralClusterer(
        min_clusters=2, max_clusters=4,
        refinement_options=_refinement_options(),
        constraint_options=copts, eigensolver=EigenSolver.Eigh)
    with pytest.raises(ValueError, match="symmetric constraint"):
      strict._compute_eigenvectors_ncluster(aff, cm)
