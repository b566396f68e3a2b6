"""Eigh-split staged executor vs the monolithic jit.

The staged executor exists to bound peak XLA compile memory at large N
(pipeline.spectral_cluster_fixed_k_staged); these tests pin that splitting
the program at the eigh boundary yields identical labels/cluster counts and
eigenvalues equal up to XLA fusion-order float32 noise.
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (re-exec env setup)

import jax
import jax.numpy as jnp

from spectralcluster_tpu import configs, pipeline
from spectralcluster_tpu.precision import precise_jit
from spectralcluster_tpu.types import (ConstraintName, ConstraintOptions,
                                       EigenGapType, EigenSolver,
                                       IntegrationType, LaplacianType,
                                       RefinementName, RefinementOptions,
                                       ThresholdType)


def _embeddings(n=96, d=16, k=3, seed=0):
  rng = np.random.RandomState(seed)
  centers = rng.randn(k, d) * 3
  labels = np.repeat(np.arange(k), n // k)
  return jnp.asarray(
      (centers[labels] + rng.randn(n, d) * 0.3).astype(np.float32))


def _run_both(cfg, x, constraint_matrix=None, n_valid=None):
  key = jax.random.PRNGKey(0)
  mono = precise_jit(
      lambda e, k: pipeline.spectral_cluster_fixed_k(
          e, k, cfg, constraint_matrix=constraint_matrix, n_valid=n_valid))
  got_m = jax.device_get(mono(x, key))
  got_s = jax.device_get(pipeline.spectral_cluster_fixed_k_staged(
      x, key, cfg, constraint_matrix=constraint_matrix, n_valid=n_valid))
  return got_m, got_s


def _assert_same(got_m, got_s):
  labels_m, nc_m, w_m, delta_m = got_m
  labels_s, nc_s, w_s, delta_s = got_s
  np.testing.assert_array_equal(labels_m, labels_s)
  assert int(nc_m) == int(nc_s)
  # Splitting the program changes XLA fusion around the eigh boundary;
  # eigenvalues agree to float32 noise, not bitwise.
  scale = max(np.max(np.abs(w_m)), 1.0)
  np.testing.assert_allclose(w_m, w_s, rtol=1e-3, atol=1e-5 * scale)
  np.testing.assert_allclose(delta_m, delta_s, rtol=1e-3, atol=1e-5)


class TestStagedExecutor:

  def test_icassp2018_rownorm_tail(self):
    cfg = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        min_clusters=2, max_clusters=7)
    _assert_same(*_run_both(cfg, _embeddings()))

  def test_laplacian_ascend(self):
    cfg = pipeline.PipelineConfig(
        refinement_options=RefinementOptions(
            thresholding_type=ThresholdType.Percentile,
            p_percentile=0.9,
            refinement_sequence=(RefinementName.RowWiseThreshold,
                                 RefinementName.Symmetrize)),
        laplacian_type=LaplacianType.GraphCut,
        eigengap_type=EigenGapType.NormalizedDiff,
        min_clusters=1, max_clusters=5, row_wise_renorm=True)
    _assert_same(*_run_both(cfg, _embeddings(seed=1)))

  def test_padded(self):
    x = _embeddings(n=90)
    pad = jnp.zeros((38, x.shape[1]), x.dtype)
    xp = jnp.concatenate([x, pad], axis=0)
    cfg = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        min_clusters=2, max_clusters=7)
    got_m, got_s = _run_both(cfg, xp, n_valid=90)
    _assert_same(got_m, got_s)

  def test_constrained(self):
    n = 96
    cm = np.zeros((n, n), np.float32)
    cm[:4, :4] = 1.0
    cfg = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        constraint_options=ConstraintOptions(
            constraint_name=ConstraintName.AffinityIntegration,
            apply_before_refinement=True,
            integration_type=IntegrationType.Max),
        min_clusters=2, max_clusters=7)
    got_m, got_s = _run_both(cfg, _embeddings(), constraint_matrix=cm)
    _assert_same(got_m, got_s)

  def test_staged_subspace_solver(self):
    # SubspaceIteration runs staged as prep -> top-k middle program ->
    # finish_topk (the N=10240 monolith cold-compiles for minutes through
    # remote-compile tunnels; the split programs are small and cached
    # independently). Must agree with the monolithic subspace jit.
    cfg = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        min_clusters=2, max_clusters=7,
        eigensolver=EigenSolver.SubspaceIteration)
    assert pipeline._staged_applicable(cfg, False)
    _assert_same(*_run_both(cfg, _embeddings()))

  def test_staged_subspace_padded(self):
    x = _embeddings(n=90)
    xp = jnp.concatenate([x, jnp.zeros((38, x.shape[1]), x.dtype)], axis=0)
    cfg = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        min_clusters=2, max_clusters=7,
        eigensolver=EigenSolver.SubspaceIteration)
    got_m, got_s = _run_both(cfg, xp, n_valid=jnp.asarray(90, jnp.int32))
    np.testing.assert_array_equal(got_m[0], got_s[0])
    assert int(got_m[1]) == int(got_s[1])

  def test_staged_subspace_requires_max_clusters(self):
    cfg = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        min_clusters=2, eigensolver=EigenSolver.SubspaceIteration)
    assert not pipeline._staged_applicable(cfg, False)

  def test_clusterer_fast_path_staged_routing(self):
    # With the threshold forced below N, SpectralClusterer.predict's fast
    # path runs through the staged executor and must match the default path.
    from spectralcluster_tpu.clusterer import SpectralClusterer
    x = np.asarray(_embeddings())
    kw = dict(min_clusters=2, max_clusters=7,
              refinement_options=configs.icassp2018_refinement_options())
    labels_default = SpectralClusterer(**kw).predict(x)
    labels_staged = SpectralClusterer(staged_execution_min_n=64,
                                      **kw).predict(x)
    np.testing.assert_array_equal(labels_default, labels_staged)

  def test_applicability(self):
    base = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        max_clusters=7)
    assert pipeline._staged_applicable(base, False)
    assert not pipeline._staged_applicable(
        base.replace(eigensolver=EigenSolver.HostGeneral), False)
    assert not pipeline._staged_applicable(
        base.replace(autotune=pipeline.AutoTuneStatic()), False)


def _turn_fixture(n=120, k=3, d=16, seed=0):
  """Contiguous-speaker fixture with Turn-to-Diarize turn scores:
  speaker changes get cannot-link scores (2.0 > threshold), half the
  within-speaker adjacencies are must-links (score 0)."""
  from spectralcluster_tpu.constraint import ConstraintMatrix
  rng = np.random.RandomState(seed)
  centers = rng.randn(k, d) * 3
  labels = np.repeat(np.arange(k), n // k)
  x = (centers[labels] + rng.randn(n, d) * 0.3).astype(np.float32)
  scores = np.zeros(n)
  for i in range(1, n):
    if labels[i] != labels[i - 1]:
      scores[i] = 2.0
    elif i % 2:
      scores[i] = 0.5
  cm = ConstraintMatrix(scores, threshold=1).compute_diagonals()
  return x, cm, labels


class TestStagedEigEval:
  """eig_topk_staged: the per-candidate staged refine→eig→gap evaluator
  that puts the constrained+autotuned (Turn-to-Diarize) pipeline past the
  monolithic compile wall. Forced on at small N via staged_execution_min_n,
  it must reproduce the default (monolithic/vmapped) path's labels."""

  def test_turntodiarize_staged_sweep_matches_default(self):
    from spectralcluster_tpu import utils
    x, cm, truth = _turn_fixture()
    got_def = configs.make_turntodiarize_clusterer().predict_with_details(
        x, cm)
    staged = configs.make_turntodiarize_clusterer()
    staged.staged_execution_min_n = 64
    got_st = staged.predict_with_details(x, cm)
    np.testing.assert_array_equal(
        utils.enforce_ordered_labels(got_def.labels),
        utils.enforce_ordered_labels(got_st.labels))
    assert got_def.n_clusters == got_st.n_clusters == 3
    assert got_def.best_p_percentile == got_st.best_p_percentile
    np.testing.assert_array_equal(
        utils.enforce_ordered_labels(got_st.labels),
        utils.enforce_ordered_labels(truth))

  def test_turntodiarize_staged_eigh_route(self):
    # Explicit exact solver: the staged sweep's middle stage is a full
    # eigh program (below dc_max_block) instead of subspace iteration.
    from spectralcluster_tpu import utils
    x, cm, _ = _turn_fixture(seed=2)
    base = configs.make_turntodiarize_clusterer()
    base.eigensolver = EigenSolver.Eigh
    got_def = base.predict(x, cm)
    staged = configs.make_turntodiarize_clusterer()
    staged.eigensolver = EigenSolver.Eigh
    staged.staged_execution_min_n = 64
    got_st = staged.predict(x, cm)
    np.testing.assert_array_equal(utils.enforce_ordered_labels(got_def),
                                  utils.enforce_ordered_labels(got_st))

  def test_constrained_no_autotune_staged_eig_stage(self):
    # Constraint (E2CP before refinement) without autotune routes through
    # _eig_stage; forced staged it must match the monolithic result.
    from spectralcluster_tpu import utils
    from spectralcluster_tpu.clusterer import SpectralClusterer
    x, cm, _ = _turn_fixture(seed=3)
    kw = dict(min_clusters=2, max_clusters=7,
              refinement_options=configs.turntodiarize_refinement_options(),
              constraint_options=configs.turntodiarize_constraint_options(),
              laplacian_type=LaplacianType.GraphCut, row_wise_renorm=True)
    got_def = SpectralClusterer(**kw).predict(x, cm)
    staged = SpectralClusterer(**kw)
    staged.staged_execution_min_n = 64
    got_st = staged.predict(x, cm)
    np.testing.assert_array_equal(utils.enforce_ordered_labels(got_def),
                                  utils.enforce_ordered_labels(got_st))

  def test_eig_topk_staged_rejects_general_structure(self):
    cfg = pipeline.PipelineConfig(
        refinement_options=configs.icassp2018_refinement_options(),
        max_clusters=7, eigensolver=EigenSolver.HostGeneral)
    with pytest.raises(ValueError):
      pipeline.eig_topk_staged(jnp.eye(128), cfg)
