"""AHC unit tests: numpy vs native C++ backend agreement + edge cases."""

import numpy as np
import pytest

from spectralcluster_tpu import ahc, utils
from spectralcluster_tpu.native import ahc_native


def _dist(n=50, seed=0):
  rng = np.random.RandomState(seed)
  x = rng.randn(n, 6)
  return ahc.cosine_distance_matrix(x)


class TestNativeBackend:

  @pytest.mark.skipif(not ahc_native.available(), reason="no native build")
  @pytest.mark.parametrize("linkage", ["complete", "average", "single"])
  def test_linkage_matches_numpy(self, linkage):
    d = _dist()
    native = ahc_native.nn_chain_linkage(d, linkage)
    # Force the numpy path.
    orig = ahc._native_ok
    ahc._native_ok = lambda: False
    try:
      ref = ahc.nn_chain_linkage(d, linkage)
    finally:
      ahc._native_ok = orig
    np.testing.assert_allclose(native, ref)

  @pytest.mark.skipif(not ahc_native.available(), reason="no native build")
  @pytest.mark.parametrize("cut", [("complete", 5, None), ("average", None, 0.4)])
  def test_labels_match_numpy(self, cut):
    linkage, k, thr = cut
    d = _dist(seed=3)
    native = ahc_native.ahc_labels(d, linkage, k, thr)
    orig = ahc._native_ok
    ahc._native_ok = lambda: False
    try:
      ref = ahc.ahc_labels(d, linkage, k, thr)
    finally:
      ahc._native_ok = orig
    # Raw equality, not just same-partition: both backends first-appearance
    # relabel, so consumers of raw ids (FallbackClusterer, NoDeflicker
    # streaming) behave identically with and without the native build.
    np.testing.assert_equal(native, ref)

  @pytest.mark.skipif(not ahc_native.available(), reason="no native build")
  def test_raw_labels_agree_fuzz(self):
    rng = np.random.RandomState(7)
    for _ in range(25):
      n = rng.randint(2, 30)
      d = ahc.cosine_distance_matrix(rng.randn(n, 5))
      for linkage in ("complete", "average"):
        kw = ({"n_clusters": int(rng.randint(1, n + 1))} if rng.rand() < 0.5
              else {"distance_threshold": float(rng.uniform(0, 2))})
        native = ahc.ahc_labels(d, linkage, **kw)
        orig = ahc._native_ok
        ahc._native_ok = lambda: False
        try:
          ref = ahc.ahc_labels(d, linkage, **kw)
        finally:
          ahc._native_ok = orig
        np.testing.assert_equal(native, ref)


class TestEdges:

  def test_single_point(self):
    np.testing.assert_equal(
        ahc.agglomerative_cluster(np.array([[1.0, 2.0]]), n_clusters=1),
        np.zeros(1))

  def test_bad_args(self):
    with pytest.raises(ValueError):
      ahc.ahc_labels(np.zeros((3, 3)), "complete", None, None)
    with pytest.raises(ValueError):
      ahc.ahc_labels(np.zeros((3, 3)), "complete", 2, 0.5)
    with pytest.raises(ValueError):
      ahc.nn_chain_linkage(np.zeros((3, 3)), "ward")
