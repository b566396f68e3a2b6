"""Affinity matrix construction and pairwise distance kernels.

TPU-first design: everything here is a pure function over ``jnp`` arrays,
jit/vmap-compatible with static shapes. The hot op — cosine affinity — is one
row-normalization fused into a single (N,d)x(d,N) matmul that XLA tiles onto
the MXU. Masking (for padded batch entries) is handled by the caller.

Reference behavior being matched: utils.py:20-41 (compute_affinity_matrix),
custom_distance_kmeans.py:123-125 (scipy cdist metrics used by K-Means).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp


def compute_affinity_matrix(embeddings: jnp.ndarray) -> jnp.ndarray:
  """Cosine affinity in [0, 1]: ((x·y)/(|x||y|) + 1) / 2.

  Matches reference utils.py:20-41. Input (N, d) -> output (N, N).
  """
  norms = jnp.linalg.norm(embeddings, axis=1, keepdims=True)
  normalized = embeddings / norms
  cosine = jnp.matmul(normalized, normalized.T,
                      preferred_element_type=jnp.float32)
  return (cosine + 1.0) / 2.0


# ---------------------------------------------------------------------------
# Pairwise distance kernels (the scipy.spatial.distance.cdist replacement).
# Each fn maps (N, d), (K, d) -> (N, K). All are batched MXU/VPU-friendly.
# ---------------------------------------------------------------------------


def _dot_products(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  return jnp.matmul(x, y.T, preferred_element_type=jnp.float32)


def cdist_cosine(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  xn = jnp.linalg.norm(x, axis=1, keepdims=True)
  yn = jnp.linalg.norm(y, axis=1, keepdims=True)
  return 1.0 - _dot_products(x, y) / (xn * yn.T)


def cdist_sqeuclidean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  x2 = jnp.sum(x * x, axis=1, keepdims=True)
  y2 = jnp.sum(y * y, axis=1, keepdims=True)
  d2 = x2 + y2.T - 2.0 * _dot_products(x, y)
  return jnp.maximum(d2, 0.0)


def cdist_euclidean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  return jnp.sqrt(cdist_sqeuclidean(x, y))


def cdist_cityblock(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  return jnp.sum(jnp.abs(x[:, None, :] - y[None, :, :]), axis=-1)


def cdist_chebyshev(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  return jnp.max(jnp.abs(x[:, None, :] - y[None, :, :]), axis=-1)


def cdist_correlation(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  xc = x - jnp.mean(x, axis=1, keepdims=True)
  yc = y - jnp.mean(y, axis=1, keepdims=True)
  return cdist_cosine(xc, yc)


def cdist_braycurtis(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  diff = jnp.sum(jnp.abs(x[:, None, :] - y[None, :, :]), axis=-1)
  summ = jnp.sum(jnp.abs(x[:, None, :] + y[None, :, :]), axis=-1)
  return diff / summ


def cdist_canberra(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
  num = jnp.abs(x[:, None, :] - y[None, :, :])
  den = jnp.abs(x)[:, None, :] + jnp.abs(y)[None, :, :]
  # scipy convention: terms with 0/0 contribute 0.
  terms = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
  return jnp.sum(terms, axis=-1)


def cdist_mahalanobis(x: jnp.ndarray, y: jnp.ndarray,
                      vi: typing.Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Mahalanobis distance.

  When ``vi`` (inverse covariance) is None we follow scipy's cdist default:
  VI = inv(cov(vstack([XA, XB]).T)) (custom_distance_kmeans.py:123-125 relies
  on this default when metric="mahalanobis").
  """
  if vi is None:
    stacked = jnp.concatenate([x, y], axis=0)
    cov = jnp.cov(stacked.T)
    cov = jnp.atleast_2d(cov)
    vi = jnp.linalg.inv(cov)
  diff = x[:, None, :] - y[None, :, :]           # (N, K, d)
  m = jnp.einsum("nkd,de,nke->nk", diff, vi, diff)
  return jnp.sqrt(jnp.maximum(m, 0.0))


def cdist_minkowski(x: jnp.ndarray, y: jnp.ndarray, p: float = 2.0):
  diff = jnp.abs(x[:, None, :] - y[None, :, :])
  return jnp.sum(diff ** p, axis=-1) ** (1.0 / p)


_DISTANCE_REGISTRY = {
    "cosine": cdist_cosine,
    "euclidean": cdist_euclidean,
    "sqeuclidean": cdist_sqeuclidean,
    "cityblock": cdist_cityblock,
    "manhattan": cdist_cityblock,
    "chebyshev": cdist_chebyshev,
    "correlation": cdist_correlation,
    "braycurtis": cdist_braycurtis,
    "canberra": cdist_canberra,
    "mahalanobis": cdist_mahalanobis,
    "minkowski": cdist_minkowski,
}


def supported_distances() -> typing.Tuple[str, ...]:
  return tuple(sorted(_DISTANCE_REGISTRY))


def get_distance_fn(
    custom_dist: typing.Union[str, typing.Callable],
) -> typing.Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
  """Resolve a distance spec to a batched (N,d),(K,d)->(N,K) JAX function.

  Accepts the metric-name strings of scipy.spatial.distance used by the
  reference (custom_distance_kmeans.py:13-16) or a callable
  ``f(u, v) -> float`` over single vectors, which is vmapped to a full
  pairwise kernel.
  """
  if callable(custom_dist):
    pair = custom_dist
    return jax.vmap(jax.vmap(pair, in_axes=(None, 0)), in_axes=(0, None))
  if isinstance(custom_dist, str):
    key = custom_dist.lower()
    if key in _DISTANCE_REGISTRY:
      return _DISTANCE_REGISTRY[key]
    raise ValueError(
        f"Unsupported distance {custom_dist!r}; supported: "
        f"{supported_distances()} or a callable f(u, v) -> float.")
  raise TypeError("custom_dist must be a string or callable")
