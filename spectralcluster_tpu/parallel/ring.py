"""Ring-exchange block-sharded affinity construction.

The clustering-domain analog of ring attention (SURVEY.md §2c): each device
holds a row block of the (N, d) embeddings and computes its (N/P, N) affinity
row-stripe by circulating the embedding blocks around the ring with
``jax.lax.ppermute`` — P-1 hops of the small (N/P, d) block over ICI instead
of an all-gather of the full embedding matrix, overlapping each hop with the
local (N/P, d) x (d, N/P) MXU matmul.

For small d an all-gather is equally fine (GSPMD's choice in
parallel/sharded.py); the ring variant wins when d is large enough that the
full gathered (N, d) replica pressures HBM, and it demonstrates the explicit
collective pattern the rest of the framework gets implicitly from GSPMD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from spectralcluster_tpu.precision import precise


@functools.lru_cache(maxsize=8)
def make_ring_affinity_fn(mesh, axis_name: str = "model"):
  """Compile fn(embeddings (N,d)) -> affinity (N,N), both row-sharded.

  N must be divisible by the mesh axis size.
  """
  p = mesh.shape[axis_name]

  def local_fn(emb_block):
    # emb_block: (N/P, d) — this device's rows. The norm clamp keeps padded
    # all-zero rows finite (their affinity rows/cols are masked by the
    # caller via mask_padding, but NaNs must never be produced at all).
    norms = jnp.linalg.norm(emb_block, axis=1, keepdims=True)
    xn = emb_block / jnp.maximum(norms, 1e-30)
    my_idx = jax.lax.axis_index(axis_name)

    def hop(carry, _):
      circ, src = carry
      # Block currently held came from device `src`; compute its stripe.
      dot = jnp.matmul(xn, circ.T, preferred_element_type=jnp.float32)
      block = (dot + 1.0) * 0.5                      # (N/P, N/P)
      nxt = jax.lax.ppermute(
          circ, axis_name,
          [(i, (i + 1) % p) for i in range(p)])
      return (nxt, (src - 1) % p), (src, block)

    (_, _), (srcs, blocks) = jax.lax.scan(hop, (xn, my_idx), None, length=p)
    # blocks: (P, N/P, N/P) with blocks[k] = stripe vs rows of device srcs[k].
    # Scatter into column order: column block j of the output.
    order = jnp.argsort(srcs)
    blocks = jnp.take(blocks, order, axis=0)          # now indexed by device id
    out = jnp.transpose(blocks, (1, 0, 2)).reshape(
        xn.shape[0], p * xn.shape[0])
    return out

  fn = shard_map(
      local_fn, mesh=mesh,
      in_specs=P(axis_name, None),
      out_specs=P(axis_name, None))
  return jax.jit(precise(fn))


def ring_affinity(embeddings: jnp.ndarray, mesh,
                  axis_name: str = "model") -> jnp.ndarray:
  """Row-sharded cosine affinity via ring ppermute exchange."""
  return make_ring_affinity_fn(mesh, axis_name)(embeddings)
