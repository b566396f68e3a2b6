"""Step through the D&C kept-side stages at N=20480 on the real operand.

The deflated remainder certifies cleanly (res2=3.7e-6) but the kept-side
pair fails verification (res1=inf) — this isolates where the kept-side
basis degrades: sign projector -> project_block capture -> back-transform.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from spectralcluster_tpu import configs, pipeline
from spectralcluster_tpu.ops import dc
from spectralcluster_tpu.types import EigenSolver

N, D = 20480, 256


def main():
  rng = np.random.RandomState(0)
  centers = rng.randn(2, D) * 3
  true = np.repeat(np.arange(2), N // 2)
  x = jnp.asarray(
      (centers[true] + rng.randn(N, D) * 0.4).astype(np.float32))
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=EigenSolver.Auto)
  prep_jit, _, _, _ = pipeline._staged_jits(cfg, False, False)
  t0 = time.time()
  m, scale = prep_jit(x)
  m = jax.block_until_ready(m)
  print(f"prep: {time.time()-t0:.1f}s", flush=True)

  t0 = time.time()
  p, k_f, b_f, sigma, alpha, norm2 = dc._sign_project(m, None, N, True, False)
  k_f, b_f, sigma, alpha, norm2 = map(
      float, jax.device_get((k_f, b_f, sigma, alpha, norm2)))
  print(f"sign_project: {time.time()-t0:.1f}s k_f={k_f} b_f={b_f} "
        f"sigma={sigma:.4e} alpha={alpha:.4e} norm2={norm2:.4e}", flush=True)

  # Projector health: P^2 ~ P and column norms of P@g.
  @jax.jit
  def p_health(p, key):
    g = jax.random.normal(key, (N, 16), p.dtype)
    pg = jnp.matmul(p, g, preferred_element_type=jnp.float32)
    ppg = jnp.matmul(p, pg, preferred_element_type=jnp.float32)
    idem = jnp.linalg.norm(ppg - pg) / jnp.maximum(jnp.linalg.norm(pg), 1e-30)
    return idem, jnp.linalg.norm(pg, axis=0)

  idem, pgn = jax.device_get(p_health(p, jax.random.PRNGKey(5)))
  print(f"P idempotency err={idem:.3e} |P g| col norms={np.round(pgn, 4)}",
        flush=True)

  k_cover, k_pad = 11, 128
  t0 = time.time()
  q, mq, a1, k_eff = dc._project_block_jit(N, k_pad, True)(
      m, p, k_cover, jax.random.PRNGKey(0))
  k_eff = int(jax.device_get(k_eff))
  qn = np.asarray(jax.device_get(jnp.linalg.norm(q, axis=0)))
  print(f"project_block: {time.time()-t0:.1f}s k_eff={k_eff} "
        f"q col norms[:16]={np.round(qn[:16], 5)}", flush=True)
  a1h = np.asarray(jax.device_get(a1))
  print(f"a1 diag[:6]={np.round(np.diag(a1h)[:6], 3)} "
        f"a1 finite={np.isfinite(a1h).all()}", flush=True)

  w1, u1 = dc._eigh_jit(k_pad)(a1)
  wt, vt, res = dc._back_transform_jit(N, k_pad, 2, True)(
      w1, u1, q, mq, jnp.float32(abs(sigma) + norm2))
  wt, res = jax.device_get(wt), float(jax.device_get(res))
  vtn = np.asarray(jax.device_get(jnp.linalg.norm(vt, axis=0)))
  print(f"back_transform: wt={np.asarray(wt)} vnorm={np.round(vtn, 4)} "
        f"res={res:.3e}", flush=True)
  w1h = np.asarray(jax.device_get(w1))
  print(f"block eigs top6: {np.round(np.sort(w1h)[::-1][:6], 4)}", flush=True)


if __name__ == "__main__":
  main()
