"""Identify which D&C stage program breaks the remote compile helper at
N=20480 (VERDICT r3 item 2 follow-up: the host-staged sign iteration is in
and its programs compile — the SIGKILL persists, so the hog is a later
stage). Compiles each candidate program in isolation with random input.

Usage: python benchmarks/probe_dc20480_stages.py [stage ...]
Stages: sign_finish project_block complement eigh back_transform verify merge
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from spectralcluster_tpu.ops import dc  # noqa: E402

N = 20480
K_PAD = 128
T = 8


def run(name, fn):
  t0 = time.time()
  try:
    out = fn()
    jax.block_until_ready(out)
    print(f"# {name}: OK in {time.time() - t0:.1f}s", flush=True)
  except Exception as e:  # noqa: BLE001 - probing failure modes
    print(f"# {name}: FAILED after {time.time() - t0:.1f}s: "
          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    traceback.print_exc()


def main(stages):
  rng = np.random.RandomState(0)
  u = jnp.asarray(rng.randn(N, N).astype(np.float32)) / N  # stand-in sign
  probes = {
      "sign_finish": lambda: dc._sign_finish_jit(N, True, False)(u),
      "complement": lambda: dc._complement_jit(N, False)(0.5 * (u + u.T)),
      "project_block": lambda: dc._project_block_jit(N, K_PAD, True)(
          u, u, K_PAD - 8, jax.random.PRNGKey(0)),
      "eigh": lambda: dc._eigh_jit(K_PAD)(
          jnp.eye(K_PAD) + 0.01 * jnp.asarray(
              rng.randn(K_PAD, K_PAD).astype(np.float32))),
      "back_transform": lambda: dc._back_transform_jit(N, K_PAD, T, True)(
          jnp.ones((K_PAD,), jnp.float32),
          jnp.eye(K_PAD, dtype=jnp.float32),
          u[:, :K_PAD], u[:, :K_PAD], jnp.float32(1.0)),
      "verify": lambda: dc._verify_select_jit(N, K_PAD, T + 8, T, True)(
          0.5 * (u + u.T), u[:, :K_PAD],
          jnp.ones((T + 8,), jnp.float32),
          jnp.eye(K_PAD, T + 8, dtype=jnp.float32), jnp.float32(1.0)),
      "merge": lambda: dc._merge_dedup_jit(N, T, T, T + 4, True)(
          jnp.ones((T,), jnp.float32), jnp.ones((T + 4,), jnp.float32),
          u[:, :T], u[:, :T + 4]),
  }
  for name in (stages or list(probes)):
    run(name, probes[name])


if __name__ == "__main__":
  main(sys.argv[1:])
