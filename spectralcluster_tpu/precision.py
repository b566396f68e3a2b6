"""Matmul-precision control.

On TPU, float32 matmuls default to bfloat16 MXU passes — fine for neural-net
training, fatal for spectral clustering: the affinity matrix loses ~3 decimal
digits, Diffuse compounds it, and the eigengap scan then sees noise (observed:
completely different cluster counts vs CPU). Every compiled entry point wraps
its trace in ``jax.default_matmul_precision("highest")`` (6-pass bf16 ==
full f32) via this decorator. Hot paths that can tolerate lower precision
(e.g. benchmark-mode affinity) opt out explicitly.
"""

from __future__ import annotations

import functools

import jax


def precise(fn):
  """Trace ``fn`` under full-float32 matmul precision."""

  @functools.wraps(fn)
  def wrapped(*args, **kwargs):
    with jax.default_matmul_precision("highest"):
      return fn(*args, **kwargs)

  return wrapped


def precise_jit(fn, **jit_kwargs):
  return jax.jit(precise(fn), **jit_kwargs)
