"""Distributed sanitizer equivalents (SURVEY.md §5 "race detection").

A single-process NumPy library has nothing to race (the reference's only
static gate is pytype). The TPU build's failure modes live elsewhere: a
mis-sharded input silently replicating different values per device, a
collective executed in different orders across participants, or
nondeterministic compilation producing device-dependent results. These
checks make those failure modes loud:

  * ``check_replica_consistency`` — asserts that every device on the mesh
    holds bitwise-identical values for a nominally replicated array, via an
    all_gather over both axes and an on-device comparison. Catches
    mis-sharded "replicated" operands and cross-device nondeterminism (the
    TPU analog of a data race).
  * ``check_deterministic`` — runs a function twice on identical inputs and
    asserts bitwise-equal outputs; jit-compiled XLA programs must be
    deterministic on TPU, so any mismatch indicates unsafe host callbacks,
    stateful primitives, or cross-device reduction-order leakage.

Use in tests and as guardrails around new sharded paths; both are cheap
relative to any real clustering step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P


def check_replica_consistency(mesh, value) -> None:
  """Assert every device holds the same bits of a replicated ``value``.

  Raises AssertionError with the worst absolute deviation if any device's
  copy differs — the symptom of feeding a sharded array where a replicated
  one is assumed, or of device-dependent compilation.
  """
  value = jnp.asarray(value)
  flat = value.reshape(-1).astype(jnp.float32)

  def per_device(x):
    # x is this device's full copy (replicated spec): gather every device's
    # copy along both mesh axes, compare to the local one, and pmax the
    # worst deviation so the output is provably replicated.
    gathered = jax.lax.all_gather(x, "batch")
    gathered = jax.lax.all_gather(gathered, "model")
    dev = jnp.max(jnp.abs(gathered - x[None, None, :]))
    return jax.lax.pmax(dev, ("batch", "model"))

  fn = shard_map(per_device, mesh=mesh, in_specs=P(), out_specs=P())
  worst = float(np.asarray(jax.jit(fn)(flat)))
  assert worst == 0.0, (
      f"replica consistency violated: max cross-device deviation {worst:g} "
      "(a nominally replicated value differs between devices)")


def check_deterministic(fn, *args, runs: int = 2) -> None:
  """Assert ``fn(*args)`` is bitwise reproducible across ``runs`` calls."""
  ref = jax.device_get(fn(*args))
  ref_leaves = jax.tree_util.tree_leaves(ref)
  for _ in range(runs - 1):
    again = jax.device_get(fn(*args))
    for a, b in zip(ref_leaves, jax.tree_util.tree_leaves(again)):
      if not np.array_equal(np.asarray(a), np.asarray(b)):
        raise AssertionError(
            "nondeterministic output: identical inputs produced different "
            "bits across runs (unsafe host callback, stateful primitive, "
            "or reduction-order leakage)")
