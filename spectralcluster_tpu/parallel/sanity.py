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

  * ``debug_nans`` — a context manager enabling JAX's NaN/Inf trap
    (``jax_debug_nans``) so the first non-finite intermediate raises with a
    traceback instead of silently poisoning downstream eigengaps (the float32
    analog of running under a sanitizer; SURVEY.md §5 proposed exactly this
    as the test-mode gate).
  * ``check_ring_order`` — asserts the ``ppermute`` ring over a mesh axis
    moves data in the logical order the ring-affinity path
    (parallel/ring.py) assumes: one hop lands shard i on device i+1 (mod P)
    and P hops round-trip bitwise. In multi-controller runs a mesh built
    over differently-ordered device lists per process mispairs collective
    participants — this probe makes that loud before any real data moves.

Use in tests and as guardrails around new sharded paths; all are cheap
relative to any real clustering step.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
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


@contextlib.contextmanager
def debug_nans(enable: bool = True):
  """Trap the first NaN/Inf produced by any jitted computation.

  Wraps ``jax.config.jax_debug_nans``: under the trap, XLA outputs are
  checked and the offending primitive re-run eagerly to raise a
  ``FloatingPointError`` with a real traceback. Use around test bodies and
  debugging sessions only — the per-call output checks defeat async
  dispatch, so never enable on a latency path.
  """
  old = jax.config.jax_debug_nans
  jax.config.update("jax_debug_nans", enable)
  try:
    yield
  finally:
    jax.config.update("jax_debug_nans", old)


def check_ring_order(mesh, axis_name: str = "model") -> None:
  """Assert the ppermute ring over ``axis_name`` is ordered as assumed.

  Probes with a one-element-per-device iota: after ONE forward hop device j
  must hold value (j-1) mod P, and after P hops every value must be home
  bitwise. The ring-affinity kernel (parallel/ring.py) credits block
  ``(step, my_index)`` arithmetic on exactly this ordering; a mesh whose
  device list is permuted differently on another process (the
  multi-controller collective-order hazard) breaks it silently.
  """
  p = int(mesh.shape[axis_name])
  perm = [(i, (i + 1) % p) for i in range(p)]

  def probe(x):
    one = jax.lax.ppermute(x, axis_name, perm)
    full = x
    for _ in range(p):
      full = jax.lax.ppermute(full, axis_name, perm)
    return one, full

  fn = shard_map(probe, mesh=mesh, in_specs=P(axis_name),
                 out_specs=P(axis_name))
  iota = jnp.arange(p, dtype=jnp.float32)
  one, full = jax.device_get(jax.jit(fn)(iota))
  expect_one = np.roll(np.arange(p, dtype=np.float32), 1)
  if not np.array_equal(np.asarray(one), expect_one):
    raise AssertionError(
        f"ring order violated: one ppermute hop produced {one!r}, expected "
        f"{expect_one!r} — mesh axis '{axis_name}' devices are not in the "
        "logical ring order the sharded paths assume")
  if not np.array_equal(np.asarray(full), np.asarray(iota)):
    raise AssertionError(
        f"ring round-trip violated: {p} hops produced {full!r}, expected "
        f"{np.asarray(iota)!r}")
