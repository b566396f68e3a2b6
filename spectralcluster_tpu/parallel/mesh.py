"""Device-mesh helpers.

The framework uses a 2-D logical mesh:
  * ``batch`` — data parallelism: independent utterances/recordings sharded
    across hosts/chips (DCN between hosts, ICI within a slice).
  * ``model`` — matrix sharding: the N×N affinity/Laplacian row-sharded
    across chips when N²·4B exceeds one chip's HBM (the tensor-parallel
    analog for this workload; SURVEY.md §2c).

The reference has no parallelism of any kind (single-process NumPy); this
whole subpackage is new TPU-first design. PP/EP have no meaningful
counterpart in this workload (no layered model, no experts) — recorded as
N/A per SURVEY.md §2c.
"""

from __future__ import annotations

import typing

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: typing.Optional[int] = None,
              mp: typing.Optional[int] = None,
              devices=None) -> Mesh:
  """Create a (batch=dp, model=mp) mesh over the available devices."""
  if devices is None:
    devices = jax.devices()
  n = len(devices)
  if dp is None and mp is None:
    # Favor data parallelism by default; model axis kicks in when requested.
    dp, mp = n, 1
  elif dp is None:
    dp = n // mp
  elif mp is None:
    mp = n // dp
  if dp * mp != n:
    raise ValueError(f"dp*mp = {dp}*{mp} != {n} devices")
  arr = np.asarray(devices).reshape(dp, mp)
  return Mesh(arr, axis_names=("batch", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
  """Shard the leading (batch) axis; replicate the rest."""
  return NamedSharding(mesh, P(("batch",), *([None] * (ndim - 1))))


def row_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
  """Shard the leading (row) axis over the model axis; replicate the rest."""
  return NamedSharding(mesh, P(("model",), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address: typing.Optional[str] = None,
                           num_processes: typing.Optional[int] = None,
                           process_id: typing.Optional[int] = None) -> None:
  """Initialize the multi-controller runtime for multi-host meshes.

  Thin wrapper over ``jax.distributed.initialize`` — call once per host
  before building a mesh that spans hosts (DCN for the batch axis, ICI for
  the model axis). No-ops cleanly when already initialized.
  """
  try:
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
  except RuntimeError as e:  # already initialized
    if "already" not in str(e).lower():
      raise
