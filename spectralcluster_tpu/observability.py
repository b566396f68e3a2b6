"""Observability: stage timing, profiler hooks, structured results.

The reference has no tracing/metrics of any kind (SURVEY.md §5). Here:
  * ``stage_timer`` — lightweight wall-clock timing of pipeline stages,
    collected into ClusterResult.timings by the orchestrator.
  * ``profile_trace`` — context manager around ``jax.profiler.trace`` for
    capturing a TensorBoard-compatible device trace of a clustering run.
  * The compiled pipeline wraps its stages in ``jax.named_scope`` (see
    pipeline.py) so device profiles attribute time to
    affinity/refinement/eigh/kmeans.
"""

from __future__ import annotations

import contextlib
import time
import typing

import jax


class StageTimings:
  """Accumulates wall-clock stage durations for one clustering call."""

  def __init__(self):
    self.timings: typing.Dict[str, float] = {}

  @contextlib.contextmanager
  def stage(self, name: str):
    t0 = time.perf_counter()
    try:
      yield
    finally:
      self.timings[name] = self.timings.get(name, 0.0) + (
          time.perf_counter() - t0)

  def as_dict(self) -> dict:
    return dict(self.timings)


@contextlib.contextmanager
def profile_trace(log_dir: str, host_trace: bool = True):
  """Capture a jax.profiler trace of the enclosed block.

  ``host_trace`` is accepted (and ignored) for backward compatibility:
  jax.profiler.trace always records both host and device activity.
  """
  del host_trace
  with jax.profiler.trace(log_dir, create_perfetto_link=False):
    yield


def block_and_time(fn, *args, **kwargs):
  """Run fn, block on its outputs, return (outputs, seconds)."""
  t0 = time.perf_counter()
  out = fn(*args, **kwargs)
  out = jax.block_until_ready(out)
  return out, time.perf_counter() - t0
