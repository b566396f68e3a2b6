"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-device sharding tests use the CPU "fake backend" (SURVEY.md §4).
This environment preloads jax bound to a tunneled TPU at interpreter start
(sitecustomize), so setting env vars here is too late — we re-exec pytest
once with a corrected environment instead.
"""

import os
import sys

_WANT_REEXEC = (os.environ.get("SCT_TESTS_REEXEC") != "1" and
                (os.environ.get("PALLAS_AXON_POOL_IPS") or
                 os.environ.get("JAX_PLATFORMS", "") != "cpu"))
if _WANT_REEXEC:
  env = {k: v for k, v in os.environ.items()}
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["JAX_PLATFORMS"] = "cpu"
  xla_flags = env.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in xla_flags:
    env["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
  env["SCT_TESTS_REEXEC"] = "1"
  os.execvpe(sys.executable,
             [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
  sys.path.insert(0, REPO_ROOT)

# The upstream reference (read-only) is importable for parity tests only.
REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
  """Is an upstream reference importable (mounted checkout or pip install)?

  The parity suites gate CI too (VERDICT r3 item 8): when the read-only
  checkout is absent, the pip-published ``spectralcluster`` package (the
  same upstream project) serves as the differential oracle.
  """
  if os.path.isdir(os.path.join(REFERENCE_PATH, "spectralcluster")):
    return True
  try:
    import spectralcluster  # noqa: F401
    return True
  except ImportError:
    return False


def import_reference():
  """Import the reference package for golden-output parity tests."""
  if os.path.isdir(os.path.join(REFERENCE_PATH, "spectralcluster")):
    if REFERENCE_PATH not in sys.path:
      sys.path.insert(0, REFERENCE_PATH)
  import spectralcluster  # noqa: F401
  return spectralcluster
